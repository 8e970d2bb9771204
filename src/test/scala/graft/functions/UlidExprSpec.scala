package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class UlidExprSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("ulid() generates unique, per-partition monotonic ULIDs") {
    val df = spark.range(0, 10000, 1, 8)
      .withColumn("u", UlidExprs.ulid())
      .select(col("id"), col("u.msb").as("msb"), col("u.lsb").as("lsb"))
      .withColumn("pid", spark_partition_id())
      .cache()
    try {
      assert(df.select("msb", "lsb").distinct().count() == 10000)
      // per-partition monotonic: ordering by row position within a
      // partition must equal ordering by ULID
      val rows = df.orderBy("pid", "id").collect()
      rows.groupBy(_.getInt(3)).foreach { case (_, rs) =>
        rs.sliding(2).foreach {
          case Array(a, b) =>
            val c = java.lang.Long.compareUnsigned(a.getLong(1), b.getLong(1))
            assert(c < 0 || (c == 0 && java.lang.Long.compareUnsigned(a.getLong(2), b.getLong(2)) < 0))
          case _ =>
        }
      }
    } finally df.unpersist()
  }

  test("ulid_timestamp extracts the embedded millisecond timestamp") {
    val now = System.currentTimeMillis()
    val got = spark.range(1).select(UlidExprs.ulid().as("u"))
      .select(UlidExprs.ulid_timestamp(col("u.msb")).cast("long").as("s"))
      .as[Long].head()
    assert(math.abs(got - now / 1000) <= 5)
  }

  test("ulid() registered for SQL") {
    UlidExprs.register(spark)
    val n = spark.sql("SELECT ulid() AS u FROM range(100)")
      .select("u.msb", "u.lsb").distinct().count()
    assert(n == 100)
  }

  test("ulid(seed) via extensions accepts int literals and rejects non-literals") {
    // extensions-registered path (GraftExtensions) — int literal widens
    val n = spark.sql("SELECT ulid(7) AS u FROM range(10)")
      .select("u.msb", "u.lsb").distinct().count()
    assert(n == 10)
    val err = intercept[Exception] {
      spark.sql("SELECT ulid(id) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("literal"))
  }
}
