package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, Tables}

/** S2 sink coverage: query results survive parquet/CSV/JSON/ORC round
  * trips (schema-aware re-read equals the original). */
class SinkRoundtripSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("orc sink round-trips a query result (native ORC, no extra deps)") {
    val df = Tables(spark, SparkFixture.sfDir, "region")
      .select("r_regionkey", "r_name").orderBy("r_regionkey")
    val expected = df.collect().toSeq
    val base = Files.createTempDirectory("sink-orc").toString
    df.write.mode("overwrite").orc(s"$base/o")
    assert(spark.read.orc(s"$base/o").orderBy("r_regionkey").collect().toSeq == expected)
  }

  test("parquet / csv / json sinks round-trip a query result") {
    val df = Tables(spark, SparkFixture.sfDir, "nation")
      .join(broadcast(Tables(spark, SparkFixture.sfDir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name", "r_name")
      .orderBy("n_nationkey")
    val expected = df.collect().toSeq
    val base = Files.createTempDirectory("sinks").toString

    df.write.mode("overwrite").parquet(s"$base/p")
    assert(spark.read.parquet(s"$base/p").orderBy("n_nationkey").collect().toSeq == expected)

    df.write.mode("overwrite").option("header", "true").csv(s"$base/c")
    assert(spark.read.option("header", "true").schema(df.schema).csv(s"$base/c")
      .orderBy("n_nationkey").collect().toSeq == expected)

    df.write.mode("overwrite").json(s"$base/j")
    assert(spark.read.schema(df.schema).json(s"$base/j")
      .orderBy("n_nationkey").collect().toSeq == expected)
  }
}
