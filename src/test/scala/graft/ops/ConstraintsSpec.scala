package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class ConstraintsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._
  import Constraints._

  test("single-table suite counts violations exactly, one fused pass") {
    val df = Seq(
      (Some(1L), "A", 10.0), (Some(2L), "B", 60.0), (None, "A", 5.0),
      (Some(1L), "Z", -1.0), (Some(4L), "A", 50.0))
      .toDF("id", "flag", "v")
    val got = check(df, Seq(
      NotNull("id"),                // 1 null
      InSet("flag", Seq("A", "B")), // 1 'Z'
      Bounded("v", 0, 50),          // 60.0 and -1.0 -> 2
      Unique(Seq("id"))))           // ids 1,2,null,1,4
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got("not_null(id)") == ((1L, false)), s"got $got")
    assert(got("in_set(flag)") == ((1L, false)), s"got $got")
    assert(got("bounded(v)") == ((2L, false)), s"got $got")
    // countDistinct skips the NULL id: 5 rows - 3 distinct = 2
    // "violations" (the dup 1 AND the null row) — uniqueness implies
    // presence
    assert(got("unique(id)") == ((2L, false)), s"got $got")
  }

  test("empty table: every count-style constraint passes with 0 violations") {
    val empty = Seq.empty[(Option[Long], String, Double)].toDF("id", "flag", "v")
    val got = check(empty, Seq(NotNull("id"), Bounded("v", 0, 1)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(got.forall(r => r._2 == 0L && r._3), s"got ${got.toSeq}")
  }

  test("foreign key: orphans and NULL keys count; clean references pass") {
    val fact = Seq(Some(1L), Some(2L), Some(9L), None).toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("rk")
    val r = checkForeignKey(fact, Seq("k"), dim, Seq("rk")).collect()(0)
    assert(r.getString(0) == "foreign_key(k)")
    assert(r.getLong(1) == 2L && !r.getBoolean(2), s"got $r") // 9 and NULL
    val clean = checkForeignKey(Seq(1L, 2L).toDF("k"), Seq("k"), dim, Seq("rk"))
      .collect()(0)
    assert(clean.getLong(1) == 0L && clean.getBoolean(2))
  }
}
