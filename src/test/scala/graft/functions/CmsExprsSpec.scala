package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class CmsExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("cms_estimate never under-estimates and is exact on an uncrowded sketch") {
    // keys with known multiplicities 1..100 into a sketch wide enough
    // that collisions are overwhelmingly unlikely — estimates must be
    // EXACTLY the true counts then; the >= bound is the CMS contract
    // the heavy-hitter gate's no-false-negative argument rests on
    val rows = (1 to 100).flatMap(k => Seq.fill(k)(k.toLong)).toDF("v")
    val cms = rows.agg(expr("count_min_sketch(v, 0.00003d, 0.99d, 42)")).scalar()
    val est = rows.distinct()
      .select(col("v"), CmsExprs.cms_estimate(cms, col("v")).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (1 to 100).foreach { k =>
      assert(est(k.toLong) >= k, s"CMS under-estimated $k: ${est(k.toLong)}")
      assert(est(k.toLong) == k, s"uncrowded sketch must be exact at $k: ${est(k.toLong)}")
    }
  }

  test("cms_estimate is callable from SQL text with a scalar-subquery sketch") {
    (1 to 20).flatMap(k => Seq.fill(k)(k.toLong)).toDF("v")
      .createOrReplaceTempView("cms_sql_probe")
    val rows = spark.sql(
      """SELECT v, cms_estimate(
        |  (SELECT count_min_sketch(v, 0.0001d, 0.99d, 7) FROM cms_sql_probe), v) AS est
        |FROM (SELECT DISTINCT v FROM cms_sql_probe)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (1 to 20).foreach(k => assert(rows(k.toLong) >= k))
  }

  test("cms_estimate against two different sketches in one projection stays correct") {
    // the probe cache is a per-thread identity ring: a projection
    // evaluating TWO sketches per row must hit the right parse for
    // each (a single-entry cache would thrash but stay correct; a
    // buggy ring could return the wrong sketch's counts)
    val a = (1 to 50).flatMap(k => Seq.fill(k)(k.toLong)).toDF("v")
    val b = (1 to 50).flatMap(k => Seq.fill(2 * k)(k.toLong)).toDF("v")
    val sa = a.agg(expr("count_min_sketch(v, 0.00003d, 0.99d, 42)")).scalar()
    val sb = b.agg(expr("count_min_sketch(v, 0.00003d, 0.99d, 43)")).scalar()
    val est = a.distinct()
      .select(col("v"),
        CmsExprs.cms_estimate(sa, col("v")).as("ea"),
        CmsExprs.cms_estimate(sb, col("v")).as("eb"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    (1 to 50).foreach { k =>
      assert(est(k.toLong) == ((k.toLong, 2L * k)),
        s"two-sketch probe mixed results at $k: ${est(k.toLong)}")
    }
  }

  test("heavyGrams equals the ungated exact computation (gate prunes work, not answers)") {
    val docs = graft.Tables(spark, SparkFixture.sfDir, "documents")
    val gated = graft.ops.CorpusOps.heavyGrams(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val exact = docs.select(explode(
        ShingleExprs.shingle_sha60(col("text"), 8)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df")).filter(col("df") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gated == exact,
      s"gated result diverged: ${gated.size} vs ${exact.size} heavy grams")
  }
}
