package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** End-to-end contract for the composed curation pipeline: funnel
  * arithmetic coheres, the packed layout conserves the curated tokens,
  * and an owned scope releases every scaffold it cached.
  */
class TrainDataPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  test("pipeline funnel coheres, packing conserves curated tokens, scope releases storage") {
    val docs = graft.Tables(spark, SparkFixture.sfDir, "documents")
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet

    implicit val scope: CacheScope = CacheScope.owned()
    val out = TrainDataPipeline.run(docs, col("doc_id") % 10 === 0)
    val funnel = out.funnel.orderBy("stage_id").collect()

    // four stages; every row's docs_out = docs_in - removed; each
    // stage's input is the previous stage's output; removals >= 0
    assert(funnel.length == 4)
    for (r <- funnel) {
      assert(r.getAs[Long]("docs_out") ==
        r.getAs[Long]("docs_in") - r.getAs[Long]("removed"))
      assert(r.getAs[Long]("removed") >= 0)
    }
    for (Array(a, b) <- funnel.sliding(2)) {
      assert(a.getAs[Long]("docs_out") == b.getAs[Long]("docs_in"))
    }
    // the funnel's terminal count IS the curated set's size
    val curatedN = out.curated.count()
    assert(funnel.last.getAs[Long]("docs_out") == curatedN)
    assert(curatedN > 0, "pipeline curated everything away")

    // token conservation: every curated token lands in exactly one piece
    val curTok = out.curated
      .agg(sum(size(split(col("text"), " ")).cast("long"))).collect()(0).getLong(0)
    val packedTok = out.packed.agg(sum("len")).collect()(0).getLong(0)
    assert(packedTok == curTok, s"packed $packedTok tokens vs curated $curTok")

    // owned-scope lifecycle: closing releases every scaffold the run
    // cached — storage returns to the pre-pipeline baseline
    scope.close()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty, s"pipeline leaked cached RDDs: $leaked")
  }

  test("span stage rewrites boilerplate runs, drops emptied docs, extends the funnel") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    // quality-passing base text (enough stopwords/length for the gate);
    // doc 2 embeds doc 1's 8-token run mid-text; doc 3 IS the run
    // verbatim (fully emptied by the rewrite -> dropped); doc 4 clean
    val base = "the quick brown fox jumps over the lazy dog and then it runs back home to rest for a while now"
    val run8 = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"$base $run8"),
      (2L, s"$run8 $base padding words here"),
      (3L, run8),
      (4L, s"$base again differently phrased tail")
    ).toDF("doc_id", "text")

    implicit val scope: CacheScope = CacheScope.owned()
    val out = TrainDataPipeline.run(docs, lit(false), minQuality = 0.0,
      seqLen = 16L, nshards = 2L, spanDedup = true)
    val funnel = out.funnel.orderBy("stage_id").collect()
    assert(funnel.length == 5 && funnel.last.getAs[String]("stage") == "span_dedup")
    for (Array(a, b) <- funnel.sliding(2))
      assert(a.getAs[Long]("docs_out") == b.getAs[Long]("docs_in"))

    val curated = out.curated.orderBy("doc_id")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    // doc 1 owns both runs (min doc_id, untouched); doc 2 duplicates
    // BOTH the 8-token run and the 21-token base run — both removed,
    // only its unique tail survives; doc 3 empties out and is dropped
    assert(curated.map(_._1) == Seq(1L, 2L, 4L))
    assert(curated(0)._2 == s"$base $run8")
    assert(curated(1)._2 == "padding words here")
    assert(funnel.last.getAs[Long]("removed") == 1L, "doc 3 should be the one emptied doc")

    // packing ran over the REWRITTEN text: token conservation holds
    val curTok = out.curated
      .agg(sum(size(split(col("text"), " ")).cast("long"))).collect()(0).getLong(0)
    val packedTok = out.packed.agg(sum("len")).collect()(0).getLong(0)
    assert(packedTok == curTok, s"packed $packedTok tokens vs curated $curTok")

    scope.close()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty, s"span-stage pipeline leaked cached RDDs: $leaked")
  }

  test("weighted-sample stage respects the budget, extends the funnel, and is deterministic") {
    val docs = graft.Tables(spark, SparkFixture.sfDir, "documents")
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet

    implicit val scope: CacheScope = CacheScope.owned()
    // unsampled baseline for the budget/no-op comparisons
    val base = TrainDataPipeline.run(docs, col("doc_id") % 10 === 0)
    val baseN = base.curated.count()
    assert(baseN > 50, s"fixture should curate >50 docs, got $baseN")

    val budget = 50L
    val out = TrainDataPipeline.run(docs, col("doc_id") % 10 === 0,
      sampleBudget = Some(budget))
    val funnel = out.funnel.orderBy("stage_id").collect()
    assert(funnel.length == 5 &&
      funnel.last.getAs[String]("stage") == "weighted_sample")
    for (Array(a, b) <- funnel.sliding(2))
      assert(a.getAs[Long]("docs_out") == b.getAs[Long]("docs_in"))
    assert(funnel.last.getAs[Long]("docs_out") == budget)
    assert(out.curated.count() == budget)

    // deterministic: a second run selects the identical id set
    val ids1 = out.curated.select("doc_id").collect().map(_.getLong(0)).toSet
    val out2 = TrainDataPipeline.run(docs, col("doc_id") % 10 === 0,
      sampleBudget = Some(budget))
    val ids2 = out2.curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "same corpus + budget must select the same docs")

    // a budget at or above the curated size is a no-op
    val noop = TrainDataPipeline.run(docs, col("doc_id") % 10 === 0,
      sampleBudget = Some(baseN))
    assert(noop.curated.count() == baseN)

    // packing ran over the SAMPLED set: token conservation holds
    val curTok = out.curated
      .agg(sum(size(split(col("text"), " ")).cast("long"))).collect()(0).getLong(0)
    val packedTok = out.packed.agg(sum("len")).collect()(0).getLong(0)
    assert(packedTok == curTok)

    scope.close()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty, s"sample-stage pipeline leaked cached RDDs: $leaked")
  }
}
