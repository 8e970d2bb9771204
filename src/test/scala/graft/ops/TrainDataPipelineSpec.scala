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
}
