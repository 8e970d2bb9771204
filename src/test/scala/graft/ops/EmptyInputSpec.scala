package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Degenerate-input contracts: a 100 TB pipeline's stages regularly
  * receive EMPTY slices (a filter that matched nothing, a quiet
  * ingest window) — every operator must return its empty shape, not
  * throw or hang. */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private implicit val scope: CacheScope = CacheScope.sessionOwned

  private def noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
  private def noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("graph ops return empty results on an empty edge list") {
    assert(GraphOps.pageRank(noEdges).isEmpty)
    assert(GraphOps.triangles(noEdges).isEmpty)
    assert(GraphOps.kCore(noEdges, k = 2).isEmpty)
    assert(GraphOps.connectedComponents(noEdges).isEmpty)
    assert(GraphOps.hits(noEdges).isEmpty)
    assert(GraphOps.labelPropagation(noEdges).isEmpty)
    assert(GraphOps.adamicAdar(noEdges).isEmpty)
    assert(GraphOps.linkPredict(noEdges).isEmpty)
    assert(GraphOps.hopDistance(noEdges, Seq(Tuple1(1L)).toDF("node")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 0L)),
      "seeds with no edges keep their distance-0 row")
    // betweenness on edgeless seeds: only the seed rows exist, and
    // the v != seed filter removes them -> empty score table
    assert(GraphOps.betweenness(noEdges, Seq(Tuple1(1L)).toDF("node")).isEmpty)
  }

  test("betweenness with an empty seed set scores nothing") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    assert(GraphOps.betweenness(edges, Seq.empty[Tuple1[Long]].toDF("node")).isEmpty)
  }

  test("maintainAgg degenerate sides: empty delta keeps the view; empty view adopts the delta") {
    val mv = Seq((1L, 2L, 10L)).toDF("k", "cnt", "s")
    val none = Seq.empty[(Long, Long, Long)].toDF("k", "cnt", "s")
    val kept = TableOps.maintainAgg(mv, none, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kept == Set((1L, 2L, 10L)))
    val adopted = TableOps.maintainAgg(none, mv, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(adopted == Set((1L, 2L, 10L)))
  }

  test("hopDistance with an empty source set explores nothing") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    assert(GraphOps.hopDistance(edges, Seq.empty[Tuple1[Long]].toDF("node")).isEmpty)
  }

  test("counted maintenance degenerate sides: empty batch keeps the view; empty view adopts the batch") {
    val mv = Seq((1L, 10L, 2L)).toDF("k", "sum_v", "cnt")
    val noBatch = Seq.empty[(Long, Long, Long)].toDF("k", "sum_v", "_mult")
    val kept = TableOps.maintainAggCounted(mv, noBatch, Seq("k"), Seq("sum_v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kept == Set((1L, 10L, 2L)), s"empty batch changed the view: $kept")
    val noView = Seq.empty[(Long, Long, Long)].toDF("k", "sum_v", "cnt")
    val batch = Seq((2L, 7L, 1L)).toDF("k", "sum_v", "_mult")
    val adopted = TableOps.maintainAggCounted(noView, batch, Seq("k"), Seq("sum_v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(adopted == Set((2L, 7L, 1L)), s"empty view lost the batch: $adopted")
    // value-counts aux + reads: empty aux reads empty, never throws
    val noAux = Seq.empty[(Long, Long, Long)].toDF("k", "v", "cnt")
    assert(TableOps.readMinMax(noAux, Seq("k"), "v").isEmpty)
    assert(TableOps.readQuantile(noAux, Seq("k"), "v",
      new java.math.BigDecimal("0.5")).isEmpty)
    // consolidate of nothing is nothing
    assert(TableOps.consolidate(
      Seq.empty[(Long, Long)].toDF("k", "_mult"), Seq("k")).isEmpty)
  }

  test("clusteringDepth on an empty zone table returns the empty aggregate, not a crash") {
    val noZones = Seq.empty[(Long, Long)].toDF("mn", "mx")
    val r = Layout.clusteringDepth(noZones, "mn", "mx").collect().head
    assert(r.getLong(0) == 0L, s"expected n_chunks 0: $r")
    // and the trigger never fires on it
    val tbl = Seq((0, 0)).toDF("x", "y")
    val (same, fired) = Layout.reclusterIfDeep(tbl, noZones, "mn", "mx",
      maxDepthThreshold = 1, "x", "y", numFiles = 2)
    assert(!fired && (same eq tbl), "empty zones must not trigger a rewrite")
  }

  test("TableOps degenerate sides: empty updates pass the base; empty changelog applies to nothing") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val got = TableOps.upsert(base, Seq.empty[(Long, String)].toDF("k", "s"), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b")))
    assert(TableOps.cdcApply(Seq.empty[(Long, Long, String)].toDF("k", "seq", "op"),
      Seq("k"), "seq", "op").isEmpty)
    assert(TableOps.scd2(Seq.empty[(Long, Long, String)].toDF("k", "ts", "v"),
      "k", "ts", "v").isEmpty)
  }

  test("heavyGrams on an empty corpus returns no heavy hitters (null sketch is null-safe)") {
    // the CMS scalar subquery over zero rows evaluates to NULL;
    // cms_estimate must null-propagate so the gate filter drops
    // everything instead of throwing at deserialization
    assert(CorpusOps.heavyGrams(noDocs).isEmpty)
  }

  test("topPrincipalDirection on an empty corpus returns an empty direction table") {
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(CorpusOps.topPrincipalDirection(noVecs).isEmpty)
  }
}
