package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private implicit val scope: CacheScope = CacheScope.sessionOwned

  test("pageRank on a 3-node path matches the hand-computed power iteration") {
    // undirected path 1-2-3: deg(1)=deg(3)=1, deg(2)=2. Replicate the
    // op's exact arithmetic (round to 9 each iteration) in plain Scala
    // and demand bit-equality — the same determinism contract the
    // DuckDB oracle pins for q44.
    val edges = GraphOps.undirect(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val got = GraphOps.pageRank(edges).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap

    def rnd(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var p = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    val deg = Map(1L -> 1.0, 2L -> 2.0, 3L -> 1.0)
    for (_ <- 1 to 3) {
      val contrib = Map(
        1L -> p(2L) / deg(2L),               // only 2 points at 1
        2L -> (p(1L) / deg(1L) + p(3L) / deg(3L)),
        3L -> p(2L) / deg(2L))
      p = contrib.map { case (v, s) => v -> rnd(0.15 / 3 + 0.85 * s) }
    }
    assert(got == p, s"got $got, expected $p")
  }

  test("pageRank conserves probability mass on the fixture graph") {
    val li = graft.Tables(spark, SparkFixture.sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val o = graft.Tables(spark, SparkFixture.sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val ed = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("src"), (col("o_custkey") * 2 + 1).as("dst"))
      .distinct()
    val pr = GraphOps.pageRank(GraphOps.undirect(ed))
    val Array(total, n) = pr.agg(sum("pr"), count(lit(1))).collect()(0) match {
      case r => Array(r.getDouble(0), r.getLong(1).toDouble)
    }
    // undirected => no dangling leakage; only the per-iteration
    // round(·,9) nibbles at the total (≤ n·5e-10 per iteration)
    assert(math.abs(total - 1.0) < n * 2e-9,
      s"mass not conserved: sum(pr) = $total over $n nodes")
  }

  test("personalized PageRank matches the hand-computed seeded iteration and conserves mass") {
    // path 1-2-3, seed {1}: all restart mass returns to node 1, the
    // rest ranks by proximity to it. Replicate the exact arithmetic
    // (single-division base, round(9) per iteration) and demand
    // bit-equality; total mass stays 1 (teleport + damping·1 fixpoint).
    val edges = GraphOps.undirect(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = GraphOps.personalizedPageRank(edges, seeds).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap

    def rnd(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val base = Map(1L -> 0.15, 2L -> 0.0, 3L -> 0.0)
    val deg = Map(1L -> 1.0, 2L -> 2.0, 3L -> 1.0)
    var p = Map(1L -> 1.0, 2L -> 0.0, 3L -> 0.0)
    for (_ <- 1 to 3) {
      val contrib = Map(
        1L -> p(2L) / deg(2L),
        2L -> (p(1L) / deg(1L) + p(3L) / deg(3L)),
        3L -> p(2L) / deg(2L))
      p = contrib.map { case (v, s) => v -> rnd(base(v) + 0.85 * s) }
    }
    assert(got == p, s"got $got, expected $p")
    assert(math.abs(got.values.sum - 1.0) < 1e-8, "seeded mass must stay 1")
    // 3 iterations on a path oscillate (1's mass sloshes through 2),
    // so no monotone-proximity claim — but the seed's NEIGHBOR must
    // outrank the far end at every odd+even mix, and the far end can
    // only hold what passed through 2 twice
    assert(got(2L) > got(3L), "the seed's neighbor must outrank the far end")
  }

  test("lazy checkpointEvery cuts lineage without running jobs at build") {
    val edges = GraphOps.undirect(Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"))
    val plain = GraphOps.pageRank(edges, iters = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val ckpt = GraphOps.pageRank(edges, iters = 4, checkpointEvery = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(ckpt == plain, "checkpointed rounds must not change ranks")
  }
}
