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

  test("deep iteration: checkpointEvery bounds plan depth and preserves ranks") {
    // 12 rounds is the regime the scaladoc promises checkpointEvery
    // for: the uncut plan unrolls all 12 rounds (plan size grows
    // linearly and the optimizer re-walks the whole chain), the cut
    // plan bottoms out at the latest checkpoint leaf — assert BOTH the
    // lineage bound (structurally: the final plan string is strictly
    // smaller, and carries an RDD checkpoint leaf) and bit-identical
    // ranks (a lazy localCheckpoint must be a pure materialization
    // boundary, never an arithmetic change).
    val edges = GraphOps.undirect(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
      .toDF("src", "dst"))
    val plainDf = GraphOps.pageRank(edges, iters = 12)
    val plain = plainDf.collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val cutDf = GraphOps.pageRank(edges, iters = 12, checkpointEvery = 3)
    val cut = cutDf.collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(cut == plain, "checkpointed rounds must not change ranks")
    val plainPlan = plainDf.queryExecution.optimizedPlan.numberedTreeString
    val cutPlan = cutDf.queryExecution.optimizedPlan.numberedTreeString
    assert(cutPlan.linesIterator.size < plainPlan.linesIterator.size,
      s"lineage cut did not bound plan depth: cut ${cutPlan.linesIterator.size} " +
        s">= plain ${plainPlan.linesIterator.size} lines")
  }

  test("directed graph: a pure source keeps teleport mass and keeps propagating it") {
    // The ADVICE-flagged case: node 4 has out-edges but NO in-edges.
    // The left-join step must hold its teleport mass at 0.15/n every
    // round (an inner-join formulation drops the node after round 1
    // and its mass stops flowing into the graph). Nodes 2 and 1 form a
    // cycle; 4 feeds 1. Replicate the exact arithmetic.
    val edges = Seq((1L, 2L), (2L, 1L), (4L, 1L)).toDF("src", "dst")
    val got = GraphOps.pageRank(edges).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap

    def rnd(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var p = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 4L -> 1.0 / 3)
    for (_ <- 1 to 3) {
      val sw = Map(
        1L -> (p(2L) / 1.0 + p(4L) / 1.0), // 2→1 and 4→1
        2L -> p(1L) / 1.0,                 // 1→2
        4L -> 0.0)                          // no in-edges
      p = sw.map { case (v, s) => v -> rnd(0.15 / 3 + 0.85 * s) }
    }
    assert(got == p, s"got $got, expected $p")
    assert(got(4L) == rnd(0.15 / 3), "a no-in-edge source must hold exactly its teleport mass")
  }

  test("personalized PageRank: a seed with no in-edges holds base mass and feeds the graph") {
    // Seed 1 points into a 2↔3 cycle and nothing points back at it:
    // its restart mass must persist (0.15 every round) and keep
    // feeding node 2 — the exact scenario where the old inner-join
    // formulation lost the seed entirely after round 1.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = GraphOps.personalizedPageRank(edges, seeds).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap

    def rnd(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val base = Map(1L -> 0.15, 2L -> 0.0, 3L -> 0.0)
    var p = Map(1L -> 1.0, 2L -> 0.0, 3L -> 0.0)
    for (_ <- 1 to 3) {
      val sw = Map(
        1L -> 0.0,
        2L -> (p(1L) / 1.0 + p(3L) / 1.0),
        3L -> p(2L) / 1.0)
      p = sw.map { case (v, s) => v -> rnd(base(v) + 0.85 * s) }
    }
    assert(got == p, s"got $got, expected $p")
    assert(got(1L) == 0.15, "a no-in-edge seed must hold exactly its base mass")
  }

  test("weighted PageRank splits out-mass by edge weight (hand-computed)") {
    // 1 sends 3/4 of its mass to 2 and 1/4 to 3; both return all mass
    // to 1. Contribution order pr * w / deg replicated exactly.
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val got = GraphOps.pageRankWeighted(edges, "w").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap

    def rnd(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var p = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    for (_ <- 1 to 3) {
      val sw = Map(
        1L -> (p(2L) * 1.0 / 1.0 + p(3L) * 1.0 / 1.0),
        2L -> p(1L) * 3.0 / 4.0,
        3L -> p(1L) * 1.0 / 4.0)
      p = sw.map { case (v, s) => v -> rnd(0.15 / 3 + 0.85 * s) }
    }
    assert(got == p, s"got $got, expected $p")
    // heavier edge -> more rank at the destination
    assert(got(2L) > got(3L), "the 3x-weighted destination must outrank the 1x one")
  }

  test("weighted + seeded PageRank composes both semantics (hand-computed)") {
    // seed {1}; 1 splits mass 3:1 between 2 and 3; 2 and 3 return it.
    // Restart mass stays on the seed; out-mass splits by weight.
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = GraphOps.personalizedPageRankWeighted(edges, seeds).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap

    def rnd(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val base = Map(1L -> 0.15, 2L -> 0.0, 3L -> 0.0)
    var p = Map(1L -> 1.0, 2L -> 0.0, 3L -> 0.0)
    for (_ <- 1 to 3) {
      val sw = Map(
        1L -> (p(2L) * 1.0 / 1.0 + p(3L) * 1.0 / 1.0),
        2L -> p(1L) * 3.0 / 4.0,
        3L -> p(1L) * 1.0 / 4.0)
      p = sw.map { case (v, s) => v -> rnd(base(v) + 0.85 * s) }
    }
    assert(got == p, s"got $got, expected $p")
    assert(got(2L) > got(3L), "the 3x-weighted branch must carry more seed mass")
  }

  test("pageRankConverged stops early on an already-converged graph with identical ranks") {
    // A 4-clique is at its stationary distribution immediately: every
    // node holds 1/4 and round(0.15/4 + 0.85*0.25, 9) = 0.25 again, so
    // delta = 0 EXACTLY after the first check — the run must stop
    // after ~1 round (job count bounds it: far fewer jobs than the 50
    // rounds maxIters allows) and the ranks must equal the fixed-round
    // variant's bit-for-bit.
    val edges = GraphOps.undirect(
      (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)).toDF("src", "dst"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val got =
      try GraphOps.pageRankConverged(edges, maxIters = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
      finally {
        // listener events post asynchronously; a short drain keeps the
        // job-count bound honest (an undercount only loosens it)
        Thread.sleep(500)
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(got == Map(1L -> 0.25, 2L -> 0.25, 3L -> 0.25, 4L -> 0.25),
      s"converged ranks drifted: $got")
    val fixed = GraphOps.pageRank(edges, iters = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got == fixed, "converged result must match the fixed-round variant")
    assert(jobs.get() < 40,
      s"convergence did not stop early: ${jobs.get()} jobs for a 1-round fixpoint")
  }

  test("pageRankConverged with checkEvery > 1 survives the between-check iterates") {
    // regression: predecessors' local-checkpoint blocks were released
    // while the NEXT iterate was still a lazy checkpoint depending on
    // them — the following delta action crashed with missing blocks.
    // tol = -1 can never be reached (delta >= 0), forcing the loop
    // through all 6 iterates with checks only every 2.
    val edges = GraphOps.undirect(Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"))
    val got = GraphOps.pageRankConverged(edges, maxIters = 6, tol = -1.0, checkEvery = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val fixed = GraphOps.pageRank(edges, iters = 6).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got == fixed, "6 checked-every-2 iterates must equal 6 fixed rounds")
  }

  test("pageRankConverged returns an empty rank table for an empty edge list") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphOps.pageRankConverged(empty, maxIters = 3).isEmpty)
  }

  test("hopDistance: multi-source BFS matches hand-computed levels, bounded by maxHops") {
    // two chains off two sources plus an unreachable island:
    //   10 -> 11 -> 12 -> 13 -> 14   (source 10)
    //   20 -> 12                     (source 20: 12 is 1 hop this way)
    //   90 -> 91                     (unreachable from any source)
    val edges = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (20L, 12L), (90L, 91L))
      .toDF("src", "dst")
    val sources = Seq(10L, 20L).map(Tuple1(_)).toDF("node")
    val got = GraphOps.hopDistance(edges, sources, maxHops = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // dist(12) = 1 via 20 (not 2 via 10); 13 = 2; 14 needs 3 hops ->
    // absent at maxHops = 2; the island never appears
    assert(got == Map(10L -> 0L, 20L -> 0L, 11L -> 1L, 12L -> 1L, 13L -> 2L))
    val full = GraphOps.hopDistance(edges, sources, maxHops = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(full == Map(10L -> 0L, 20L -> 0L, 11L -> 1L, 12L -> 1L, 13L -> 2L, 14L -> 3L))
  }

  test("triangles: degree-oriented enumeration counts each triangle once per corner") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant
    // edge 4-5 (degree skew: node 4 has deg 4) and a triangle-free
    // path 6-7-8. Canonical src < dst input form.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L), (7L, 8L)).toDF("src", "dst")
    val got = GraphOps.triangles(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"K4 corners must each sit in 3 triangles, pendant/path in none: $got")
  }

  test("shortestPaths relaxes by edge weight and honors the round bound") {
    //   1 -(5)-> 2 -(1)-> 3      direct 1->3 costs 10, via 2 costs 6
    //   1 -(10)-> 3
    //   3 -(1)-> 4 -(1)-> 5      5 needs 4 relaxations via the cheap path
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 10L), (3L, 4L, 1L), (4L, 5L, 1L))
      .toDF("src", "dst", "w")
    val sources = Seq(Tuple1(1L)).toDF("node")
    val two = GraphOps.shortestPaths(edges, sources, "w", rounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // after 2 rounds: 3 is reachable at min(10, 5+1) = 6; 4 at 10+1 = 11
    // (the cheap path to 4 needs 3 edges); 5 not yet reached
    assert(two == Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> 11L))
    val four = GraphOps.shortestPaths(edges, sources, "w", rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(four == Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> 7L, 5L -> 8L))
  }

  test("kCore peels to the exact k-core on a hand-built graph") {
    // K4 on {1,2,3,4} (the 3-core) + a tail 4-5-6 and a pendant 1-7:
    // peel 1 drops 7 and 6, peel 2 drops 5, leaving exactly the K4
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (1L, 7L)).toDF("src", "dst")
    val got = GraphOps.kCore(edges, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the max core -> empty, not an error
    assert(GraphOps.kCore(edges, k = 4).isEmpty)
  }

  test("hits: hubs and authorities reinforce on a bipartite graph, both sides unit-normalized") {
    // s1 -> {c1, c2}, s2 -> {c2}: s1 is the stronger hub (two
    // authorities), c2 the stronger authority (two hubs); the bipartite
    // shape keeps customer hubs and supplier authorities at exactly 0
    val edges = Seq((2L, 11L), (2L, 13L), (4L, 13L)).toDF("src", "dst")
    val ha = GraphOps.hits(edges).collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    assert(ha(2L)._1 > ha(4L)._1, "two-authority hub must outrank the one-authority hub")
    assert(ha(13L)._2 > ha(11L)._2, "two-hub authority must outrank the one-hub authority")
    assert(ha(11L)._1 == 0.0 && ha(13L)._1 == 0.0, "sinks have hub 0")
    assert(ha(2L)._2 == 0.0 && ha(4L)._2 == 0.0, "sources have authority 0")
    val hubN2 = ha.values.map(_._1).map(x => x * x).sum
    val authN2 = ha.values.map(_._2).map(x => x * x).sum
    assert(math.abs(hubN2 - 1.0) < 1e-6 && math.abs(authN2 - 1.0) < 1e-6,
      s"both score vectors must be unit-L2 (hub $hubN2, auth $authN2)")
  }

  test("adamicAdar scores non-adjacent pairs by shared neighbors, skipping existing edges") {
    // square 1-2-3-4-1: the two diagonals are the only predictions,
    // each with two common neighbors of degree 2 -> score 2/ln(2);
    // adjacent pairs are anti-joined away
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L)).toDF("src", "dst")
    val got = GraphOps.adamicAdar(edges).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val expect = 2.0 / math.log(2.0)
    assert(got.keySet == Set((1L, 3L), (2L, 4L)), s"got ${got.keySet}")
    got.values.foreach(v => assert(math.abs(v - expect) < 1e-12))
    // hub cap: capping at deg 1 excludes every center -> no predictions
    assert(GraphOps.adamicAdar(edges, hubCap = 1).isEmpty)
  }

  test("linkPredict returns exact cn and true (uncapped) endpoint degrees") {
    // square 1-2-3-4-1 plus a pendant 5 off node 1. Wedges: through
    // center 1 (deg 3) pairs (2,4),(2,5),(4,5); through 2 and 4 the
    // diagonal (1,3); through 3 again (2,4). Endpoint degrees must be
    // the TRUE degrees: deg(1)=3, deg(2)=deg(3)=deg(4)=2, deg(5)=1.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L), (1L, 5L))
      .toDF("src", "dst")
    val got = GraphOps.linkPredict(edges).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == Set((1L, 3L), (2L, 4L), (2L, 5L), (4L, 5L)),
      s"got ${got.keySet}")
    assert(got((1L, 3L)) == ((2L, 3L, 2L)), "diagonal 1-3: cn 2, degs 3/2")
    assert(got((2L, 4L)) == ((2L, 2L, 2L)), "diagonal 2-4: cn 2 via 1 and 3")
    assert(got((2L, 5L)) == ((1L, 2L, 1L)), "pendant pair: cn 1, true deg 1")
    assert(got((4L, 5L)) == ((1L, 2L, 1L)))
    // capping at deg 2 removes center 1: pendant pairs and the 2-4
    // via-1 wedge disappear, but (2,4) survives via center 3 with its
    // TRUE degrees intact
    val capped = GraphOps.linkPredict(edges, hubCap = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(capped.keySet == Set((1L, 3L), (2L, 4L)))
    assert(capped((2L, 4L)) == ((1L, 2L, 2L)), "cap prunes centers, not stats")
  }

  test("betweenness on a 5-path from both ends matches the hand trace") {
    // path 1-2-3-4-5, seeds {1, 5}, maxHops 4: from seed 1 the
    // dependencies are δ(2)=3, δ(3)=2, δ(4)=1, δ(5)=0 (each interior
    // node carries every deeper node's shortest path); symmetric from
    // seed 5. bc sums over v != s.
    val edges = GraphOps.undirect(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst"))
    val seeds = Seq(1L, 5L).toDF("node")
    val got = GraphOps.betweenness(edges, seeds, maxHops = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(1L -> 0.0, 2L -> 4.0, 3L -> 4.0, 4L -> 4.0, 5L -> 0.0),
      s"got $got")
  }

  test("harmonicCentrality sums reciprocal distances from each seed") {
    // path 1-2-3-4-5, seeds {1, 5}, maxHops 4: H(2) = 1/1 + 1/3,
    // H(3) = 1/2 + 1/2, H(4) = 1/3 + 1, endpoints see only the far
    // seed at distance 4
    val edges = GraphOps.undirect(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst"))
    val got = GraphOps.harmonicCentrality(edges, Seq(1L, 5L).toDF("node"),
        maxHops = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1),
        math.round(r.getDouble(2) * 1e6) / 1e6))).toMap
    assert(got == Map(
      1L -> ((1L, 0.25)), 2L -> ((2L, 1.333333)), 3L -> ((2L, 1.0)),
      4L -> ((2L, 1.333333)), 5L -> ((1L, 0.25))), s"got $got")
  }

  test("betweenness splits dependency across equal-count shortest paths") {
    // diamond 1-2-4, 1-3-4: sigma(4) = 2, so nodes 2 and 3 each carry
    // half of 4's dependency: δ(2) = δ(3) = (1/2)·(1+0) = 0.5
    val edges = GraphOps.undirect(
      Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst"))
    val got = GraphOps.betweenness(edges, Seq(1L).toDF("node"), maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(2L -> 0.5, 3L -> 0.5, 4L -> 0.0), s"got $got")
  }

  test("labelPropagation matches a local replay of the synchronous LPA rule") {
    // two triangles joined by one bridge + a pendant — communities
    // should be FINER than the single connected component
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L), (12L, 99L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val got = GraphOps.labelPropagation(edges, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // local synchronous replay: most frequent neighbor label, ties to
    // the smaller label
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3)
      lbl = adj.map { case (n, nbrs) =>
        val freq = nbrs.groupBy(lbl).view.mapValues(_.size)
        n -> freq.toSeq.maxBy { case (l, c) => (c, -l) }._1
      }
    assert(got == lbl, s"engine $got vs replay $lbl")
    assert(got.values.toSet.size > 1, "bridged dense clusters must keep distinct labels")
  }

  test("connectedComponents labels every node with its component minimum") {
    // components {1,2,3} (path), {10,11} (edge), island pair {20,21}
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (21L, 20L)).toDF("src", "dst")
    val got = GraphOps.connectedComponents(edges).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      10L -> (10L, 2L), 11L -> (10L, 2L),
      20L -> (20L, 2L), 21L -> (20L, 2L)))
  }

  test("kCoreConverged reaches the fixpoint a shallow fixed-round peel misses") {
    // path 0-1-...-12 with k = 2: every peel only removes the two
    // current endpoints, so the 2-core (empty) needs 6+ rounds — the
    // fixed 4-round default under-peels (returns a non-empty SUPERSET),
    // the converged variant peels to empty and stops
    val path = (0L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    val fixed = GraphOps.kCore(path, k = 2, rounds = 4)
    assert(!fixed.isEmpty, "fixture drift: 4 rounds should under-peel this path")
    assert(GraphOps.kCoreConverged(path, k = 2).isEmpty,
      "converged peel must reach the (empty) 2-core fixpoint")
    // fixpoint equality with the fixed-round form on a graph where the
    // peel terminates fast: the K4 + tail fixture from the kCore test
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (1L, 7L)).toDF("src", "dst")
    val conv = GraphOps.kCoreConverged(edges, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val fx = GraphOps.kCore(edges, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(conv == fx && conv == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // empty input: empty result, no error
    assert(GraphOps.kCoreConverged(
      Seq.empty[(Long, Long)].toDF("src", "dst"), k = 2).isEmpty)
  }

  test("labelPropagationConverged stops at the fixpoint and matches fixed rounds") {
    // a triangle with one pendant converges in a few rounds: after the
    // labels stabilize, the change probe stops the loop, and the result
    // equals the fixed-round form run to the same depth (replay the
    // local rule far past convergence to find the fixpoint)
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 9L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val conv = GraphOps.labelPropagationConverged(edges, maxRounds = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    var prev = lbl.map { case (k, _) => k -> -1L }
    var n = 0
    while (lbl != prev && n < 10) {
      prev = lbl
      lbl = adj.map { case (node, nbrs) =>
        val freq = nbrs.groupBy(lbl).view.mapValues(_.size)
        node -> freq.toSeq.maxBy { case (l, c) => (c, -l) }._1
      }
      n += 1
    }
    assert(lbl == prev, "replay fixture must converge inside 10 rounds")
    assert(conv == lbl, s"engine $conv vs replay fixpoint $lbl")
  }

  test("labelPropagationConverged on an oscillating 2-cycle returns the last iterate") {
    // a single undirected edge swaps labels forever (the synchronous-
    // LPA 2-cycle): the loop must exhaust maxRounds, WARN, and return
    // exactly what the fixed-round form produces at the same depth
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val conv = GraphOps.labelPropagationConverged(edges, maxRounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fixed = GraphOps.labelPropagation(edges, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(conv == fixed, s"oscillating last iterate drifted: $conv vs $fixed")
    assert(conv == Map(1L -> 2L, 2L -> 1L), "odd round count must show the swap")
  }

  test("labelPropagationConverged is not fooled by node churn on single-direction input") {
    // a DIRECTED edge list (contract says both directions, but the
    // probe must not silently mis-converge on a violation): with
    // edges {1->2, 3->2, 3->3}, round 1 moves the node set from
    // {1,3} to {2,3} — an inner-join change probe sees only node 3
    // (unchanged) and would declare a FALSE fixpoint at {2->1,3->3};
    // the full-outer probe counts the churn as change and iterates to
    // the true fixpoint of this relaxation, {2->3, 3->3}
    val edges = Seq((1L, 2L), (3L, 2L), (3L, 3L)).toDF("src", "dst")
    val conv = GraphOps.labelPropagationConverged(edges, maxRounds = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val deep = GraphOps.labelPropagation(edges, rounds = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(conv == deep, s"converged $conv must match the deep fixed-round $deep")
    assert(conv == Map(2L -> 3L, 3L -> 3L), s"true fixpoint expected, got $conv")
  }

  test("connectedComponentsConverged matches the fixed-round components") {
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (21L, 20L)).toDF("src", "dst")
    val conv = GraphOps.connectedComponentsConverged(edges).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val fixed = GraphOps.connectedComponents(edges).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(conv == fixed)
  }

  test("modularity scores two clean triangle communities (hand-computed)") {
    // two triangles bridged by one edge, communities = the triangles:
    // m = 7; each community: e_in = 3, deg_sum = 7 ->
    // contribution = (4*7*3 - 49) / (4*49) = 35/196 = 0.178571429
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val com = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("node", "community")
    val got = GraphOps.modularity(edges, com).orderBy("community")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      (1L, 3L, 7L, 3L, 0.178571429),
      (4L, 3L, 7L, 3L, 0.178571429)))
    // the degenerate one-community assignment scores ~0 (e_in = m,
    // deg_sum = 2m -> 4m*m - 4m^2 = 0 exactly)
    val one = com.select(col("node"), lit(1L).as("community"))
    val q1 = GraphOps.modularity(edges, one).collect()
    assert(q1.length == 1 && q1(0).getDouble(4) == 0.0)
  }

  test("adamicAdar derives a scale-dependent hub cap: mid-degree centers survive past 64") {
    // 2100-edge chain + a deg-100 center wired to nodes 0..99:
    // E = 2200 -> derived cap = 128 (smallest power of two whose
    // square >= 2E = 4400), so the deg-100 center still GENERATES
    // wedges — the old fixed 64 would silently drop it. Nodes 0 and
    // 99 share ONLY that center.
    val chain = (0L until 2100L).map(i => (i, i + 1)).toDF("src", "dst")
    val spokes = (0L until 100L).map(i => (i, 5000L)).toDF("src", "dst")
    val edges = chain.union(spokes)
    val derived = GraphOps.adamicAdar(edges)
      .filter(col("a") === 0L && col("b") === 99L)
    assert(!derived.isEmpty,
      "derived cap (128) must keep the deg-100 wedge center")
    val fixed = GraphOps.adamicAdar(edges, hubCap = 64)
      .filter(col("a") === 0L && col("b") === 99L)
    assert(fixed.isEmpty, "explicit cap 64 must drop the deg-100 center")
    // below the floor the derived cap IS 64: small graphs are unchanged
    val square = Seq((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L)).toDF("src", "dst")
    val a = GraphOps.adamicAdar(square).orderBy("a", "b").collect().toSeq
    val b = GraphOps.adamicAdar(square, hubCap = 64).orderBy("a", "b").collect().toSeq
    assert(a == b)
  }

  test("louvain merges two bridged triangles into their communities (hand-traced)") {
    // triangles {1,2,3} and {4,5,6} + bridge 3-4. Semi-synchronous
    // rounds (odd nodes move on odd rounds): hand-tracing the integer
    // gain scores gives R1 {1->2,3->1,5->6}, R2 {4->6}, R3 {3->2},
    // R4 no moves — each triangle one community, labels 2 and 6 (the
    // surviving ids are members, not minima — Louvain labels are
    // arbitrary). The trace IS the spec: every score is exact.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val got = GraphOps.louvain(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 6L, 5L -> 6L, 6L -> 6L),
      s"hand-traced communities expected, got $got")
    // and the result grades well: modularity = 2 * (3/7 - (7/14)^2)
    val q = GraphOps.modularity(edges, got.toSeq.toDF("node", "community"))
      .agg(sum("contribution")).first().getDouble(0)
    assert(math.abs(q - 0.357142858) < 1e-9, s"Q = $q")
    // one round moves only the odd half: evens keep their own label
    val one = GraphOps.louvain(edges, rounds = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(one == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 4L, 5L -> 6L, 6L -> 6L),
      s"round-1 gate drifted: $one")
  }

  test("louvainConverged stops at the zero-move sweep and matches fixed rounds") {
    // bridged triangles: hand-traced to converge at round 4 (R4 moves
    // nothing), i.e. sweep 2 of the converged form — and sweep 3 is
    // the zero-move probe hit. Fixpoint equality: louvain(rounds=4)
    // == louvain(rounds=6) == louvainConverged.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val conv =
      try toMap(GraphOps.louvainConverged(edges, maxSweeps = 50))
      finally { Thread.sleep(500); spark.sparkContext.removeSparkListener(listener) }
    assert(conv == toMap(GraphOps.louvain(edges, rounds = 4)),
      s"converged must equal the hand-traced fixpoint: $conv")
    assert(conv == toMap(GraphOps.louvain(edges, rounds = 6)),
      "rounds past the fixpoint must change nothing")
    assert(jobs.get() < 60,
      s"convergence did not stop early: ${jobs.get()} jobs for a 3-sweep run")
    // modularity is non-decreasing sweep to sweep (fixed-round API at
    // the even-round sweep boundaries)
    val qs = Seq(2, 4, 6).map { r =>
      GraphOps.modularity(edges,
          GraphOps.louvain(edges, rounds = r).toDF("node", "community"))
        .agg(sum("contribution")).first().getDouble(0)
    }
    assert(qs == qs.sorted, s"modularity decreased across sweeps: $qs")
  }

  test("louvainConverged on the weighted contracted graph matches fixed rounds") {
    // phase-2 input shape: weighted coarse edges incl. a self-loop row
    val coarse = Seq((2L, 6L, 1L), (2L, 2L, 3L), (6L, 6L, 3L))
      .toDF("src", "dst", "w")
    val conv = GraphOps.louvainConverged(coarse, maxSweeps = 20,
        weightCol = Some("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fixed = GraphOps.louvain(coarse, rounds = 4, weightCol = Some("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(conv == fixed, s"weighted converged $conv vs fixed $fixed")
  }

  test("edgeSupport and kTruss peel a hand graph to the exact truss") {
    // 4-clique minus edge (1,2): triangles {1,3,4} and {2,3,4};
    // supports: (3,4)=2, the other four edges 1; no edge (1,2)
    val nearClique = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val sup = GraphOps.edgeSupport(nearClique).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(sup == Map((1L, 3L) -> 1L, (1L, 4L) -> 1L, (2L, 3L) -> 1L,
      (2L, 4L) -> 1L, (3L, 4L) -> 2L), s"supports: $sup")
    // 3-truss: every edge survives (all in >= 1 triangle)
    assert(GraphOps.kTruss(nearClique, k = 3).count() == 5)
    // 4-truss: round 1 keeps only (3,4), round 2 finds it triangle-less
    // -> EMPTY (the peel is load-bearing: a single-pass support filter
    // would wrongly keep (3,4))
    assert(GraphOps.kTruss(nearClique, k = 4).count() == 0)
    // the full 4-clique IS a 4-truss: all 6 edges at support 2
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val t4 = GraphOps.kTruss(clique, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(t4.length == 6 && t4.forall(_._3 == 2L), s"got ${t4.toSeq}")
    // a pendant edge hanging off the clique drops at k=3
    val pendant = clique.union(Seq((4L, 9L)).toDF("src", "dst"))
    assert(GraphOps.kTruss(pendant, k = 3).count() == 6)
    // converged variant matches fixed rounds past the fixpoint
    val conv = GraphOps.kTrussConverged(nearClique, k = 4, maxRounds = 10)
    assert(conv.count() == 0)
    assert(GraphOps.kTrussConverged(clique, k = 4).count() == 6)
  }

  test("hyperBall matches the exact neighborhood function on a hand path graph") {
    // path 1-2-3-4-5: |ball_h(v)| by hand ->
    // N(0)=5, N(1)=2+3+3+3+2=13, N(2)=3+4+5+4+3=19, N(3)=4+5+5+5+4=23
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val exact = GraphOps.neighborhoodExact(edges, maxH = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(exact == Map(0 -> 5L, 1 -> 13L, 2 -> 19L, 3 -> 23L), s"exact: $exact")
    // at lgK=12 and 5-element balls the HLL sketches are in sparse
    // (exact) mode, so the estimates must equal the exact counts
    val est = GraphOps.hyperBall(edges, maxH = 3, lgK = 12)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(est == exact, s"sparse-mode estimates must be exact: $est vs $exact")
    // dense estimation mode (lgK=4, 16 registers) still lands near
    // the truth on this tiny graph — and stays monotone in h
    val dense = GraphOps.hyperBall(edges, maxH = 3, lgK = 4)
      .orderBy("h").collect().map(_.getLong(1)).toSeq
    assert(dense == dense.sorted, s"N(h) must be non-decreasing: $dense")
    assert(math.abs(dense.last - 23L) <= 6, s"lgK=4 estimate too far: $dense")
  }

  test("hits raises loudly when pull magnitudes cross the 2^52 exactness bound") {
    // star 0 -> {1..100}: hub(0) multiplies by 100 per iteration, so 9
    // iterations reach 1e18 > 2^52 — the guard must fail the action
    // with the documented message instead of returning drifting ranks
    val star = (1L to 100L).map(i => (0L, i)).toDF("src", "dst")
    val ex = intercept[Exception] {
      GraphOps.hits(star, iters = 9).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("2^52")),
      s"expected the magnitude-guard error, got: $ex")
    // the same star within bounds still evaluates (3 iters -> 1e6 pulls)
    assert(GraphOps.hits(star, iters = 3).count() == 101L)
  }

  test("scc peels a hand-built graph: cycles group, one-way bridges do not") {
    // 1→2→3→1 (3-cycle), 5⇄6 (2-cycle), one-way bridges 3→5, 3→4,
    // 7→1. Round 1 assigns only {1,2,3} (5's backward closure still
    // reaches 1 through the bridge, so fmin=5 ≠ bmin=1); round 2,
    // with the bridges peeled away, resolves {5,6} and the
    // singletons — the outer peel is load-bearing, not decoration.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (5L, 6L), (6L, 5L),
      (3L, 5L), (3L, 4L), (7L, 1L)).toDF("src", "dst")
    val got = GraphOps.scc(edges).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      5L -> (5L, 2L), 6L -> (5L, 2L),
      4L -> (4L, 1L), 7L -> (7L, 1L)), s"got $got")
  }

  test("scc fixed schedule sits at the fixture fixpoint; sccConverged matches") {
    // the directed trade graph (delivered: supplier→customer,
    // returned: customer→supplier) — the q72 fixture. The Seq(5, 2)
    // default must be a FIXPOINT (a deeper schedule changes nothing:
    // the fixed schedule is not hiding an unconverged closure), must
    // assign every node, and the action-driven variant must land on
    // the identical assignment.
    val li = graft.Tables(spark, SparkFixture.sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val o = graft.Tables(spark, SparkFixture.sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val de = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        when(col("l_returnflag") =!= "R", col("l_suppkey") * 2)
          .otherwise(col("o_custkey") * 2 + 1).as("src"),
        when(col("l_returnflag") =!= "R", col("o_custkey") * 2 + 1)
          .otherwise(col("l_suppkey") * 2).as("dst"))
      .distinct()
    val base = GraphOps.scc(de).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val deep = GraphOps.scc(de, schedule = Seq(6, 4, 2)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(base == deep, "a deeper schedule must change nothing on the fixture")
    val nNodes = de.select(col("src").as("n"))
      .union(de.select(col("dst").as("n"))).distinct().count()
    assert(base.size == nNodes, s"expected all $nNodes nodes assigned, got ${base.size}")
    val conv = GraphOps.sccConverged(de).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(conv == base, "converged variant must match the fixed schedule")
  }

  test("sccConverged returns an empty frame for an empty edge list") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphOps.sccConverged(empty).count() == 0L)
  }

  test("weighted louvain on a contracted graph: self-loops feed degree, not candidate mass") {
    // two triangles bridged by one edge, level-1 communities = the
    // triangles (the louvain hand-trace). Contract: two super-nodes,
    // self-loop weight 3 each, bridge weight 1. Level-2 hand-trace:
    // deg(A) = 2·3 + 1 = 7 (the explode doubles the self row), 2m = 14;
    // moving A into B scores 14·1 − 7·7 < 0 while staying scores 0 —
    // the communities correctly stay separate (merging two triangles
    // over one bridge lowers modularity).
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val l1 = GraphOps.louvain(edges)
    val coarse = GraphOps.louvainContract(edges, l1)
    val got = coarse.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val selfs = got.collect { case ((a, b), w) if a == b => w }.toSeq
    val crosses = got.collect { case ((a, b), w) if a != b => w }.toSeq
    assert(selfs == Seq(3L, 3L) && crosses == Seq(1L),
      s"contraction must emit two w=3 self-loops + the w=1 bridge, got $got")
    val l2 = GraphOps.louvain(coarse, weightCol = Some("w")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(l2.values.toSet.size == 2 && l2.forall { case (n, c) => n == c },
      s"bridged triangles must stay separate (each super-node keeps itself), got $l2")
  }

  test("louvain phase 2 never lowers modularity on the fixture co-purchase graph") {
    val op = graft.Tables(spark, SparkFixture.sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pe = op.as("a").join(op.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("src", "dst")
      .localCheckpoint(true)
    val l1 = GraphOps.louvain(pe)
    val l2 = GraphOps.louvain(GraphOps.louvainContract(pe, l1),
      weightCol = Some("w"))
    val mapped = l1.select(col("node"), col("community").as("c1"))
      .join(l2.select(col("node").as("c1"), col("community")), "c1")
      .select("node", "community")
    def q(labels: org.apache.spark.sql.DataFrame): Double =
      GraphOps.modularity(pe, labels).agg(sum("contribution"))
        .first().getDouble(0)
    val (q1, q2) = (q(l1), q(mapped))
    assert(q2 >= q1 - 1e-9, s"phase 2 lowered modularity: $q1 -> $q2")
  }

  test("pageRankWarm from a cold prefix IS the cold run's continuation, bit-for-bit") {
    // the exact-continuation contract: warm-starting from cold-3's
    // ranks and running 2 more rounds must equal cold-5 exactly —
    // warm start is resumption, not approximation. And a node ABSENT
    // from the prior starts at the uniform share: warming the 4-node
    // graph with a 1-node prior still ranks every node.
    val edges = GraphOps.undirect(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("src", "dst"))
    val cold3 = GraphOps.pageRank(edges, iters = 3)
    val warm = GraphOps.pageRankWarm(edges, cold3.select(col("node"), col("pr")),
        iters = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val cold5 = GraphOps.pageRank(edges, iters = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(warm == cold5, s"warm continuation $warm != cold-5 $cold5")
    val partial = Seq((1L, 0.9)).toDF("node", "pr")
    val fromPartial = GraphOps.pageRankWarm(edges, partial, iters = 1)
    assert(fromPartial.count() == 4L, "new nodes must enter at the uniform share")
  }

  test("scc under-convergence SPLITS an SCC into sound fragments; sccConverged heals it") {
    // the documented fixed-schedule failure mode, pinned: a 12-node
    // directed cycle with scrambled ids is ONE SCC, but a Seq(1)
    // schedule can't close the min-label walk — the result may
    // fragment the cycle under several representative ids and leave
    // nodes unassigned. The contract is that every fragment is still
    // a SUBSET of the true SCC (memberships sound — distinct SCCs
    // never merge), and the converged variant returns the one true
    // component.
    val ids = Seq(7L, 3L, 11L, 1L, 9L, 5L, 12L, 2L, 10L, 4L, 8L, 6L)
    val edges = ids.zip(ids.tail :+ ids.head).toDF("src", "dst")
    val frag = GraphOps.scc(edges, schedule = Seq(1)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // sound: every assigned component id is itself a cycle member
    // (subset of the true SCC — trivially true here with one SCC),
    // and the split is real: more than one component or not all nodes
    assert(frag.forall { case (n, c) => ids.contains(n) && ids.contains(c) })
    assert(frag.map(_._2).distinct.length > 1 || frag.length < ids.length,
      s"Seq(1) unexpectedly converged: $frag")
    val conv = GraphOps.sccConverged(edges).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    assert(conv.length == 12 && conv.forall(_._2 == (1L, 12L)),
      s"converged variant must return the single true SCC, got ${conv.toSeq}")
  }
}
