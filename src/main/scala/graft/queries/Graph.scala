package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph-analytics battery over the part CO-PURCHASE graph: nodes are
  * parts, an undirected edge connects two parts that appear in the
  * SAME order at least `MinSupport` times. The support threshold is
  * what makes the graph analytically interesting (the raw co-purchase
  * graph is near-complete at every scale — ~116k edges over 2k parts
  * at sf0.01); at support >= 2 the graph fractures into real
  * components with real structure (~3.4k edges, 61 triangles at
  * sf0.01).
  *
  * Edge-build scale shape (shared by all three queries): the
  * within-order self-join is bounded by lines-per-order² — a
  * DATA-MODEL constant (TPC-H ~7 lines/order), so pair volume is
  * corpus-LINEAR, not quadratic; the join keys on l_orderkey so both
  * sides shuffle-partition together, and the `p1 < p2` predicate
  * halves the output and canonicalizes in the same pass. The support
  * filter is a partial-aggregatable groupBy — map-side combine eats
  * the duplicate-pair mass before it crosses the wire.
  *
  * The iterative/propagation queries delegate to [[graft.ops.GraphOps]]
  * / [[graft.ops.CorpusOps.dupClusters]] and inherit their round
  * discipline (AQE-off child session at edge-derived width, lineage
  * cuts between rounds). Every value in this battery is an exact
  * integer — no rounding contract is needed anywhere.
  */
object Graph {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Canonical (p1 < p2) co-purchase edges with support >= 2. */
  private def coEdges(s: SparkSession, dir: String): DataFrame =
    coEdgesW(s, dir).select(col("p1"), col("p2"))

  /** [[coEdges]] keeping the support count as the edge weight. */
  private def coEdgesW(s: SparkSession, dir: String): DataFrame = {
    val op = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")).distinct()
    op.as("a").join(op.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
  }

  /** The weighted edge table as a SQL CTE prefix (`pe(p1, p2, c)`). */
  private val coEdgesWCte =
    """pe AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS c
      |       FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      |       JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |       GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  /** The same edge table as a SQL CTE prefix (`pe(p1, p2)`). */
  private val coEdgesCte =
    """pe AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
      |       FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      |       JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |       GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  // CONNECTED COMPONENTS (q48): which parts form co-purchase
  // "product families"? GraphOps.connectedComponents = dupClusters'
  // min-label propagation + pointer doubling (2 doublings/round,
  // 3 rounds covers diameter 32); component id = the component's
  // minimum part key — deterministic, so the oracle REPLAYS the same
  // three rounds unrolled (relax-and-double via the edge∪pointer
  // union join, then the pointer-jump self-join) and matches
  // exactly even where a component's true diameter exceeds the cover.
  private val q48 = QueryDef(
    "q48_components",
    (s, dir) => {
      val comp = graft.ops.GraphOps.connectedComponents(
        coEdges(s, dir).toDF("src", "dst"))
      comp.select(col("node").as("part"), col("component"),
          col("component_size"))
        .orderBy("component", "part")
    },
    Some(s"""WITH $coEdgesCte,
            |e AS (SELECT p1 AS a, p2 AS b FROM pe
            |      UNION ALL SELECT p2, p1 FROM pe),
            |l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM e),
            |r1a AS (SELECT t.a AS node, min(lt.lbl) AS lbl
            |        FROM (SELECT a, b FROM e
            |              UNION ALL SELECT node, lbl FROM l0) t
            |        JOIN l0 lt ON t.b = lt.node GROUP BY t.a),
            |r1 AS (SELECT x.node, y.lbl FROM r1a x JOIN r1a y ON x.lbl = y.node),
            |r2a AS (SELECT t.a AS node, min(lt.lbl) AS lbl
            |        FROM (SELECT a, b FROM e
            |              UNION ALL SELECT node, lbl FROM r1) t
            |        JOIN r1 lt ON t.b = lt.node GROUP BY t.a),
            |r2 AS (SELECT x.node, y.lbl FROM r2a x JOIN r2a y ON x.lbl = y.node),
            |r3a AS (SELECT t.a AS node, min(lt.lbl) AS lbl
            |        FROM (SELECT a, b FROM e
            |              UNION ALL SELECT node, lbl FROM r2) t
            |        JOIN r2 lt ON t.b = lt.node GROUP BY t.a),
            |r3 AS (SELECT x.node, y.lbl FROM r3a x JOIN r3a y ON x.lbl = y.node)
            |SELECT node AS part, lbl AS component,
            |       count(*) OVER (PARTITION BY lbl) AS component_size
            |FROM r3 ORDER BY component, part""".stripMargin))

  // MULTI-SOURCE BFS (q49): hop distance from the 10 smallest part
  // keys in the graph to everything reachable within 4 hops —
  // GraphOps.hopDistance's monotone min-merge rounds over the
  // undirected (both-directions) edge list. The oracle unrolls the
  // same 4 rounds; the merge is spelled coalesce(least(d, nd), d, nd)
  // in BOTH engines, which is null-correct under either least()
  // semantic. Unreached parts are absent on both sides.
  private val q49 = QueryDef(
    "q49_bfs",
    (s, dir) => {
      // seeds derive from the SAME pipeline as the edges — lineage-cut
      // the pair build once so the seed checkpoint seam inside the
      // rounds reads this leaf instead of re-running the whole
      // co-purchase build (the q46 seed-seam lesson, +3 s at sf0.1)
      val pe = graft.ops.CacheScope.sessionOwned
        .checkpointed(coEdges(s, dir), reliable = false)
      val edges = pe.union(pe.select(col("p2").as("p1"), col("p1").as("p2")))
        .toDF("src", "dst")
      val seeds = edges.select(col("src").as("node"))
        .distinct().orderBy("node").limit(10)
      val d = graft.ops.GraphOps.hopDistance(edges, seeds, maxHops = 4)
      d.select(col("node").as("part"), col("dist")).orderBy("dist", "part")
    },
    Some(s"""WITH $coEdgesCte,
            |e AS (SELECT p1 AS src, p2 AS dst FROM pe
            |      UNION ALL SELECT p2, p1 FROM pe),
            |d0 AS (SELECT node, 0 AS dist FROM
            |       (SELECT DISTINCT src AS node FROM e ORDER BY node LIMIT 10)),
            |n1 AS (SELECT e.dst AS node, min(d.dist) + 1 AS nd
            |       FROM e JOIN d0 d ON e.src = d.node GROUP BY e.dst),
            |d1 AS (SELECT coalesce(d.node, n.node) AS node,
            |              coalesce(least(d.dist, n.nd), d.dist, n.nd) AS dist
            |       FROM d0 d FULL JOIN n1 n ON d.node = n.node),
            |n2 AS (SELECT e.dst AS node, min(d.dist) + 1 AS nd
            |       FROM e JOIN d1 d ON e.src = d.node GROUP BY e.dst),
            |d2 AS (SELECT coalesce(d.node, n.node) AS node,
            |              coalesce(least(d.dist, n.nd), d.dist, n.nd) AS dist
            |       FROM d1 d FULL JOIN n2 n ON d.node = n.node),
            |n3 AS (SELECT e.dst AS node, min(d.dist) + 1 AS nd
            |       FROM e JOIN d2 d ON e.src = d.node GROUP BY e.dst),
            |d3 AS (SELECT coalesce(d.node, n.node) AS node,
            |              coalesce(least(d.dist, n.nd), d.dist, n.nd) AS dist
            |       FROM d2 d FULL JOIN n3 n ON d.node = n.node),
            |n4 AS (SELECT e.dst AS node, min(d.dist) + 1 AS nd
            |       FROM e JOIN d3 d ON e.src = d.node GROUP BY e.dst),
            |d4 AS (SELECT coalesce(d.node, n.node) AS node,
            |              coalesce(least(d.dist, n.nd), d.dist, n.nd) AS dist
            |       FROM d3 d FULL JOIN n4 n ON d.node = n.node)
            |SELECT node AS part, dist FROM d4 ORDER BY dist, part""".stripMargin))

  // TRIANGLE COUNTS (q50): per-part triangle participation —
  // GraphOps.triangles' degree-oriented enumeration (acyclic
  // orientation, out-degree O(√E), wedge join bounded by E^1.5). The
  // oracle enumerates the SAME triangle set with the id-order a<b<c
  // join — the canonical-form edges make that a three-way self-join —
  // and explodes the three corners identically.
  private val q50 = QueryDef(
    "q50_triangles",
    (s, dir) => {
      val tri = graft.ops.GraphOps.triangles(
        coEdges(s, dir).toDF("src", "dst"))
      tri.select(col("node").as("part"), col("triangles")).orderBy("part")
    },
    Some(s"""WITH $coEdgesCte,
            |tri AS (SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
            |        FROM pe e1
            |        JOIN pe e2 ON e1.p2 = e2.p1
            |        JOIN pe e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
            |corners AS (SELECT a AS node FROM tri
            |            UNION ALL SELECT b FROM tri
            |            UNION ALL SELECT c FROM tri)
            |SELECT node AS part, count(*) AS triangles
            |FROM corners GROUP BY node ORDER BY part""".stripMargin))

  // WEIGHTED SHORTEST PATHS (q56): Bellman-Ford relaxation rounds with
  // the co-purchase SUPPORT as the edge cost — min total support from
  // the seed parts within 4 relaxations (GraphOps.shortestPaths; the
  // anytime bounded-exploration semantics). Same monotone-merge
  // spelling as q49, step = dist + w instead of dist + 1; exact longs.
  // The oracle MATERIALIZEs each round's distance table — each is
  // referenced twice (relax join + merge), and inlined CTEs would
  // re-expand the whole prefix exponentially.
  private val q56 = QueryDef(
    "q56_sssp",
    (s, dir) => {
      // same seed-seam discipline as q49: one lineage cut feeds both
      // the weighted edge table and the seed set
      val pe = graft.ops.CacheScope.sessionOwned
        .checkpointed(coEdgesW(s, dir), reliable = false)
      val edges = pe.union(
        pe.select(col("p2").as("p1"), col("p1").as("p2"), col("c")))
        .toDF("src", "dst", "w")
      val seeds = edges.select(col("src").as("node"))
        .distinct().orderBy("node").limit(10)
      val d = graft.ops.GraphOps.shortestPaths(edges, seeds, "w", rounds = 4)
      d.select(col("node").as("part"), col("dist")).orderBy("dist", "part")
    },
    Some(s"""WITH $coEdgesWCte,
            |e AS (SELECT p1 AS src, p2 AS dst, c AS w FROM pe
            |      UNION ALL SELECT p2, p1, c FROM pe),
            |d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM
            |       (SELECT DISTINCT src AS node FROM e ORDER BY node LIMIT 10)),
            |n1 AS (SELECT e.dst AS node, min(d.dist + e.w) AS nd
            |       FROM e JOIN d0 d ON e.src = d.node GROUP BY e.dst),
            |d1 AS MATERIALIZED (SELECT coalesce(d.node, n.node) AS node,
            |              coalesce(least(d.dist, n.nd), d.dist, n.nd) AS dist
            |       FROM d0 d FULL JOIN n1 n ON d.node = n.node),
            |n2 AS (SELECT e.dst AS node, min(d.dist + e.w) AS nd
            |       FROM e JOIN d1 d ON e.src = d.node GROUP BY e.dst),
            |d2 AS MATERIALIZED (SELECT coalesce(d.node, n.node) AS node,
            |              coalesce(least(d.dist, n.nd), d.dist, n.nd) AS dist
            |       FROM d1 d FULL JOIN n2 n ON d.node = n.node),
            |n3 AS (SELECT e.dst AS node, min(d.dist + e.w) AS nd
            |       FROM e JOIN d2 d ON e.src = d.node GROUP BY e.dst),
            |d3 AS MATERIALIZED (SELECT coalesce(d.node, n.node) AS node,
            |              coalesce(least(d.dist, n.nd), d.dist, n.nd) AS dist
            |       FROM d2 d FULL JOIN n3 n ON d.node = n.node),
            |n4 AS (SELECT e.dst AS node, min(d.dist + e.w) AS nd
            |       FROM e JOIN d3 d ON e.src = d.node GROUP BY e.dst),
            |d4 AS (SELECT coalesce(d.node, n.node) AS node,
            |              coalesce(least(d.dist, n.nd), d.dist, n.nd) AS dist
            |       FROM d3 d FULL JOIN n4 n ON d.node = n.node)
            |SELECT node AS part, dist FROM d4 ORDER BY dist, part""".stripMargin))

  // K-CORE (q57): the 3-core of the co-purchase graph by 4 fixed peel
  // rounds (GraphOps.kCore) — drop degree-<3 nodes, recompute degrees
  // over the survivors, repeat; the fixpoint is the true 3-core and
  // fixed rounds make it replayable. Output = surviving (node, deg).
  // Every peel's degree table and edge filter replays identically in
  // the oracle (MATERIALIZED for the same exponential-inline reason).
  private val q57 = QueryDef(
    "q57_kcore",
    (s, dir) => {
      val core = graft.ops.GraphOps.kCore(
        coEdges(s, dir).toDF("src", "dst"), k = 3)
      core.select(col("node").as("part"), col("deg")).orderBy("part")
    },
    Some(s"""WITH $coEdgesCte,
            |e0 AS MATERIALIZED (SELECT p1 AS src, p2 AS dst FROM pe),
            |d1 AS MATERIALIZED (SELECT node, count(*) AS deg FROM
            |  (SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0) GROUP BY node),
            |e1 AS MATERIALIZED (SELECT src, dst FROM e0
            |  WHERE src IN (SELECT node FROM d1 WHERE deg >= 3)
            |    AND dst IN (SELECT node FROM d1 WHERE deg >= 3)),
            |d2 AS MATERIALIZED (SELECT node, count(*) AS deg FROM
            |  (SELECT src AS node FROM e1 UNION ALL SELECT dst FROM e1) GROUP BY node),
            |e2 AS MATERIALIZED (SELECT src, dst FROM e1
            |  WHERE src IN (SELECT node FROM d2 WHERE deg >= 3)
            |    AND dst IN (SELECT node FROM d2 WHERE deg >= 3)),
            |d3 AS MATERIALIZED (SELECT node, count(*) AS deg FROM
            |  (SELECT src AS node FROM e2 UNION ALL SELECT dst FROM e2) GROUP BY node),
            |e3 AS MATERIALIZED (SELECT src, dst FROM e2
            |  WHERE src IN (SELECT node FROM d3 WHERE deg >= 3)
            |    AND dst IN (SELECT node FROM d3 WHERE deg >= 3)),
            |d4 AS MATERIALIZED (SELECT node, count(*) AS deg FROM
            |  (SELECT src AS node FROM e3 UNION ALL SELECT dst FROM e3) GROUP BY node),
            |e4 AS MATERIALIZED (SELECT src, dst FROM e3
            |  WHERE src IN (SELECT node FROM d4 WHERE deg >= 3)
            |    AND dst IN (SELECT node FROM d4 WHERE deg >= 3)),
            |fd AS (SELECT node, count(*) AS deg FROM
            |  (SELECT src AS node FROM e4 UNION ALL SELECT dst FROM e4) GROUP BY node)
            |SELECT node AS part, deg FROM fd WHERE deg >= 3 ORDER BY part""".stripMargin))

  // LABEL-PROPAGATION COMMUNITIES (q64): synchronous LPA over the
  // co-purchase graph — nodes adopt their neighbors' most frequent
  // label, ties toward the smaller label (GraphOps.labelPropagation).
  // FINER than q48's components: bridges between dense regions don't
  // merge labels. The engine's max_by((c, -lbl)) argmax and the
  // oracle's row_number() OVER (ORDER BY c DESC, lbl) pick the same
  // row per node (the key is unique), so three unrolled rounds match
  // exactly — all integers.
  private val q64 = QueryDef(
    "q64_lpa",
    (s, dir) => {
      // same lineage-cut discipline as q49/q56: the pair build is
      // referenced by both union branches — cut it once
      val pe = graft.ops.CacheScope.sessionOwned
        .checkpointed(coEdges(s, dir), reliable = false)
      val edges = pe.union(pe.select(col("p2").as("p1"), col("p1").as("p2")))
        .toDF("src", "dst")
      val com = graft.ops.GraphOps.labelPropagation(edges)
      com.select(col("node").as("part"), col("community"))
        .withColumn("community_size",
          count(lit(1)).over(Window.partitionBy(col("community"))))
        .orderBy("community", "part")
    },
    Some(s"""WITH $coEdgesCte,
            |e AS (SELECT p1 AS src, p2 AS dst FROM pe
            |      UNION ALL SELECT p2, p1 FROM pe),
            |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
            |c1 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
            |       FROM e JOIN l0 l ON e.src = l.node GROUP BY 1, 2),
            |l1 AS MATERIALIZED (SELECT node, lbl FROM (
            |  SELECT node, lbl, row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
            |  FROM c1) WHERE rn = 1),
            |c2 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
            |       FROM e JOIN l1 l ON e.src = l.node GROUP BY 1, 2),
            |l2 AS MATERIALIZED (SELECT node, lbl FROM (
            |  SELECT node, lbl, row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
            |  FROM c2) WHERE rn = 1),
            |c3 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
            |       FROM e JOIN l2 l ON e.src = l.node GROUP BY 1, 2),
            |l3 AS (SELECT node, lbl FROM (
            |  SELECT node, lbl, row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
            |  FROM c3) WHERE rn = 1)
            |SELECT node AS part, lbl AS community,
            |       count(*) OVER (PARTITION BY lbl) AS community_size
            |FROM l3 ORDER BY community, part""".stripMargin))

  // ADAMIC-ADAR link prediction (q66): which co-purchase edges are
  // "missing"? Non-adjacent part pairs scored by Σ 1/ln(deg) over
  // shared neighbors (GraphOps.adamicAdar). Hub centers are excluded
  // from wedge generation above a SCALE-DERIVED cap — max(64, the
  // smallest power of two whose square is >= 2E), ~√(2E), bounding
  // wedge volume at (2E)^1.5 at any graph size; the derivation is
  // integer-only and the oracle re-derives the identical cap from
  // count(*) (the l2_simhash adaptive-parameter pattern). Scores are
  // sums of per-center doubles whose shuffle-order drift (~1e-13)
  // dies at round(6); ranking ties break on (a, b). Top-50 predicted
  // links.
  private val q66 = QueryDef(
    "q66_adamic_adar",
    (s, dir) => {
      val aa = graft.ops.GraphOps.adamicAdar(coEdges(s, dir).toDF("src", "dst"))
      aa.select(col("a"), col("b"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), asc("a"), asc("b")).limit(50)
        .withColumn("rnk", row_number().over(
          Window.orderBy(desc("score"), asc("a"), asc("b"))))
        .select(col("rnk"), col("a"), col("b"), col("score"))
        .orderBy("rnk")
    },
    Some(s"""WITH $coEdgesCte,
            |prm AS (SELECT GREATEST(64, (SELECT MIN(1::BIGINT << b)
            |        FROM (SELECT unnest(range(0, 32)) AS b)
            |        WHERE (1::BIGINT << b) * (1::BIGINT << b) >=
            |              2 * (SELECT count(*) FROM pe))) AS cap),
            |e2 AS (SELECT p1 AS src, p2 AS dst FROM pe
            |       UNION ALL SELECT p2, p1 FROM pe),
            |deg AS (SELECT src AS z, count(*) AS deg FROM e2 GROUP BY src),
            |zw AS (SELECT e2.src AS z2, e2.dst AS n,
            |              1.0 / ln(CAST(deg.deg AS DOUBLE)) AS w
            |       FROM e2 JOIN deg ON e2.src = deg.z
            |       WHERE deg.deg >= 2 AND deg.deg <= (SELECT cap FROM prm)),
            |pairs AS (SELECT l.n AS a, r.n AS b, l.w
            |          FROM zw l JOIN zw r ON l.z2 = r.z2 AND l.n < r.n),
            |scored AS (SELECT a, b, SUM(w) AS score FROM pairs GROUP BY a, b),
            |nonadj AS (SELECT s.a, s.b, s.score FROM scored s
            |           LEFT JOIN pe ON s.a = pe.p1 AND s.b = pe.p2
            |           WHERE pe.p1 IS NULL),
            |top AS (SELECT a, b, round(score, 6) AS score FROM nonadj
            |        ORDER BY score DESC, a, b LIMIT 50)
            |SELECT row_number() OVER (ORDER BY score DESC, a, b) AS rnk, a, b, score
            |FROM top ORDER BY rnk""".stripMargin))

  // MODULARITY (q69): grade q64's LPA communities with the standard
  // "are these communities real" score — per community c, with
  // m = |canonical edges|, e_c intra-community edges, d_c the degree
  // sum, contribution = e_c/m − (d_c/2m)², Q = Σ contributions
  // (Newman-Girvan; GraphOps.modularity). The contribution is ONE
  // division of exact integer terms, (4·m·e_c − d_c²)/(4m²), rounded
  // to 9 — both engines divide the identical longs, so the round is
  // pure belt-and-suspenders. The oracle replays q64's three LPA
  // rounds then the same integer aggregates.
  private val q69 = QueryDef(
    "q69_modularity",
    (s, dir) => {
      val pe = graft.ops.CacheScope.sessionOwned
        .checkpointed(coEdges(s, dir), reliable = false)
      val edges = pe.union(pe.select(col("p2").as("p1"), col("p1").as("p2")))
        .toDF("src", "dst")
      val com = graft.ops.GraphOps.labelPropagation(edges)
      graft.ops.GraphOps.modularity(pe.toDF("src", "dst"), com)
        .orderBy("community")
    },
    Some(s"""WITH $coEdgesCte,
            |e AS (SELECT p1 AS src, p2 AS dst FROM pe
            |      UNION ALL SELECT p2, p1 FROM pe),
            |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
            |c1 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
            |       FROM e JOIN l0 l ON e.src = l.node GROUP BY 1, 2),
            |l1 AS MATERIALIZED (SELECT node, lbl FROM (
            |  SELECT node, lbl, row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
            |  FROM c1) WHERE rn = 1),
            |c2 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
            |       FROM e JOIN l1 l ON e.src = l.node GROUP BY 1, 2),
            |l2 AS MATERIALIZED (SELECT node, lbl FROM (
            |  SELECT node, lbl, row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
            |  FROM c2) WHERE rn = 1),
            |c3 AS (SELECT e.dst AS node, l.lbl, count(*) AS c
            |       FROM e JOIN l2 l ON e.src = l.node GROUP BY 1, 2),
            |l3 AS MATERIALIZED (SELECT node, lbl FROM (
            |  SELECT node, lbl, row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
            |  FROM c3) WHERE rn = 1),
            |cm AS (SELECT node, lbl AS community FROM l3),
            |mm AS (SELECT count(*) AS m FROM pe),
            |lab AS (SELECT x.community AS ca, y.community AS cb
            |        FROM pe JOIN cm x ON pe.p1 = x.node JOIN cm y ON pe.p2 = y.node),
            |degsum AS (SELECT community, count(*) AS deg_sum FROM
            |           (SELECT ca AS community FROM lab
            |            UNION ALL SELECT cb FROM lab) GROUP BY community),
            |ein AS (SELECT ca AS community, count(*) AS e_in FROM lab
            |        WHERE ca = cb GROUP BY ca),
            |nn AS (SELECT community, count(*) AS n_nodes FROM cm GROUP BY community)
            |SELECT nn.community, nn.n_nodes,
            |       coalesce(degsum.deg_sum, 0) AS deg_sum,
            |       coalesce(ein.e_in, 0) AS e_in,
            |       round(CAST(4 * (SELECT m FROM mm) * coalesce(ein.e_in, 0)
            |                  - coalesce(degsum.deg_sum, 0) * coalesce(degsum.deg_sum, 0) AS DOUBLE)
            |             / CAST(4 * (SELECT m FROM mm) * (SELECT m FROM mm) AS DOUBLE), 9) AS contribution
            |FROM nn LEFT JOIN degsum USING (community) LEFT JOIN ein USING (community)
            |ORDER BY community""".stripMargin))

  // LOUVAIN communities (q70): modularity-OPTIMIZING local moves over
  // the co-purchase graph (GraphOps.louvain) — the step past q64's
  // LPA (frequency-following) and q69's scoring: nodes greedily move
  // to the neighbor community with the highest modularity gain,
  // semi-synchronously (odd ids move on odd rounds, evens on even —
  // the red/black gate that kills the synchronous label chase). The
  // gain argmax ranks by the exact integer score
  // 2m·k_{i,c} − deg_i·Σtot(c∖{i}), ties to the smaller community id,
  // so the oracle's four unrolled rounds (row_number over score DESC,
  // c ASC) land on identical labels — no rounding contract anywhere.
  private val q70 = QueryDef(
    "q70_louvain",
    (s, dir) => {
      val com = graft.ops.GraphOps.louvain(coEdges(s, dir).toDF("src", "dst"))
      com.select(col("node").as("part"), col("community"))
        .withColumn("community_size",
          count(lit(1)).over(Window.partitionBy(col("community"))))
        .orderBy("community", "part")
    },
    Some {
      val roundCtes = (1 to 4).map { r =>
        val p = r - 1
        s"""tot$r AS (SELECT l.c, sum(d.deg) AS tot
           |        FROM l$p l JOIN deg d ON d.node = l.node GROUP BY l.c),
           |kic$r AS (SELECT e.src AS node, l.c, count(*) AS k
           |        FROM e2 e JOIN l$p l ON e.dst = l.node
           |        WHERE e.src % 2 = ${r % 2} GROUP BY 1, 2),
           |cand$r AS (SELECT node, c, k FROM kic$r
           |        UNION ALL SELECT node, c, 0 FROM l$p WHERE node % 2 = ${r % 2}),
           |sc$r AS (SELECT cd.node, cd.c,
           |        (SELECT m2 FROM m2t) * cd.k - d.deg *
           |        (t.tot - CASE WHEN cd.c = l.c THEN d.deg ELSE 0 END) AS score
           |        FROM cand$r cd JOIN l$p l ON l.node = cd.node
           |        JOIN deg d ON d.node = cd.node JOIN tot$r t ON t.c = cd.c),
           |b$r AS (SELECT node, c FROM (SELECT node, c,
           |        row_number() OVER (PARTITION BY node ORDER BY score DESC, c) AS rn
           |        FROM sc$r) WHERE rn = 1),
           |l$r AS MATERIALIZED (SELECT l.node, coalesce(b.c, l.c) AS c
           |        FROM l$p l LEFT JOIN b$r b ON b.node = l.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH $coEdgesCte,
         |e2 AS (SELECT p1 AS src, p2 AS dst FROM pe
         |       UNION ALL SELECT p2, p1 FROM pe),
         |deg AS (SELECT src AS node, count(*) AS deg FROM e2 GROUP BY src),
         |m2t AS (SELECT sum(deg) AS m2 FROM deg),
         |l0 AS (SELECT node, node AS c FROM deg),
         |$roundCtes
         |SELECT node AS part, c AS community,
         |       count(*) OVER (PARTITION BY c) AS community_size
         |FROM l4 ORDER BY community, part""".stripMargin
    })

  // STRONGLY CONNECTED COMPONENTS (q72): over the DIRECTED trade
  // graph — supplier → customer for delivered lineitems, customer →
  // supplier for returns (l_returnflag = 'R'), nodes coded s*2 /
  // c*2+1 like q65 — which suppliers and customers sit in mutual
  // sale/return cycles? GraphOps.scc's min-label coloring peel at the
  // fixed Seq(5, 2) schedule; the oracle REPLAYS the exact schedule
  // (generated CTEs: per outer round the live-restricted edge table —
  // outer 1 runs on the full table, live = every node — then per
  // inner round ONE CTE holding the min-label pull-merge AND the
  // stale pointer jump against the round's input labels,
  // forward+backward in one direction-tagged pass, then
  // the fmin=bmin assignment and the live anti join). All values
  // exact integers. GraphOpsSpec pins the fixture fully assigned AND
  // at its fixpoint (a deeper schedule changes nothing), so the
  // fixed schedule is not hiding an unconverged closure.
  /** The directed trade graph (delivered: supplier→customer, returned:
    * customer→supplier) — shared by q72 and q99. */
  private def tradeGraph(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        when(col("l_returnflag") =!= "R", col("l_suppkey") * 2)
          .otherwise(col("o_custkey") * 2 + 1).as("src"),
        when(col("l_returnflag") =!= "R", col("o_custkey") * 2 + 1)
          .otherwise(col("l_suppkey") * 2).as("dst"))
      .distinct()

  private val q72 = QueryDef(
    "q72_scc",
    (s, dir) => {
      graft.ops.GraphOps.scc(tradeGraph(s, dir))
        .orderBy("component", "node")
    },
    Some {
      s"""WITH ${sccOracleCtes(sccOracleRounds(Seq(5, 2)))}
         |SELECT a.node, a.component, s.component_size
         |FROM allf a JOIN (SELECT component, count(*) AS component_size
         |                  FROM allf GROUP BY 1) s USING (component)
         |ORDER BY component, node""".stripMargin
    })

  /** The generated min-label closure rounds of the q72 oracle, one
    * outer CTE group per schedule entry. Shared by q72 and q99. */
  private def sccOracleRounds(schedule: Seq[Int]): String =
    schedule.zipWithIndex.map { case (inner, idx) =>
      val o = idx + 1
      val p = o - 1
      val pulls = (1 to inner).map { i =>
        s"""l${o}_$i AS MATERIALIZED (
           |  SELECT m.node, m.dir, coalesce(least(m.lab1, j.lab), m.lab1) AS lab
           |  FROM (SELECT l.node, l.dir,
           |               coalesce(least(l.lab, p.nl), l.lab) AS lab1
           |        FROM l${o}_${i - 1} l LEFT JOIN (
           |          SELECT el.src AS node, el.dir, min(l2.lab) AS nl
           |          FROM el$o el JOIN l${o}_${i - 1} l2
           |            ON el.dst = l2.node AND el.dir = l2.dir
           |          GROUP BY 1, 2) p
           |          ON l.node = p.node AND l.dir = p.dir) m
           |  LEFT JOIN l${o}_${i - 1} j
           |    ON m.lab1 = j.node AND m.dir = j.dir)""".stripMargin
      }.mkString(",\n")
      val elCte =
        if (o == 1) s"el$o AS (SELECT src, dst, dir FROM e2)"
        else
          s"""el$o AS MATERIALIZED (
             |  SELECT e2.src, e2.dst, e2.dir FROM e2
             |  JOIN live$p ls ON e2.src = ls.node
             |  JOIN live$p ld ON e2.dst = ld.node)""".stripMargin
      s"""$elCte,
         |l${o}_0 AS (SELECT node, dir, node AS lab FROM live$p
         |            CROSS JOIN (SELECT 'f' AS dir UNION ALL SELECT 'b')),
         |$pulls,
         |found$o AS MATERIALIZED (
         |  SELECT node, fmin AS component FROM (
         |    SELECT node, min(CASE WHEN dir = 'f' THEN lab END) AS fmin,
         |                 min(CASE WHEN dir = 'b' THEN lab END) AS bmin
         |    FROM l${o}_$inner GROUP BY node) WHERE fmin = bmin),
         |live$o AS MATERIALIZED (
         |  SELECT l.node FROM live$p l LEFT JOIN found$o f ON l.node = f.node
         |  WHERE f.node IS NULL)""".stripMargin
    }.mkString(",\n")

  /** The q72 oracle's CTE prefix — `de` (trade edges), the tagged
    * closure rounds (caller passes the generated outer CTEs), ending
    * in `allf(node, component)`. Shared by q72 and q99. */
  private def sccOracleCtes(outerCtes: String): String =
    s"""de AS (
       |  SELECT DISTINCT
       |    CASE WHEN l_returnflag <> 'R' THEN l_suppkey * 2
       |         ELSE o_custkey * 2 + 1 END AS src,
       |    CASE WHEN l_returnflag <> 'R' THEN o_custkey * 2 + 1
       |         ELSE l_suppkey * 2 END AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e2 AS (SELECT src, dst, 'f' AS dir FROM de
       |       UNION ALL SELECT dst, src, 'b' FROM de),
       |live0 AS (SELECT DISTINCT node FROM
       |          (SELECT src AS node FROM de UNION ALL SELECT dst FROM de)),
       |$outerCtes,
       |allf AS (SELECT * FROM found1 UNION ALL SELECT * FROM found2)""".stripMargin

  // DETERMINISTIC RANDOM WALKS (q73): the DeepWalk/node2vec corpus
  // prep — one walk per node, 3 steps, each step choosing the
  // neighbor whose rank (row_number over neighbor id, per source)
  // equals sha60(walk ‖ ':' ‖ step) mod degree. The "randomness" is
  // the portable 60-bit hash both engines compute identically, so
  // the whole walk corpus is exactly replayable — the property a
  // training pipeline needs for reproducible embedding runs.
  // Scale shape: NO edge-sized intermediates — each step is a
  // walk-sized join onto the degree table (compute the rank) and a
  // (src, rnk)-keyed equi-join onto the ranked adjacency (one row
  // per walk); the adjacency ranking is one per-source window pass,
  // built once. L fixed ⇒ L·2 walk-sized joins total.
  private val q73 = QueryDef(
    "q73_random_walks",
    (s, dir) => {
      import graft.queries.QueryDef.sha60
      // lineage-cut the pair build once (the q49 seam), then CACHE the
      // ranked adjacency and degree tables — each of the 3 steps joins
      // both, and replaying the window per step would re-rank the
      // whole edge table L times
      val pe = graft.ops.CacheScope.sessionOwned
        .checkpointed(coEdges(s, dir), reliable = false)
      val e2 = pe.select(col("p1").as("src"), col("p2").as("dst"))
        .union(pe.select(col("p2").as("src"), col("p1").as("dst")))
      val scope = graft.ops.CacheScope.sessionOwned
      val adj = scope.cached(e2.withColumn("rnk",
        row_number().over(Window.partitionBy("src").orderBy("dst")) - 1))
      val deg = scope.cached(
        e2.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
      var pos = deg.select(col("node").as("walk"), col("node").as("cur"))
      val steps = scala.collection.mutable.ArrayBuffer(
        pos.select(col("walk"), lit(0).as("step"), col("cur").as("node")))
      for (st <- 1 to 3) {
        // each step's position table feeds BOTH the next step's chain
        // and its own output branch of the final union — cache it so
        // the union does not re-execute every prefix step per branch
        // (L·2 walk-sized joins total, not ~L²)
        pos = scope.cached(pos
          .join(deg, col("cur") === col("node"))
          .select(col("walk"), col("cur").as("src"),
            (sha60(concat(col("walk").cast("string"), lit(s":$st")))
              % col("deg")).as("rnk"))
          .join(adj, Seq("src", "rnk"))
          .select(col("walk"), col("dst").as("cur")))
        steps += pos.select(col("walk"), lit(st).as("step"), col("cur").as("node"))
      }
      steps.reduce(_.unionByName(_)).orderBy("walk", "step")
    },
    Some {
      val stepCtes = (1 to 3).map { st =>
        val p = if (st == 1) "w0" else s"s${st - 1}"
        s"""s$st AS (SELECT w.walk, a.dst AS cur
           |  FROM $p w
           |  JOIN deg d ON d.node = w.cur
           |  JOIN adj a ON a.src = w.cur AND a.rnk =
           |    CAST(concat('0x', substr(sha256(CAST(w.walk AS VARCHAR) || ':$st'), 1, 15))
           |         AS BIGINT) % d.deg)""".stripMargin
      }.mkString(",\n")
      val stepSelects = (1 to 3).map { st =>
        s"UNION ALL SELECT walk, $st AS step, cur AS node FROM s$st"
      }.mkString("\n")
      s"""WITH $coEdgesCte,
         |e2 AS (SELECT p1 AS src, p2 AS dst FROM pe
         |       UNION ALL SELECT p2, p1 FROM pe),
         |adj AS (SELECT src, dst,
         |        row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rnk
         |        FROM e2),
         |deg AS (SELECT src AS node, count(*) AS deg FROM e2 GROUP BY 1),
         |w0 AS (SELECT node AS walk, node AS cur FROM deg),
         |$stepCtes
         |SELECT walk, 0 AS step, cur AS node FROM w0
         |$stepSelects
         |ORDER BY walk, step""".stripMargin
    })

  // MULTI-LEVEL LOUVAIN (q77): the full two-phase algorithm — after
  // q70's local moves, every community CONTRACTS to a super-node
  // (GraphOps.louvainContract: inter-community weights + ONE
  // self-loop row per community carrying the intra weight, so coarse
  // modularity equals fine modularity) and the SAME local-move
  // machinery reruns WEIGHTED on the coarse graph; the final label of
  // a part is its level-2 community reached through its level-1
  // community. All weights are exact integer counts, so the gain
  // argmax stays integer-exact at both levels and the oracle replays
  // both levels' rounds as generated CTEs (weighted sums CAST to
  // BIGINT — DuckDB's SUM(BIGINT) is HUGEINT). Self-loop candidate
  // mass is excluded at level 2 (src <> dst in the kic build) in BOTH
  // engines — the standard phase-2 treatment.
  private val q77 = QueryDef(
    "q77_louvain_l2",
    (s, dir) => {
      val pe = graft.ops.CacheScope.sessionOwned
        .checkpointed(coEdges(s, dir).toDF("src", "dst"), reliable = false)
      val l1 = graft.ops.GraphOps.louvain(pe)
      val coarse = graft.ops.GraphOps.louvainContract(pe, l1)
      val l2 = graft.ops.GraphOps.louvain(coarse, weightCol = Some("w"))
      l1.select(col("node").as("part"), col("community").as("c1"))
        .join(l2.select(col("node").as("c1"), col("community")), "c1")
        .select(col("part"), col("community"))
        .withColumn("community_size",
          count(lit(1)).over(Window.partitionBy(col("community"))))
        .orderBy("community", "part")
    },
    Some {
      def levelRounds(lp: String, e2: String, deg: String, m2t: String,
                      kExpr: String, selfFilter: String): String =
        (1 to 4).map { r =>
          val p = s"$lp${r - 1}"
          s"""tot$lp$r AS (SELECT c, CAST(sum(deg) AS BIGINT) AS tot FROM $p GROUP BY c),
             |kic$lp$r AS (SELECT e.src AS node, l.c, $kExpr AS k
             |        FROM $e2 e JOIN $p l ON e.dst = l.node
             |        WHERE e.src % 2 = ${r % 2}$selfFilter GROUP BY 1, 2),
             |cand$lp$r AS (SELECT node, c, k FROM kic$lp$r
             |        UNION ALL SELECT node, c, 0 FROM $p WHERE node % 2 = ${r % 2}),
             |sc$lp$r AS (SELECT cd.node, cd.c,
             |        (SELECT m2 FROM $m2t) * cd.k - d.deg *
             |        (t.tot - CASE WHEN cd.c = l.c THEN d.deg ELSE 0 END) AS score
             |        FROM cand$lp$r cd JOIN $p l ON l.node = cd.node
             |        JOIN $deg d ON d.node = cd.node JOIN tot$lp$r t ON t.c = cd.c),
             |b$lp$r AS (SELECT node, c FROM (SELECT node, c,
             |        row_number() OVER (PARTITION BY node ORDER BY score DESC, c) AS rn
             |        FROM sc$lp$r) WHERE rn = 1),
             |$lp$r AS MATERIALIZED (SELECT l.node, l.deg, coalesce(b.c, l.c) AS c
             |        FROM $p l LEFT JOIN b$lp$r b ON b.node = l.node)""".stripMargin
        }.mkString(",\n")
      s"""WITH $coEdgesCte,
         |e2 AS (SELECT p1 AS src, p2 AS dst FROM pe
         |       UNION ALL SELECT p2, p1 FROM pe),
         |deg AS (SELECT src AS node, count(*) AS deg FROM e2 GROUP BY src),
         |m2t AS (SELECT sum(deg) AS m2 FROM deg),
         |a0 AS (SELECT node, deg, node AS c FROM deg),
         |${levelRounds("a", "e2", "deg", "m2t", "count(*)", "")},
         |ce AS MATERIALIZED (SELECT least(la.c, lb.c) AS src,
         |        greatest(la.c, lb.c) AS dst, count(*) AS w
         |      FROM pe JOIN a4 la ON la.node = pe.p1
         |      JOIN a4 lb ON lb.node = pe.p2 GROUP BY 1, 2),
         |e2b AS (SELECT src, dst, w FROM ce UNION ALL SELECT dst, src, w FROM ce),
         |degb AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS deg FROM e2b GROUP BY src),
         |m2b AS (SELECT CAST(sum(deg) AS BIGINT) AS m2 FROM degb),
         |b0 AS (SELECT node, deg, node AS c FROM degb),
         |${levelRounds("b", "e2b", "degb", "m2b",
              "CAST(sum(e.w) AS BIGINT)", " AND e.src <> e.dst")}
         |SELECT p.node AS part, l2.c AS community,
         |       count(*) OVER (PARTITION BY l2.c) AS community_size
         |FROM a4 p JOIN b4 l2 ON l2.node = p.c
         |ORDER BY community, part""".stripMargin
    })

  // FREQUENT TRIPLES (q79): the market-basket itemset classic one
  // level above the co-purchase PAIR build — parts bought together in
  // the same order as an ORDERED triple (p1 < p2 < p3), support >= 2,
  // top-20 by (support desc, triple). Scale shape: the within-order
  // triple enumeration is bounded by C(lines-per-order, 3) — a
  // DATA-MODEL constant (TPC-H ~7 lines/order ⇒ <= 35 triples/order),
  // so triple volume is corpus-LINEAR like the pair build, and both
  // self-joins key on l_orderkey so the order's lines co-partition;
  // the support filter is one partial-aggregatable groupBy. A
  // NON-constant basket bound would need the a-priori prune
  // (candidate triples from frequent pairs) — noted, not needed here.
  private val q79 = QueryDef(
    "q79_frequent_triples",
    (s, dir) => {
      val op = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      op.as("a")
        .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .join(op.as("c"), col("a.l_orderkey") === col("c.l_orderkey") &&
          col("b.l_partkey") < col("c.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"),
          col("c.l_partkey").as("p3"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .orderBy(desc("support"), asc("p1"), asc("p2"), asc("p3"))
        .limit(20)
    },
    Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            |SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
            |       count(*) AS support
            |FROM op a
            |JOIN op b ON a.l_orderkey = b.l_orderkey
            |         AND a.l_partkey < b.l_partkey
            |JOIN op c ON a.l_orderkey = c.l_orderkey
            |         AND b.l_partkey < c.l_partkey
            |GROUP BY 1, 2, 3 HAVING count(*) >= 2
            |ORDER BY support DESC, p1, p2, p3 LIMIT 20""".stripMargin))

  // ASSOCIATION RULES (q80): the market-basket completion of q79 —
  // directed rules a → b over the same-order part pairs, scored by
  // CONFIDENCE = supp(a,b)/supp(a) (how often baskets with a also
  // hold b) and LIFT = confidence / (supp(b)/N) (how much better than
  // b's base rate — lift > 1 is real association, not popularity).
  // Pair support >= 2; top-20 by (round(lift, 6) desc, a, b). All
  // supports are exact integers from partial-aggregatable counts; the
  // two divisions happen in ONE spelled order (conf = pair/a, lift =
  // conf·N/b) and round 6 — engine-stable ordering. Scale: pair
  // volume is the q79 data-model-constant bound; per-part supports
  // are one groupBy; N rides as a broadcast 1-row aggregate.
  private val q80 = QueryDef(
    "q80_assoc_rules",
    (s, dir) => {
      val op = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val supp = op.groupBy(col("l_partkey").as("p")).agg(count(lit(1)).as("s"))
      val n = op.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n"))
      val pairs = op.as("a").join(op.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
        .agg(count(lit(1)).as("sp"))
        .filter(col("sp") >= 2)
      // both rule directions from the canonical pair via one explode
      val rules = pairs.select(explode(array(
          struct(col("p1").as("x"), col("p2").as("y"), col("sp")),
          struct(col("p2").as("x"), col("p1").as("y"), col("sp")))).as("r"))
        .select(col("r.x").as("a"), col("r.y").as("b"), col("r.sp"))
      rules
        .join(supp.select(col("p").as("a"), col("s").as("sa")), "a")
        .join(supp.select(col("p").as("b"), col("s").as("sb")), "b")
        .crossJoin(broadcast(n))
        .select(col("a"), col("b"), col("sp").as("support"),
          round(col("sp") / col("sa"), 6).as("confidence"),
          round(col("sp") / col("sa") * col("n") / col("sb"), 6).as("lift"))
        .orderBy(desc("lift"), asc("a"), asc("b")).limit(20)
    },
    Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            |supp AS (SELECT l_partkey AS p, count(*) AS s FROM op GROUP BY 1),
            |n AS (SELECT count(DISTINCT l_orderkey) AS n FROM op),
            |pairs AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS sp
            |          FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
            |                            AND a.l_partkey < b.l_partkey
            |          GROUP BY 1, 2 HAVING count(*) >= 2),
            |rules AS (SELECT p1 AS a, p2 AS b, sp FROM pairs
            |          UNION ALL SELECT p2, p1, sp FROM pairs)
            |SELECT r.a, r.b, r.sp AS support,
            |       round(r.sp / sa.s, 6) AS confidence,
            |       round(r.sp / sa.s * (SELECT n FROM n) / sb.s, 6) AS lift
            |FROM rules r
            |JOIN supp sa ON sa.p = r.a
            |JOIN supp sb ON sb.p = r.b
            |ORDER BY lift DESC, a, b LIMIT 20""".stripMargin))

  // NEIGHBORHOOD LINK PREDICTION (q81): the exact-integer companions
  // of q66's Adamic-Adar — common-neighbor count, Jaccard overlap
  // cn/(deg_a + deg_b − cn), preferential attachment deg_a·deg_b
  // (Liben-Nowell & Kleinberg 2003) for non-adjacent pairs sharing
  // >= 2 neighbors (cn >= 2 cuts the one-shared-neighbor noise floor
  // that dominates a support-thresholded graph). GraphOps.linkPredict
  // returns the integer ingredients; the ONE division (and its
  // round(6)) happens here, so the rounding contract lives in query
  // code. Same scale-derived wedge-center cap as q66, re-derived by
  // the oracle from count(*); endpoint degrees join uncapped. Top-30
  // by (jaccard desc, a, b).
  private val q81 = QueryDef(
    "q81_link_predict",
    (s, dir) => {
      val lp = graft.ops.GraphOps.linkPredict(coEdges(s, dir).toDF("src", "dst"))
      lp.filter(col("cn") >= 2)
        .select(col("a"), col("b"), col("cn"),
          round(col("cn") / (col("deg_a") + col("deg_b") - col("cn")), 6)
            .as("jaccard"),
          (col("deg_a") * col("deg_b")).as("pref"))
        .orderBy(desc("jaccard"), asc("a"), asc("b")).limit(30)
    },
    Some(s"""WITH $coEdgesCte,
            |prm AS (SELECT GREATEST(64, (SELECT MIN(1::BIGINT << b)
            |        FROM (SELECT unnest(range(0, 32)) AS b)
            |        WHERE (1::BIGINT << b) * (1::BIGINT << b) >=
            |              2 * (SELECT count(*) FROM pe))) AS cap),
            |e2 AS (SELECT p1 AS src, p2 AS dst FROM pe
            |       UNION ALL SELECT p2, p1 FROM pe),
            |deg AS (SELECT src AS z, count(*) AS deg FROM e2 GROUP BY src),
            |zn AS (SELECT e2.src AS z2, e2.dst AS n
            |       FROM e2 JOIN deg ON e2.src = deg.z
            |       WHERE deg.deg >= 2 AND deg.deg <= (SELECT cap FROM prm)),
            |cn AS (SELECT l.n AS a, r.n AS b, count(*) AS cn
            |       FROM zn l JOIN zn r ON l.z2 = r.z2 AND l.n < r.n
            |       GROUP BY 1, 2),
            |nonadj AS (SELECT c.a, c.b, c.cn FROM cn c
            |           LEFT JOIN pe ON c.a = pe.p1 AND c.b = pe.p2
            |           WHERE pe.p1 IS NULL AND c.cn >= 2)
            |SELECT n.a, n.b, n.cn,
            |       round(n.cn / (da.deg + db.deg - n.cn), 6) AS jaccard,
            |       da.deg * db.deg AS pref
            |FROM nonadj n
            |JOIN deg da ON da.z = n.a
            |JOIN deg db ON db.z = n.b
            |ORDER BY jaccard DESC, a, b LIMIT 30""".stripMargin))

  // K-SOURCE BETWEENNESS (q85): which parts sit ON the shortest paths
  // between others? GraphOps.betweenness — Brandes' forward σ
  // path-count BFS + backward dependency folding from the 10 smallest
  // part keys, explored 3 hops (the q49 seed/horizon conventions; a
  // fixed seed sample is the standard estimator, Brandes & Pich
  // 2007). σ are exact longs (2^52-guarded); each backward level
  // rounds its δ aggregate to 9 (the q44 per-round discipline), so
  // the oracle's unrolled forward/backward levels land on identical
  // doubles and the final per-node sum rounds to 6.
  private val q85 = QueryDef(
    "q85_betweenness",
    (s, dir) => {
      val pe = graft.ops.CacheScope.sessionOwned
        .checkpointed(coEdges(s, dir), reliable = false)
      val edges = pe.union(pe.select(col("p2").as("p1"), col("p1").as("p2")))
        .toDF("src", "dst")
      val seeds = edges.select(col("src").as("node"))
        .distinct().orderBy("node").limit(10)
      graft.ops.GraphOps.betweenness(edges, seeds, maxHops = 3)
        .select(col("node").as("part"), round(col("bc"), 6).as("bc"))
        .orderBy("part")
    },
    Some(s"""WITH $coEdgesCte,
            |e AS (SELECT p1 AS src, p2 AS dst FROM pe
            |      UNION ALL SELECT p2, p1 FROM pe),
            |sd AS (SELECT DISTINCT src AS node FROM e ORDER BY node LIMIT 10),
            |st0 AS (SELECT node AS seed, node, 0 AS dist, 1::BIGINT AS sigma FROM sd),
            |c1 AS (SELECT f.seed, e.dst AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
            |       FROM e JOIN st0 f ON e.src = f.node GROUP BY 1, 2),
            |n1 AS (SELECT seed, node, 1 AS dist, sigma FROM c1
            |       WHERE NOT EXISTS (SELECT 1 FROM st0 x
            |                         WHERE x.seed = c1.seed AND x.node = c1.node)),
            |st1 AS MATERIALIZED (SELECT * FROM st0 UNION ALL SELECT * FROM n1),
            |c2 AS (SELECT f.seed, e.dst AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
            |       FROM e JOIN st1 f ON e.src = f.node WHERE f.dist = 1 GROUP BY 1, 2),
            |n2 AS (SELECT seed, node, 2 AS dist, sigma FROM c2
            |       WHERE NOT EXISTS (SELECT 1 FROM st1 x
            |                         WHERE x.seed = c2.seed AND x.node = c2.node)),
            |st2 AS MATERIALIZED (SELECT * FROM st1 UNION ALL SELECT * FROM n2),
            |c3 AS (SELECT f.seed, e.dst AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
            |       FROM e JOIN st2 f ON e.src = f.node WHERE f.dist = 2 GROUP BY 1, 2),
            |n3 AS (SELECT seed, node, 3 AS dist, sigma FROM c3
            |       WHERE NOT EXISTS (SELECT 1 FROM st2 x
            |                         WHERE x.seed = c3.seed AND x.node = c3.node)),
            |st3 AS MATERIALIZED (SELECT * FROM st2 UNION ALL SELECT * FROM n3),
            |d3 AS (SELECT seed, node, sigma, 0.0 AS delta FROM st3 WHERE dist = 3),
            |t2 AS (SELECT v.seed, v.node,
            |         round(sum(CAST(v.sigma AS DOUBLE) / CAST(p.sigma AS DOUBLE)
            |               * (1 + p.delta)), 9) AS delta
            |       FROM st3 v JOIN e ON e.src = v.node
            |       JOIN d3 p ON p.seed = v.seed AND p.node = e.dst
            |       WHERE v.dist = 2 GROUP BY 1, 2),
            |d2 AS MATERIALIZED (SELECT v.seed, v.node, v.sigma, coalesce(t.delta, 0.0) AS delta
            |       FROM st3 v LEFT JOIN t2 t ON t.seed = v.seed AND t.node = v.node
            |       WHERE v.dist = 2),
            |t1 AS (SELECT v.seed, v.node,
            |         round(sum(CAST(v.sigma AS DOUBLE) / CAST(p.sigma AS DOUBLE)
            |               * (1 + p.delta)), 9) AS delta
            |       FROM st3 v JOIN e ON e.src = v.node
            |       JOIN d2 p ON p.seed = v.seed AND p.node = e.dst
            |       WHERE v.dist = 1 GROUP BY 1, 2),
            |d1 AS MATERIALIZED (SELECT v.seed, v.node, v.sigma, coalesce(t.delta, 0.0) AS delta
            |       FROM st3 v LEFT JOIN t1 t ON t.seed = v.seed AND t.node = v.node
            |       WHERE v.dist = 1),
            |t0 AS (SELECT v.seed, v.node,
            |         round(sum(CAST(v.sigma AS DOUBLE) / CAST(p.sigma AS DOUBLE)
            |               * (1 + p.delta)), 9) AS delta
            |       FROM st3 v JOIN e ON e.src = v.node
            |       JOIN d1 p ON p.seed = v.seed AND p.node = e.dst
            |       WHERE v.dist = 0 GROUP BY 1, 2),
            |d0 AS (SELECT v.seed, v.node, v.sigma, coalesce(t.delta, 0.0) AS delta
            |       FROM st3 v LEFT JOIN t0 t ON t.seed = v.seed AND t.node = v.node
            |       WHERE v.dist = 0),
            |al AS (SELECT seed, node, delta FROM d0
            |       UNION ALL SELECT seed, node, delta FROM d1
            |       UNION ALL SELECT seed, node, delta FROM d2
            |       UNION ALL SELECT seed, node, delta FROM d3)
            |SELECT node AS part, round(sum(delta), 6) AS bc
            |FROM al WHERE node != seed GROUP BY node ORDER BY part""".stripMargin))

  // GRAPH PROFILE (q86): the one-row structural summary an analyst
  // reads before running anything else on a graph — node/edge counts,
  // density, degree stats, wedge count Σ deg·(deg−1)/2, total
  // triangles, and the GLOBAL CLUSTERING COEFFICIENT 3·triangles /
  // wedges (transitivity — what fraction of open wedges close).
  // Triangles come from GraphOps.triangles' degree-oriented E^1.5
  // enumeration (per-node counts sum to 3T — exact integer div); the
  // oracle counts the same set via the canonical a<b<c triple join.
  // Everything is one edge checkpoint + three 1-row broadcast
  // aggregates; the only divisions are the three rounded ratios.
  // Nodes = edge endpoints (the support>=2 graph's isolated parts
  // don't exist as nodes).
  private val q86 = QueryDef(
    "q86_graph_profile",
    (s, dir) => {
      val pe = graft.ops.CacheScope.sessionOwned
        .checkpointed(coEdges(s, dir), reliable = false)
      val e2 = pe.union(pe.select(col("p2").as("p1"), col("p1").as("p2")))
      val deg = e2.groupBy(col("p1").as("node")).agg(count(lit(1)).as("deg"))
      val ds = broadcast(deg.agg(count(lit(1)).as("n"), max("deg").as("max_deg"),
        expr("cast(sum(deg * (deg - 1) div 2) as bigint)").as("wedges")))
      val mm = broadcast(pe.agg(count(lit(1)).as("m")))
      val tr = broadcast(graft.ops.GraphOps.triangles(pe.toDF("src", "dst"))
        .agg(coalesce(expr("sum(triangles) div 3"), lit(0L)).as("t")))
      ds.crossJoin(mm).crossJoin(tr)
        .select(col("n").as("n_nodes"), col("m").as("n_edges"), col("max_deg"),
          round((lit(2) * col("m")).cast("double")
            / (col("n") * (col("n") - 1)).cast("double"), 6).as("density"),
          round((lit(2) * col("m")).cast("double")
            / col("n").cast("double"), 6).as("avg_deg"),
          col("wedges"), col("t").as("n_triangles"),
          when(col("wedges") > 0,
            round((lit(3) * col("t")).cast("double")
              / col("wedges").cast("double"), 6))
            .otherwise(lit(0.0)).as("clustering"))
    },
    Some(s"""WITH $coEdgesCte,
            |e2 AS (SELECT p1 AS src, p2 AS dst FROM pe
            |       UNION ALL SELECT p2, p1 FROM pe),
            |deg AS (SELECT src AS node, count(*) AS deg FROM e2 GROUP BY 1),
            |ds AS (SELECT count(*) AS n, max(deg) AS max_deg,
            |              CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS wedges
            |       FROM deg),
            |mm AS (SELECT count(*) AS m FROM pe),
            |tri AS (SELECT count(*) AS t FROM pe ab
            |        JOIN pe bc ON ab.p2 = bc.p1
            |        JOIN pe ac ON ac.p1 = ab.p1 AND ac.p2 = bc.p2)
            |SELECT n AS n_nodes, m AS n_edges, max_deg,
            |  round(CAST(2 * m AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE), 6) AS density,
            |  round(CAST(2 * m AS DOUBLE) / CAST(n AS DOUBLE), 6) AS avg_deg,
            |  wedges, t AS n_triangles,
            |  CASE WHEN wedges > 0
            |       THEN round(CAST(3 * t AS DOUBLE) / CAST(wedges AS DOUBLE), 6)
            |       ELSE 0.0 END AS clustering
            |FROM ds, mm, tri""".stripMargin))

  // NODE2VEC BIASED WALKS (q87): q73's deterministic walks with the
  // second-order transition bias (Grover & Leskovec 2016) — candidate
  // x from cur with previous node prev weighs α = 1/p if x = prev
  // (return), 1 if x is adjacent to prev (triadic), 1/q otherwise
  // (outward). p = 2, q = 1/2 scaled by 2 gives EXACT INTEGER weights
  // {1, 2, 4} (DFS-leaning — the "structural equivalence" setting);
  // the choice is hash-deterministic: r = sha60(walk‖':'‖step) mod
  // Σw picks the candidate whose cumulative-weight range covers r
  // (cum over dst order — a total order, since adjacency rows are
  // distinct per cur). Step 1 has prev = start, every candidate
  // triadic, so it degenerates to the uniform first step the paper
  // prescribes. Scale shape: per step one walk-sized adjacency join
  // (candidate volume Σ deg(cur) ≤ 2E — the PageRank-round class),
  // one edge-sized prev-adjacency tag join, ONE walk-keyed window
  // exchange carrying both the running and total weight sums; every
  // quantity is an exact integer, no rounding contract anywhere.
  private val q87 = QueryDef(
    "q87_node2vec_walks",
    (s, dir) => {
      import graft.queries.QueryDef.sha60
      val pe = graft.ops.CacheScope.sessionOwned
        .checkpointed(coEdges(s, dir), reliable = false)
      val scope = graft.ops.CacheScope.sessionOwned
      val adj = scope.cached(
        pe.select(col("p1").as("src"), col("p2").as("dst"))
          .union(pe.select(col("p2").as("src"), col("p1").as("dst"))))
      var pos = adj.select(col("src").as("walk")).distinct()
        .select(col("walk"), col("walk").as("prev"), col("walk").as("cur"))
      val steps = scala.collection.mutable.ArrayBuffer(
        pos.select(col("walk"), lit(0).as("step"), col("cur").as("node")))
      val w = Window.partitionBy("walk")
      val wo = w.orderBy("dst")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      for (st <- 1 to 3) {
        val cand = pos.join(adj, col("cur") === col("src"))
          .select(col("walk"), col("prev"), col("cur"), col("dst"))
        val tagged = cand.join(
            adj.select(col("src").as("ps"), col("dst").as("pd")),
            col("prev") === col("ps") && col("dst") === col("pd"), "left")
          .select(col("walk"), col("cur"), col("dst"),
            when(col("dst") === col("prev"), lit(1))
              .when(col("ps").isNotNull, lit(2)).otherwise(lit(4)).as("wt"))
        pos = scope.cached(tagged
          .withColumn("cum", sum("wt").over(wo))
          .withColumn("tot", sum("wt").over(w))
          .withColumn("r",
            sha60(concat(col("walk").cast("string"), lit(s":$st"))) % col("tot"))
          .filter(col("cum") - col("wt") <= col("r") && col("r") < col("cum"))
          .select(col("walk"), col("cur").as("prev"), col("dst").as("cur")))
        steps += pos.select(col("walk"), lit(st).as("step"), col("cur").as("node"))
      }
      steps.reduce(_.unionByName(_)).orderBy("walk", "step")
    },
    Some {
      val stepCtes = (1 to 3).map { st =>
        val p = if (st == 1) "s0" else s"s${st - 1}"
        s"""c$st AS (SELECT w.walk, w.cur, a.dst,
           |    CASE WHEN a.dst = w.prev THEN 1
           |         WHEN ex.src IS NOT NULL THEN 2 ELSE 4 END AS wt
           |  FROM $p w JOIN adj a ON a.src = w.cur
           |  LEFT JOIN adj ex ON ex.src = w.prev AND ex.dst = a.dst),
           |k$st AS (SELECT walk, cur, dst, wt,
           |    sum(wt) OVER (PARTITION BY walk ORDER BY dst
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           |    sum(wt) OVER (PARTITION BY walk) AS tot
           |  FROM c$st),
           |s$st AS (SELECT walk, cur AS prev, dst AS cur FROM k$st
           |  WHERE cum - wt <=
           |    CAST(concat('0x', substr(sha256(CAST(walk AS VARCHAR) || ':$st'), 1, 15)) AS BIGINT) % tot
           |   AND CAST(concat('0x', substr(sha256(CAST(walk AS VARCHAR) || ':$st'), 1, 15)) AS BIGINT) % tot < cum)""".stripMargin
      }.mkString(",\n")
      val stepSelects = (1 to 3).map { st =>
        s"UNION ALL SELECT walk, $st AS step, cur AS node FROM s$st"
      }.mkString("\n")
      s"""WITH $coEdgesCte,
         |adj AS (SELECT p1 AS src, p2 AS dst FROM pe
         |        UNION ALL SELECT p2, p1 FROM pe),
         |s0 AS (SELECT DISTINCT src AS walk, src AS prev, src AS cur FROM adj),
         |$stepCtes
         |SELECT walk, 0 AS step, cur AS node FROM s0
         |$stepSelects
         |ORDER BY walk, step""".stripMargin
    })

  // HARMONIC CENTRALITY (q93): the centrality family's third member —
  // H(v) = Σ 1/d(s,v) from the same 10 seeds and 3-hop horizon as
  // q85's betweenness (Boldi & Vigna's closeness variant: reciprocals
  // make disconnected pairs contribute 0 instead of poisoning a
  // mean). GraphOps.harmonicCentrality shares betweenness' per-seed
  // forward BFS; distances are exact longs, each 1/d one IEEE
  // division, and the ≤10-term sum's order drift dies at round(6).
  // The oracle replays the identical forward levels.
  private val q93 = QueryDef(
    "q93_harmonic",
    (s, dir) => {
      val pe = graft.ops.CacheScope.sessionOwned
        .checkpointed(coEdges(s, dir), reliable = false)
      val edges = pe.union(pe.select(col("p2").as("p1"), col("p1").as("p2")))
        .toDF("src", "dst")
      val seeds = edges.select(col("src").as("node"))
        .distinct().orderBy("node").limit(10)
      graft.ops.GraphOps.harmonicCentrality(edges, seeds, maxHops = 3)
        .select(col("node").as("part"), col("n_reached"),
          round(col("harmonic"), 6).as("harmonic"))
        .orderBy("part")
    },
    Some(s"""WITH $coEdgesCte,
            |e AS (SELECT p1 AS src, p2 AS dst FROM pe
            |      UNION ALL SELECT p2, p1 FROM pe),
            |sd AS (SELECT DISTINCT src AS node FROM e ORDER BY node LIMIT 10),
            |st0 AS (SELECT node AS seed, node, 0 AS dist, 1::BIGINT AS sigma FROM sd),
            |c1 AS (SELECT f.seed, e.dst AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
            |       FROM e JOIN st0 f ON e.src = f.node GROUP BY 1, 2),
            |n1 AS (SELECT seed, node, 1 AS dist, sigma FROM c1
            |       WHERE NOT EXISTS (SELECT 1 FROM st0 x
            |                         WHERE x.seed = c1.seed AND x.node = c1.node)),
            |st1 AS MATERIALIZED (SELECT * FROM st0 UNION ALL SELECT * FROM n1),
            |c2 AS (SELECT f.seed, e.dst AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
            |       FROM e JOIN st1 f ON e.src = f.node WHERE f.dist = 1 GROUP BY 1, 2),
            |n2 AS (SELECT seed, node, 2 AS dist, sigma FROM c2
            |       WHERE NOT EXISTS (SELECT 1 FROM st1 x
            |                         WHERE x.seed = c2.seed AND x.node = c2.node)),
            |st2 AS MATERIALIZED (SELECT * FROM st1 UNION ALL SELECT * FROM n2),
            |c3 AS (SELECT f.seed, e.dst AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
            |       FROM e JOIN st2 f ON e.src = f.node WHERE f.dist = 2 GROUP BY 1, 2),
            |n3 AS (SELECT seed, node, 3 AS dist, sigma FROM c3
            |       WHERE NOT EXISTS (SELECT 1 FROM st2 x
            |                         WHERE x.seed = c3.seed AND x.node = c3.node)),
            |st3 AS (SELECT * FROM st2 UNION ALL SELECT * FROM n3)
            |SELECT node AS part, count(*) AS n_reached,
            |       round(SUM(CAST(1.0 AS DOUBLE) / dist), 6) AS harmonic
            |FROM st3 WHERE dist >= 1
            |GROUP BY node ORDER BY part""".stripMargin))

  // HYPERBALL NEIGHBORHOOD FUNCTION (q95): N(h) = how many (node,
  // node) pairs sit within h hops — the scalable complement to q86's
  // one-row profile and q49's exact BFS: per-node HLL ball sketches
  // merge register-wise per hop (GraphOps.hyperBall, Boldi & Vigna
  // 2013), edge-linear per round where exact all-pairs state
  // explodes. Sketch estimates are engine-specific, so the gate is
  // the q05/q34 bound-check pattern: the engine ALSO runs the exact
  // pair closure (GraphOps.neighborhoodExact — affordable on the
  // fixture, the thing hyperBall replaces at scale) and emits
  // deterministic verdicts — per-h estimates within 5%, and the
  // 90%-effective-diameter read off the estimated curve equal to the
  // exact one. lgK = 7 (128 registers/node) keeps the sketches in
  // true dense-HLL estimation mode on the fixture — the 100 TB
  // memory shape, not the sparse-exact fallback lgK 12 would give
  // here.
  private val q95 = QueryDef(
    "q95_hyperball",
    (s, dir) => {
      val scope = graft.ops.CacheScope.sessionOwned
      val pe = coEdges(s, dir).toDF("src", "dst")
      val est = scope.cached(graft.ops.GraphOps.hyperBall(pe, maxH = 3, lgK = 7))
      val exact = scope.cached(graft.ops.GraphOps.neighborhoodExact(pe, maxH = 3))
      val n3e = est.filter(col("h") === 3).select(col("n_est").as("n3e"))
      val n3x = exact.filter(col("h") === 3).select(col("n_exact").as("n3x"))
      val d90e = est.crossJoin(broadcast(n3e))
        .filter(col("n_est").cast("double") >=
          lit(0.9) * col("n3e").cast("double"))
        .agg(min("h").as("d90_est"))
      val d90x = exact.crossJoin(broadcast(n3x))
        .filter(col("n_exact").cast("double") >=
          lit(0.9) * col("n3x").cast("double"))
        .agg(min("h").as("d90_exact"))
      est.join(exact, "h")
        .crossJoin(broadcast(d90e)).crossJoin(broadcast(d90x))
        .select(col("h"), col("n_exact"),
          (abs(col("n_est") - col("n_exact")).cast("double") / col("n_exact")
            <= lit(0.05)).as("within_5pct"),
          (col("d90_est") === col("d90_exact")).as("d90_match"))
        .orderBy("h")
    },
    Some(s"""WITH $coEdgesCte,
            |e2 AS (SELECT p1 AS src, p2 AS dst FROM pe
            |       UNION ALL SELECT p2, p1 FROM pe),
            |b0 AS MATERIALIZED (SELECT DISTINCT src AS a, src AS b FROM e2),
            |b1 AS MATERIALIZED (SELECT DISTINCT a, b FROM (
            |  SELECT a, b FROM b0 UNION ALL
            |  SELECT b0.a, e2.dst AS b FROM b0 JOIN e2 ON b0.b = e2.src)),
            |b2 AS MATERIALIZED (SELECT DISTINCT a, b FROM (
            |  SELECT a, b FROM b1 UNION ALL
            |  SELECT b1.a, e2.dst AS b FROM b1 JOIN e2 ON b1.b = e2.src)),
            |b3 AS MATERIALIZED (SELECT DISTINCT a, b FROM (
            |  SELECT a, b FROM b2 UNION ALL
            |  SELECT b2.a, e2.dst AS b FROM b2 JOIN e2 ON b2.b = e2.src)),
            |ns AS (          SELECT 0 AS h, count(*) AS n_exact FROM b0
            |       UNION ALL SELECT 1 AS h, count(*) AS n_exact FROM b1
            |       UNION ALL SELECT 2 AS h, count(*) AS n_exact FROM b2
            |       UNION ALL SELECT 3 AS h, count(*) AS n_exact FROM b3)
            |SELECT h, n_exact, true AS within_5pct, true AS d90_match
            |FROM ns ORDER BY h""".stripMargin))

  // K-TRUSS BACKBONE (q98): the community-backbone extractor one
  // notch stronger than q57's k-core — every surviving edge must sit
  // in >= k−2 triangles WITHIN the surviving subgraph (Cohen 2008),
  // by fixed-round support peeling (GraphOps.kTruss; engine and
  // oracle run the SAME rounds, so they agree converged or not — the
  // q57 trade; the fixture peel reaches its fixpoint in 2). k = 3:
  // edges in no triangle drop, i.e. the triangle-supported core of
  // the co-purchase graph. Per round one E^1.5-bounded support
  // enumeration (the q50 orientation) + an integer filter; the
  // oracle enumerates triangles id-ordered (a<b<c) — same triangle
  // set, same supports. All exact integers.
  private val q98 = QueryDef(
    "q98_ktruss",
    (s, dir) => {
      graft.ops.GraphOps.kTruss(coEdges(s, dir).toDF("src", "dst"),
          k = 3, rounds = 3)
        .select(col("src").as("p1"), col("dst").as("p2"), col("support"))
        .orderBy("p1", "p2")
    },
    Some {
      val rounds = (1 to 4).map { r =>
        s"""t$r AS MATERIALIZED (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
           |  FROM e${r - 1} e1 JOIN e${r - 1} e2 ON e1.dst = e2.src
           |  JOIN e${r - 1} e3 ON e3.src = e1.src AND e3.dst = e2.dst),
           |s$r AS MATERIALIZED (SELECT src, dst, count(*) AS support FROM (
           |            SELECT a AS src, b AS dst FROM t$r
           |  UNION ALL SELECT b AS src, c AS dst FROM t$r
           |  UNION ALL SELECT a AS src, c AS dst FROM t$r) GROUP BY src, dst),
           |e$r AS MATERIALIZED (SELECT src, dst FROM s$r WHERE support >= 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $coEdgesCte,
         |e0 AS (SELECT p1 AS src, p2 AS dst FROM pe),
         |$rounds
         |SELECT src AS p1, dst AS p2, support FROM s4
         |WHERE support >= 1 ORDER BY p1, p2""".stripMargin
    })

  // SCC CONDENSATION (q99): the component-level view of the directed
  // trade graph — contract q72's SCC assignment onto the edges. Rows
  // with c_src = c_dst carry the INTRA-component edge count (the
  // louvainContract self-loop convention — also what keeps the query
  // non-empty when the whole graph collapses into one SCC, as the
  // sf0.001 fixture does); rows with c_src != c_dst are the
  // condensation DAG, which is acyclic by the SCC theorem — the
  // dependency order a topological pipeline stage runs on. ONE
  // edge-sized double label join + a component²-bounded aggregate —
  // the louvainContract shape on a directed graph. All exact
  // integers; oracle = the q72 closure prefix + the same
  // contraction.
  private val q99 = QueryDef(
    "q99_condensation",
    (s, dir) => {
      val scope = graft.ops.CacheScope.sessionOwned
      // de is NOT cached: scc lineage-cuts its input internally, and
      // the contraction's two join sides read the ~1 s de build more
      // cheaply than a cache materialization distorts the scc path
      // (measured: caching de cost ~5 s at sf0.1)
      val de = tradeGraph(s, dir)
      val cm = scope.cached(graft.ops.GraphOps.scc(de)
        .select(col("node"), col("component")))
      de.join(cm.select(col("node").as("src"), col("component").as("c_src")), "src")
        .join(cm.select(col("node").as("dst"), col("component").as("c_dst")), "dst")
        .groupBy("c_src", "c_dst").agg(count(lit(1)).as("n_edges"))
        .orderBy("c_src", "c_dst")
    },
    Some {
      s"""WITH ${sccOracleCtes(sccOracleRounds(Seq(5, 2)))}
         |SELECT ca.component AS c_src, cb.component AS c_dst,
         |       count(*) AS n_edges
         |FROM de JOIN allf ca ON de.src = ca.node
         |        JOIN allf cb ON de.dst = cb.node
         |GROUP BY c_src, c_dst ORDER BY c_src, c_dst""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(q48, q49, q50, q56, q57, q64, q66, q69, q70,
    q72, q73, q77, q79, q80, q81, q85, q86, q87, q93, q95, q98, q99)
}
