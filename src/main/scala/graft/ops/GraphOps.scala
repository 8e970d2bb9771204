package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph algorithms over plain (src, dst) edge lists —
  * the Pregel-by-join family (connected components live in
  * [[CorpusOps.dupClusters]]; this module holds the rank/centrality
  * side). Everything is declarative DataFrame code: per iteration one
  * edge-sized shuffle join plus one node-sized aggregate, so cost is
  * edge-linear per round and the rank/degree tables stay node-sized.
  */
object GraphOps {

  /** Power-iteration PageRank over a DIRECTED edge list.
    *
    * Semantics: pr₀(v) = 1/N; prₜ₊₁(v) = teleport/N + damping ·
    * Σ_{u→v} prₜ(u)/outdeg(u), each iteration's ranks rounded to
    * `scale` decimals — the same determinism contract as the query
    * battery (a replay, or a SQL oracle, reproduces the ranks
    * bit-for-bit; double sum-order drift dies at the round). Callers
    * wanting no dangling-mass correction should materialize both edge
    * directions (an undirected graph — every node then has
    * outdeg ≥ 1); [[undirect]] does exactly that.
    *
    * `teleport` and `damping` are SEPARATE parameters on purpose:
    * computing 1.0 − damping in doubles lands on 0.15000000000000002,
    * not the 0.15 a SQL oracle spells — pass both literals so the
    * engine and any replay agree bit-for-bit.
    *
    * Plan shape (PLANS.md q44): the edge and degree tables are
    * scope-cached (every iteration reads both); the node count enters
    * as ONE action-free broadcast aggregate and rides the iterations
    * as a constant column (max() through each aggregate) — no
    * per-round broadcast stage. Construction is action-free. At scale:
    * run the rounds at a width that tracks the node table (the
    * dupClusters round discipline — q44 plans them in an AQE-off
    * child session), and cut lineage with `checkpointEvery` on deep
    * iteration counts (lazy localCheckpoint: no job at build, the
    * round materializes at first action — executor-local, so pair it
    * with a durable checkpoint dir on clusters, the
    * dupClusters(reliable) trade).
    *
    * Returns (node, deg, pr) for every node with at least one
    * outgoing edge.
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
               damping: Double = 0.85, teleport: Double = 0.15,
               scale: Int = 9, checkpointEvery: Int = 0)
              (implicit scope: CacheScope): DataFrame = {
    val e = scope.cached(edges.select(col("src"), col("dst")))
    val deg = scope.cached(e.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg")))
    val n = deg.agg(count(lit(1)).as("n"))
    var pr = deg.crossJoin(broadcast(n))
      .select(col("node"), col("deg"), col("n"), (lit(1.0) / col("n")).as("pr"))
    for (it <- 1 to iters) {
      val in = e.join(pr, e("src") === pr("node"))
        .select(col("dst"), (col("pr") / col("deg")).as("w"), col("n"))
        .groupBy("dst").agg(sum("w").as("sw"), max("n").as("n"))
      pr = in.join(deg, in("dst") === deg("node"))
        .select(col("node"), col("deg"), col("n"),
          round(lit(teleport) / col("n") + lit(damping) * col("sw"), scale).as("pr"))
      if (checkpointEvery > 0 && it % checkpointEvery == 0 && it < iters)
        pr = pr.localCheckpoint(false) // lazy: lineage cut, no job at build
    }
    pr.select(col("node"), col("deg"), col("pr"))
  }

  /** Both directions of an edge list, distinct — the undirected form
    * [[pageRank]] wants when dangling-mass correction should vanish. */
  def undirect(edges: DataFrame): DataFrame = {
    val ed = edges.select(col("src"), col("dst"))
    ed.union(ed.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }
}
