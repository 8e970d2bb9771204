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

  /** PERSONALIZED PageRank: teleport mass restarts at a SEED SET
    * instead of uniformly — pr₀(v) = 1/|S| for seeds else 0;
    * prₜ₊₁(v) = teleport·[v∈S]/|S| + damping · Σ prₜ(u)/outdeg(u).
    * The "relevance to the seeds" ranking (seeded trust/quality
    * propagation in a curation pipeline: seed the trusted sources,
    * rank everything else by received mass). Same plan shape and
    * determinism contract as [[pageRank]]; the per-node restart mass
    * is computed ONCE (node-sized, scope-cached — `teleport/|S|` as a
    * SINGLE division so a SQL replay's `0.15/ns` matches bit-for-bit)
    * and rides the iterations like the degree. Returns
    * (node, deg, pr); non-seed nodes unreachable from any seed hold
    * pr = 0.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int = 3,
                           damping: Double = 0.85, teleport: Double = 0.15,
                           scale: Int = 9)
                          (implicit scope: CacheScope): DataFrame = {
    val e = scope.cached(edges.select(col("src"), col("dst")))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
    val sd = seeds.select(col("node")).distinct()
    val ns = sd.agg(count(lit(1)).as("ns"))
    val nodes = scope.cached(
      deg.join(sd.withColumn("is_seed", lit(1)), Seq("node"), "left")
        .crossJoin(broadcast(ns))
        .select(col("node"), col("deg"),
          when(col("is_seed").isNotNull, lit(1.0) / col("ns")).otherwise(lit(0.0)).as("pr0"),
          when(col("is_seed").isNotNull, lit(teleport) / col("ns")).otherwise(lit(0.0)).as("base")))
    var pr = nodes.select(col("node"), col("deg"), col("base"), col("pr0").as("pr"))
    for (_ <- 1 to iters) {
      val in = e.join(pr, e("src") === pr("node"))
        .select(col("dst"), (col("pr") / col("deg")).as("w"))
        .groupBy("dst").agg(sum("w").as("sw"))
      pr = in.join(nodes, in("dst") === nodes("node"))
        .select(col("node"), col("deg"), col("base"),
          round(col("base") + lit(damping) * col("sw"), scale).as("pr"))
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
