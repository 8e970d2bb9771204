package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 scaling ledger: times the TOP-20 most expensive bench entries
  * (the BENCH_r12 ranking) at the sf0.1 fixture AND at a 10×-replicated
  * copy of every table they touch — the cheapest possible
  * 100×-readiness audit. A cell whose measured ratio lands far above
  * its plan-predicted exponent (linear for the round-bounded graph
  * family, n^1.5 for the IVF-bounded ANN index builds) is a scaling
  * bug, not noise.
  *
  * Replication is structure-preserving and join-consistent: every key
  * column shifts by `i · 10M` per replica, so the scaled corpus is
  * `factor` DISJOINT copies of the fixture graph/corpus — node count,
  * edge count, and document mass all scale by exactly `factor` while
  * per-component structure (degree profile, diameter, cluster sizes)
  * stays fixed. That isolates the engine's growth exponent from
  * data-shape drift. documents/embeddings reuse the Stress replicator
  * (pad-word discipline keeps synthetic near-dup pairs out).
  *
  * Usage: `sbt "runMain graft.Sf1Ledger [sfDir] [factor] [query ...]"`
  * Prints one JSON line per query (base, scaled, ratio) plus a summary.
  */
object Sf1Ledger {

  /** The audited cells: BENCH_r12's 20 most expensive, most expensive
    * first, plus each later round's own expensive additions. */
  private val auditedCells = Seq(
    "l3_ann_hnsw_incremental", "q77_louvain_l2", "l3_ann_hnsw",
    "l2_incremental_clusters", "q99_condensation", "q76_pagerank_incr",
    "l3_ann_graph_search", "q72_scc", "q95_hyperball", "q70_louvain",
    "q69_modularity", "q85_betweenness", "q64_lpa", "q48_components",
    "q44_pagerank", "q65_hits", "q46_ppr", "q47_pagerank_weighted",
    "q73_random_walks", "q63_wppr",
    // round-13's own expensive cells — audited the round they ship
    "q121_zonemap_pruned_read", "l3_ann_compact",
    "l2_incremental_delete", "l3_ann_delete",
    // round-14's own cells
    "l6_cascade_delete", "l4_bm25_incremental", "q125_mv_topk_delete",
    "l6_cascade_insert",
    // round-15's own cells: the transparent-read family + the
    // repair-path cells (see the _apply prewarm below)
    "q126_zonemap_transparent_read", "q127_zonemap_string_or_read",
    "q128_zonemap_file_read", "q129_zonemap_prefix_read",
    "q130_zonemap_zorder_read",
    "l6_cascade_delete_apply", "l6_cascade_insert_apply",
    // round-16's own cells: the read-only zone _apply family (expect
    // ~flat ratios — only the pruned read scales, not the write), the
    // null-count/NOT-BETWEEN construction cells, and the quantizer
    // re-train (n·nlist kernel work per Lloyd round — near-linear)
    "q131_zonemap_nullcount_read", "q132_zonemap_notbetween_read",
    "q133_zonemap_notin_read", "q134_zonemap_zorder_files_read",
    "l3_ann_retrain",
    "q121_zonemap_pruned_read_apply", "q126_zonemap_transparent_read_apply",
    "q127_zonemap_string_or_read_apply", "q128_zonemap_file_read_apply",
    "q129_zonemap_prefix_read_apply", "q130_zonemap_zorder_read_apply",
    "q131_zonemap_nullcount_read_apply", "q132_zonemap_notbetween_read_apply",
    "q133_zonemap_notin_read_apply", "q134_zonemap_zorder_files_read_apply")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val only = args.drop(2).toSet
    val spark = BenchSession.build()

    // pid-stamped scratch: old scaled corpora (and the zone fixtures
    // the _apply prewarms persist against them — keyed to this
    // never-repeating dir, so unreachable after the run) reap once
    // their owning ledger process is gone instead of accumulating a
    // multi-table copy per invocation
    val outDir = graft.ops.ArtifactCache.scratchDir("sf1")
    Stress.buildScaled(spark, sfDir, outDir, factor) // documents + embeddings
    buildScaledRelational(spark, sfDir, outDir, factor)

    val names = auditedCells.filter(n => only.isEmpty || only(n))
    require(names.nonEmpty,
      s"no audited cell matches ${only.mkString(", ")} — valid names: ${auditedCells.mkString(", ")}")
    // one warm-up per corpus (JIT, codegen, parquet footers) so the
    // first timed cell doesn't absorb one-time costs
    BenchSession.timeQuery(spark, names.last, sfDir)
    BenchSession.timeQuery(spark, names.last, outDir)
    // the _apply cells time the REPAIR path: their FIRST run per
    // corpus builds and persists the stored bundle (construction), so
    // prewarm each once per corpus — the timed run then measures
    // read-stored + maintenance only, the number the ledger audits
    names.filter(_.endsWith("_apply")).foreach { n =>
      BenchSession.timeQuery(spark, n, sfDir)
      BenchSession.timeQuery(spark, n, outDir)
    }
    val rows = names.map { n =>
      val b = BenchSession.timeQuery(spark, n, sfDir)
      val s0 = BenchSession.timeQuery(spark, n, outDir)
      // timeQuery returns -1.0 on failure; never divide the sentinel —
      // a both-sides failure must NOT print ratio 1.00 and pass silently
      if (b <= 0 || s0 <= 0)
        println(f"""{"sf1":"$n","base":$b%.3f,"scaled":$s0%.3f,"ratio":null,"failed":true}""")
      else
        println(f"""{"sf1":"$n","base":$b%.3f,"scaled":$s0%.3f,"ratio":${s0 / b}%.2f}""")
      (n, b, s0)
    }
    val (ok, failed) = rows.partition { case (_, b, s0) => b > 0 && s0 > 0 }
    val body = ok.map { case (n, b, s0) => f""""$n":[$b%.3f,$s0%.3f,${s0 / b}%.2f]""" }
      .mkString(",")
    val failedList = failed.map { case (n, _, _) => s""""$n"""" }.mkString(",")
    println(s"""{"ledger":"sf1","factor":$factor,"cells":{$body},"failed_cells":[$failedList]}""")
    spark.stop()
  }

  /** Replicate lineitem + orders `factor`× with join-consistent key
    * shifts (orderkey/partkey/suppkey/custkey all move together), so
    * the co-purchase and customer–supplier graphs become `factor`
    * disjoint copies. Non-key columns replicate verbatim. */
  private def buildScaledRelational(spark: SparkSession, sfDir: String,
                                    outDir: String, factor: Int): Unit = {
    val off = 10000000L
    val li = Tables(spark, sfDir, "lineitem")
    (0 until factor).map { i =>
      li.select(
        (col("l_orderkey") + i * off).as("l_orderkey"),
        (col("l_partkey") + i * off).as("l_partkey"),
        (col("l_suppkey") + i * off).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }.reduce(_ union _)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    val ord = Tables(spark, sfDir, "orders")
    (0 until factor).map { i =>
      ord.select(
        (col("o_orderkey") + i * off).as("o_orderkey"),
        (col("o_custkey") + i * off).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    }.reduce(_ union _)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
  }
}
