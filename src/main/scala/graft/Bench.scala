package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Work is forced through the noop DSv2 sink
  * (full plan executes, nothing buffered on the driver) — `count()`
  * would let Catalyst prune expensive projections away.
  */
object Bench {

  /** Representative slice of every operator family: scan+filter, wide
    * agg, shuffle join, as-of union-window join, window frames, top-k,
    * dedup (exact + minhash + simhash), kNN, tf-idf, arrays, windows.
    */
  val headline: Seq[String] = Seq(
    "q01_project_filter", "q03_agg_pricing_summary", "q04_count_distinct",
    "q06_rollup", "q07_broadcast_join", "q08_shuffle_join_topk",
    "q12_asof_join", "q14_window_rank", "q15_window_frames", "q16_sort_topk",
    "q18_dedup_keeper", "q21_math_conditional", "q22_array_funcs",
    "q24_json_funcs", "t1_window_tumbling", "t3_window_session",
    "l1_exact_dedup", "l2_jaccard_pairs", "l2_minhash_lsh",
    "l3_knn_bruteforce", "l4_tfidf", "l4_fingerprint")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries = SparkEntry.queries
    // one warm-up action so JIT/codegen/parquet-footer costs don't land
    // on the first measured query
    queries("q01_project_filter")(spark, sfDir).write.format("noop").mode("overwrite").save()

    val results = headline.filter(queries.contains).map { name =>
      val t0 = System.nanoTime()
      try {
        queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
