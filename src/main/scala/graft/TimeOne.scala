package graft

/** Time a single named query: `runMain graft.TimeOne <sfDir> <name> [runs]`.
  * Cold per run (clearCache), prints each run and the min — the quick
  * iteration loop Bench is too coarse for.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    // comma-separated names share one JVM/session — the A/B conf loop
    // would otherwise pay a ~20 s JVM+session spin-up per query
    val names = args(1).split(',').toSeq
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = BenchSession.build()
    names.foreach { name =>
      val times = (1 to runs).map { i =>
        val t = BenchSession.timeQuery(spark, name, dir)
        println(f"[timeone] $name run $i: $t%.3f s")
        t
      }
      val ok = times.filter(_ >= 0)
      if (ok.isEmpty) println(s"[timeone] $name: every run failed (unknown query name?)")
      else println(f"[timeone] $name min: ${ok.min}%.3f s")
    }
    spark.stop()
  }
}
