package graft

/** Paired A/B timing of runtime SQL confs:
  * `runMain graft.ConfAb <sfDir> <names,comma> <runsPerArm> <k=v[;k=v]>`
  * — alternates ARM A (session as-is) and ARM B (the overrides) run by
  * run inside ONE JVM, so host drift hits both arms equally (the
  * TimeOne protocol's ±30% run-to-run noise on this box swamps any
  * single-arm comparison). Only valid for RUNTIME-settable confs (AQE
  * knobs, join strategy prefs — not codegen/static ones).
  */
object ConfAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',').toSeq
    val runs = args(2).toInt
    val overrides = BenchSession.parseConfPairs(args(3))
    val spark = BenchSession.build()
    val saved = overrides.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    def setB(): Unit = overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    def setA(): Unit = saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    names.foreach { name =>
      val a = collection.mutable.ArrayBuffer.empty[Double]
      val b = collection.mutable.ArrayBuffer.empty[Double]
      // ABBA counterbalancing: alternate which arm leads each
      // iteration so warm-cache and within-iteration drift hit the
      // arms symmetrically instead of always favoring the follower
      (1 to runs).foreach { i =>
        def runA(): Unit = { setA(); a += BenchSession.timeQuery(spark, name, dir) }
        def runB(): Unit = { setB(); b += BenchSession.timeQuery(spark, name, dir) }
        if (i % 2 == 1) { runA(); runB() } else { runB(); runA() }
      }
      setA()
      val am = a.filter(_ >= 0); val bm = b.filter(_ >= 0)
      if (am.nonEmpty && bm.nonEmpty)
        println(f"[confab] $name A_min=${am.min}%.3f B_min=${bm.min}%.3f " +
          f"A_med=${am.sorted.apply(am.size / 2)}%.3f B_med=${bm.sorted.apply(bm.size / 2)}%.3f " +
          f"ratioB/A=${bm.min / am.min}%.3f")
      else println(s"[confab] $name failed: A=${a.mkString(",")} B=${b.mkString(",")}")
    }
    spark.stop()
  }
}
