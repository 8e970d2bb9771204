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
    val overrides = args(3).split(';').filter(_.contains('=')).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k.trim, v.trim)
    }.toSeq
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
      (1 to runs).foreach { _ =>
        setA(); a += BenchSession.timeQuery(spark, name, dir)
        setB(); b += BenchSession.timeQuery(spark, name, dir)
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
