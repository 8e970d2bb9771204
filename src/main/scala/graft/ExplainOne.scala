package graft

/** Print the formatted physical plan of named queries without running
  * them: `runMain graft.ExplainOne <sfDir> <name> [name ...]` — the
  * plan-audit loop behind docs/PLANS.md (TimeOne is the timing
  * counterpart).
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = BenchSession.build()
    args.drop(1).foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, dir).explain("formatted")
        case None => println(s"[explainone] unknown query: $n")
      }
    }
    spark.stop()
  }
}
