package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession recipe for the measurement mains (Bench, Stress) —
  * keeps their methodology from drifting apart. */
object BenchSession {

  /** Parse "k=v;k2=v2" conf-override syntax — ONE definition shared by
    * the session builder, ConfAb's arm parser, and Bench's record
    * stamp, so the three spellings cannot drift. (A value cannot
    * contain ';' — acceptable for SQL conf values, documented here.) */
  def parseConfPairs(s: String): Seq[(String, String)] =
    s.split(';').filter(_.contains('=')).toSeq.map { kv =>
      val Array(k, v) = kv.split("=", 2); (k.trim, v.trim)
    }

  /** The SPARK_GRAFT_CONF overrides active in this process (empty when
    * unset) — Bench stamps these into its record JSON so a committed
    * record self-certifies that it ran override-free. */
  def confOverrides: Seq[(String, String)] =
    sys.env.get("SPARK_GRAFT_CONF").map(parseConfPairs).getOrElse(Nil)

  def build(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf overrides for measurement experiments (TimeOne A/B
    // loops): SPARK_GRAFT_CONF="k=v;k2=v2". Unset = the exact session
    // every committed record ran under; Bench stamps the active map
    // into its record JSON either way (audit trail).
    confOverrides.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Time one query through the noop sink; cache cleanup happens
    * OUTSIDE the measured window. Returns -1 on failure. */
  def timeQuery(spark: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    val elapsed = try {
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
    }
    spark.sharedState.cacheManager.clearCache() // after timing, not inside it
    // local-checkpoint RDD blocks (the dup-cluster rounds) live at the
    // RDD level, invisible to the SQL cache manager — release whatever
    // the cleared caches left behind so repeated cold runs measure the
    // same storage baseline instead of accumulating dead round tables
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    elapsed
  }
}
