package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object Q92Probe {
  def main(args: Array[String]): Unit = {
    val spark = BenchSession.build()
    val dir = "/root/testdata/sf0.1"
    def newShape(): DataFrame = SparkEntry.queries("q92_skew_profile")(spark, dir)
    def oldShape(): DataFrame = {
      val li = Tables(spark, dir, "lineitem")
      def profile(c: String): DataFrame = {
        val freq = li.groupBy(col(c).as("k")).agg(count(lit(1)).as("f"))
        val st = freq.agg(count(lit(1)).as("n_keys"), max("f").as("max_freq"),
          sum("f").as("n_rows"))
        val top10 = freq.orderBy(desc("f"), asc("k")).limit(10)
          .agg(sum("f").as("top10_rows"))
        st.crossJoin(top10)
          .select(lit(c).as("key_col"), col("n_rows"), col("n_keys"),
            col("max_freq"),
            round(col("max_freq") / col("n_rows"), 6).as("top1_share"),
            round(col("top10_rows") / col("n_rows"), 6).as("top10_share"),
            round(col("max_freq") * col("n_keys") / col("n_rows"), 6).as("skew_ratio"))
      }
      Seq("l_partkey", "l_suppkey", "l_orderkey").map(profile)
        .reduce(_ union _).orderBy("key_col")
    }
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache(); dt
    }
    time(newShape); time(oldShape) // warm both
    val pairs = (1 to 4).map(_ => (time(oldShape), time(newShape)))
    pairs.foreach { case (o, n) => println(f"[q92probe] old=$o%.3f new=$n%.3f") }
    println(f"[q92probe] min old=${pairs.map(_._1).min}%.3f new=${pairs.map(_._2).min}%.3f")
    spark.stop()
  }
}
