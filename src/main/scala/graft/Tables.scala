package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All tables keep their parquet schema except `events.ts`, which is
  * physically INT64 TIMESTAMP(NANOS) — a type Spark's parquet reader
  * rejects outright. It is read via `spark.sql.legacy.parquet.nanosAsLong`
  * and floored to microseconds (`div 1000`, not `/1000`: int64 nanos
  * exceed a double's 53-bit mantissa). DuckDB performs the same floor
  * when it reads the file, so oracle comparisons stay value-identical.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    case n => spark.read.parquet(s"$dir/$n.parquet")
  }

  /** Register every fixture as a temp view (used by the SQL entry point). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
