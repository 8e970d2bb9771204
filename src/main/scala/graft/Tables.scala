package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All tables keep their parquet schema except `events.ts`, whose
  * physical type has varied across driver generations: INT64
  * TIMESTAMP(NANOS) (a type Spark's parquet reader rejects outright —
  * read via `spark.sql.legacy.parquet.nanosAsLong` and floored to
  * microseconds with `div 1000`, not `/1000`: int64 nanos exceed a
  * double's 53-bit mantissa) or plain TIMESTAMP(MICROS) without
  * timezone (read natively as TIMESTAMP_NTZ). Both normalize to
  * TIMESTAMP_NTZ microseconds here; DuckDB lands on the same value
  * when it reads the file, so oracle comparisons stay value-identical
  * under either generation.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/events.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
        case TimestampNTZType => df
        case _ => df.withColumn("ts", col("ts").cast(TimestampNTZType))
      }
    case n => spark.read.parquet(s"$dir/$n.parquet")
  }

  /** Register every fixture as a temp view (used by the SQL entry point). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
