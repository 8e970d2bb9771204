package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout — the pre-partitioning lever for repeated
  * big-to-big joins: two tables bucketed (and sorted) the same way on
  * the join key sort-merge join with ZERO exchanges, because every
  * bucket file pair is already co-located and pre-sorted. At 100 TB
  * this converts the dominant shuffle of a fact-to-fact join into a
  * pure map-side merge, amortized once at write time — exactly what a
  * message-log engine wants for repeated (shard, sequence)-keyed or
  * doc-id-keyed joins over immutable landed data.
  *
  * (BucketedJoinSpec pins the zero-Exchange plan; the catalog entry
  * carries the bucket spec, so readers get it via `spark.table`.)
  */
object Bucketing {

  /** Write `df` as an external parquet table bucketed+sorted by `key`
    * at `path`, registered as `table` in the session catalog. */
  def writeBucketed(df: DataFrame, path: String, table: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite").option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
