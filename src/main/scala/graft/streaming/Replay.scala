package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Cursor, StartingPoint}

/** Batch replay from a cursor — the declarative form of every cursor
  * type (SURVEY.md §1.3 "in batch replays a simple filter after a
  * window scan"):
  *
  *  - OldestRetained → full scan; Now → empty (nothing after "now" in
  *    a batch snapshot);
  *  - AtProviderSequence → per-shard sequence filter (inclusive /
  *    exclusive);
  *  - AtProviderTime → `provider.publishedTimestamp >= ts`, which the
  *    source PUSHES DOWN into a per-shard seek (replay pruning);
  *  - AtUlid / AtExternalId → locate the exact match inside the
  *    tolerance window, slice from it; no match → replay from the
  *    window's lower bound (the consumer's lookahead-fallback
  *    semantics, expressed as plain filters).
  */
object Replay {

  def topic(spark: SparkSession, topicName: String, cursor: Cursor): DataFrame =
    from(spark.read.format("graft-messages").option("topic", topicName).load(), cursor)

  def log(spark: SparkSession, logName: String, cursor: Cursor): DataFrame =
    from(spark.read.format("graft-messages").option("log", logName).load(), cursor)

  /** Apply cursor semantics to any provider-stamped message DataFrame. */
  def from(df: DataFrame, cursor: Cursor): DataFrame = {
    val onShard = col("provider.shardId") === cursor.shardId
    cursor.start match {
      case StartingPoint.OldestRetained => df.filter(onShard)
      case StartingPoint.Now => df.filter(onShard && lit(false))
      case StartingPoint.AtProviderSequence(seq, inclusive) =>
        val cmp = if (inclusive) col("provider.sequenceNumber") >= seq
                  else col("provider.sequenceNumber") > seq
        df.filter(onShard && cmp)
      case StartingPoint.AtProviderTime(ts) =>
        df.filter(onShard && col("provider.publishedTimestamp") >= ts)
      case StartingPoint.AtUlid(u, inclusive, tol) =>
        sliceAtMatch(df, onShard,
          col("ulid.msb") === u.msb && col("ulid.lsb") === u.lsb,
          u.timestampMillis - tol, inclusive)
      case StartingPoint.AtExternalId(id, ts, tol, inclusive) =>
        sliceAtMatch(df, onShard, col("externalId") === id, ts - tol, inclusive)
    }
  }

  /** Find the match's sequence number within the window (driver-side
    * lookup of ONE row — dimension-scale), then slice; fall back to the
    * tolerance lower bound when absent. */
  private def sliceAtMatch(df: DataFrame, onShard: org.apache.spark.sql.Column,
                           matches: org.apache.spark.sql.Column,
                           lowerBoundMillis: Long, inclusive: Boolean): DataFrame = {
    val hit = df.filter(onShard && matches)
      .select(col("provider.sequenceNumber")).orderBy("sequenceNumber")
      .limit(1).collect().headOption.map(_.getString(0))
    hit match {
      case Some(seq) =>
        val cmp = if (inclusive) col("provider.sequenceNumber") >= seq
                  else col("provider.sequenceNumber") > seq
        df.filter(onShard && cmp)
      case None =>
        df.filter(onShard && col("provider.publishedTimestamp") >= lowerBoundMillis)
    }
  }
}
