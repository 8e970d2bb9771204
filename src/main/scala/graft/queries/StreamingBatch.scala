package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch-mode equivalents of the streaming window operators T1–T3
  * (SURVEY.md §2B). `window`/`session_window` are the same Catalyst
  * expressions batch and streaming — verifying them against a DuckDB
  * oracle here pins the window semantics; watermark/state behavior is
  * covered by the streaming ScalaTest TCK.
  */
object StreamingBatch {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  private val t1 = QueryDef(
    "t1_window_tumbling",
    (s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("v"))
        .orderBy("ws", "event_type")
    },
    Some("""SELECT date_trunc('minute', ts) AS ws, event_type,
              COUNT(*) AS n, SUM(value) AS v
            FROM events GROUP BY 1, 2 ORDER BY ws, event_type"""))

  private val t2 = QueryDef(
    "t2_window_sliding",
    (s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "5 minutes", "1 minute"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .select(col("window.start").as("ws"), col("n"), col("v"))
        .orderBy("ws")
    },
    Some("""SELECT date_trunc('minute', ts) - i * INTERVAL 1 MINUTE AS ws,
              COUNT(*) AS n, SUM(value) AS v
            FROM events, (SELECT unnest(range(0, 5)) AS i) t
            GROUP BY 1 ORDER BY ws"""))

  private val t3 = QueryDef(
    "t3_window_session",
    (s, dir) => {
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("session_window.start").as("ss"),
                col("session_window.end").as("se"), col("user_id"), col("n"))
        .orderBy("user_id", "ss")
    },
    Some("""WITH x AS (SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS brk
               FROM events),
            y AS (SELECT user_id, ts,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
               FROM x)
            SELECT min(ts) AS ss, max(ts) + INTERVAL 30 MINUTE AS se,
                   user_id, COUNT(*) AS n
            FROM y GROUP BY user_id, sid ORDER BY user_id, ss"""))

  val all: Seq[QueryDef] = Seq(t1, t2, t3)
}
