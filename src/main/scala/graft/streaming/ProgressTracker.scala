package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.model.Cursor

/** At-least-once progress persistence — parity port of the reference's
  * `FileBasedProgressTracker.java:60-157` (§2A-18): record the last
  * consumed sequence number, flush to a JSON file at most every
  * `flushIntervalMs` (reference: 5 s), and treat a corrupt file as
  * "restart from TRIM_HORIZON" (warn + None, `:140-141`).
  *
  * NOTE: Structured Streaming's checkpointLocation subsumes this with
  * exactly-once offsets — this class exists for API parity with apps
  * that manage their own consume loop (the reference never wired it
  * into the client either, `KinesisMessiClient.java:24,34`).
  */
trait ProgressTracker {
  def registerProgress(shardId: String, sequenceNumber: String): Unit
  def registerTimePassed(): Unit
  def safeCursor(): Option[Cursor]
}

final class FileProgressTracker(file: Path, flushIntervalMs: Long = 5000,
                                clock: () => Long = () => System.currentTimeMillis())
    extends ProgressTracker {

  @volatile private var pending: Option[(String, String)] = None
  @volatile private var lastFlush = 0L

  override def registerProgress(shardId: String, sequenceNumber: String): Unit = {
    pending = Some((shardId, sequenceNumber))
    maybeFlush()
  }

  override def registerTimePassed(): Unit = maybeFlush()

  /** The last durably-flushed position, as a replayable cursor
    * (inclusive=false: everything up to and including it was handled —
    * at-least-once, re-delivery possible for the unflushed tail). */
  override def safeCursor(): Option[Cursor] = {
    if (!Files.exists(file)) return None
    try {
      val c = Cursor.fromCheckpoint(new String(Files.readAllBytes(file), StandardCharsets.UTF_8))
      Some(c)
    } catch {
      case e: Exception =>
        System.err.println(s"[progress-tracker] corrupt progress file $file (${e.getMessage}); restarting from TRIM_HORIZON")
        None
    }
  }

  def flush(): Unit = pending.foreach { case (shard, seq) =>
    val json = Cursor.atSequence(shard, seq, inclusive = false).checkpoint
    Files.write(file, json.getBytes(StandardCharsets.UTF_8))
    lastFlush = clock()
  }

  private def maybeFlush(): Unit =
    if (clock() - lastFlush >= flushIntervalMs) flush()
}
