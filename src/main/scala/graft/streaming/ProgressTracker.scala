package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}
import java.time.Instant

import graft.model.Cursor

/** At-least-once progress persistence — parity port of the reference's
  * `FileBasedProgressTracker.java:60-157` (§2A-18): record the last
  * consumed sequence number, flush to a JSON file at most every
  * `flushIntervalMs` (reference: 5 s), and treat a corrupt file as
  * "restart from TRIM_HORIZON" (warn + null, `:140-141`).
  *
  * File-format parity: the on-disk JSON is the reference's
  * `SequenceNumberRegistration` shape
  * (`FileBasedProgressTracker.java:28-49`):
  * `{"timestamp": "<ISO-8601 instant>", "sequence": "<seq>"}` —
  * a progress file written by the reference is readable here and
  * vice versa. Like the reference (constructor `:59-63`), the tracker
  * is per-shard: shardId is held by the instance, not the file.
  *
  * NOTE: Structured Streaming's checkpointLocation subsumes this with
  * exactly-once offsets — this class exists for API parity with apps
  * that manage their own consume loop (the reference never wired it
  * into the client either, `KinesisMessiClient.java:24,34`).
  */
trait ProgressTracker {
  def registerProgress(sequenceNumber: String): Unit
  def registerTimePassed(): Unit
  def safeCursor(): Option[Cursor]
}

final class FileProgressTracker(file: Path, shardId: String,
                                flushIntervalMs: Long = 5000,
                                clock: () => Long = () => System.currentTimeMillis())
    extends ProgressTracker {

  @volatile private var pending: Option[String] = None
  @volatile private var lastFlush = 0L

  override def registerProgress(sequenceNumber: String): Unit = {
    pending = Some(sequenceNumber)
    maybeFlush()
  }

  override def registerTimePassed(): Unit = maybeFlush()

  /** The last durably-flushed position, as a replayable cursor
    * (inclusive=false: everything up to and including it was handled —
    * at-least-once, re-delivery possible for the unflushed tail). */
  override def safeCursor(): Option[Cursor] =
    readSequence().map(seq => Cursor.atSequence(shardId, seq, inclusive = false))

  /** Raw read of the reference-format file: Some(sequence) if parsable,
    * None if absent/corrupt (reference `readCheckpointFromFile:128-144`). */
  def readSequence(): Option[String] = {
    if (!Files.exists(file)) return None
    try {
      val txt = new String(Files.readAllBytes(file), StandardCharsets.UTF_8)
      val m = """"sequence"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      m.findFirstMatchIn(txt) match {
        case Some(g) if txt.trim.startsWith("{") =>
          Some(g.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
        case None if txt.trim.startsWith("{") && txt.contains("timestamp") =>
          // reference's dummy checkpoint: timestamp only, sequence null/omitted
          // (FileBasedProgressTracker.java:84-86) -> no safe position yet
          None
        case _ =>
          System.err.println(s"[progress-tracker] corrupt progress file $file; restarting from TRIM_HORIZON")
          None
      }
    } catch {
      case e: Exception =>
        System.err.println(s"[progress-tracker] unreadable progress file $file (${e.getMessage}); restarting from TRIM_HORIZON")
        None
    }
  }

  def flush(): Unit = pending.foreach { seq =>
    // reference writes pretty-printed Jackson; shape is what matters
    val ts = Instant.ofEpochMilli(clock()).toString
    val json =
      s"""{\n  "timestamp" : "$ts",\n  "sequence" : "${seq.replace("\\", "\\\\").replace("\"", "\\\"")}"\n}"""
    Files.write(file, json.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
    lastFlush = clock()
  }

  private def maybeFlush(): Unit =
    if (clock() - lastFlush >= flushIntervalMs) flush()
}
