package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{Cursor, Message, StartingPoint}

/** Online scan-to-match gate (SURVEY.md §2A-13 / T6): the streaming
  * equivalent of the consumer's AT_ULID / AT_EXTERNAL_ID resolution,
  * as a stateful operator. A cursor addresses ONE shard (the
  * reference's GetShardIterator is per-shard:
  * KinesisMessiShard.java:65, KinesisMessiStreamingConsumer.java:108),
  * so the gate first filters the stream to `cursor.shardId`, then
  * within that shard drops rows until the matching message flows
  * past; from there on everything is emitted (inclusive keeps the
  * match itself, exclusive starts after it). To read several shards,
  * union one gate per cursor — same as the reference, where a
  * consumer holds one cursor per shard.
  *
  * No-match fallback (`KinesisMessiStreamingConsumer.java:93-148`):
  * while scanning, rows whose ULID timestamp has entered the cursor's
  * tolerance window are held in a lookahead buffer. If the exact match
  * arrives, the buffer is discarded and emission starts at the match;
  * if instead a row overshoots the window's upper bound, the gate
  * opens anyway and replays the buffer — i.e. emission restarts from
  * the first row at/after the lower bound. Nothing inside the window
  * is ever silently lost. Bounds per cursor type mirror the reference:
  * AT_ULID buffers from the ULID's own timestamp and gives up
  * `toleranceMillis` past it (`:96-102`, tolerance constant `:26`);
  * AT_EXTERNAL_ID buffers from `approx - tolerance` and gives up at
  * `approx + tolerance` (`:118-133`). AT_PROVIDER_SEQUENCE has no
  * fuzzy window (the reference resolves it in the shard iterator
  * itself), so the gate waits for the exact sequence number.
  *
  * State per gated shard: the opened flag plus the lookahead buffer —
  * bounded by the rows inside one tolerance window (minutes of one
  * shard's traffic), the same bound as the reference's
  * `initialPositionLookaheadBuffer`. Rows within the shard group
  * arrive in source order because the source plans one partition per
  * shard (ordering guarantee mirrors the reference's per-shard
  * contract, SURVEY.md §2A note).
  */
object CursorGate {

  /** Gate state: once `opened`, rows flow through untouched.
    * `buffering` latches when a row's timestamp first enters the
    * tolerance window (`initialBufferingEnabled` in the reference);
    * `lookahead` holds the buffered rows for no-match replay.
    *
    * Checkpoint compatibility: this state schema replaced the plain
    * Boolean used before the no-match fallback landed. Streaming
    * checkpoints written by the Boolean-state build are NOT
    * forward-compatible — a restarted gate query must use a fresh
    * checkpoint location (gates re-resolve their cursor from the
    * source on a fresh start, so nothing is lost beyond the warm-up
    * scan). Future state-schema changes should bump a version field
    * here rather than reshaping silently.
    */
  final case class GateState(opened: Boolean, buffering: Boolean, lookahead: Seq[Message])

  def apply(ds: Dataset[Message], cursor: Cursor): Dataset[Message] = {
    val (matches, inclusive) = predicate(cursor)
    val window = toleranceWindow(cursor)
    ds.filter(m => m.provider.map(_.shardId).contains(cursor.shardId))
      .groupByKey(m => m.provider.map(_.shardId).getOrElse(""))(Encoders.STRING)
      .flatMapGroupsWithState[GateState, Message](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: String, rows: Iterator[Message], state: GroupState[GateState]) =>
          val st = state.getOption.getOrElse(GateState(opened = false, buffering = false, Vector.empty))
          if (st.opened) rows
          else {
            val out = Vector.newBuilder[Message]
            var buf = st.lookahead.toVector
            var buffering = st.buffering
            var opened = false
            while (rows.hasNext && !opened) {
              val m = rows.next()
              if (matches(m)) {
                buf = Vector.empty
                opened = true
                if (inclusive) out += m
              } else window.foreach { case (lowerMillis, upperMillis) =>
                val ts = m.ulid.map(_.timestampMillis)
                if (buffering) buf :+= m
                else if (ts.exists(_ >= lowerMillis)) { buffering = true; buf :+= m }
                if (ts.exists(_ > upperMillis)) {
                  // Overshot the window without a match: open and
                  // replay from the lower bound (buffer includes this
                  // row — it was appended above, like the reference).
                  opened = true
                  out ++= buf
                  buf = Vector.empty
                }
              }
            }
            if (opened) {
              state.update(GateState(opened = true, buffering = false, Vector.empty))
              out.result().iterator ++ rows
            } else {
              state.update(GateState(opened = false, buffering, buf))
              Iterator.empty
            }
          }
      }(Encoders.product[GateState], Message.encoder)
  }

  private def predicate(c: Cursor): (Message => Boolean, Boolean) = c.start match {
    case StartingPoint.AtUlid(u, inc, _) => ((m: Message) => m.ulid.contains(u), inc)
    case StartingPoint.AtExternalId(id, _, _, inc) => ((m: Message) => m.externalId.contains(id), inc)
    case StartingPoint.AtProviderSequence(seq, inc) =>
      ((m: Message) => m.provider.exists(_.sequenceNumber == seq), inc)
    case other =>
      throw new IllegalArgumentException(s"CursorGate needs a match-style cursor, got $other")
  }

  /** (lower, upper) ULID-timestamp bounds of the scan window, or None
    * for exact cursors with no fuzzy fallback.
    */
  private def toleranceWindow(c: Cursor): Option[(Long, Long)] = c.start match {
    case StartingPoint.AtUlid(u, _, tol) =>
      Some((u.timestampMillis, u.timestampMillis + tol))
    case StartingPoint.AtExternalId(_, approx, tol, _) =>
      Some((approx - tol, approx + tol))
    case _ => None
  }
}
