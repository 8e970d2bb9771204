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
  * State is one boolean for the single gated shard — constant size,
  * safe at any scale. Rows within the shard group arrive in source
  * order because the source plans one partition per shard (ordering
  * guarantee mirrors the reference's per-shard contract, SURVEY.md
  * §2A note).
  */
object CursorGate {

  def apply(ds: Dataset[Message], cursor: Cursor): Dataset[Message] = {
    val (matches, inclusive) = predicate(cursor)
    ds.filter(m => m.provider.map(_.shardId).contains(cursor.shardId))
      .groupByKey(m => m.provider.map(_.shardId).getOrElse(""))(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, Message](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: String, rows: Iterator[Message], state: GroupState[Boolean]) =>
          val opened = state.getOption.getOrElse(false)
          if (opened) rows
          else {
            val buf = rows.toVector
            val hit = buf.indexWhere(matches)
            if (hit < 0) Iterator.empty
            else {
              state.update(true)
              buf.iterator.drop(hit + (if (inclusive) 0 else 1))
            }
          }
      }(Encoders.scalaBoolean, Message.encoder)
  }

  private def predicate(c: Cursor): (Message => Boolean, Boolean) = c.start match {
    case StartingPoint.AtUlid(u, inc, _) => ((m: Message) => m.ulid.contains(u), inc)
    case StartingPoint.AtExternalId(id, _, _, inc) => ((m: Message) => m.externalId.contains(id), inc)
    case StartingPoint.AtProviderSequence(seq, inc) =>
      ((m: Message) => m.provider.exists(_.sequenceNumber == seq), inc)
    case other =>
      throw new IllegalArgumentException(s"CursorGate needs a match-style cursor, got $other")
  }
}
