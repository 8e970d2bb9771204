package graft.model

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types._

/** Provider stamp — who handed the message to the consumer
  * (`KinesisStreamingBuffer.java:187-192`): `firstProvider` is set once
  * at first ingest and preserved; `provider` is overwritten on every
  * read.
  */
final case class Provider(
    technology: String,
    publishedTimestamp: Long,
    shardId: String,
    sequenceNumber: String)

final case class MessageOrdering(group: String, sequenceNumber: Long)

final case class MessageSource(clientSourceId: String)

/** The engine's unit of data — the reference's `MessiMessage` protobuf
  * re-expressed as a Spark-encodable case class (field inventory:
  * SURVEY.md §1.2; evidence cites therein). `data` carries named binary
  * payloads, `attributes` string metadata; both survive publish/consume
  * untouched (round-trip pinned by the TCK specs).
  */
final case class Message(
    ulid: Option[Ulid],
    partitionKey: String,
    externalId: Option[String],
    data: Map[String, Array[Byte]],
    attributes: Map[String, String],
    timestamp: Option[java.sql.Timestamp],
    ordering: Option[MessageOrdering],
    firstProvider: Option[Provider],
    provider: Option[Provider],
    source: Option[MessageSource])

object Message {
  val encoder: Encoder[Message] = Encoders.product[Message]
  val schema: StructType = encoder.schema

  def simple(partitionKey: String, externalId: String,
             payloads: (String, Array[Byte])*): Message =
    Message(None, partitionKey, Option(externalId), payloads.toMap,
      Map.empty, None, None, None, None, None)
}
