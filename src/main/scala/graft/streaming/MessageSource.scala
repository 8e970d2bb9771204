package graft.streaming

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.{Cursor, Message, StartingPoint}

/** Kinesis-shaped Structured Streaming source (DataSource V2) over a
  * [[ShardLog]] — the Spark re-expression of the reference's consume
  * loop (SURVEY.md §3.2): `latestOffset`/`planInputPartitions` replace
  * GetShardIterator, `PartitionReader` replaces GetRecords + decode +
  * provider-enrich, the trigger interval replaces pollIntervalMs, and
  * the checkpointed offset log replaces the cursor JSON — with the SAME
  * wire format: this source's Offset serializes to
  * `{"shardId": ..., "sequenceNumber": ..., "inclusive": ...}`
  * (`KinesisMessiCursor.java:58-68`).
  *
  * Options:
  *  - `log`       (required) registry name of the shard log
  *  - `startingPosition` "earliest" (default) | "latest" |
  *     "at_timestamp:<epochMillis>" | a cursor checkpoint JSON
  *  - `maxRecordsPerBatch` admission control per micro-batch (the
  *     reference's GetRecords LIMIT=1000 pacing)
  *
  * At 100 TB the same shape holds: one `InputPartition` per shard
  * (`planInputPartitions` = shard discovery, §2A-12), offsets per
  * shard, executor-side sequential reads per shard — swap ShardLog for
  * the Kinesis SDK and nothing else changes.
  */
class MessageTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-messages"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Message.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new MessageTable(opts.get("log"), Option(opts.get("startingPosition")),
      Option(opts.get("maxRecordsPerBatch")).map(_.toInt).getOrElse(1000))
  }
}

final class MessageTable(logName: String, startingPosition: Option[String], maxPerBatch: Int)
    extends Table with SupportsRead {
  require(logName != null, "option 'log' is required")
  override def name(): String = s"graft-messages/$logName"
  override def schema(): StructType = Message.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new MessageScan(logName, startingPosition, maxPerBatch)
}

final class MessageScan(logName: String, startingPosition: Option[String], maxPerBatch: Int)
    extends Scan {
  override def readSchema(): StructType = Message.schema

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MessageMicroBatchStream(logName, startingPosition, maxPerBatch)

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val log = ShardLog.getOrCreate(logName)
      Array(MessagePartition(logName, 0L, ShardLog.parseSeq(log.endSequence)))
    }
    override def createReaderFactory(): PartitionReaderFactory = new MessageReaderFactory
  }
}

/** Offset = the reference's cursor checkpoint. `sequenceNumber` +
  * `inclusive` identify the NEXT record to read (canonical form:
  * next-index, inclusive=true).
  */
final case class ShardOffset(shardId: String, sequenceNumber: String, inclusive: Boolean)
    extends Offset {
  def nextIndex: Long = ShardLog.parseSeq(sequenceNumber) + (if (inclusive) 0 else 1)
  override def json(): String =
    s"""{"shardId": ${Cursor.jsonStr(shardId)}, "sequenceNumber": ${Cursor.jsonStr(sequenceNumber)}, "inclusive": $inclusive}"""
}

object ShardOffset {
  def fromJson(s: String): ShardOffset = {
    val c = Cursor.fromCheckpoint(s)
    val sp = c.start.asInstanceOf[StartingPoint.AtProviderSequence]
    ShardOffset(c.shardId, sp.sequenceNumber, sp.inclusive)
  }
}

final class MessageMicroBatchStream(logName: String, startingPosition: Option[String],
                                    maxPerBatch: Int)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  private def log: ShardLog = ShardLog.getOrCreate(logName)

  // Admission control: the reference's GetRecords LIMIT pacing
  // (`KinesisStreamingBuffer.java:41,100`) — each micro-batch admits at
  // most maxPerBatch records, the engine loops until caught up.
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ShardOffset].nextIndex
    val end = ShardLog.parseSeq(log.endSequence)
    ShardOffset(log.shardId, ShardLog.formatSeq(math.min(end, s + maxPerBatch)), inclusive = true)
  }

  override def reportLatestOffset(): Offset = latestOffset()

  override def initialOffset(): Offset = {
    val idx: Long = startingPosition.map(_.trim) match {
      case None | Some("earliest") => 0L
      case Some("latest") => ShardLog.parseSeq(log.endSequence)
      case Some(sp) if sp.startsWith("at_timestamp:") =>
        val ts = sp.stripPrefix("at_timestamp:").toLong
        log.sequenceAtTimestamp(ts).map(ShardLog.parseSeq)
          .getOrElse(ShardLog.parseSeq(log.endSequence))
      case Some(json) => ShardOffset.fromJson(json).nextIndex
    }
    ShardOffset(log.shardId, ShardLog.formatSeq(idx), inclusive = true)
  }

  override def latestOffset(): Offset = {
    val end = ShardLog.parseSeq(log.endSequence)
    ShardOffset(log.shardId, ShardLog.formatSeq(end), inclusive = true)
  }

  override def deserializeOffset(json: String): Offset = ShardOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardOffset].nextIndex
    val e = end.asInstanceOf[ShardOffset].nextIndex
    if (e <= s) Array.empty else Array(MessagePartition(logName, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory = new MessageReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class MessagePartition(logName: String, startIdx: Long, endIdx: Long)
    extends InputPartition

final class MessageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MessagePartition]
    new PartitionReader[InternalRow] {
      private val serializer = ExpressionEncoder(
        Message.encoder.asInstanceOf[org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[Message]]
      ).createSerializer()
      private val log = ShardLog.getOrCreate(p.logName)
      private var idx = p.startIdx
      private var current: Message = _
      override def next(): Boolean = {
        if (idx >= p.endIdx) false
        else {
          val recs = log.read(Some(ShardLog.formatSeq(idx)), inclusive = true, limit = 1)
          if (recs.isEmpty) false
          else { current = recs.head._2; idx += 1; true }
        }
      }
      override def get(): InternalRow = serializer(current).copy()
      override def close(): Unit = ()
    }
  }
}
