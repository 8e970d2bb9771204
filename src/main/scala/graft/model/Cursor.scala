package graft.model

/** Cursor starting points — the reference's six
  * `MessiCursorStartingPointType`s (`KinesisMessiCursor.java:19-36`,
  * Kinesis translations at `KinesisStreamingBuffer.java:242-293`).
  * `Now`/`OldestRetained`/`AtProviderTime`/`AtProviderSequence` are
  * exact; `AtUlid`/`AtExternalId` are fuzzy timestamp seeks followed by
  * a client-side scan-to-match (SURVEY.md §1.3, implemented in
  * [[graft.streaming.ShardConsumer]]).
  */
sealed trait StartingPoint
object StartingPoint {
  case object Now extends StartingPoint
  case object OldestRetained extends StartingPoint
  final case class AtProviderTime(epochMillis: Long) extends StartingPoint
  final case class AtProviderSequence(sequenceNumber: String, inclusive: Boolean) extends StartingPoint
  final case class AtUlid(ulid: Ulid, inclusive: Boolean,
                          toleranceMillis: Long = Cursor.UlidSeekToleranceMillis) extends StartingPoint
  final case class AtExternalId(externalId: String, approxEpochMillis: Long,
                                toleranceMillis: Long, inclusive: Boolean = true) extends StartingPoint
}

/** A replayable position on one shard. Only `AtProviderSequence`
  * cursors are checkpointable (`KinesisMessiCursor.java:58-68`); the
  * JSON codec below is wire-compatible with the reference's
  * `{"shardId": ..., "sequenceNumber": ..., "inclusive": ...}`.
  */
final case class Cursor(shardId: String, start: StartingPoint) {

  def checkpoint: String = start match {
    case StartingPoint.AtProviderSequence(seq, inc) =>
      s"""{"shardId": ${Cursor.jsonStr(shardId)}, "sequenceNumber": ${Cursor.jsonStr(seq)}, "inclusive": $inc}"""
    case _ =>
      throw new IllegalStateException(
        s"only AT_PROVIDER_SEQUENCE cursors are checkpointable, got $start")
  }

  def isSame(o: Cursor): Boolean = Cursor.ordering.compare(this, o) == 0
  def isBefore(o: Cursor): Boolean = Cursor.ordering.compare(this, o) < 0
  def isAfter(o: Cursor): Boolean = Cursor.ordering.compare(this, o) > 0
}

object Cursor {
  /** AT_ULID fuzzy-seek tolerance (`KinesisMessiStreamingConsumer.java:26`). */
  val UlidSeekToleranceMillis: Long = 60000L

  def now(shardId: String): Cursor = Cursor(shardId, StartingPoint.Now)
  def trimHorizon(shardId: String): Cursor = Cursor(shardId, StartingPoint.OldestRetained)
  def atTime(shardId: String, epochMillis: Long): Cursor =
    Cursor(shardId, StartingPoint.AtProviderTime(epochMillis))
  def atSequence(shardId: String, seq: String, inclusive: Boolean): Cursor =
    Cursor(shardId, StartingPoint.AtProviderSequence(seq, inclusive))

  /** Cursor addressing the given consumed message (replays it) — reads
    * the provider stamp, like `KinesisMessiShard.cursorAt`
    * (`KinesisMessiShard.java:85-115`). */
  def at(m: Message): Cursor = fromProvider(m, inclusive = true)

  /** Cursor starting just after the given consumed message
    * (`KinesisMessiShard.java:117-137`). */
  def after(m: Message): Cursor = fromProvider(m, inclusive = false)

  private def fromProvider(m: Message, inclusive: Boolean): Cursor = {
    val p = m.provider.getOrElse(throw new IllegalArgumentException(
      "message has no provider stamp — was it consumed through the engine?"))
    require(p.shardId != null && p.sequenceNumber != null, "incomplete provider stamp")
    atSequence(p.shardId, p.sequenceNumber, inclusive)
  }

  /** Total order over same-shard sequence cursors
    * (`KinesisMessiCursor.java:70-98`): lexicographic sequenceNumber,
    * then inclusive-before-exclusive. Cursors that are not both
    * AT_PROVIDER_SEQUENCE on the same shard are incomparable.
    */
  implicit val ordering: Ordering[Cursor] = (a: Cursor, b: Cursor) => {
    (a.start, b.start) match {
      case (StartingPoint.AtProviderSequence(s1, i1), StartingPoint.AtProviderSequence(s2, i2)) =>
        require(a.shardId == b.shardId, s"cursors on different shards: ${a.shardId} vs ${b.shardId}")
        val c = s1.compareTo(s2)
        if (c != 0) c
        else java.lang.Boolean.compare(i2, i1) // inclusive sorts first
      case _ =>
        throw new IllegalArgumentException(s"incomparable cursors: ${a.start} vs ${b.start}")
    }
  }

  /** Parse a checkpoint produced by [[Cursor.checkpoint]] (or by the
    * reference — same wire format). Hand-rolled: zero deps. */
  def fromCheckpoint(json: String): Cursor = {
    def field(name: String): String = {
      val m = ("\"" + name + "\"\\s*:\\s*(\"((?:[^\"\\\\]|\\\\.)*)\"|true|false)").r
        .findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(s"checkpoint missing '$name': $json"))
      if (m.group(2) != null) unescape(m.group(2)) else m.group(1)
    }
    Cursor(field("shardId"),
      StartingPoint.AtProviderSequence(field("sequenceNumber"), field("inclusive").toBoolean))
  }

  private[graft] def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case o => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
