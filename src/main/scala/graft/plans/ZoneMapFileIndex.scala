package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Companion utilities for the zone-map [[FileIndex]] family. The
  * round-13 keep-set index (an eagerly-resolved surviving-chunk set)
  * was SUBSUMED in round 14 by [[TransparentZoneMapFileIndex]], which
  * re-derives the same intersection from the scan's own pushed
  * `dataFilters` — one pruning implementation, and a zone table that
  * misses a chunk now loosens skipping instead of dropping rows. */
object ZoneMapFileIndex {
  /** Plain listing index over `path` (hive partition discovery on). */
  def listing(spark: SparkSession, path: String): InMemoryFileIndex =
    new InMemoryFileIndex(spark, Seq(new Path(path)), Map.empty[String, String], None)

  /** Exact-decimal image of a numeric or temporal JVM value; None for
    * NULL, NaN, infinities, and unsupported types (→ "no bound known",
    * which every consumer treats conservatively). BigDecimal
    * comparison means a long beyond 2^53 can never be mis-rounded
    * into a wrong pruning decision.
    *
    * Temporal values land on SPARK'S OWN internal scales, so a zone
    * envelope collected as external objects compares correctly
    * against the Int/Long a Catalyst `Literal` carries: DateType is
    * days since epoch (Literal = Int), TimestampType /
    * TIMESTAMP_NTZ are microseconds (Literal = Long; NTZ fields read
    * as if UTC, exactly Spark's `localDateTimeToMicros`). */
  private[graft] def toBigDecimal(v: Any): Option[java.math.BigDecimal] = v match {
    case null => None
    case b: Byte => Some(java.math.BigDecimal.valueOf(b.toLong))
    case s: Short => Some(java.math.BigDecimal.valueOf(s.toLong))
    case i: Int => Some(java.math.BigDecimal.valueOf(i.toLong))
    case l: Long => Some(java.math.BigDecimal.valueOf(l))
    case f: Float if !f.isNaN && !f.isInfinite =>
      Some(new java.math.BigDecimal(f.toString))
    case d: Double if !d.isNaN && !d.isInfinite =>
      Some(java.math.BigDecimal.valueOf(d))
    case d: org.apache.spark.sql.types.Decimal => Some(d.toJavaBigDecimal)
    case d: java.math.BigDecimal => Some(d)
    case d: java.sql.Date =>
      Some(java.math.BigDecimal.valueOf(d.toLocalDate.toEpochDay))
    case d: java.time.LocalDate =>
      Some(java.math.BigDecimal.valueOf(d.toEpochDay))
    case t: java.sql.Timestamp =>
      val i = t.toInstant
      Some(java.math.BigDecimal.valueOf(
        math.addExact(math.multiplyExact(i.getEpochSecond, 1000000L),
          i.getNano / 1000L)))
    case i: java.time.Instant =>
      Some(java.math.BigDecimal.valueOf(
        math.addExact(math.multiplyExact(i.getEpochSecond, 1000000L),
          i.getNano / 1000L)))
    case t: java.time.LocalDateTime =>
      val i = t.toInstant(java.time.ZoneOffset.UTC)
      Some(java.math.BigDecimal.valueOf(
        math.addExact(math.multiplyExact(i.getEpochSecond, 1000000L),
          i.getNano / 1000L)))
    case _ => None
  }
}

/** TRANSPARENT zone-map pruning — the full lakehouse reader seam:
  * instead of a caller-supplied predicate spec, this index reads the
  * range predicates Spark itself pushes into the scan.
  * `FileSourceScanExec` hands every scan its `dataFilters` (the
  * non-partition-column conjuncts of the query's WHERE clause) when it
  * lists files; Delta's and Iceberg's data skipping live exactly here.
  * This index intersects each recognized range conjunct with the
  * chunk envelopes and drops non-intersecting chunk directories at
  * listing time — so `df.filter(...)`, `spark.sql("... WHERE ...")`
  * over a temp view, ANY downstream predicate on an envelope-covered
  * column prunes I/O with no zone-aware code at the call site.
  *
  * Pruning is CONSERVATIVE by construction — it only ever drops a
  * chunk that provably cannot satisfy a conjunct, and keeps
  * everything it does not understand:
  *  - recognized shapes: `a < v`, `a <= v`, `a > v`, `a >= v`,
  *    `a = v`, the literal-first flips, `And` recursion, and a
  *    monotone numeric `Cast` around the attribute (Catalyst inserts
  *    those for literal-type promotion);
  *  - `Or`, `Not`, `In`, UDFs, column-column comparisons → ignored
  *    (chunk kept);
  *  - comparisons evaluate in BigDecimal, so a long beyond 2^53 can
  *    never be mis-rounded into a wrong DROP;
  *  - a chunk whose envelope is NULL for a constrained column is
  *    dropped: a NULL envelope means every row is NULL there, and a
  *    range conjunct rejects NULL rows anyway;
  *  - columns without an envelope constrain nothing.
  *
  * `envelopes`: chunk id → (column → (mn, mx)), the collected
  * chunk-count-bounded zone table ([[graft.ops.Layout.zoneMapRead]]
  * builds it from the maintained zone-map view). Metadata-sized
  * driver state — the same position Delta's manifest occupies. */
final class TransparentZoneMapFileIndex(
    inner: FileIndex, chunkCol: String,
    envelopes: Map[String, Map[String, (Option[java.math.BigDecimal], Option[java.math.BigDecimal])]])
  extends FileIndex {

  import org.apache.spark.sql.catalyst.expressions._

  private val chunkIdx: Int = {
    val i = inner.partitionSchema.fieldNames.indexOf(chunkCol)
    require(i >= 0, s"TransparentZoneMapFileIndex: '$chunkCol' is not a partition " +
      s"column (partition schema: ${inner.partitionSchema.fieldNames.mkString(", ")})")
    i
  }

  private def toBig(v: Any): Option[java.math.BigDecimal] =
    ZoneMapFileIndex.toBigDecimal(v)

  /** The attribute under an optional LOSSLESS numeric up-cast
    * (Catalyst inserts those for literal-type promotion). A lossy
    * cast — double→int truncation, say — is NOT monotone-invertible
    * against the raw-column envelope, so anything `Cast.canUpCast`
    * rejects is left unrecognized (chunk kept). */
  private def attrOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case Cast(a: AttributeReference, t, _, _)
        if t.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
          a.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
          Cast.canUpCast(a.dataType, t) => Some(a.name)
    case _ => None
  }

  /** Recognized conjuncts as (column, requiredLo, requiredHi) —
    * CLOSED bounds, widened by design (an open bound is treated as
    * closed; pruning may keep an extra chunk, never drop a valid
    * one). */
  private def rangeConjuncts(e: Expression): Seq[(String, Option[java.math.BigDecimal], Option[java.math.BigDecimal])] =
    e match {
      case And(l, r) => rangeConjuncts(l) ++ rangeConjuncts(r)
      case GreaterThan(a, Literal(v, _)) =>
        attrOf(a).zip(toBig(v)).map { case (c, b) => (c, Some(b), None) }.toSeq
      case GreaterThanOrEqual(a, Literal(v, _)) =>
        attrOf(a).zip(toBig(v)).map { case (c, b) => (c, Some(b), None) }.toSeq
      case LessThan(a, Literal(v, _)) =>
        attrOf(a).zip(toBig(v)).map { case (c, b) => (c, None, Some(b)) }.toSeq
      case LessThanOrEqual(a, Literal(v, _)) =>
        attrOf(a).zip(toBig(v)).map { case (c, b) => (c, None, Some(b)) }.toSeq
      case EqualTo(a, Literal(v, _)) =>
        attrOf(a).zip(toBig(v)).map { case (c, b) => (c, Some(b), Some(b)) }.toSeq
      // literal-first flips
      case GreaterThan(Literal(v, _), a) =>
        attrOf(a).zip(toBig(v)).map { case (c, b) => (c, None, Some(b)) }.toSeq
      case GreaterThanOrEqual(Literal(v, _), a) =>
        attrOf(a).zip(toBig(v)).map { case (c, b) => (c, None, Some(b)) }.toSeq
      case LessThan(Literal(v, _), a) =>
        attrOf(a).zip(toBig(v)).map { case (c, b) => (c, Some(b), None) }.toSeq
      case LessThanOrEqual(Literal(v, _), a) =>
        attrOf(a).zip(toBig(v)).map { case (c, b) => (c, Some(b), None) }.toSeq
      case EqualTo(Literal(v, _), a) =>
        attrOf(a).zip(toBig(v)).map { case (c, b) => (c, Some(b), Some(b)) }.toSeq
      case EqualNullSafe(a, Literal(v, _)) if v != null =>
        attrOf(a).zip(toBig(v)).map { case (c, b) => (c, Some(b), Some(b)) }.toSeq
      case EqualNullSafe(Literal(v, _), a) if v != null =>
        attrOf(a).zip(toBig(v)).map { case (c, b) => (c, Some(b), Some(b)) }.toSeq
      // IN-lists bound by their value hull: a chunk intersecting
      // [min(vs), max(vs)] may hold a member (conservative — the hull
      // can cover non-members, so this only ever keeps extra chunks)
      case In(a, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        hullOf(a, list.map(_.asInstanceOf[Literal].value))
      case InSet(a, hset) if hset.nonEmpty =>
        hullOf(a, hset.toSeq)
      case _ => Seq.empty
    }

  /** (column, min, max) of an IN-list's values; empty (no constraint)
    * unless EVERY value converts — a single unconvertible member
    * voids the hull, never tightens it. */
  private def hullOf(a: Expression, vs: Seq[Any]): Seq[(String, Option[java.math.BigDecimal], Option[java.math.BigDecimal])] =
    attrOf(a).toSeq.flatMap { c =>
      val bs = vs.map(toBig)
      if (bs.exists(_.isEmpty)) Seq.empty
      else {
        val all = bs.flatten
        val lo = all.reduce((x, y) => if (x.compareTo(y) <= 0) x else y)
        val hi = all.reduce((x, y) => if (x.compareTo(y) >= 0) x else y)
        Seq((c, Some(lo), Some(hi)))
      }
    }

  private def chunkSurvives(chunk: String,
      reqs: Seq[(String, Option[java.math.BigDecimal], Option[java.math.BigDecimal])]): Boolean =
    envelopes.get(chunk) match {
      case None => true // no envelope row for this chunk: never prune it
      case Some(env) => reqs.forall { case (c, lo, hi) =>
        env.get(c) match {
          case None => true // column not zone-mapped: constrains nothing
          case Some((mn, mx)) =>
            if (mn.isEmpty || mx.isEmpty) false // all-NULL column: range conjunct rejects every row
            else lo.forall(l => mx.get.compareTo(l) >= 0) &&
              hi.forall(h => mn.get.compareTo(h) <= 0)
        }
      }
    }

  override def rootPaths: Seq[Path] = inner.rootPaths

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val reqs = dataFilters.flatMap(rangeConjuncts)
    val listed = inner.listFiles(partitionFilters, dataFilters)
    if (reqs.isEmpty) listed
    else listed.filter { pd =>
      !pd.values.isNullAt(chunkIdx) &&
        chunkSurvives(pd.values.getUTF8String(chunkIdx).toString, reqs)
    }
  }

  override def inputFiles: Array[String] = inner.inputFiles
  override def refresh(): Unit = inner.refresh()
  override def sizeInBytes: Long = inner.sizeInBytes
  override def partitionSchema: StructType = inner.partitionSchema
}
