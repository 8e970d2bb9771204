package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** An ORDERED zone-envelope value — the common image domain in which a
  * chunk's (min, max) compares against a pushed literal. Two kinds:
  *
  *  - [[ZBound.Num]]: exact decimal, covering every numeric and
  *    temporal type ([[ZoneMapFileIndex.toBigDecimal]] — longs beyond
  *    2^53 never mis-round, temporal values land on Spark's own
  *    internal scales);
  *  - [[ZBound.Str]]: UTF8 binary order — exactly the ordering
  *    Spark's default-collation string comparisons use, so string
  *    min/max envelopes (the most common real zone dimension:
  *    categories, date-formatted keys, id prefixes) prune too.
  *
  * Cross-kind comparison is UNDEFINED (`cmp` = None) and every
  * consumer treats an undefined comparison as "keep the chunk" — a
  * type confusion can only loosen skipping, never drop a row. */
sealed trait ZBound {
  /** Total order within a kind; None across kinds. */
  def cmp(o: ZBound): Option[Int]
}
object ZBound {
  final case class Num(b: java.math.BigDecimal) extends ZBound {
    def cmp(o: ZBound): Option[Int] = o match {
      case Num(b2) => Some(b.compareTo(b2))
      case _ => None
    }
  }
  final case class Str(s: UTF8String) extends ZBound {
    def cmp(o: ZBound): Option[Int] = o match {
      case Str(s2) => Some(Integer.signum(s.compareTo(s2)))
      case _ => None
    }
  }
  /** Image a JVM or Catalyst-internal value; None for NULL, NaN,
    * infinities, and unsupported types (→ "no bound known", treated
    * conservatively everywhere). */
  def of(v: Any): Option[ZBound] = v match {
    case null => None
    case s: String => Some(Str(UTF8String.fromString(s)))
    case u: UTF8String => Some(Str(u))
    case other => ZoneMapFileIndex.toBigDecimal(other).map(Num.apply)
  }
}

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
    * A Float images as its EXACT double value (`f.toDouble` is exact;
    * both float-vs-float and cast-to-double comparisons then share
    * one monotone image) — imaging via the float's own shortest
    * decimal would sit BELOW the exact double for values like 0.1f,
    * and a pushed double literal between the two would wrongly DROP
    * a chunk holding matching rows.
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
      Some(java.math.BigDecimal.valueOf(f.toDouble))
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

  /** One column's statistics in one unit (chunk or file): the (mn, mx)
    * envelope plus OPTIONAL exact counts — the Delta/Iceberg
    * `nullCount`/`recordCount` parity that lets `IS NULL` prune — plus
    * an OPTIONAL per-unit BLOOM FILTER over `xxhash64(col)` (the Delta
    * bloom-filter-index parity: point lookups on HIGH-CARDINALITY
    * unordered keys, where every unit's (mn, mx) spans ~the whole
    * domain and envelopes prune nothing, drop on a definitive
    * bloom "absent"). A `None` bound with a non-empty unit records
    * the column ALL-NULL there (a range conjunct rejects NULL rows,
    * so the unit may drop); absent counts constrain nothing (`IS
    * NULL` keeps); an absent bloom constrains nothing (point lookups
    * fall back to the envelope test). */
  final case class ColStats(mn: Option[ZBound], mx: Option[ZBound],
                            nullCount: Option[Long] = None,
                            rowCount: Option[Long] = None,
                            bloom: Option[org.apache.spark.util.sketch.BloomFilter] = None)

  /** column → [[ColStats]] of one chunk or file. A column absent from
    * the map constrains nothing. */
  type ColEnv = Map[String, ColStats]

  /** Canonical key of a file URI string: `scheme://authority/path`,
    * with a missing scheme defaulting to `file` and a missing
    * authority to empty — "file:/x", "file:///x", and bare "/x" all
    * key identically, while "hdfs://nn1/x" and "s3://b/x" stay
    * DISTINCT (a path-only key would let a zone table built against
    * one filesystem wrongly prune a coincident path on another).
    * File-zone tables key by this, not bare file name: parquet
    * immutability holds per path, and a name collision across
    * partition directories (non-UUID writers reuse part names) under
    * a name key would silently prune the wrong file's rows. Returns
    * the raw string when unparseable — an unmatched key only loosens
    * skipping. */
  private[graft] def pathKey(s: String): String =
    try {
      val u = new java.net.URI(s)
      val p = u.getPath
      if (p == null || p.isEmpty) s
      else {
        val scheme = Option(u.getScheme).map(_.toLowerCase(java.util.Locale.ROOT))
          .getOrElse("file")
        val auth = Option(u.getAuthority).getOrElse("")
        s"$scheme://$auth$p"
      }
    } catch { case _: java.net.URISyntaxException => s }

  /** An interval [lo, hi] with per-endpoint OPENNESS, either side
    * open-ended via None. Positive conjuncts emit CLOSED endpoints
    * (`a < v` is widened to `[…, v]` — pruning may keep an extra
    * unit, never drop a valid one); NEGATIONS need exact open
    * endpoints to prune at all (the complement of a point under
    * closed widening is the whole line). (None, _, None, _) is the
    * "any non-NULL value" interval: it intersects every envelope
    * except an all-NULL one. */
  private[plans] final case class Iv(lo: Option[ZBound], loOpen: Boolean,
                                     hi: Option[ZBound], hiOpen: Boolean)

  /** A recognized constraint on one column. [[Ranges]]: the column
    * must intersect AT LEAST ONE of the intervals — a DISJUNCTIVE
    * requirement, so IN-lists prune per VALUE (a chunk between two
    * sparse members drops) and OR prunes by the true union of its arm
    * intervals (the gap between arms drops), not by their hulls; an
    * EMPTY interval set is an unsatisfiable constraint (no chunk can
    * serve it — sound, no ROW satisfies the filter either). Every
    * Ranges constraint admits only NON-NULL rows (range comparisons
    * reject NULL), so an all-NULL unit drops under it. [[NeedsNull]]
    * (`IS NULL`): the unit must CONTAIN a null — droppable exactly
    * when its `nullCount` stat records zero. */
  private[plans] sealed trait Req
  private[plans] final case class Ranges(col: String, ivs: Seq[Iv]) extends Req
  private[plans] final case class NeedsNull(col: String) extends Req

  /** Point-membership constraint for the per-unit BLOOM filters: the
    * unit must possibly contain AT LEAST ONE of `hashes` (xxhash64
    * images of the probed literals, computed by evaluating the SAME
    * Catalyst expression the bloom build side runs — hash identity by
    * construction, never by re-implementation). Bloom filters have no
    * false negatives, so "every probe definitively absent" is a sound
    * drop; units without a bloom keep. Emitted ONLY for top-level
    * equality/IN conjuncts on a BARE (cast-free) column — a cast
    * changes the literal's type and therefore its hash, and
    * negations/disjunctions cannot use membership evidence. */
  private[plans] final case class MustContain(col: String, hashes: Seq[Long]) extends Req
}

/** TRANSPARENT zone-map pruning — the full lakehouse reader seam:
  * instead of a caller-supplied predicate spec, this index reads the
  * range predicates Spark itself pushes into the scan.
  * `FileSourceScanExec` hands every scan its `dataFilters` (the
  * non-partition-column conjuncts of the query's WHERE clause) when it
  * lists files; Delta's and Iceberg's data skipping live exactly here.
  * This index intersects each recognized range conjunct with the
  * envelopes and drops non-intersecting units at listing time — whole
  * chunk DIRECTORIES of a [[graft.ops.Layout.writeClustered]] table
  * (when `chunkCol` is set and `envelopes` non-empty), and individual
  * FILES within surviving directories (when `fileEnvelopes` is
  * non-empty — footer-stat-granularity skipping over a PLAIN,
  * unpartitioned table needs no layout contract at all). So
  * `df.filter(...)`, `spark.sql("... WHERE ...")` over a temp view,
  * ANY downstream predicate on an envelope-covered column prunes I/O
  * with no zone-aware code at the call site.
  *
  * Pruning is CONSERVATIVE by construction — it only ever drops a
  * unit that provably cannot satisfy a conjunct, and keeps
  * everything it does not understand:
  *  - recognized shapes: `a < v`, `a <= v`, `a > v`, `a >= v`,
  *    `a = v`, the literal-first flips, `And` recursion, `In`/`InSet`
  *    per value (cap-bounded), `Or` by the per-column UNION of its
  *    arm interval sets (only columns bounded in BOTH arms
  *    constrain — still conservative), `StartsWith` (`LIKE 'p%'`) by
  *    its UTF8 prefix range, bare `IsNotNull` (drops all-NULL-column
  *    units), `IsNull` (drops units whose `nc_<col>` count records
  *    ZERO nulls — count-less zone tables keep), `Not` of any
  *    recognized child by its EXACT complement (open-endpoint
  *    intervals: `NOT BETWEEN` drops the inside chunks, `NOT IN`
  *    prunes by the gaps between its points, De Morgan recursion
  *    through `NOT (… AND/OR …)`), and a VALUE-EXACT numeric `Cast`
  *    around the attribute (Catalyst inserts casts for literal-type
  *    promotion; rounding casts like long→double are REJECTED — the
  *    rounded image can land ON a bound the original value sits
  *    past, and the exact envelope test would wrongly drop);
  *  - `Not` of an UNRECOGNIZED child, UDFs, column-column
  *    comparisons, non-binary-collated string columns → ignored
  *    (unit kept);
  *  - numeric comparisons evaluate in BigDecimal and strings in UTF8
  *    binary order ([[ZBound]]); a cross-kind comparison is undefined
  *    and KEEPS;
  *  - a unit whose envelope is NULL for a constrained column is
  *    dropped: a NULL envelope means every row is NULL there, and a
  *    range conjunct rejects NULL rows anyway;
  *  - a chunk directory whose PARTITION VALUE is NULL (hive's
  *    `__HIVE_DEFAULT_PARTITION__`) is KEPT unconditionally — it is
  *    a chunk the zone table cannot address, exactly the
  *    missing-zone-row case;
  *  - columns without an envelope, and chunks/files missing from the
  *    zone tables, constrain nothing.
  *
  * The index is SNAPSHOT-BOUND (the Delta convention): the envelopes
  * were collected against the file set at construction, so
  * [[refresh]] THROWS — re-listing under frozen envelopes could let
  * an append widen a chunk's true range past its stale-tight bound
  * and silently drop the new rows. Construct a fresh reader from the
  * latest zone snapshot instead.
  *
  * `envelopes`: chunk id → [[ZoneMapFileIndex.ColEnv]], the collected
  * chunk-count-bounded zone table ([[graft.ops.Layout.zoneMapRead]]
  * builds it from the maintained zone-map view); `fileEnvelopes`:
  * scheme-normalized file PATH → ColEnv
  * ([[ZoneMapFileIndex.pathKey]]; [[graft.ops.Layout.zoneMapReadFiles]]
  * builds it). Both
  * are metadata-sized driver state — the same position Delta's
  * manifest occupies. */
final class TransparentZoneMapFileIndex(
    inner: FileIndex, chunkCol: Option[String],
    envelopes: Map[String, ZoneMapFileIndex.ColEnv],
    fileEnvelopes: Map[String, ZoneMapFileIndex.ColEnv] = Map.empty)
  extends FileIndex {

  import org.apache.spark.sql.catalyst.expressions._

  private val chunkIdx: Option[Int] = chunkCol.map { cc =>
    val i = inner.partitionSchema.fieldNames.indexOf(cc)
    require(i >= 0, s"TransparentZoneMapFileIndex: '$cc' is not a partition " +
      s"column (partition schema: ${inner.partitionSchema.fieldNames.mkString(", ")})")
    require(inner.partitionSchema(i).dataType == org.apache.spark.sql.types.StringType,
      s"TransparentZoneMapFileIndex: chunk partition column '$cc' must be " +
        s"STRING-typed so zone-table keys match partition values exactly " +
        s"(discovered type: ${inner.partitionSchema(i).dataType.simpleString}; " +
        s"format chunk ids as strings at write time — Layout.writeClustered's contract)")
    i
  }

  /** Binary-collated strings and every non-string type compare in the
    * [[ZBound]] domain; a non-default string collation orders
    * differently from UTF8 binary, so its predicates must not prune. */
  private def comparableType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case st: org.apache.spark.sql.types.StringType =>
        st == org.apache.spark.sql.types.StringType
      case _ => true
    }

  /** Is `from` → `to` VALUE-EXACT for every representable value?
    * Strictly tighter than Spark's `Cast.canUpCast`, whose numeric
    * precedence chain admits int→float, long→float, and long→double —
    * "up-casts" that lose value precision (a long above 2^53 rounds
    * under long→double), and a rounding cast composed with the exact
    * BigDecimal envelope test is NOT invertible: a pushed
    * `cast(longCol as double) <= 2^53` is satisfied by the row
    * 2^53+1 (its double image rounds DOWN onto the bound) while the
    * exact envelope comparison sees 2^53+1 > 2^53 and would wrongly
    * DROP the chunk. Only casts where image and original always
    * compare identically in the ZBound domain qualify; everything
    * else leaves the conjunct unrecognized (unit kept). */
  private def losslessCast(from: org.apache.spark.sql.types.DataType,
                           to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (f, t) if f == t => true
      case (ByteType, ShortType | IntegerType | LongType | FloatType | DoubleType) => true
      case (ShortType, IntegerType | LongType | FloatType | DoubleType) => true
      case (IntegerType, LongType | DoubleType) => true // int→float is lossy past 2^24
      case (FloatType, DoubleType) => true
      // integral→decimal is exact when the decimal's integral digits
      // cover the source range (the DecimalType.forType widths)
      case (ByteType, d: DecimalType) => d.precision - d.scale >= 3
      case (ShortType, d: DecimalType) => d.precision - d.scale >= 5
      case (IntegerType, d: DecimalType) => d.precision - d.scale >= 10
      case (LongType, d: DecimalType) => d.precision - d.scale >= 20
      case (f: DecimalType, t: DecimalType) =>
        t.precision - t.scale >= f.precision - f.scale && t.scale >= f.scale
      case _ => false
    }
  }

  /** The attribute under an optional VALUE-EXACT numeric cast
    * (Catalyst inserts casts for literal-type promotion). A lossy
    * cast — double→int truncation, long→double rounding — is NOT
    * monotone-invertible against the raw-column envelope, so anything
    * [[losslessCast]] rejects is left unrecognized (unit kept). */
  /** The column a predicate binds: a bare attribute, or a
    * [[GetStructField]] chain over one — keyed by DOTTED path
    * (`provider.published_ts`), the Delta/Iceberg nested-stats
    * convention. Envelope columns are named `mn_<dotted path>`
    * ([[graft.ops.Layout.fileZones]] emits them for dotted `cols`
    * entries), and NULL semantics compose exactly: a NULL struct
    * makes every field NULL, which is what `min`/`count` over the
    * nested value see when the envelope is built. A flat column whose
    * NAME contains a literal dot is outside this convention. */
  private def baseOf(e: Expression)
    : Option[(String, org.apache.spark.sql.types.DataType)] = e match {
    case a: AttributeReference => Some((a.name, a.dataType))
    case g: org.apache.spark.sql.catalyst.expressions.GetStructField =>
      baseOf(g.child).map { case (p, _) =>
        (p + "." + g.extractFieldName, g.dataType) }
    case _ => None
  }

  private def attrOf(e: Expression): Option[String] = e match {
    // comparableType guards the Cast branch too: losslessCast's
    // identity case would otherwise admit an identity cast over a
    // non-binary-collated string column (SimplifyCasts normally
    // removes those, but this index must not depend on an optimizer
    // rule for soundness) and prune it with UTF8-binary envelope
    // ordering.
    case Cast(c, t, _, _) =>
      baseOf(c).collect {
        case (p, dt) if comparableType(dt) && losslessCast(dt, t) => p }
    case other =>
      baseOf(other).collect { case (p, dt) if comparableType(dt) => p }
  }

  private def toB(v: Any): Option[ZBound] = ZBound.of(v)

  import ZoneMapFileIndex.{Iv, MustContain, NeedsNull, Ranges, Req}
  private def closedIv(lo: Option[ZBound], hi: Option[ZBound]): Iv =
    Iv(lo, loOpen = false, hi, hiOpen = false)

  /** Smallest string ABOVE every string with prefix `p` in UTF8 binary
    * order: increment p's last non-0xFF byte, drop the bytes after it.
    * None when every byte is 0xFF (no finite upper bound exists). */
  private def prefixUpper(p: UTF8String): Option[UTF8String] = {
    val b = p.getBytes.clone()
    var i = b.length - 1
    while (i >= 0 && b(i) == -1) i -= 1
    if (i < 0) None
    else {
      b(i) = (b(i) + 1).toByte
      Some(UTF8String.fromBytes(java.util.Arrays.copyOf(b, i + 1)))
    }
  }

  private def minB(a: ZBound, b: ZBound): Option[ZBound] =
    a.cmp(b).map(c => if (c <= 0) a else b)
  private def maxB(a: ZBound, b: ZBound): Option[ZBound] =
    a.cmp(b).map(c => if (c >= 0) a else b)

  /** Intersection of two intervals; None when provably EMPTY. An
    * incomparable bound pair (cross-kind) widens that side to
    * unbounded — the intersection must CONTAIN the true one. On a
    * tied endpoint, OPEN wins (the more restrictive side — exact for
    * an intersection, never wider than the truth). */
  private def intersectIv(a: Iv, b: Iv): Option[Iv] = {
    def pick(x: Option[ZBound], xo: Boolean, y: Option[ZBound], yo: Boolean,
             max: Boolean): (Option[ZBound], Boolean) =
      (x, y) match {
        case (Some(p), Some(q)) => p.cmp(q) match {
          case Some(0) => (Some(p), xo || yo)
          case Some(c0) => if ((c0 >= 0) == max) (Some(p), xo) else (Some(q), yo)
          case None => (None, false) // incomparable: widen to unbounded (safe)
        }
        case (Some(p), None) => (Some(p), xo)
        case (None, Some(q)) => (Some(q), yo)
        case (None, None) => (None, false)
      }
    val (lo, loO) = pick(a.lo, a.loOpen, b.lo, b.loOpen, max = true)
    val (hi, hiO) = pick(a.hi, a.hiOpen, b.hi, b.hiOpen, max = false)
    (lo, hi) match {
      case (Some(l), Some(h)) => l.cmp(h) match {
        case Some(c) if c > 0 => None
        case Some(0) if loO || hiO => None // (v, v] / [v, v) / (v, v): empty
        case _ => Some(Iv(lo, loO, hi, hiO))
      }
      case _ => Some(Iv(lo, loO, hi, hiO))
    }
  }

  /** Hull of a non-empty interval set: bounded on a side only when
    * EVERY member is, and all bounds compare. Endpoints come back
    * CLOSED — wider than the members, which is all a fallback hull
    * may be. */
  private def hullIvs(ivs: Seq[Iv]): Iv = {
    val lo = ivs.map(_.lo).reduceLeft((x, y) =>
      for { a <- x; b <- y; m <- minB(a, b) } yield m)
    val hi = ivs.map(_.hi).reduceLeft((x, y) =>
      for { a <- x; b <- y; m <- maxB(a, b) } yield m)
    closedIv(lo, hi)
  }

  /** Per-column interval SET each arm of a disjunction implies: a
    * column's range reqs within the arm (a conjunction) intersect
    * pairwise; a blowing product hulls one side first (wider, safe).
    * An empty result records an arm unsatisfiable on that column. */
  private def armIntervalSets(cs: Seq[Req]): Map[String, Seq[Iv]] =
    cs.collect { case Ranges(c, ivs) => (c, ivs) }.groupBy(_._1).map {
      case (c, rs) =>
        val folded = rs.map(_._2).reduceLeft { (acc, next) =>
          val (a, b) =
            if (acc.size.toLong * next.size > 256)
              (Seq(hullIvs(acc)), Seq(hullIvs(next)))
            else (acc, next)
          (for { x <- a; y <- b; iv <- intersectIv(x, y) } yield iv).distinct
        }
        c -> folded
    }

  /** The per-column UNION of two disjunction arms' interval sets: a
    * row satisfying either arm satisfies, for every column BOTH arms
    * range-bound, one of the arms' intervals — q74/TPC-H Q19's shape,
    * and the gap BETWEEN the arms prunes (a hull would keep it). A
    * column bounded in only one arm constrains nothing (the other
    * arm's rows are unbounded there); a column carrying a
    * [[NeedsNull]] in an arm contributes no range there and is
    * therefore excluded the same way; an arm unsatisfiable on the
    * column contributes nothing to the union; an oversized union
    * hulls (wider, safe). */
  private def orCombine(l: Seq[Req], r: Seq[Req]): Seq[Req] = {
    val lc = armIntervalSets(l)
    val rc = armIntervalSets(r)
    lc.keySet.intersect(rc.keySet).toSeq.map { c =>
      val u = (lc(c) ++ rc(c)).distinct
      Ranges(c, if (u.size > 128) Seq(hullIvs(u)) else u)
    }
  }

  private def one(c: String, lo: Option[ZBound], hi: Option[ZBound]): Req =
    Ranges(c, Seq(closedIv(lo, hi)))

  /** Recognized conjuncts as constraints implied by `e`. */
  private def rangeConjuncts(e: Expression): Seq[Req] =
    e match {
      case And(l, r) => rangeConjuncts(l) ++ rangeConjuncts(r)
      case GreaterThan(a, Literal(v, _)) =>
        attrOf(a).zip(toB(v)).map { case (c, b) => one(c, Some(b), None) }.toSeq
      case GreaterThanOrEqual(a, Literal(v, _)) =>
        attrOf(a).zip(toB(v)).map { case (c, b) => one(c, Some(b), None) }.toSeq
      case LessThan(a, Literal(v, _)) =>
        attrOf(a).zip(toB(v)).map { case (c, b) => one(c, None, Some(b)) }.toSeq
      case LessThanOrEqual(a, Literal(v, _)) =>
        attrOf(a).zip(toB(v)).map { case (c, b) => one(c, None, Some(b)) }.toSeq
      case EqualTo(a, Literal(v, _)) =>
        attrOf(a).zip(toB(v)).map { case (c, b) => one(c, Some(b), Some(b)) }.toSeq
      // literal-first flips
      case GreaterThan(Literal(v, _), a) =>
        attrOf(a).zip(toB(v)).map { case (c, b) => one(c, None, Some(b)) }.toSeq
      case GreaterThanOrEqual(Literal(v, _), a) =>
        attrOf(a).zip(toB(v)).map { case (c, b) => one(c, None, Some(b)) }.toSeq
      case LessThan(Literal(v, _), a) =>
        attrOf(a).zip(toB(v)).map { case (c, b) => one(c, Some(b), None) }.toSeq
      case LessThanOrEqual(Literal(v, _), a) =>
        attrOf(a).zip(toB(v)).map { case (c, b) => one(c, Some(b), None) }.toSeq
      case EqualTo(Literal(v, _), a) =>
        attrOf(a).zip(toB(v)).map { case (c, b) => one(c, Some(b), Some(b)) }.toSeq
      case EqualNullSafe(a, Literal(v, _)) if v != null =>
        attrOf(a).zip(toB(v)).map { case (c, b) => one(c, Some(b), Some(b)) }.toSeq
      case EqualNullSafe(Literal(v, _), a) if v != null =>
        attrOf(a).zip(toB(v)).map { case (c, b) => one(c, Some(b), Some(b)) }.toSeq
      // a <=> NULL is EXACTLY a IS NULL — zero-null units cannot
      // serve it (same NeedsNull rule; count-less tables keep)
      case EqualNullSafe(a, Literal(null, _)) =>
        attrOf(a).toSeq.map(c => NeedsNull(c): Req)
      case EqualNullSafe(Literal(null, _), a) =>
        attrOf(a).toSeq.map(c => NeedsNull(c): Req)
      // IN-lists prune per VALUE up to a size cap (one point interval
      // per member - a chunk lying BETWEEN two sparse members drops);
      // above the cap the value hull bounds them (wider, still sound)
      case In(a, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        inIntervals(a, list.map(_.asInstanceOf[Literal].value))
      case InSet(a, hset) if hset.nonEmpty =>
        inIntervals(a, hset.toSeq)
      // prefix predicates (col LIKE 'p%' pushes as StartsWith): every
      // matching string sits in [p, upper(p)) under UTF8 binary order,
      // where upper(p) increments p's last non-0xFF byte and drops the
      // tail - the classic footer-stats skip for date-formatted keys
      // and id prefixes. The closed-interval test only widens the
      // half-open truth; an all-0xFF prefix keeps just the lower bound.
      case StartsWith(a, Literal(v, _)) if v != null =>
        attrOf(a).toSeq.map { c =>
          val p = v.asInstanceOf[UTF8String]
          one(c, Some(ZBound.Str(p)),
            prefixUpper(p).map(u => ZBound.Str(u): ZBound))
        }
      // a bare IsNotNull conjunct (Catalyst emits one for every null-
      // intolerant filter, and users write them directly) rejects every
      // row of a chunk whose envelope records the column ALL-NULL -
      // exactly what the unbounded interval drops against a
      // (None, None) envelope
      case IsNotNull(a) =>
        attrOf(a).toSeq.map(c => one(c, None, None))
      // IS NULL admits only rows that ARE null: a unit whose null
      // count records ZERO nulls cannot serve it. Count-less zone
      // tables keep everything (the missing-stat rule).
      case IsNull(a) =>
        attrOf(a).toSeq.map(c => NeedsNull(c): Req)
      // NOT of a recognized child prunes by the EXACT complement —
      // open-endpoint intervals, so NOT BETWEEN drops the inside
      // chunks and NOT IN prunes by the gaps between its points.
      // NOT is null-rejecting exactly like the ranges it complements
      // (NOT(NULL cmp v) = NULL -> row rejected), so emitting Ranges
      // is sound for all-NULL units too. An unrecognized child
      // contributes nothing (unit kept).
      case Not(child) => negConjuncts(child)
      // OR by the per-column UNION of arm interval SETS - orCombine.
      // Nested Ors recurse.
      case Or(l, r) => orCombine(rangeConjuncts(l), rangeConjuncts(r))
      case _ => Seq.empty
    }

  /** Constraints implied by `NOT e` — the exact complement of each
    * recognized leaf (complementing the WIDENED form would be
    * unsound, so every case here derives from the leaf's true
    * semantics), De Morgan through And/Or, double negation back to
    * [[rangeConjuncts]]. Anything unrecognized contributes nothing. */
  private def negConjuncts(e: Expression): Seq[Req] =
    e match {
      case Not(x) => rangeConjuncts(x)
      // ¬(l ∨ r) = ¬l ∧ ¬r; ¬(l ∧ r) = ¬l ∨ ¬r (an arm whose negation
      // is unrecognized yields no ranges, and orCombine's both-arms
      // rule then keeps everything — conservative)
      case Or(l, r) => negConjuncts(l) ++ negConjuncts(r)
      case And(l, r) => orCombine(negConjuncts(l), negConjuncts(r))
      case IsNull(a) => // ¬(a IS NULL) = a IS NOT NULL
        attrOf(a).toSeq.map(c => one(c, None, None))
      case IsNotNull(a) => // ¬(a IS NOT NULL) = a IS NULL
        attrOf(a).toSeq.map(c => NeedsNull(c): Req)
      // ¬(a <=> NULL) is EXACTLY a IS NOT NULL (false for null rows,
      // true otherwise) — the unbounded range drops all-NULL chunks.
      // ¬(a <=> v) for non-null v stays UNRECOGNIZED: its truth
      // includes NULL rows, which Ranges' null-rejecting contract
      // cannot represent.
      case EqualNullSafe(a, Literal(null, _)) =>
        attrOf(a).toSeq.map(c => one(c, None, None))
      case EqualNullSafe(Literal(null, _), a) =>
        attrOf(a).toSeq.map(c => one(c, None, None))
      // comparison complements: ¬(a > v) = a <= v, ¬(a >= v) = a < v
      // (open), etc — attribute-first forms
      case GreaterThan(a, Literal(v, _)) =>
        attrOf(a).zip(toB(v)).map { case (c, b) =>
          Ranges(c, Seq(Iv(None, loOpen = false, Some(b), hiOpen = false))): Req }.toSeq
      case GreaterThanOrEqual(a, Literal(v, _)) =>
        attrOf(a).zip(toB(v)).map { case (c, b) =>
          Ranges(c, Seq(Iv(None, loOpen = false, Some(b), hiOpen = true))): Req }.toSeq
      case LessThan(a, Literal(v, _)) =>
        attrOf(a).zip(toB(v)).map { case (c, b) =>
          Ranges(c, Seq(Iv(Some(b), loOpen = false, None, hiOpen = false))): Req }.toSeq
      case LessThanOrEqual(a, Literal(v, _)) =>
        attrOf(a).zip(toB(v)).map { case (c, b) =>
          Ranges(c, Seq(Iv(Some(b), loOpen = true, None, hiOpen = false))): Req }.toSeq
      // literal-first flips: ¬(v > a) = ¬(a < v) = a >= v, etc
      case GreaterThan(Literal(v, _), a) =>
        attrOf(a).zip(toB(v)).map { case (c, b) =>
          Ranges(c, Seq(Iv(Some(b), loOpen = false, None, hiOpen = false))): Req }.toSeq
      case GreaterThanOrEqual(Literal(v, _), a) =>
        attrOf(a).zip(toB(v)).map { case (c, b) =>
          Ranges(c, Seq(Iv(Some(b), loOpen = true, None, hiOpen = false))): Req }.toSeq
      case LessThan(Literal(v, _), a) =>
        attrOf(a).zip(toB(v)).map { case (c, b) =>
          Ranges(c, Seq(Iv(None, loOpen = false, Some(b), hiOpen = false))): Req }.toSeq
      case LessThanOrEqual(Literal(v, _), a) =>
        attrOf(a).zip(toB(v)).map { case (c, b) =>
          Ranges(c, Seq(Iv(None, loOpen = false, Some(b), hiOpen = true))): Req }.toSeq
      // ¬(a = v) = a < v ∨ a > v — two open-ended intervals; the
      // single-value chunk holding only v drops
      case EqualTo(a, Literal(v, _)) => neqIntervals(a, v)
      case EqualTo(Literal(v, _), a) => neqIntervals(a, v)
      // NOT IN: the gaps between the sorted member points (all open
      // endpoints). Cap-bounded: above the IN cap the complement's
      // hull is the whole line - no constraint.
      case In(a, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        notInIntervals(a, list.map(_.asInstanceOf[Literal].value))
      case InSet(a, hset) if hset.nonEmpty =>
        notInIntervals(a, hset.toSeq)
      // ¬(s LIKE 'p%'): s < p (no string with prefix p sorts below p)
      // or s >= upper(p); an all-0xFF prefix keeps just the low arm
      case StartsWith(a, Literal(v, _)) if v != null =>
        attrOf(a).toSeq.map { c =>
          val p = v.asInstanceOf[UTF8String]
          val below = Iv(None, loOpen = false, Some(ZBound.Str(p)), hiOpen = true)
          val above = prefixUpper(p).map(u =>
            Iv(Some(ZBound.Str(u)), loOpen = false, None, hiOpen = false))
          Ranges(c, below +: above.toSeq): Req
        }
      case _ => Seq.empty
    }

  private def neqIntervals(a: Expression, v: Any): Seq[Req] =
    attrOf(a).zip(toB(v)).map { case (c, b) =>
      Ranges(c, Seq(
        Iv(None, loOpen = false, Some(b), hiOpen = true),
        Iv(Some(b), loOpen = true, None, hiOpen = false))): Req
    }.toSeq

  /** Point intervals of an IN-list's values - empty-handed (no
    * constraint) unless EVERY value converts to ONE comparable kind (a
    * single unconvertible or cross-kind member voids the constraint,
    * never tightens it); hull fallback above the size cap, where the
    * per-chunk membership walk would start to cost more than the scan
    * it saves. */
  private val inListCap = 64
  /** The IN-list's values as ONE comparable sorted kind; None when any
    * member is unconvertible or cross-kind (the folds would be
    * order-dependent — void the constraint, never tighten it). */
  private def comparableSorted(vs: Seq[Any]): Option[Seq[ZBound]] = {
    val bs = vs.map(toB)
    if (bs.exists(_.isEmpty)) None
    else {
      val all = bs.flatten.distinct
      if (all.isEmpty) Some(Seq.empty)
      else {
        val lo = all.reduceLeft((x, y) => minB(x, y).getOrElse(x))
        val hi = all.reduceLeft((x, y) => maxB(x, y).getOrElse(x))
        if (all.exists(v => v.cmp(lo).isEmpty || v.cmp(hi).isEmpty)) None
        else Some(all.sortWith((x, y) => x.cmp(y).exists(_ < 0)))
      }
    }
  }
  private def inIntervals(a: Expression, vs: Seq[Any]): Seq[Req] =
    attrOf(a).toSeq.flatMap { c =>
      comparableSorted(vs) match {
        case None => Seq.empty
        case Some(all) if all.isEmpty => Seq.empty
        case Some(all) if all.size <= inListCap =>
          Seq(Ranges(c, all.map(v => closedIv(Some(v), Some(v)))))
        case Some(all) =>
          Seq(one(c, Some(all.head), Some(all.last)))
      }
    }
  private def notInIntervals(a: Expression, vs: Seq[Any]): Seq[Req] =
    attrOf(a).toSeq.flatMap { c =>
      comparableSorted(vs) match {
        case Some(all) if all.nonEmpty && all.size <= inListCap =>
          val below = Iv(None, loOpen = false, Some(all.head), hiOpen = true)
          val above = Iv(Some(all.last), loOpen = true, None, hiOpen = false)
          val gaps = all.zip(all.tail).map { case (l, h) =>
            Iv(Some(l), loOpen = true, Some(h), hiOpen = true) }
          Seq(Ranges(c, (below +: gaps) :+ above))
        case _ => Seq.empty // unconvertible, or the complement hull is everything
      }
    }

  /** BLOOM-probe constraints implied by `e` — a SEPARATE, stricter
    * walk than [[rangeConjuncts]]: only top-level And-conjuncts, only
    * positive equality/IN leaves, only BARE (cast-free) attributes or
    * struct-leaf chains. The literal's hash is computed by EVALUATING
    * the same `XxHash64` Catalyst expression the bloom build side runs
    * (`xxhash64(col)` — seed 42), so hash identity holds by
    * construction; after type coercion the literal's type equals the
    * column's, which is exactly why casts are excluded (a cast means
    * the literal's hash input differs from the stored values').
    * Negations and Or-arms contribute nothing: membership evidence
    * cannot complement, and a disjunct would need per-arm tracking the
    * interval machinery already covers for ranges. */
  private def bloomConjuncts(e: Expression): Seq[Req] = {
    def bare(x: Expression): Option[String] = x match {
      case _: Cast => None
      case other => attrOf(other)
    }
    def hashOf(l: Literal): Option[Long] =
      if (l.value == null) None
      else scala.util.Try(
        XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long]).toOption
    def point(x: Expression, l: Literal): Seq[Req] =
      bare(x).toSeq.flatMap(c => hashOf(l).map(h => MustContain(c, Seq(h)): Req))
    e match {
      case And(l, r) => bloomConjuncts(l) ++ bloomConjuncts(r)
      case EqualTo(x, l: Literal) => point(x, l)
      case EqualTo(l: Literal, x) => point(x, l)
      case EqualNullSafe(x, l: Literal) if l.value != null => point(x, l)
      case EqualNullSafe(l: Literal, x) if l.value != null => point(x, l)
      case In(x, list) if list.nonEmpty && list.size <= inListCap &&
          list.forall(_.isInstanceOf[Literal]) =>
        bare(x).toSeq.flatMap { c =>
          val hs = list.collect { case l: Literal => hashOf(l) }.flatten
          if (hs.isEmpty) Seq.empty else Seq(MustContain(c, hs): Req)
        }
      case InSet(x, hset) if hset.nonEmpty && hset.size <= inListCap =>
        bare(x).toSeq.flatMap { c =>
          val dt = x.dataType
          val hs = hset.toSeq.filter(_ != null)
            .flatMap(v => scala.util.Try(
              XxHash64(Seq(Literal.create(v, dt)), 42L).eval(null)
                .asInstanceOf[Long]).toOption)
          if (hs.isEmpty) Seq.empty else Seq(MustContain(c, hs): Req)
        }
      case _ => Seq.empty
    }
  }

  /** Does a unit with stats `envOpt` possibly satisfy every
    * constraint? Missing stats (`envOpt` None) -> yes. */
  private def survives(envOpt: Option[ZoneMapFileIndex.ColEnv],
                       reqs: Seq[Req]): Boolean =
    envOpt match {
      case None => true // no zone row for this unit: never prune it
      case Some(env) => reqs.forall {
        case Ranges(c, ivs) => env.get(c) match {
          case None => true // column not zone-mapped: constrains nothing
          case Some(st) =>
            // all-NULL column: every interval admits only non-NULL rows
            if (st.mn.isEmpty || st.mx.isEmpty) false
            else ivs.exists { iv =>
              val loOk = iv.lo.forall(l => st.mx.get.cmp(l) match {
                case Some(cp) => if (iv.loOpen) cp > 0 else cp >= 0
                case None => true // incomparable: keep
              })
              val hiOk = iv.hi.forall(h => st.mn.get.cmp(h) match {
                case Some(cp) => if (iv.hiOpen) cp < 0 else cp <= 0
                case None => true
              })
              loOk && hiOk
            }
        }
        case NeedsNull(c) => env.get(c) match {
          case None => true
          // zero recorded nulls: no row of this unit is NULL there.
          // Any other state (positive count, or no count collected)
          // keeps — the missing-stat rule.
          case Some(st) => !st.nullCount.contains(0L)
        }
        case MustContain(c, hs) => env.get(c) match {
          case None => true // column not zone-mapped: constrains nothing
          // no bloom collected: keep (the range/envelope Reqs for the
          // same conjunct still apply independently). With a bloom:
          // "every probed hash definitively absent" is a sound drop —
          // blooms have no false negatives.
          case Some(st) => st.bloom.forall(bf => hs.exists(bf.mightContainLong))
        }
      }
    }

  override def rootPaths: Seq[Path] = inner.rootPaths

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val reqs = dataFilters.flatMap(rangeConjuncts) ++
      dataFilters.flatMap(bloomConjuncts)
    val listed = inner.listFiles(partitionFilters, dataFilters)
    if (reqs.isEmpty) listed
    else {
      val dirKept = chunkIdx match {
        case None => listed
        case Some(ci) => listed.filter { pd =>
          // a NULL partition value is a chunk the zone table cannot
          // address — keep it, exactly like a missing zone row
          pd.values.isNullAt(ci) ||
            survives(envelopes.get(pd.values.getUTF8String(ci).toString), reqs)
        }
      }
      if (fileEnvelopes.isEmpty) dirKept
      else dirKept.map { pd =>
        pd.copy(files = pd.files.filter(f =>
          survives(fileEnvelopes.get(
            ZoneMapFileIndex.pathKey(f.getPath.toString)), reqs)))
      }
    }
  }

  override def inputFiles: Array[String] = inner.inputFiles
  override def refresh(): Unit = throw new UnsupportedOperationException(
    "TransparentZoneMapFileIndex is snapshot-bound: its envelopes were " +
      "collected against the file set at construction, and re-listing under " +
      "frozen envelopes could drop rows an append added past a stale-tight " +
      "bound. Construct a fresh reader from the latest zone snapshot instead.")
  override def sizeInBytes: Long = inner.sizeInBytes
  override def partitionSchema: StructType = inner.partitionSchema
}
