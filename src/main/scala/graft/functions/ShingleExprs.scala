package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_sha60(text)` — the near-dup scan kernel: DISTINCT 60-bit
  * sha-256 prefix hashes of the word-3-gram shingles of `text`, in one
  * native pass. Replaces the interpreted HOF chain
  * `split → transform(sequence) → concat_ws → array_distinct →
  * explode → sha2 → conv` that previously materialized a string array
  * per row before hashing.
  *
  * Semantics are EXACTLY the composed built-ins (so the DuckDB oracles
  * are untouched):
  *  - words = split on single spaces, trailing empties kept
  *    (Spark `split(text, " ")` regex semantics, limit -1);
  *  - >= 3 words → 3-grams joined with one space; fewer → the whole
  *    raw text as the single shingle;
  *  - hash = first 15 hex chars of sha256 (== top 60 bits of the first
  *    8 digest bytes), the portable sha-60 both engines share;
  *  - distinct at the hash level (matches the oracle's DISTINCT over
  *    hashed shingles).
  */
object ShingleHashes {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-256")
  }

  private[functions] def h60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4 // top 60 bits == first 15 hex chars parsed base 16
  }

  /** Positional variant for span-level exact dedup: the hash of EVERY
    * gram start in position order, duplicates preserved (ownership and
    * cover tests are positional), empty array when the doc has fewer
    * than `n` words. Same 60-bit sha60 as [[compute]], so SQL oracles
    * replay it as first-15-hex-of-sha256. */
  def computePositional(text: UTF8String, n: Int): ArrayData = {
    val md = digest.get()
    val ws = text.toString.split(" ", -1)
    if (ws.length < n) return ArrayData.toArrayData(Array.emptyLongArray)
    val out = new Array[Long](ws.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= ws.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      out(i) = h60(md, sb.toString)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Called from both interpreted eval and generated code. `n` is the
    * gram width (3 for near-dup shingles, 8 for decontamination). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val md = digest.get()
    val ws = text.toString.split(" ", -1)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (ws.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= ws.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        out.add(h60(md, sb.toString))
        i += 1
      }
    } else out.add(h60(md, text.toString))
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    ArrayData.toArrayData(arr)
  }
}

case class ShingleSha60(child: Expression, n: Int = 3) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"shingle_sha60 gram width must be >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_sha60 expects a string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_sha60"

  override def nullSafeEval(s: Any): Any =
    ShingleHashes.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleSha60 =
    copy(child = newChild)
}

/** Positional word-gram sha-60 hashes — [[ShingleSha60]]'s ordered,
  * duplicate-preserving sibling (that one emits the DISTINCT hash set
  * for set-similarity; this one keeps position alignment for the
  * span-dedup cover test). */
case class GramSha60Pos(child: Expression, n: Int = 8) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"gram_sha60_pos gram width must be >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_sha60_pos expects a string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_sha60_pos"

  override def nullSafeEval(s: Any): Any =
    ShingleHashes.computePositional(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.computePositional($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): GramSha60Pos =
    copy(child = newChild)
}

object ShingleExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def shingle_sha60(text: Column, n: Int = 3): Column =
    ColumnBridge.column(ShingleSha60(ColumnBridge.expression(text), n))

  def gram_sha60_pos(text: Column, n: Int = 8): Column =
    ColumnBridge.column(GramSha60Pos(ColumnBridge.expression(text), n))

  def winnow_sketch(text: Column, k: Int = 3, w: Int = 4): Column =
    ColumnBridge.column(WinnowSketch(ColumnBridge.expression(text), k, w))
}

/** One-pass winnowing (MOSS) sketch kernel — the codegen upgrade the
  * HOF spelling's plan audit promised: POSITIONAL word-`k`-gram
  * sha-60 hashes, per-`w`-window rightmost-minimum selection,
  * distinct winners position-sorted. Bit-identical to the composed
  * HOF chain (split → positional transform/sha2 → windowed
  * rightmost-min aggregate → array_distinct → sort), pinned by
  * CrossCheckSpec's parity test; the DuckDB oracle replays the same
  * algorithm independently. Short docs (< k words) sketch the whole
  * text as one gram at position 0. */
object WinnowHashes {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-256")
  }

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val md = digest.get()
    val ws = text.toString.split(" ", -1)
    val m = if (ws.length >= k) ws.length - k + 1 else 1
    val hs = new Array[Long](m)
    if (ws.length >= k) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        hs(i) = ShingleHashes.h60(md, sb.toString)
        i += 1
      }
    } else hs(0) = ShingleHashes.h60(md, text.toString)
    // per window: min hash, ties -> rightmost position (the paper's rule)
    val winners = new java.util.TreeSet[Integer]()
    val nw = math.max(1, m - w + 1)
    var j = 0
    while (j < nw) {
      var best = j
      var i = j + 1
      val end = math.min(j + w, m)
      while (i < end) {
        if (hs(i) < hs(best) || (hs(i) == hs(best) && i > best)) best = i
        i += 1
      }
      winners.add(best)
      j += 1
    }
    val rows = new Array[Any](winners.size)
    val it = winners.iterator()
    var r = 0
    while (it.hasNext) {
      val p = it.next().intValue()
      rows(r) = org.apache.spark.sql.catalyst.InternalRow(p, hs(p))
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}

case class WinnowSketch(child: Expression, k: Int = 3, w: Int = 4) extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"winnow_sketch gram width and window must be >= 1, got (k=$k, w=$w)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_sketch expects a string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("p", IntegerType, nullable = false),
                   StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_sketch"

  override def nullSafeEval(s: Any): Any =
    WinnowHashes.compute(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowHashes.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowSketch =
    copy(child = newChild)
}
