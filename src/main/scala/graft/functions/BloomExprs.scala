package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column wrappers over Spark's OWN bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime row-level join filtering, catalyst-internal but
  * shipped in every distro). Exposed here for the bloom-GATED dedup
  * path ([[graft.ops.CorpusOps.bloomIncrementalDedup]]): build one
  * broadcast-sized sketch over the corpus key set with a map-side-
  * combined aggregate, then prune a batch row-locally with
  * `might_contain` before any join is paid.
  *
  * The aggregate is partial-combinable (per-partition blooms OR
  * together), so the corpus pass shuffles exactly one sketch per
  * partition — never the key set.
  */
object BloomExprs {

  /** Bloom sketch over a LONG column (pre-hash with `xxhash64`).
    * `estimatedItems` sizes the filter (Spark derives bits as
    * items × 8, capped by its aggregate defaults). */
  def bloom_filter_agg(value: Column, estimatedItems: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(value), Literal(estimatedItems))
        .toAggregateExpression())

  /** True iff `value` (LONG, same pre-hash as the build side) MIGHT be
    * in the sketch — no false negatives, so a `false` is definitive. */
  def might_contain(bloom: Column, value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(value)))

  /** OR-union of two serialized bloom sketches — the MERGE arm the
    * incremental zone-map maintainer needs ([[bloom_filter_agg]] can
    * aggregate raw values but cannot combine two already-built
    * sketches in SQL). Both inputs must come from builds with the SAME
    * `estimatedItems` (same bit width + hash count — Spark's
    * `mergeInPlace` throws loudly on a mismatch, never silently
    * degrades), and then the union's BITS equal a from-scratch build
    * over the combined value set (OR of set bits == bits of union
    * inserts), so maintained == rebuilt holds bit-for-bit
    * (TableOpsSpec pins it). Interpreted eval only (CodegenFallback):
    * this runs once per (key, batch) in metadata-sized maintenance
    * aggregates, never in a row-wise hot path. */
  def bloom_union(a: Column, b: Column): Column =
    ColumnBridge.column(BloomUnion(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** See [[BloomExprs.bloom_union]]. */
final case class BloomUnion(left: org.apache.spark.sql.catalyst.expressions.Expression,
                            right: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{BinaryType, DataType}

  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_union expects two BINARY sketches, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val b1 = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(a.asInstanceOf[Array[Byte]]))
    val b2 = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(b.asInstanceOf[Array[Byte]]))
    b1.mergeInPlace(b2) // throws IncompatibleMergeException on mismatch
    val out = new java.io.ByteArrayOutputStream()
    b1.writeTo(out)
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): BloomUnion =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_union"
}
