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
}
