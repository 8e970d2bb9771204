package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Row-local probe for Spark's own count-min sketch (the binary the
  * built-in `count_min_sketch(...)` aggregate emits — partial sketches
  * merge map-side, so a corpus pass shuffles one sketch per partition,
  * never the key stream). Spark ships the BUILD side as a SQL
  * aggregate but no probe expression; this is the probe, enabling the
  * sketch-gated heavy-hitter shape: estimate every occurrence
  * row-locally against a broadcast/folded sketch and drop the long
  * tail BEFORE any shuffle — CMS only ever over-estimates, so the
  * prune has NO false negatives and a downstream exact aggregate on
  * the survivors returns exactly the true heavy hitters (the
  * [[BloomExprs]] gating argument, with counts instead of membership).
  */
object CmsExprs {

  /** `cms_estimate(sketch, value)` — the sketch's count estimate for a
    * LONG value (pre-hash wider values, the bloom-path convention).
    * The sketch side must be CONSTANT at execution — a scalar subquery
    * (`Dataset.scalar()`) or literal, exactly like `might_contain`. */
  def cms_estimate(sketch: Column, value: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(value)))
}

/** Deserialize-once cache behind [[CmsEstimate]]: the sketch child is
  * a literal after Catalyst folds the scalar subquery, so every row of
  * a task evaluates it to the SAME byte-array reference. The cache is
  * per-THREAD (= per running task slot) with FOUR identity-keyed
  * entries in a ring: a task pays one parse per distinct sketch and
  * identity-hits afterwards — a SINGLE slot would thrash (re-parse a
  * multi-MB sketch per row per probe) the moment one projection
  * evaluates cms_estimate against two different sketches, which a
  * two-sketch comparison query legitimately does. Ring eviction keeps
  * total retention bounded by live task slots × 4 sketches — a global
  * map keyed on per-task array instances would instead pin every
  * task's sketch copy on the executor heap for the JVM lifetime.
  * Called from both interpreted and generated code; each thread owns
  * its ring, so no synchronization. */
object CmsProbe {
  private final val Entries = 4

  private final class Ring {
    private val keys = new Array[Array[Byte]](Entries)
    private val vals = new Array[CountMinSketch](Entries)
    private var next = 0
    def get(k: Array[Byte]): CountMinSketch = {
      var i = 0
      while (i < Entries) {
        if (keys(i) eq k) return vals(i)
        i += 1
      }
      val parsed = CountMinSketch.readFrom(k)
      keys(next) = k; vals(next) = parsed; next = (next + 1) % Entries
      parsed
    }
  }

  private val slot = ThreadLocal.withInitial[Ring](() => new Ring)

  def estimate(sketchBytes: Array[Byte], value: Long): Long =
    slot.get().get(sketchBytes).estimateCount(java.lang.Long.valueOf(value))
}

case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary sketch, long value), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sketch: Any, value: Any): Any =
    CmsProbe.estimate(sketch.asInstanceOf[Array[Byte]], value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, v) =>
      s"${ev.value} = graft.functions.CmsProbe.estimate($sk, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
