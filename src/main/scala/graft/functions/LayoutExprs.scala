package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Space-filling-curve keys for data layout ([[graft.ops.Layout]]).
  * Morton needs only shift/mask ladders and stays plain built-in
  * arithmetic; the Hilbert walk is inherently SEQUENTIAL per bit
  * level (each level rotates/reflects the frame the next level reads),
  * so as Column arithmetic it needs `order` chained projections —
  * measured ~2 s of Janino compile tax per fresh plan at order 16 —
  * while as a native kernel it is one tight JVM loop per row, free to
  * plan and faster to run. Same discipline as the other native
  * kernels: real `doGenCode`, interpreted fallback, SQL-text
  * registration via [[graft.GraftExtensions]]. */
object LayoutExprs {

  /** `hilbert_key(x, y)` at `order` bit levels (default 16): the
    * Hilbert d-index of the point (x mod 2^order, y mod 2^order) —
    * exact integers, replayable in ANSI SQL as the unrolled
    * rotate/reflect CTE ladder (the q75 oracle). */
  def hilbert_key(x: Column, y: Column, order: Int = 16): Column =
    ColumnBridge.column(HilbertKey(
      ColumnBridge.expression(x), ColumnBridge.expression(y), order))
}

/** The textbook xy2d bit-level walk — one static entry point shared by
  * interpreted eval and generated code. */
object HilbertWalk {
  def key(x0: Long, y0: Long, order: Int): Long = {
    val mask = (1L << order) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate/reflect the frame, then swap axes
        val nx = if (rx == 1) s - 1 - y else y
        val ny = if (rx == 1) s - 1 - x else x
        x = nx
        y = ny
      }
      s >>= 1
    }
    d
  }
}

case class HilbertKey(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31, s"order must be in 1..31 (got $order)")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_key expects (bigint, bigint), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertWalk.key(x.asInstanceOf[Long], y.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.HilbertWalk.key($x, $y, $order);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}
