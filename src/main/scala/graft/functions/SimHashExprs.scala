package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `simhash_sig(hashes)` — the 60-bit SimHash signature of a doc's
  * distinct shingle-hash array in one native pass: bit i of the
  * signature is set iff more hashes have bit i set than clear
  * (strictly — ties clear the bit, matching the SQL `SUM(±1) > 0`
  * spelling on both engines). Replaces a corpus-sized explode +
  * groupBy with 60 conditional-SUM aggregates — a full shuffle of the
  * shingle table for what is per-doc bit counting.
  */
object SimHashes {
  val Bits = 60

  /** Called from both interpreted eval and generated code. */
  def compute(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val counts = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < Bits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull must be false: compute() reads slots with getLong
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects array<bigint> without nulls, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(a: Any): Any =
    SimHashes.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashes.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def simhash_sig(hashes: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(hashes)))
}
