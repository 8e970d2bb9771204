package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_sig(hashes)` — all 64 min-hash signature values from a
  * doc's distinct shingle-hash array in ONE native pass (inner loop:
  * 64 multiply-adds per hash, no allocation). Replaces 64 interpreted
  * `array_min(transform(...))` HOF passes (each materializing a fresh
  * array per doc per permutation), and before that a corpus-sized
  * explode + groupBy with 64 `min()` aggregates — a shuffle of every
  * (doc_id, h) row for what is per-doc arithmetic.
  *
  * The permutation family is the same one the query battery always
  * used: `((h mod P) * a_k + b_k) mod P` with LCG-derived constants —
  * signature values are bit-identical to both earlier spellings.
  */
object MinHashes {
  val NPERM = 64
  val P: Long = 1000000007L
  def permA(k: Int): Long = (1103515245L * k + 12345L) % P
  def permB(k: Int): Long = (69069L * k + 1L) % P
  private val A = Array.tabulate(NPERM)(permA)
  private val B = Array.tabulate(NPERM)(permB)

  /** Called from both interpreted eval and generated code. */
  def compute(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    val mins = Array.fill(NPERM)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = hashes.getLong(i) % P
      var k = 0
      while (k < NPERM) {
        val v = (hm * A(k) + B(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }
}

case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull must be false: compute() reads slots with getLong,
    // which would fold an undefined value from a null slot into the
    // minima instead of failing loudly
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint> without nulls, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any =
    MinHashes.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashes.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def minhash_sig(hashes: Column): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes)))
}
