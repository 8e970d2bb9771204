package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ShingleSha60, UlidExpression, UlidTimestamp, VecDot, VecNorm}

/** Session-extension entry point: registers the engine's native
  * Catalyst expressions into the function registry, so SQL text can
  * call them like built-ins:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT vec_dot(a.embedding, b.embedding) ...")
  * }}}
  *
  * The DataFrame-side Column helpers ([[graft.functions.VectorExprs]],
  * [[graft.functions.UlidExprs]]) work without this — extensions only
  * add the SQL-text path (and survive session cloning, unlike
  * `createOrReplaceTempFunction`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      exprs => VecNorm(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("ulid"),
      new ExpressionInfo(classOf[UlidExpression].getName, "ulid"),
      graft.functions.UlidExprs.ulidBuilder))
    ext.injectFunction((
      FunctionIdentifier("shingle_sha60"),
      new ExpressionInfo(classOf[ShingleSha60].getName, "shingle_sha60"),
      exprs => ShingleSha60(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("ulid_timestamp"),
      new ExpressionInfo(classOf[UlidTimestamp].getName, "ulid_timestamp"),
      exprs => UlidTimestamp(exprs.head)))
  }
}
