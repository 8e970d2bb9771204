package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CmsEstimate, GramSha60Pos, HilbertKey, MinHashSig, ShingleSha60, SimHashSig, UlidExpression, UlidTimestamp, VecDot, VecL2Sq, VecNorm, WinnowSketch}

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
  import GraftExtensions.arity

  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in auto-skew rewrite (OFF unless spark.graft.autoSkew.enabled
    // AND a hot-key profile is registered — see graft.plans.AutoSkew)
    ext.injectOptimizerRule(session => graft.plans.AutoSkewRule(session))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      exprs => { arity("vec_dot", 2, exprs); VecDot(exprs(0), exprs(1)) }))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      exprs => { arity("vec_norm", 1, exprs); VecNorm(exprs.head) }))
    ext.injectFunction((
      FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[VecL2Sq].getName, "vec_l2sq"),
      exprs => { arity("vec_l2sq", 2, exprs); VecL2Sq(exprs(0), exprs(1)) }))
    ext.injectFunction((
      FunctionIdentifier("ulid"),
      new ExpressionInfo(classOf[UlidExpression].getName, "ulid"),
      graft.functions.UlidExprs.ulidBuilder))
    ext.injectFunction((
      FunctionIdentifier("shingle_sha60"),
      new ExpressionInfo(classOf[ShingleSha60].getName, "shingle_sha60"),
      exprs => exprs match {
        // 1-arg = 3-gram shingles; optional 2nd arg = constant gram
        // width at any integral width (SQL text integer literals can
        // parse as TINYINT..BIGINT, and an explicit CAST arrives here
        // unfolded — the builder runs before constant folding, so
        // accept any foldable integral expression and eval it)
        case Seq(text) => ShingleSha60(text)
        case Seq(text, width) if width.foldable && (width.dataType match {
              case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
                   org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
              case _ => false
            }) =>
          width.eval() match {
            case n: Number => ShingleSha60(text, java.lang.Math.toIntExact(n.longValue()))
            case _ => throw new IllegalArgumentException(
              s"shingle_sha60 gram width must be a non-null integer constant, got ${width.sql}")
          }
        case Seq(_, other) => throw new IllegalArgumentException(
          s"shingle_sha60 gram width must be an integer literal, got ${other.sql}")
        case _ => throw new IllegalArgumentException(
          s"shingle_sha60 expects (string) or (string, <int literal gram width>), got ${exprs.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      exprs => { arity("minhash_sig", 1, exprs); MinHashSig(exprs.head) }))
    ext.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      exprs => { arity("simhash_sig", 1, exprs); SimHashSig(exprs.head) }))
    ext.injectFunction((
      FunctionIdentifier("winnow_sketch"),
      new ExpressionInfo(classOf[WinnowSketch].getName, "winnow_sketch"),
      exprs => { arity("winnow_sketch", 1, exprs); WinnowSketch(exprs.head) }))
    ext.injectFunction((
      FunctionIdentifier("gram_sha60_pos"),
      new ExpressionInfo(classOf[GramSha60Pos].getName, "gram_sha60_pos"),
      exprs => exprs match {
        // same foldable-integral-width contract as shingle_sha60
        case Seq(text) => GramSha60Pos(text)
        case Seq(text, width) if width.foldable && (width.dataType match {
              case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
                   org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
              case _ => false
            }) =>
          width.eval() match {
            case n: Number => GramSha60Pos(text, java.lang.Math.toIntExact(n.longValue()))
            case _ => throw new IllegalArgumentException(
              s"gram_sha60_pos gram width must be a non-null integer constant, got ${width.sql}")
          }
        case Seq(_, other) => throw new IllegalArgumentException(
          s"gram_sha60_pos gram width must be an integer literal, got ${other.sql}")
        case _ => throw new IllegalArgumentException(
          s"gram_sha60_pos expects (string) or (string, <int literal gram width>), got ${exprs.length} args")
      }))
    ext.injectFunction((
      FunctionIdentifier("ulid_timestamp"),
      new ExpressionInfo(classOf[UlidTimestamp].getName, "ulid_timestamp"),
      exprs => { arity("ulid_timestamp", 1, exprs); UlidTimestamp(exprs.head) }))
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      exprs => { arity("cms_estimate", 2, exprs); CmsEstimate(exprs(0), exprs(1)) }))
    ext.injectFunction((
      FunctionIdentifier("hilbert_key"),
      new ExpressionInfo(classOf[HilbertKey].getName, "hilbert_key"),
      exprs => exprs match {
        // 2-arg = order 16; optional 3rd arg = constant bit order
        // (same foldable-integral contract as shingle_sha60)
        case Seq(x, y) => HilbertKey(x, y, 16)
        case Seq(x, y, ord) if ord.foldable && (ord.dataType match {
              case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
                   org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
              case _ => false
            }) =>
          ord.eval() match {
            case n: Number => HilbertKey(x, y, java.lang.Math.toIntExact(n.longValue()))
            case _ => throw new IllegalArgumentException(
              s"hilbert_key order must be a non-null integer constant, got ${ord.sql}")
          }
        case _ => throw new IllegalArgumentException(
          s"hilbert_key expects (bigint, bigint) or (bigint, bigint, <int literal order>), got ${exprs.length} args")
      }))
  }
}

object GraftExtensions {
  /** Wrong-arity SQL must fail analysis with a message naming the
    * function and expected count — not an IndexOutOfBoundsException
    * from the builder indexing into exprs. */
  private[graft] def arity(
      name: String, expected: Int,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Unit =
    if (exprs.length != expected)
      throw new IllegalArgumentException(
        s"$name expects $expected argument${if (expected == 1) "" else "s"}, got ${exprs.length}")
}
