package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.model.Ulid

/** `ulid()` — native Catalyst expression generating per-partition
  * strictly-monotonic ULIDs (SURVEY.md §2A-2: the reference's
  * per-producer monotonic assignment, `KinesisMessiProducer.java:32-33,
  * 68-80`, becomes per-partition monotonic — the same guarantee Kinesis
  * gives per shard). Marked nondeterministic so Catalyst never
  * collapses, reorders, or re-executes it past a shuffle boundary —
  * the same contract as Spark's own `Uuid`/`MonotonicallyIncreasingID`.
  *
  * Returns struct<msb: bigint, lsb: bigint> (the wire layout, §1.2).
  */
case class UlidExpression(seed: Long) extends LeafExpression with Nondeterministic
    with CodegenFallback {

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("msb", LongType, nullable = false),
    StructField("lsb", LongType, nullable = false)))

  @transient private var rnd: java.util.Random = _
  @transient private var prev: Ulid = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    rnd = new java.util.Random(seed ^ (partitionIndex.toLong * 0x9e3779b97f4a7c15L))
    prev = null
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val u = Ulid.nextMonotonic(prev, System.currentTimeMillis(), rnd)
    prev = u
    InternalRow(u.msb, u.lsb)
  }

  override def prettyName: String = "ulid"
}

/** `ulid_timestamp(msb)` — extract the 48-bit millisecond timestamp as
  * a TIMESTAMP. Deterministic, codegen-fallback scalar.
  */
case class UlidTimestamp(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = TimestampType
  override def nullSafeEval(msb: Any): Any =
    (msb.asInstanceOf[Long] >>> 16) * 1000L // epoch millis -> micros
  override protected def withNewChildInternal(newChild: Expression): UlidTimestamp =
    copy(child = newChild)
  override def prettyName: String = "ulid_timestamp"
}

object UlidExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column helpers. */
  def ulid(seed: Long = 42L): Column = ColumnBridge.column(UlidExpression(seed))
  def ulid_timestamp(msb: Column): Column =
    ColumnBridge.column(UlidTimestamp(ColumnBridge.expression(msb)))

  /** Shared SQL builder: zero args -> default seed; an integer LITERAL
    * seed is widened; anything non-foldable is rejected (a column seed
    * would silently freeze one value per query otherwise). Used by both
    * the temp-function registration below and [[graft.GraftExtensions]].
    */
  def ulidBuilder(exprs: Seq[Expression]): Expression = {
    if (exprs.length > 1) throw new IllegalArgumentException(
      s"ulid expects 0 or 1 arguments (optional integer seed), got ${exprs.length}")
    UlidExpression(if (exprs.isEmpty) 42L else exprs.head match {
      case e if e.foldable => e.eval(null) match {
        case i: java.lang.Integer => i.longValue
        case l: java.lang.Long => l.longValue
        case other => throw new IllegalArgumentException(
          s"ulid(seed) expects an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "ulid(seed) expects a literal seed")
    })
  }

  /** SQL registration: `SELECT ulid(), ulid_timestamp(u.msb) ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ulid", ulidBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ulid_timestamp", exprs => {
        graft.GraftExtensions.arity("ulid_timestamp", 1, exprs)
        UlidTimestamp(exprs.head)
      }, "built-in")
  }
}
