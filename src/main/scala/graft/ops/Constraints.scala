package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY constraint checking (the Deequ/
  * great-expectations shape): a constraint suite over a table compiles
  * to ONE fused aggregate pass — however many constraints, the fact is
  * scanned once and every violation count is a partial-aggregatable
  * conditional sum — plus one anti-join per referential constraint.
  * The gate a 100 TB ingest runs BEFORE publishing a partition: all
  * exact integer counts, so verdicts replay bit-for-bit in any engine.
  */
object Constraints {

  sealed trait Constraint { def name: String }

  /** No NULLs in `c`. */
  final case class NotNull(c: String) extends Constraint {
    def name = s"not_null($c)"
  }

  /** Every value of `c` (NULL included) drawn from `vs`. */
  final case class InSet(c: String, vs: Seq[String]) extends Constraint {
    def name = s"in_set($c)"
  }

  /** `c` (non-NULL) within [lo, hi]. */
  final case class Bounded(c: String, lo: Double, hi: Double) extends Constraint {
    def name = s"bounded($c)"
  }

  /** `cs` is a key: violations = n_rows − n_distinct(cs), where the
    * distinct count SKIPS NULL-bearing tuples (Spark `countDistinct`
    * semantics) — so every row with a NULL in any key column counts
    * as a violation (a NULL can't identify a row; this matches the
    * NOT NULL half of a PRIMARY KEY). A SQL oracle must spell the
    * same NULL-skipping distinct explicitly —
    * `count(DISTINCT CASE WHEN a IS NOT NULL AND b IS NOT NULL
    * THEN (a, b) END)` — because a bare `count(DISTINCT (a, b))`
    * counts a struct CONTAINING NULLs as one distinct value and
    * diverges on NULL-keyed data (see the q101 oracle). */
  final case class Unique(cs: Seq[String]) extends Constraint {
    def name = s"unique(${cs.mkString(",")})"
  }

  private def violations(c: Constraint): Column = c match {
    case NotNull(col0) =>
      coalesce(sum(when(col(col0).isNull, 1L).otherwise(0L)), lit(0L))
    case InSet(col0, vs) =>
      coalesce(sum(when(col(col0).isNull || !col(col0).isin(vs: _*), 1L)
        .otherwise(0L)), lit(0L))
    case Bounded(col0, lo, hi) =>
      coalesce(sum(when(col(col0).isNull || col(col0) < lo || col(col0) > hi, 1L)
        .otherwise(0L)), lit(0L))
    case Unique(cs) =>
      count(lit(1)) - countDistinct(cs.head, cs.tail: _*)
  }

  /** Run a suite over one table: (constraint, n_violations, pass) —
    * ONE fused aggregate (each [[Unique]] adds a distinct aggregate to
    * the same pass; Spark plans multi-distinct through one Expand),
    * then a row-local explode of the 1-row result into the verdict
    * table. */
  def check(df: DataFrame, cs: Seq[Constraint]): DataFrame = {
    require(cs.nonEmpty, "empty constraint suite")
    val aggs = cs.zipWithIndex.map { case (c, i) => violations(c).as(s"_v$i") }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cs.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("constraint"), col(s"_v$i").as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.constraint").as("constraint"),
        col("r.n_violations").as("n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
  }

  /** Referential integrity: rows of `df` whose `cols` tuple has no
    * match in `ref(refCols)` (NULL keys count as orphans — a NULL FK
    * matches nothing). One left_anti join; the ref side projects to
    * its key columns, so size-estimation broadcasts dimension-sized
    * refs. Returns the same (constraint, n_violations, pass) row. */
  def checkForeignKey(df: DataFrame, cols: Seq[String],
                      ref: DataFrame, refCols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.length == refCols.length,
      "FK column lists must be non-empty and same-length")
    val r = ref.select(refCols.zip(cols).map { case (rc, c) => col(rc).as(c) }: _*)
      .distinct()
    df.select(cols.map(col): _*).join(r, cols, "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(
        lit(s"foreign_key(${cols.mkString(",")})").as("constraint"),
        col("n_violations"), (col("n_violations") === 0L).as("pass"))
  }
}
