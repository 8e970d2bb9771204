package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle the
  * driver hash-compares against. Column names/aliases must match the
  * oracle exactly — the compare sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Exact money-sum: both Spark and DuckDB sum DECIMAL(18,6) exactly
    * (no float reassociation), then cast to double — bit-identical
    * results regardless of partitioning / aggregation order.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** 60-bit portable hash: first 15 hex chars of sha256. DuckDB side:
    * CAST('0x' || substr(sha256(x),1,15) AS BIGINT). Identical values in
    * both engines — the basis for MinHash/SimHash/fingerprint oracles.
    */
  def sha60(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")
}
