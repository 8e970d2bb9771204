package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan locality — the write-side
  * optimization that makes 100 TB reads cheap. Sorting a table by
  * (x, y) lexicographically clusters x only: each output file covers a
  * thin x-range but the FULL y domain, so a y-predicate prunes
  * nothing. A Morton (Z-order) key interleaves the bits of both
  * dimensions, so consecutive key ranges cover near-square blocks of
  * the (x, y) plane — every file's min/max footer envelope is tight in
  * BOTH dimensions and either predicate prunes files (the
  * Delta/Iceberg `ZORDER BY` semantic, built here from plain
  * shift/mask arithmetic).
  *
  * Everything is codegen'd built-in bit arithmetic (shiftleft / & / |)
  * — no UDF, no custom expression needed — and the same shift/mask
  * ladder is spelled in ANSI SQL by the q52 oracle, so key values are
  * engine-exact integers.
  */
object Layout {

  /** Bits of the low 16 bits of `c` spread to the even positions of a
    * 32-bit value — the standard interleave ladder ((x | x<<8) & m8,
    * then 4/2/1). */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit coordinates: x in the even bit
    * positions, y in the odd. Callers quantize wider domains down to
    * 16 bits first (`% 65536`, or a range-rank for non-integer
    * columns) — locality needs only the high-order structure. */
  def mortonKey(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Range-partition `df` into `numFiles` output partitions by the
    * Morton key of (`xCol`, `yCol`) and sort within each — the
    * write-side shape whose parquet files carry tight min/max
    * envelopes in BOTH dimensions. One skew-aware range exchange
    * (sampled bounds, the same machinery as a global sort) + an
    * in-partition sort; no global sort barrier. */
  def clusterByMorton(df: DataFrame, xCol: String, yCol: String,
                      numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1 (got $numFiles)")
    df.withColumn("_zkey", mortonKey(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
  }
}
