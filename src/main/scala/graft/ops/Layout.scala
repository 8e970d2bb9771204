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

  /** HILBERT curve key of two `order`-bit coordinates — the
    * space-filling curve whose consecutive key ranges are CONNECTED
    * blocks (Morton's Z jumps across the plane at every quadrant
    * seam, so a key range can span two far-apart stripes; Hilbert
    * ranks strictly better on range-scan locality and is what large
    * tables cluster by when scan ranges matter more than key
    * arithmetic).
    *
    * Unlike [[mortonKey]]'s shift/mask ladder, the xy2d walk is
    * inherently SEQUENTIAL per bit level (each level rotates the
    * frame the next level reads), so as Column arithmetic it needs
    * `order` chained projections — measured ~2 s of Janino compile
    * tax per fresh plan at order 16. It is therefore a NATIVE kernel
    * ([[graft.functions.LayoutExprs.hilbert_key]]): one codegen'd JVM
    * loop per row, free to plan; the q75 oracle replays the identical
    * walk as an unrolled SQL CTE ladder — engine-exact integers.
    * Coordinates are masked to `order` bits inside the kernel. */
  def hilbertKey(x: Column, y: Column, order: Int = 16): Column =
    graft.functions.LayoutExprs.hilbert_key(
      x.cast("long"), y.cast("long"), order)

  /** [[clusterByMorton]] with the Hilbert key — same one-exchange
    * write shape, tighter range-scan locality. */
  def clusterByHilbert(df: DataFrame, xCol: String, yCol: String,
                       numFiles: Int, order: Int = 16): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1 (got $numFiles)")
    df.withColumn("_hkey", hilbertKey(col(xCol), col(yCol), order))
      .repartitionByRange(numFiles, col("_hkey"))
      .sortWithinPartitions("_hkey")
      .drop("_hkey")
  }
}
