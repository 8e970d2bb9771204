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

  /** CLUSTERING-HEALTH metric — the measured OPTIMIZE/recluster
    * trigger: given per-chunk key envelopes (one row per file/chunk,
    * CLOSED intervals [`mnCol`, `mxCol`]), how deeply do the
    * envelopes overlap? A perfectly clustered layout has depth 1
    * everywhere (each key point lives in one file, every predicate
    * prunes to one chunk); q103-style maintained zone maps LOOSEN
    * under appends, and once depth drifts a [[clusterByMorton]] /
    * [[clusterByHilbert]] rewrite re-tightens — this metric is the
    * number that says when.
    *
    * Computed as a boundary SWEEP, never a chunk × chunk interval
    * self-join (a 100 TB table at 1 GB files has 10⁵ chunks — the
    * join is 10¹⁰ pairs, the sweep 2·10⁵ events): each envelope
    * emits (+1 at mn, −1 at mx), events order by (pos, starts-first)
    * so touching closed intervals count as overlapping, and a running
    * sum reads the depth. Sampled at each chunk's START event:
    * depth(c) = number of chunks whose envelope covers c's mn,
    * c itself included. Returns ONE row of exact integers —
    * (n_chunks, sum_start_depth, max_depth); avg depth =
    * sum_start_depth / n_chunks, left undivided so the output is
    * engine-exact (sum and max are permutation-invariant under tied
    * positions, so the nondeterministic order among ties is
    * invisible). The window is a single global cumsum over the
    * metadata-sized event table — chunk-count-bounded, not
    * data-bounded. */
  def clusteringDepth(zones: DataFrame, mnCol: String, mxCol: String): DataFrame = {
    val ev = zones.select(explode(array(
        struct(col(mnCol).cast("long").as("pos"), lit(1).as("d")),
        struct(col(mxCol).cast("long").as("pos"), lit(-1).as("d")))).as("e"))
      .select(col("e.pos").as("pos"), col("e.d").as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pos").asc, col("d").desc)
      .rowsBetween(Long.MinValue, 0)
    ev.withColumn("depth", sum("d").over(w))
      .filter(col("d") === 1)
      .agg(count(lit(1)).as("n_chunks"),
        sum("depth").as("sum_start_depth"),
        max("depth").as("max_depth"))
  }
}
