package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Reference Morton interleave, bit-by-bit — the semantics the
    * column ladder must reproduce. */
  private def mortonRef(x: Int, y: Int): Long = {
    var acc = 0L
    for (i <- 0 until 16)
      acc |= (((x >> i) & 1).toLong << (2 * i)) |
             (((y >> i) & 1).toLong << (2 * i + 1))
    acc
  }

  test("mortonKey matches the bit-by-bit reference on deterministic pseudo-random pairs") {
    // 1000 pairs from a fixed LCG — covers low/high bits and both-ends
    // of the 16-bit domain without Math.random nondeterminism
    val pairs = Iterator.iterate(12345L)(s => (s * 6364136223846793005L + 1442695040888963407L))
      .take(1000)
      .map(s => (((s >>> 16) & 0xFFFF).toInt, ((s >>> 40) & 0xFFFF).toInt))
      .toSeq
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Layout.mortonKey(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y), s"mismatch at ($x, $y)")
    }
  }

  test("clusterByMorton partitions cover near-square blocks; lexicographic sort covers stripes") {
    // a full 128x128 grid into 16 partitions: a lexicographic (x, y)
    // range layout makes thin full-height x-stripes (extent 8 + 128),
    // Z-order makes 32x32 blocks (extent 32 + 32) — the per-partition
    // min/max envelope that parquet footers carry must be tighter in
    // the SUM of extents for either-dimension pruning to win
    val grid = spark.range(128L * 128L)
      .select((col("id") / 128).cast("int").as("x"), (col("id") % 128).cast("int").as("y"))
    def avgExtent(df: org.apache.spark.sql.DataFrame): Double =
      df.groupBy(spark_partition_id().as("p"))
        .agg(((max("x") - min("x")) + (max("y") - min("y"))).as("ext"))
        .agg(avg("ext")).first().getDouble(0)
    val zExt = avgExtent(Layout.clusterByMorton(grid, "x", "y", 16))
    val lexExt = avgExtent(
      grid.repartitionByRange(16, col("x"), col("y"))
        .sortWithinPartitions("x", "y"))
    // range-partition bounds are SAMPLED, so partition edges cut
    // through z-blocks and the average envelope lands above the
    // ideal 32+32=64 (measured ~88) — still far under the ~136 the
    // lexicographic stripes pay
    assert(zExt < 0.75 * lexExt,
      s"z-order envelope ($zExt) must be substantially tighter than lexicographic ($lexExt)")
    assert(zExt <= 110, s"16 partitions of a 128-grid should be near-block extents, got $zExt")
  }
}
