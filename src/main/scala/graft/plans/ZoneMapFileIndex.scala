package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] that prunes a chunk-partitioned table's listing to
  * a zone-map-surviving chunk set — the lakehouse manifest-pruning
  * step (Delta/Iceberg data skipping) expressed through Spark's own
  * planning seam instead of a predicate literal. `FileSourceScanExec`
  * calls [[listFiles]] to enumerate the partitions it will scan;
  * partitions whose `chunkCol` value is outside `keep` never reach
  * the parquet reader, so the scan's `numFiles` metric counts only
  * survivors and the query plan carries NO chunk-id IN-list — at 10⁶
  * chunks the survivor set is planning METADATA (driver-side, the
  * same place Delta holds its file manifest), not a 10⁶-literal
  * expression the optimizer has to fold.
  *
  * Delegates everything else to the inner (listing) index; the data
  * and partition schemas are the inner index's own.
  */
final class ZoneMapFileIndex(inner: FileIndex, chunkCol: String,
                             keep: Set[String]) extends FileIndex {

  private val chunkIdx: Int = {
    val i = inner.partitionSchema.fieldNames.indexOf(chunkCol)
    require(i >= 0, s"ZoneMapFileIndex: '$chunkCol' is not a partition column " +
      s"of the table (partition schema: ${inner.partitionSchema.fieldNames.mkString(", ")})")
    i
  }

  override def rootPaths: Seq[Path] = inner.rootPaths

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    inner.listFiles(partitionFilters, dataFilters).filter { pd =>
      // partition values are never null for a hive-partitioned chunk
      // dir; a __HIVE_DEFAULT_PARTITION__ chunk has no envelope row and
      // is correctly skipped (its rows carry no prunable value)
      !pd.values.isNullAt(chunkIdx) &&
        keep.contains(pd.values.getUTF8String(chunkIdx).toString)
    }

  override def inputFiles: Array[String] = inner.inputFiles

  override def refresh(): Unit = inner.refresh()

  override def sizeInBytes: Long = inner.sizeInBytes

  override def partitionSchema: StructType = inner.partitionSchema
}

object ZoneMapFileIndex {
  /** Plain listing index over `path` (hive partition discovery on). */
  def listing(spark: SparkSession, path: String): InMemoryFileIndex =
    new InMemoryFileIndex(spark, Seq(new Path(path)), Map.empty[String, String], None)
}
