package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Dedup-at-ingest TCK: the streaming LSH collision detector flags a
  * near-duplicate ARRIVING LATER than its original, across micro-batch
  * boundaries, with keep-first-by-id determinism — and the per-doc
  * rollup over the collision stream yields the doc verdicts the batch
  * path would.
  */
class IngestDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("near-dup arriving in a later batch collides; distinct docs stay clean") {
    val a = "the quick brown fox jumps over the lazy dog while the rain " +
      "falls softly on the quiet village roofs tonight"
    val aEdit = a.replace("tonight", "today") // same shingles except the tail
    val b = "completely different content about spark catalyst optimizer " +
      "rules and distributed shuffle exchange planning strategies"

    val in = MemoryStream[(Long, String)](spark)
    val q = IngestDedup.bandCollisions(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("ingest_hits").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("g").toString)
      .start()
    in.addData((1L, a), (2L, b))   // batch 1: both first-seen
    q.processAllAvailable()
    in.addData((3L, aEdit))        // batch 2: near-dup of doc 1
    q.processAllAvailable()
    q.stop()

    // per-doc rollup over the collision stream (the downstream hop)
    val verdicts = spark.table("ingest_hits")
      .groupBy("doc_id").agg(max(col("dup")).as("is_dup"))
      .as[(Long, Boolean)].collect().toMap
    assert(verdicts(1L) == false, "bucket owner must stay clean")
    assert(verdicts(2L) == false, "distinct doc must stay clean")
    assert(verdicts(3L) == true, "near-dup must collide on at least one band")
    // every doc emitted all 16 band records
    val counts = spark.table("ingest_hits").groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ == 16L))
  }

  test("same-batch race resolves keep-first by doc_id, not arrival order") {
    val text = "identical payload text repeated verbatim across both docs " +
      "so every band signature matches exactly between the pair"
    val in = MemoryStream[(Long, String)](spark)
    val q = IngestDedup.bandCollisions(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("ingest_race").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("g").toString)
      .start()
    in.addData((9L, text), (4L, text)) // one batch, higher id added first
    q.processAllAvailable()
    q.stop()
    val verdicts = spark.table("ingest_race")
      .groupBy("doc_id").agg(max(col("dup")).as("is_dup"))
      .as[(Long, Boolean)].collect().toMap
    assert(verdicts(4L) == false && verdicts(9L) == true,
      s"min doc_id must own every bucket: $verdicts")
  }
}
