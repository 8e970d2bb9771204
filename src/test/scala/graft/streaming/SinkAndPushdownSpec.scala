package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.model._

class SinkAndPushdownSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def msg(pk: String, extId: String): Message = Message.simple(pk, extId)

  test("batch DSv2 write publishes a Dataset[Message] into a topic with key routing") {
    val name = "sk-batch-" + System.nanoTime()
    Topics.create(name, 3)
    val msgs = (0 until 30).map(i => msg("user-" + i % 6, "w" + i))
    spark.createDataset(msgs)(Message.encoder).repartition(4)
      .write.format("graft-messages").option("topic", name).mode("append").save()
    val back = spark.read.format("graft-messages").option("topic", name).load()
    assert(back.count() == 30)
    // routing: each partitionKey confined to one shard
    val spread = back.groupBy("partitionKey")
      .agg(countDistinct("provider.shardId").as("n")).filter(col("n") > 1).count()
    assert(spread == 0)
    // ULIDs assigned everywhere, unique
    assert(back.select("ulid.msb", "ulid.lsb").distinct().count() == 30)
  }

  test("streaming DSv2 write: stream from one topic into another (message pipeline)") {
    val src = "sk-src-" + System.nanoTime(); val dst = "sk-dst-" + System.nanoTime()
    Topics.create(src, 2); Topics.create(dst, 2)
    val p = Topics.get(src).get.producer(seed = 5)
    (0 until 12).foreach(i => p.publish(msg("k" + i, "s" + i)))
    val q = spark.readStream.format("graft-messages").option("topic", src).load()
      .writeStream.format("graft-messages").option("topic", dst)
      .option("checkpointLocation", Files.createTempDirectory("sk").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val back = spark.read.format("graft-messages").option("topic", dst).load()
    assert(back.count() == 12)
    // firstProvider preserved from the SOURCE topic read, provider re-stamped by dst
    assert(back.filter(col("firstProvider.shardId") === col("provider.shardId") &&
      col("firstProvider.sequenceNumber") === col("provider.sequenceNumber"))
      .count() < 12 || Topics.get(src).get.numShards == Topics.get(dst).get.numShards)
    val dstShards = back.select("provider.shardId").distinct().as[String].collect().toSet
    assert(dstShards.subsetOf(Topics.get(dst).get.shardIds.toSet))
  }

  test("write without partitionKey fails loudly") {
    val name = "sk-bad-" + System.nanoTime()
    Topics.create(name, 1)
    val bad = Seq(msg("", "x"))
    val e = intercept[Exception] {
      spark.createDataset(bad)(Message.encoder)
        .write.format("graft-messages").option("topic", name).mode("append").save()
    }
    assert(e.getMessage.contains("partitionKey") ||
      Option(e.getCause).exists(_.getMessage.contains("partitionKey")))
  }

  test("timestamp filter on batch read seeks instead of scanning (replay pruning)") {
    val logName = "sk-push-" + System.nanoTime()
    val log = ShardLog.getOrCreate(logName)
    (0 until 1000).foreach(i => log.putRecords(Seq(msg("pk", "e" + i)), arrivalMillis = 1000L + i))
    val df = spark.read.format("graft-messages").option("log", logName).load()

    val before = log.recordsRead.get()
    val n = df.filter(col("provider.publishedTimestamp") >= 1900L).count()
    val readWithFilter = log.recordsRead.get() - before
    assert(n == 100)
    assert(readWithFilter <= 110, s"seek did not prune: read $readWithFilter records for 100 hits")

    // unfiltered read scans everything
    val b2 = log.recordsRead.get()
    assert(df.count() == 1000)
    assert(log.recordsRead.get() - b2 >= 1000)

    // strict > also prunes and stays correct
    assert(df.filter(col("provider.publishedTimestamp") > 1998L).count() == 1)
  }

  test("rate source (S3) feeds the message write path end-to-end") {
    val name = "sk-rate-" + System.nanoTime()
    Topics.create(name, 2)
    val q = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
      .selectExpr(
        "cast(null as struct<msb: bigint, lsb: bigint>) as ulid",
        "concat('rate-', cast(value % 5 as string)) as partitionKey",
        "cast(value as string) as externalId",
        "map('ts', cast(cast(timestamp as string) as binary)) as data",
        "map() as attributes",
        "timestamp",
        "cast(null as struct<group: string, sequenceNumber: bigint>) as ordering",
        "cast(null as struct<technology: string, publishedTimestamp: bigint, shardId: string, sequenceNumber: string>) as firstProvider",
        "cast(null as struct<technology: string, publishedTimestamp: bigint, shardId: string, sequenceNumber: string>) as provider",
        "cast(null as struct<clientSourceId: string>) as source")
      .writeStream.format("graft-messages").option("topic", name)
      .option("checkpointLocation", Files.createTempDirectory("rate").toString)
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.read.format("graft-messages").option("topic", name).load().count() < 10
             && System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q.stop()
    val back = spark.read.format("graft-messages").option("topic", name).load()
    assert(back.count() >= 10)
    assert(back.filter(col("ulid").isNull).count() == 0) // writer assigned ULIDs
  }

  test("Trigger.AvailableNow drains exactly the pre-start backlog, paced, then terminates") {
    val logName = "sk-avail-" + System.nanoTime()
    val log = ShardLog.getOrCreate(logName)
    (0 until 25).foreach(i => log.putRecords(Seq(msg("pk", "a" + i))))
    val q = spark.readStream.format("graft-messages").option("log", logName)
      .option("maxRecordsPerBatch", "7").load()
      .writeStream.format("memory").queryName("avail_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("av").toString)
      .start()
    // publish MORE while draining — AvailableNow must not chase the tail
    log.putRecords(Seq(msg("pk", "late")))
    assert(q.awaitTermination(60000), "AvailableNow query did not terminate")
    val got = spark.table("avail_out").select("externalId").as[String].collect().toSeq
    assert(got.size >= 25 && got.size <= 26) // backlog drained; tail race tolerated
    assert(got.take(25) == (0 until 25).map("a" + _))
  }

  test("stream == batch: session windows over the real events table agree") {
    val events = graft.Tables(spark, SparkFixture.sfDir, "events")
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"))
      .orderBy("ts")
    val batch = events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("ss"), col("user_id"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet

    val rows = events.as[(Timestamp, Long)].collect()
    val in = MemoryStream[(Timestamp, Long)](spark)
    val q = in.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("ss"), col("user_id"), col("n"))
      .writeStream.format("memory").queryName("sb_out").outputMode("complete").start()
    rows.grouped(300).foreach { chunk => in.addData(chunk.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("sb_out")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }
}
