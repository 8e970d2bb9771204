package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.model._

/** Batch Replay must agree with the pull consumer for every cursor
  * type — two independent implementations of the cursor semantics
  * (imperative scan vs declarative filters) cross-checked.
  */
class ReplaySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val logName = "replay-" + System.nanoTime()
  private lazy val log = {
    val l = ShardLog.getOrCreate(logName)
    Seq("a", "b", "c", "d").zipWithIndex.foreach { case (e, i) =>
      l.putRecords(Seq(Message.simple("pk1", e).copy(
        ulid = Some(Ulid(100000L + i * 10, new java.util.Random(i))))),
        arrivalMillis = 100000L + i * 10)
    }
    l
  }

  private def consumerIds(c: Cursor): Seq[String] = {
    val cons = new ShardConsumer(log, c)
    (1 to 4).flatMap(_ => cons.receive(200)).flatMap(_.externalId)
  }

  private def replayIds(c: Cursor): Seq[String] =
    Replay.log(spark, logName, c)
      .orderBy("provider.sequenceNumber")
      .select("externalId").as[String].collect().toSeq

  private def ulidOf(pos: Int): Ulid = {
    val cons = new ShardConsumer(log, Cursor.trimHorizon(log.shardId))
    (1 to pos + 1).flatMap(_ => cons.receive(200)).last.ulid.get
  }

  test("Replay agrees with the consumer for every cursor type") {
    val cursors = Seq(
      Cursor.trimHorizon(log.shardId),
      Cursor.atSequence(log.shardId, "000000000001", inclusive = true),
      Cursor.atSequence(log.shardId, "000000000001", inclusive = false),
      Cursor.atTime(log.shardId, 100015L),
      Cursor(log.shardId, StartingPoint.AtUlid(ulidOf(2), inclusive = true)),
      Cursor(log.shardId, StartingPoint.AtUlid(ulidOf(2), inclusive = false)),
      Cursor(log.shardId, StartingPoint.AtExternalId("b", 100010L, toleranceMillis = 100)),
      // no-match fallback: replay from tolerance lower bound
      Cursor(log.shardId, StartingPoint.AtExternalId("nope", 100020L, toleranceMillis = 12)))
    cursors.foreach { c =>
      assert(replayIds(c) == consumerIds(c), s"divergence for $c")
    }
    // NOW: consumer sees nothing new; batch replay of a snapshot is empty
    assert(replayIds(Cursor.now(log.shardId)).isEmpty)
  }
}
