package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import Multimodal._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def mediaDf(n: Int) = {
    val rows = (0 until n).map { i =>
      val payload = MediaCodec.encodeHeader(
        width = 640 + i, height = 480, frames = 1 + i % 7,
        body = Array.fill(32)(i.toByte))
      (i.toLong, if (i % 2 == 0) "image" else "video", "grft", payload)
    }
    rows.toDF("media_id", "kind", "fmt", "payload")
  }

  test("feature extraction decodes dims per partition, no collect") {
    val feats = extractFeatures(mediaDf(20).repartition(4))
    val rows = feats.collect().sortBy(_.media_id)
    assert(rows.length == 20)
    assert(rows(3).width == 643 && rows(3).height == 480 && rows(3).n_frames == 4)
    assert(rows.forall(_.n_bytes == 48))
    assert(rows.map(_.sha).distinct.length == 20) // payloads all distinct
  }

  test("frame sampling explodes deterministic frame indices") {
    val feats = extractFeatures(mediaDf(8))
    val sampled = sampleFrames(feats, stride = 2)
    // media 7 has frames 0..0 (1 + 7%7 = 1) -> only frame 0
    val m7 = sampled.filter(col("media_id") === 7).select("frame_idx").as[Long].collect()
    assert(m7.toSeq == Seq(0L))
    // media 6 has 7 frames -> 0,2,4,6
    val m6 = sampled.filter(col("media_id") === 6).select("frame_idx").as[Long].collect()
    assert(m6.toSeq == Seq(0L, 2L, 4L, 6L))
  }

  test("resize plan computes clamped scales") {
    val plan = resizePlan(extractFeatures(mediaDf(4)), maxSide = 320)
    val r = plan.filter(col("media_id") === 0).head()
    assert(r.getAs[Int]("out_w") == 320 && r.getAs[Double]("scale") == 0.5)
    // never upscale
    assert(plan.filter(col("scale") > 1.0).count() == 0)
  }

  test("corrupt payload fails loudly, not silently") {
    val bad = Seq((1L, "image", "grft", Array[Byte](1, 2, 3))).toDF("media_id", "kind", "fmt", "payload")
    val e = intercept[org.apache.spark.SparkException](extractFeatures(bad).collect())
    assert(e.getMessage.contains("GRFT") || Option(e.getCause).exists(_.getMessage.contains("GRFT")))
  }
}
