package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: media
  * travels as an opaque `binary` column plus typed metadata, and every
  * transform is per-partition streaming-friendly (no driver collect,
  * no full materialization — the only shape that works when the binary
  * column is 100 TB of images).
  *
  * The actual codec step (JPEG decode, audio resample, video frame
  * extraction) is STUBBED — this container has no image/audio
  * libraries — behind [[MediaCodec]]: a deterministic fake that parses
  * our own 16-byte header. The Spark-side plumbing (schema, batch
  * iteration, partition preservation, feature schema) is real and
  * tested; swapping the stub for javacv/ImageIO changes one function.
  */
object Multimodal {

  /** media wire schema: id + opaque payload + declared kind/format. */
  val mediaSchema = "media_id BIGINT, kind STRING, fmt STRING, payload BINARY"

  final case class MediaFeature(
      media_id: Long, kind: String, fmt: String,
      n_bytes: Int, width: Int, height: Int, n_frames: Int,
      sha: String)

  /** STUB codec: a real implementation would decode payload bytes with
    * an image/audio library. The fake reads our deterministic 16-byte
    * header: [magic(4) | width(4) | height(4) | frames(4)], big-endian.
    */
  object MediaCodec {
    val Magic = 0x47524654 // "GRFT"

    def encodeHeader(width: Int, height: Int, frames: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + body.length)
      bb.putInt(Magic).putInt(width).putInt(height).putInt(frames).put(body)
      bb.array()
    }

    /** (width, height, frames) — ??? territory in a real deployment:
      * replace with ImageIO/javacv. Deterministic fake for tests. */
    def decodeDims(payload: Array[Byte]): (Int, Int, Int) = {
      val bb = java.nio.ByteBuffer.wrap(payload)
      require(bb.remaining >= 16 && bb.getInt() == Magic, "not a GRFT payload")
      (bb.getInt(), bb.getInt(), bb.getInt())
    }
  }

  /** Feature extraction over the binary column, per-partition (the
    * `mapPartitions` shape that scales: one codec instance per
    * partition, streaming iteration, no row buffering).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "fmt", "payload")
      .as[(Long, String, String, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, kind, fmt, payload) =>
          val (w, h, f) = MediaCodec.decodeDims(payload)
          digest.reset()
          val sha = digest.digest(payload).take(8).map("%02x".format(_)).mkString
          MediaFeature(id, kind, fmt, payload.length, w, h, f, sha)
        }
      }
  }

  /** Deterministic frame sampling: keep every `stride`-th frame index —
    * pure metadata math on the stub, but the partition-preserving
    * explode shape is exactly what real video sampling needs.
    */
  def sampleFrames(features: Dataset[MediaFeature], stride: Int): DataFrame =
    features.toDF()
      .select(col("media_id"), explode(expr(s"sequence(0, n_frames - 1, $stride)")).as("frame_idx"))

  /** Resize metadata transform (stub: no pixels to touch — emits the
    * target dims and scale factors the real kernel would apply). */
  def resizePlan(features: Dataset[MediaFeature], maxSide: Int): DataFrame =
    features.toDF().withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", ceil(col("height") * col("scale")).cast("int"))
      .select("media_id", "width", "height", "out_w", "out_h", "scale")
}
