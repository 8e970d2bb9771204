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

  test("BMP codec: encode produces a spec-valid file the parser reads back") {
    val bytes = MediaCodec.encodeBmp(33, 21) // odd width exercises row padding
    // file structure per spec: magic, little-endian sizes, pixel offset
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val rowSize = ((3 * 33 + 3) / 4) * 4 // 100: 99 pixel bytes padded to 4
    assert(bb.getInt(2) == bytes.length, "file-size field must match the payload")
    assert(bytes.length == 54 + rowSize * 21)
    assert(bb.getInt(10) == 54, "pixel array offset")
    assert(bb.getInt(14) == 40, "BITMAPINFOHEADER size")
    assert(MediaCodec.decodeBmp(bytes) == ((33, 21, 1)))
    // top-down BMPs store negative height — dimensions must not
    bb.putInt(22, -21)
    assert(MediaCodec.decodeBmp(bb.array()) == ((33, 21, 1)))
  }

  test("JPEG codec: marker walk finds SOF0 past APP0/COM and reads u16 dims") {
    // dims past 255 exercise the big-endian u16 split across bytes
    val bytes = MediaCodec.encodeJpeg(517, 389, "a comment".getBytes("UTF-8"))
    assert((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8, "SOI first")
    assert(bytes.length == 45 + 9, "documented 45 + comment size")
    assert(MediaCodec.decodeJpeg(bytes) == ((517, 389, 1)))
    // an extra APPn segment before SOF0 must be walked over, not
    // tripped over (real files carry EXIF/ICC blocks there)
    val extra = java.nio.ByteBuffer.allocate(bytes.length + 8)
    extra.put(bytes, 0, 2) // SOI
      .putShort(0xFFE1.toShort).putShort(6).putInt(0x45786966) // APP1 "Exif"
      .put(bytes, 2, bytes.length - 2)
    assert(MediaCodec.decodeJpeg(extra.array()) == ((517, 389, 1)))
    // progressive SOF2 is a frame header too
    val prog = bytes.clone()
    val sofAt = bytes.length - 21 // SOF0 marker offset (19 SOF + 2 EOI from the end)
    assert((prog(sofAt) & 0xFF) == 0xFF && (prog(sofAt + 1) & 0xFF) == 0xC0)
    prog(sofAt + 1) = 0xC2.toByte
    assert(MediaCodec.decodeJpeg(prog) == ((517, 389, 1)))
  }

  test("PNG codec: chunk walk reads IHDR dims and verifies real CRC32s") {
    // dims past 255 exercise the big-endian u32 byte split
    val bytes = MediaCodec.encodePng(317, 211)
    assert(bytes.length == 45, "signature 8 + IHDR 25 + IEND 12")
    assert(MediaCodec.decodePng(bytes) == ((317, 211, 1)))
    // an ancillary chunk inserted before IHDR violates the spec
    val reord = java.nio.ByteBuffer.allocate(bytes.length + 12)
    reord.put(bytes, 0, 8)
    val t = "tEXt".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32; crc.update(t)
    reord.putInt(0).put(t).putInt(crc.getValue.toInt)
    reord.put(bytes, 8, bytes.length - 8)
    intercept[IllegalArgumentException](MediaCodec.decodePng(reord.array()))
  }

  test("PNG codec: corrupt payloads fail the CRC, not just the magic") {
    intercept[IllegalArgumentException](MediaCodec.decodePng(Array[Byte](1, 2, 3)))
    // flip ONE bit inside the IHDR data (width) — the signature and
    // layout stay valid, only the checksum can catch it
    val bad = MediaCodec.encodePng(64, 64)
    bad(16) = (bad(16) ^ 1).toByte
    val e = intercept[IllegalArgumentException](MediaCodec.decodePng(bad))
    assert(e.getMessage.contains("CRC"), s"expected a CRC failure: ${e.getMessage}")
    // a chunk length near Int.MaxValue must fail the bound check, not
    // overflow len+8 negative and die allocating a 2 GiB array
    val huge = MediaCodec.encodePng(8, 8)
    val hb = java.nio.ByteBuffer.wrap(huge)
    hb.putInt(8, Int.MaxValue - 4) // IHDR length field -> near-max
    val e2 = intercept[IllegalArgumentException](MediaCodec.decodePng(huge))
    assert(e2.getMessage.contains("truncated"), s"expected truncated: ${e2.getMessage}")
  }

  test("JPEG codec: malformed streams fail loudly") {
    // not a JPEG at all
    intercept[IllegalArgumentException](MediaCodec.decodeJpeg(Array[Byte](1, 2, 3, 4)))
    // SOI + EOI with no frame header
    val noSof = Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)
    intercept[IllegalArgumentException](MediaCodec.decodeJpeg(noSof))
    // DHT (C4) must NOT be mistaken for a SOF frame header: a stream
    // with only DHT then EOI has no dims
    val dht = java.nio.ByteBuffer.allocate(10)
    dht.putShort(0xFFD8.toShort).putShort(0xFFC4.toShort).putShort(4)
      .putShort(0).putShort(0xFFD9.toShort)
    intercept[IllegalArgumentException](MediaCodec.decodeJpeg(dht.array()))
    // zero height (DNL-deferred) is a parse failure, not a 0-dim image
    val z = MediaCodec.encodeJpeg(10, 1, Array.empty[Byte])
    val zsof = z.length - 21
    z(zsof + 5) = 0; z(zsof + 6) = 0 // height u16 -> 0
    intercept[IllegalArgumentException](MediaCodec.decodeJpeg(z))
    // a comment that cannot fit the u16 COM length must be rejected at
    // ENCODE time — a wrapped length would emit a corrupt stream
    intercept[IllegalArgumentException](
      MediaCodec.encodeJpeg(8, 8, new Array[Byte](0xFFFE)))
    // the boundary itself still round-trips
    assert(MediaCodec.decodeJpeg(
      MediaCodec.encodeJpeg(8, 8, new Array[Byte](0xFFFD))) == ((8, 8, 1)))
  }

  test("MP3 codec: frame-header walk counts frames and reads rate/channels") {
    // 44100 Hz: frame length 144*128000/44100 = 417 (integer division)
    val bytes = MediaCodec.encodeMp3(44100, 2, 7)
    assert(bytes.length == 7 * 417)
    assert(MediaCodec.decodeMp3(bytes) == ((44100, 2, 7)))
    // mono at 32000: frameLen 576, mode bits 11
    assert(MediaCodec.decodeMp3(MediaCodec.encodeMp3(32000, 1, 3)) == ((32000, 1, 3)))
    // an ID3v2 tag (syncsafe size) is skipped, not parsed as frames
    val id3 = new Array[Byte](10 + 200)
    id3(0) = 'I'; id3(1) = 'D'; id3(2) = '3'
    id3(8) = 1; id3(9) = 72 // syncsafe 200 = (1 << 7) | 72
    val tagged = id3 ++ MediaCodec.encodeMp3(48000, 2, 4)
    assert(MediaCodec.decodeMp3(tagged) == ((48000, 2, 4)))
    // ID3v2.4 footer flag (header byte 5 bit 4): the 10-byte '3DI'
    // footer is NOT in the syncsafe size and must also be skipped
    val foot = new Array[Byte](10 + 200 + 10)
    foot(0) = 'I'; foot(1) = 'D'; foot(2) = '3'; foot(3) = 4
    foot(5) = 0x10; foot(8) = 1; foot(9) = 72
    foot(220 - 10) = '3'; foot(220 - 9) = 'D'; foot(220 - 8) = 'I'; foot(220 - 7) = 4
    foot(220 - 5) = 0x10; foot(220 - 2) = 1; foot(220 - 1) = 72
    val footTagged = foot ++ MediaCodec.encodeMp3(44100, 1, 2)
    assert(MediaCodec.decodeMp3(footTagged) == ((44100, 1, 2)))
    // truncated final frame and lost sync both fail loudly
    intercept[IllegalArgumentException](
      MediaCodec.decodeMp3(bytes.take(bytes.length - 10)))
    val desync = bytes.clone(); desync(417) = 0
    intercept[IllegalArgumentException](MediaCodec.decodeMp3(desync))
    // MPEG-2 (version bits 10) is refused, not misparsed
    val v2 = bytes.clone(); v2(1) = 0xF3.toByte
    intercept[IllegalArgumentException](MediaCodec.decodeMp3(v2))
  }

  test("WAV codec: chunk walk finds fmt/data regardless of extra chunks") {
    val bytes = MediaCodec.encodeWav(16000, 2, 120)
    assert(MediaCodec.decodeWav(bytes) == ((16000, 2, 120)))
    assert(bytes.length == 44 + 120 * 2 * 2)
    // splice a LIST chunk between fmt and data (real recorders do
    // this) — a fixed-offset reader breaks, the chunk walk must not
    val head = bytes.take(36) // RIFF..WAVE + fmt chunk
    val tail = bytes.drop(36) // data chunk
    val list = java.nio.ByteBuffer.allocate(14).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(6).put("INFOab".getBytes("US-ASCII"))
      .array()
    val spliced = java.nio.ByteBuffer.allocate(head.length + list.length + tail.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(head).put(list).put(tail).array()
    // fix the RIFF size field for the inserted bytes
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    assert(MediaCodec.decodeWav(spliced) == ((16000, 2, 120)))
  }

  test("GIF codec: block walk reads LSD dims and counts image frames") {
    assert(MediaCodec.decodeGif(MediaCodec.encodeGif(320, 200)) == ((320, 200, 1)))
    // animated: 4 image descriptors -> 4 frames
    assert(MediaCodec.decodeGif(MediaCodec.encodeGif(64, 48, frames = 4)) == ((64, 48, 4)))
    // a graphic-control extension (0x21 0xF9 + sub-blocks) before the
    // image must be walked past, and a GIF87a signature accepted
    val base = MediaCodec.encodeGif(10, 10)
    val withExt = java.nio.ByteBuffer.allocate(base.length + 8)
    withExt.put(base, 0, 13)
    withExt.put(0x21.toByte).put(0xF9.toByte)
      .put(4.toByte).put(new Array[Byte](4)).put(0.toByte) // GCE + terminator
    withExt.put(base, 13, base.length - 13)
    val arr = withExt.array(); arr(4) = '7'.toByte // GIF87a
    assert(MediaCodec.decodeGif(arr) == ((10, 10, 1)))
    // global color table flagged -> 3 * 2^(depth+1) bytes are skipped
    val gct = java.nio.ByteBuffer.allocate(base.length + 6)
    gct.put(base, 0, 10)
    gct.put((0x80 | 0).toByte) // GCT flag, depth 0 -> 6 bytes
    gct.put(base(11)).put(base(12)).put(new Array[Byte](6))
    gct.put(base, 13, base.length - 13)
    assert(MediaCodec.decodeGif(gct.array()) == ((10, 10, 1)))
  }

  test("GIF codec: corrupt payloads fail loudly") {
    intercept[IllegalArgumentException](MediaCodec.decodeGif(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      MediaCodec.decodeGif("GIF88a".getBytes("US-ASCII") ++ new Array[Byte](10)))
    // truncate the trailer off -> "ended without a trailer"
    val noTrailer = MediaCodec.encodeGif(10, 10).dropRight(1)
    val e1 = intercept[IllegalArgumentException](MediaCodec.decodeGif(noTrailer))
    assert(e1.getMessage.contains("trailer"), e1.getMessage)
    // corrupt a block separator -> sync lost, offset named
    val bad = MediaCodec.encodeGif(10, 10)
    bad(13) = 0x55.toByte
    val e2 = intercept[IllegalArgumentException](MediaCodec.decodeGif(bad))
    assert(e2.getMessage.contains("sync lost"), e2.getMessage)
  }

  test("TIFF codec: endian-aware IFD walk reads dims in both byte orders") {
    assert(MediaCodec.decodeTiff(MediaCodec.encodeTiff(800, 600,
      littleEndian = true)) == ((800, 600, 1)))
    assert(MediaCodec.decodeTiff(MediaCodec.encodeTiff(800, 600,
      littleEndian = false)) == ((800, 600, 1)))
    // SHORT-typed (type 3) dims read the value field's first 2 bytes
    // in the declared order — exercise big-endian where it matters
    val bb = java.nio.ByteBuffer.allocate(38) // big-endian default
    bb.put("MM".getBytes("US-ASCII")).putShort(42).putInt(8)
    bb.putShort(2)
    bb.putShort(256).putShort(3).putInt(1).putShort(123).putShort(0)
    bb.putShort(257).putShort(3).putInt(1).putShort(45).putShort(0)
    bb.putInt(0)
    assert(MediaCodec.decodeTiff(bb.array()) == ((123, 45, 1)))
    // multi-page: a second IFD chained -> frames = 2
    val two = java.nio.ByteBuffer.allocate(68)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    two.put("II".getBytes("US-ASCII")).putShort(42).putInt(8)
    two.putShort(2)
    two.putShort(256).putShort(4).putInt(1).putInt(99)
    two.putShort(257).putShort(4).putInt(1).putInt(77)
    two.putInt(38) // next IFD
    two.putShort(2)
    two.putShort(256).putShort(4).putInt(1).putInt(10)
    two.putShort(257).putShort(4).putInt(1).putInt(10)
    two.putInt(0)
    assert(MediaCodec.decodeTiff(two.array()) == ((99, 77, 2)))
  }

  test("TIFF codec: corrupt payloads fail loudly, cyclic IFD chains terminate") {
    intercept[IllegalArgumentException](MediaCodec.decodeTiff(Array[Byte](1, 2, 3)))
    val wrongMagic = MediaCodec.encodeTiff(8, 8)
    wrongMagic(2) = 43.toByte
    intercept[IllegalArgumentException](MediaCodec.decodeTiff(wrongMagic))
    // out-of-bounds IFD offset
    val oob = MediaCodec.encodeTiff(8, 8)
    oob(4) = 0xF0.toByte
    val e1 = intercept[IllegalArgumentException](MediaCodec.decodeTiff(oob))
    assert(e1.getMessage.contains("out of bounds"), e1.getMessage)
    // a SELF-POINTING next-IFD pointer must hit the chain cap, not spin
    val cyc = java.nio.ByteBuffer.wrap(MediaCodec.encodeTiff(8, 8))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    cyc.putInt(34, 8) // next IFD -> itself
    val e2 = intercept[IllegalArgumentException](MediaCodec.decodeTiff(cyc.array()))
    assert(e2.getMessage.contains("terminate"), e2.getMessage)
  }

  test("mixed-format extraction decodes real BMP and WAV bytes per row") {
    val rows = Seq(
      (0L, "image", "bmp", MediaCodec.encodeBmp(64, 48)),
      (1L, "audio", "wav", MediaCodec.encodeWav(8000, 1, 50)),
      (2L, "video", "grft", MediaCodec.encodeHeader(320, 240, 5, Array[Byte](1))))
      .toDF("media_id", "kind", "fmt", "payload")
    val got = extractFeatures(rows).collect().sortBy(_.media_id)
    assert(got(0).width == 64 && got(0).height == 48 && got(0).n_frames == 1)
    assert(got(0).n_bytes == 54 + ((3 * 64 + 3) / 4) * 4 * 48)
    assert(got(1).width == 8000 && got(1).height == 1 && got(1).n_frames == 50)
    assert(got(1).n_bytes == 44 + 50 * 2)
    assert(got(2).width == 320 && got(2).height == 240 && got(2).n_frames == 5)
  }

  test("resizeBmp resamples REAL pixels nearest-neighbor, not just the header") {
    // 4x2 source with a distinct color per pixel: pixel (x, y) holds
    // (B, G, R) = (10x, 10y, 77). Downscale to 2x1: nearest mapping
    // sx = x*4/2 picks source pixels (0,0) and (2,0).
    val src = MediaCodec.encodeBmp(4, 2)
    val inStride = ((3 * 4 + 3) / 4) * 4
    for (y <- 0 until 2; x <- 0 until 4) {
      val off = 54 + y * inStride + 3 * x
      src(off) = (10 * x).toByte; src(off + 1) = (10 * y).toByte; src(off + 2) = 77.toByte
    }
    val out = resizeBmp(src, 2, 1)
    assert(MediaCodec.decodeBmp(out) == ((2, 1, 1)))
    val outStride = ((3 * 2 + 3) / 4) * 4
    def px(x: Int): (Int, Int, Int) = {
      val off = 54 + 3 * x
      (out(off) & 0xff, out(off + 1) & 0xff, out(off + 2) & 0xff)
    }
    assert(px(0) == ((0, 0, 77)), s"pixel 0 wrong: ${px(0)}")
    assert(px(1) == ((20, 0, 77)), s"pixel 1 must come from source x=2: ${px(1)}")
    assert(outStride == 8 && out.length == 54 + outStride * 1)
  }

  test("resizeBmp preserves image content for TOP-DOWN (negative height) BMPs") {
    // 2x2 bottom-up reference: bottom row red-ish (R=200), top row
    // blue-ish (B=200). The TOP-DOWN encoding of the same image stores
    // the top row first with biHeight = -2; a 2x2 -> 2x1 downscale
    // keeps the BOTTOM row (sy = 0) in both encodings.
    def put(b: Array[Byte], off: Int, bgr: (Int, Int, Int)): Unit = {
      b(off) = bgr._1.toByte; b(off + 1) = bgr._2.toByte; b(off + 2) = bgr._3.toByte
    }
    val stride = ((3 * 2 + 3) / 4) * 4
    val bottomUp = MediaCodec.encodeBmp(2, 2)
    put(bottomUp, 54, (0, 0, 200)); put(bottomUp, 54 + 3, (0, 0, 200))          // bottom row
    put(bottomUp, 54 + stride, (200, 0, 0)); put(bottomUp, 54 + stride + 3, (200, 0, 0)) // top row
    val topDown = MediaCodec.encodeBmp(2, 2)
    java.nio.ByteBuffer.wrap(topDown).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -2) // declare top-down
    put(topDown, 54, (200, 0, 0)); put(topDown, 54 + 3, (200, 0, 0))            // TOP row stored first
    put(topDown, 54 + stride, (0, 0, 200)); put(topDown, 54 + stride + 3, (0, 0, 200))
    val a = resizeBmp(bottomUp, 2, 1)
    val b = resizeBmp(topDown, 2, 1)
    assert(a.toSeq == b.toSeq, "top-down input must resize to the same image, not a mirror")
    assert((a(54 + 2) & 0xff) == 200, "the kept row must be the image's BOTTOM (red) row")
  }

  test("resizeBmp rejects non-24-bpp payloads instead of resampling garbage") {
    val bmp = MediaCodec.encodeBmp(4, 4)
    java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(28, 32) // declare 32 bpp
    val e = intercept[IllegalArgumentException](resizeBmp(bmp, 2, 2))
    assert(e.getMessage.contains("24-bpp"))
  }

  test("decodeWav fails fast on a corrupt negative chunk size instead of spinning") {
    val wav = MediaCodec.encodeWav(8000, 1, 10)
    java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, -8) // corrupt the fmt chunk size
    val e = intercept[IllegalArgumentException](MediaCodec.decodeWav(wav))
    assert(e.getMessage.contains("negative size"))
  }

  test("AVI codec: avih fields round-trip through the RIFF walk; JUNK chunks skipped; corruption fails fast") {
    val avi = MediaCodec.encodeAvi(320, 240, 17, 25)
    assert(avi.length == 100)
    assert(MediaCodec.decodeAvi(avi) == ((320, 240, 17, 40000)))
    assert(MediaCodec.decodeDims("avi", avi) == ((320, 240, 17)))
    // a real-world AVI carries chunks BEFORE hdrl — the walk must skip
    // them, not read fixed offsets: splice a JUNK chunk after 'AVI '
    val junk = java.nio.ByteBuffer.allocate(avi.length + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put(avi, 0, 12)
    junk.put("JUNK".getBytes("US-ASCII")).putInt(8).putLong(0L)
    junk.put(avi, 12, avi.length - 12)
    assert(MediaCodec.decodeAvi(junk.array()) == ((320, 240, 17, 40000)))
    // corrupt negative chunk size fails loudly (the decodeWav guard)
    val bad = avi.clone()
    java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, -8) // corrupt the LIST size
    val e = intercept[IllegalArgumentException](MediaCodec.decodeAvi(bad))
    assert(e.getMessage.contains("negative size"))
    // a payload with no avih must fail, not return garbage
    val noHdrl = MediaCodec.encodeWav(8000, 1, 4)
    intercept[IllegalArgumentException](MediaCodec.decodeAvi(noHdrl))
  }

  test("resizeMedia caps the longest side, preserves aspect, passes non-BMP through") {
    val rows = Seq(
      (0L, "image", "bmp", MediaCodec.encodeBmp(100, 40)), // downscale 100 -> 10
      (1L, "image", "bmp", MediaCodec.encodeBmp(8, 6)),    // under the cap: untouched
      (2L, "audio", "wav", MediaCodec.encodeWav(8000, 1, 50)))
      .toDF("media_id", "kind", "fmt", "payload")
    val out = resizeMedia(rows, maxSide = 10).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getAs[Array[Byte]](3))).sortBy(_._1)
    assert(MediaCodec.decodeBmp(out(0)._3) == ((10, 4, 1)))
    assert(MediaCodec.decodeBmp(out(1)._3) == ((8, 6, 1)), "small image must pass through")
    assert(out(2)._3.sameElements(MediaCodec.encodeWav(8000, 1, 50)), "wav must pass through")
  }
}
