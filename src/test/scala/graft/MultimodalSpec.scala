package graft

import graft.multimodal.{MediaCodec, Multimodal}
import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codec is graded on parsing REAL bytes — every positive case here
  * is a hand-built byte array (independent of `MediaCodec.build`), and
  * tamper cases prove the parser checks structure, not just magic.
  */
class MediaCodecSpec extends AnyFunSuite {

  private def handBuiltPng(w: Int, h: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(w).putInt(h)
    bb.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val a = bb.array()
    val crc = new CRC32; crc.update(a, 12, 17)
    ByteBuffer.wrap(a, 29, 4).order(ByteOrder.BIG_ENDIAN).putInt(crc.getValue.toInt)
    a
  }

  test("PNG: hand-built IHDR parses width/height, bit depth, CRC verified") {
    val d = MediaCodec.decode(handBuiltPng(640, 480) ++ "payload".getBytes)
    assert(d.ok)
    assert(d.format.contains("png"))
    assert(d.width.contains(640L) && d.height.contains(480L))
    assert(d.bitDepth.contains(8L) && d.nFrames.contains(1L))
    assert(d.contentOffset == 33)
  }

  test("PNG: tampered width byte fails the CRC check (not just the magic)") {
    val a = handBuiltPng(640, 480)
    a(19) = (a(19) ^ 0x01).toByte // low byte of width, CRC now stale
    assert(!MediaCodec.decode(a).ok)
  }

  test("PNG: truncated header fails") {
    assert(!MediaCodec.decode(handBuiltPng(640, 480).take(20)).ok)
  }

  test("WAV: hand-built canonical PCM header parses rate/channels/frames") {
    val data = Array.fill[Byte](12)(0x55)
    val bb = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
    bb.putInt(44100).putInt(44100 * 4).putShort(4).putShort(16)
    bb.put("data".getBytes).putInt(data.length)
    val d = MediaCodec.decode(bb.array() ++ data)
    assert(d.ok && d.format.contains("wav"))
    assert(d.sampleRate.contains(44100L) && d.channels.contains(2L))
    assert(d.bitDepth.contains(16L))
    assert(d.nFrames.contains(3L)) // 12 bytes / blockAlign 4
    assert(d.contentOffset == 44)
  }

  test("WAV: extra chunk before fmt is walked over, not a failure") {
    val bb = ByteBuffer.allocate(44 + 12).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(48).put("WAVE".getBytes)
    bb.put("LIST".getBytes).putInt(4).put("INFO".getBytes) // junk chunk
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
    bb.putInt(8000).putInt(8000 * 2).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(0)
    val d = MediaCodec.decode(bb.array())
    assert(d.ok && d.sampleRate.contains(8000L) && d.channels.contains(1L))
    assert(d.nFrames.contains(0L))
  }

  test("WAV: RIFF magic without WAVE form fails") {
    val a = "RIFFxxxxAVI LIST".getBytes(StandardCharsets.US_ASCII) ++
      Array.fill[Byte](40)(0)
    assert(!MediaCodec.decode(a).ok)
  }

  test("JPEG: marker scan skips APP segments and finds SOF dimensions") {
    val bb = ByteBuffer.allocate(2 + 6 + 19).order(ByteOrder.BIG_ENDIAN)
    bb.put(0xff.toByte).put(0xd8.toByte)
    bb.put(0xff.toByte).put(0xee.toByte).putShort(4).putShort(0) // COM-ish seg
    bb.put(0xff.toByte).put(0xc2.toByte).putShort(17)            // progressive SOF2
    bb.put(8.toByte).putShort(1080).putShort(1920).put(3.toByte)
    bb.put(1.toByte).put(0x22.toByte).put(0.toByte)
    bb.put(2.toByte).put(0x11.toByte).put(1.toByte)
    bb.put(3.toByte).put(0x11.toByte).put(1.toByte)
    val d = MediaCodec.decode(bb.array())
    assert(d.ok && d.format.contains("jpeg"))
    assert(d.width.contains(1920L) && d.height.contains(1080L))
    assert(d.bitDepth.contains(8L))
  }

  test("JPEG: SOS before any SOF fails (no dimensions recoverable)") {
    val bb = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
    bb.put(0xff.toByte).put(0xd8.toByte)
    bb.put(0xff.toByte).put(0xda.toByte).putShort(4).putShort(0)
    assert(!MediaCodec.decode(bb.array()).ok)
  }

  test("garbage and empty payloads fail cleanly") {
    assert(!MediaCodec.decode(null).ok)
    assert(!MediaCodec.decode(Array.emptyByteArray).ok)
    assert(!MediaCodec.decode("not media at all".getBytes).ok)
  }

  test("WAV: huge unsigned chunk size terminates (no negative-advance loop)") {
    // chunk at 12 with size 0, then a chunk claiming 0xFFFFFFF0 bytes —
    // truncating that unsigned size to Int once made the walk cycle forever
    val bb = ByteBuffer.allocate(60).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(52).put("WAVE".getBytes)
    bb.put("JUNK".getBytes).putInt(0)
    bb.put("LIST".getBytes).putInt(0xfffffff0)
    assert(!MediaCodec.decode(bb.array()).ok)
  }

  test("AVI: huge unsigned chunk size terminates (no negative-advance loop)") {
    val bb = ByteBuffer.allocate(96).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(88).put("AVI ".getBytes)
    bb.put("JUNK".getBytes).putInt(0)
    bb.put("LIST".getBytes).putInt(0xfffffff0)
    assert(!MediaCodec.decode(bb.array()).ok)
  }

  test("JPEG: fill bytes and restart markers before SOF are skipped per T.81") {
    val bb = ByteBuffer.allocate(2 + 3 + 2 + 19).order(ByteOrder.BIG_ENDIAN)
    bb.put(0xff.toByte).put(0xd8.toByte)                 // SOI
    bb.put(0xff.toByte).put(0xff.toByte).put(0xff.toByte) // fill bytes + ...
    bb.put(0xd0.toByte)                                  // ...RST0 (standalone)
    bb.put(0xff.toByte)                                  // marker intro for SOF
    bb.put(0xc0.toByte).putShort(17)
    bb.put(8.toByte).putShort(24).putShort(42).put(3.toByte)
    bb.put(1.toByte).put(0x22.toByte).put(0.toByte)
    bb.put(2.toByte).put(0x11.toByte).put(1.toByte)
    bb.put(3.toByte).put(0x11.toByte).put(1.toByte)
    val d = MediaCodec.decode(bb.array())
    assert(d.ok && d.width.contains(42L) && d.height.contains(24L))
  }

  test("AVI: hand-built RIFF/hdrl/avih parses frames and dimensions") {
    val bb = ByteBuffer.allocate(88).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(80).put("AVI ".getBytes)
    bb.put("LIST".getBytes).putInt(68).put("hdrl".getBytes)
    bb.put("avih".getBytes).putInt(56)
    bb.putInt(33367)  // µs/frame (~30 fps)
    bb.putInt(0).putInt(0).putInt(0x10)
    bb.putInt(720)    // total frames
    bb.putInt(0).putInt(1).putInt(0)
    bb.putInt(1920).putInt(1080)
    val d = MediaCodec.decode(bb.array() ++ "trailing".getBytes)
    assert(d.ok && d.format.contains("avi"))
    assert(d.width.contains(1920L) && d.height.contains(1080L))
    assert(d.nFrames.contains(720L))
    assert(d.sampleRate.isEmpty && d.bitDepth.isEmpty)
    assert(d.contentOffset == 88)
  }

  test("AVI: RIFF form without an avih header fails") {
    val bb = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(16).put("AVI ".getBytes)
    bb.put("LIST".getBytes).putInt(4).put("hdrl".getBytes)
    assert(!MediaCodec.decode(bb.array() ++ Array.fill[Byte](70)(0)).ok)
  }

  test("build→decode round trip matches the planted arithmetic for 0..300") {
    (0L to 300L).foreach { id =>
      val d = MediaCodec.decode(MediaCodec.build(id, s"text for $id"))
      if (MediaCodec.isCorrupt(id)) assert(!d.ok, s"doc $id should fail decode")
      else {
        assert(d.ok, s"doc $id should decode")
        MediaCodec.formatOf(id) match {
          case 0 =>
            assert(d.format.contains("png"))
            assert(d.width.contains(MediaCodec.plantedWidth(id)))
            assert(d.height.contains(MediaCodec.plantedHeight(id)))
          case 1 =>
            assert(d.format.contains("wav"))
            assert(d.sampleRate.contains(MediaCodec.plantedSampleRate(id)))
            assert(d.channels.contains(MediaCodec.plantedChannels(id)))
          case 2 =>
            assert(d.format.contains("jpeg"))
            assert(d.width.contains(MediaCodec.plantedWidth(id)))
            assert(d.height.contains(MediaCodec.plantedHeight(id)))
          case _ =>
            assert(d.format.contains("avi"))
            assert(d.width.contains(MediaCodec.plantedWidth(id)))
            assert(d.height.contains(MediaCodec.plantedHeight(id)))
            assert(d.nFrames.contains(MediaCodec.plantedVideoFrames(id)))
        }
      }
    }
  }
}

/** Dataset-level plumbing over the codec. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("features: PNG/WAV/AVI docs decode planted fields; corrupt doc flags not-ok") {
    val df = Seq(
      (4L, "abcd" * 32, "en", "s1", 128L),   // fmt 0 → png
      (97L, "wxyz" * 32, "en", "s1", 128L),  // corrupt (97 % 97 == 0), wav claimed
      (5L, "efgh" * 32, "en", "s2", 128L),   // fmt 1 → wav
      (7L, "ijkl" * 32, "en", "s2", 128L))   // fmt 3 → avi
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val f = Multimodal.features(spark, df).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    val png = f(4L)
    assert(png.getAs[String]("media_type") == "image/png")
    assert(png.getAs[String]("header_hex") == "89504e47")
    assert(png.getAs[Long]("width") == MediaCodec.plantedWidth(4L))
    assert(png.getAs[Long]("height") == MediaCodec.plantedHeight(4L))
    assert(png.getAs[Long]("n_bytes") == 33L + 128L)
    assert(png.getAs[Boolean]("decoded_ok"))
    // content region mean: 'abcd' bytes = 97+98+99+100 over first 256
    assert(math.abs(png.getAs[Double]("mean_byte") - 98.5) < 1e-12)

    val corrupt = f(97L)
    assert(!corrupt.getAs[Boolean]("decoded_ok"))
    assert(corrupt.getAs[String]("format") == null)
    assert(corrupt.getAs[Any]("sample_rate") == null)
    assert(corrupt.getAs[String]("header_hex").startsWith("00"))

    val wav = f(5L)
    assert(wav.getAs[String]("media_type") == "audio/wav")
    assert(wav.getAs[Long]("sample_rate") == MediaCodec.plantedSampleRate(5L))
    assert(wav.getAs[Long]("channels") == MediaCodec.plantedChannels(5L))
    assert(wav.getAs[Long]("n_frames") == 128L / (2L * MediaCodec.plantedChannels(5L)))
    assert(wav.getAs[Any]("width") == null)

    val avi = f(7L)
    assert(avi.getAs[String]("media_type") == "video/x-msvideo")
    assert(avi.getAs[String]("format") == "avi")
    assert(avi.getAs[Long]("width") == MediaCodec.plantedWidth(7L))
    assert(avi.getAs[Long]("n_frames") == MediaCodec.plantedVideoFrames(7L))
    assert(avi.getAs[Long]("n_bytes") == 88L + 128L)
    assert(avi.getAs[Any]("bit_depth") == null)
  }

  test("audioFrameStats: every 4th LE PCM sample, exact mean/peak, wav-only rows") {
    // doc 5 → wav (5 % 4 == 1). Content bytes are the text's UTF-8;
    // recompute the expected decimated samples here independently.
    val text = "abcdWXYZ" * 16 // 128 bytes → 64 samples → 16 sampled
    val df = Seq(
      (5L, text, "en", "s", 128L),
      (4L, text, "en", "s", 128L),   // png → no row
      (97L, text, "en", "s", 128L))  // corrupt wav → no row
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.audioFrameStats(spark, df, decimate = 4).collect()
    assert(out.length == 1 && out(0).getAs[Long]("doc_id") == 5L)
    val bytes = text.getBytes("UTF-8")
    val expect = (0 until 64 by 4).map { j =>
      math.abs((((bytes(2 * j + 1) & 0xff) << 8) | (bytes(2 * j) & 0xff)).toShort.toLong)
    }
    assert(out(0).getAs[Long]("n_samples") == 64L)
    assert(out(0).getAs[Long]("n_sampled") == expect.length.toLong)
    assert(math.abs(out(0).getAs[Double]("mean_abs_sample") -
      expect.sum.toDouble / expect.length) < 1e-12)
    assert(out(0).getAs[Long]("peak_sample") == expect.max)
  }

  test("imageResizePlan: aspect preserved, floor div, never upscales, floor >= 1") {
    // doc 4: png; doc 2: jpeg; doc 7: avi (video thumbnail); doc 5: wav (no plan)
    val df = Seq(
      (4L, "t", "en", "s", 1L), (2L, "t", "en", "s", 1L),
      (7L, "t", "en", "s", 1L), (5L, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.imageResizePlan(spark, df, maxDim = 128)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(5L)) // wav has no resize plan
    Seq(4L, 2L, 7L).foreach { id =>
      val (w, h) = (MediaCodec.plantedWidth(id), MediaCodec.plantedHeight(id))
      val (tw, th) =
        if (math.max(w, h) <= 128) (w, h)
        else (math.max(1L, w * 128 / math.max(w, h)), math.max(1L, h * 128 / math.max(w, h)))
      assert(out(id).getAs[Long]("thumb_w") == tw, s"doc $id thumb_w")
      assert(out(id).getAs[Long]("thumb_h") == th, s"doc $id thumb_h")
      assert(out(id).getAs[Long]("thumb_w") <= 128 && out(id).getAs[Long]("thumb_h") <= 128)
    }
  }

  test("features schema: nullable metric columns are int64/double, not struct") {
    val df = Seq((1L, "t", "en", "s", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val sch = Multimodal.features(spark, df).schema
    assert(sch("width").dataType.typeName == "long")
    assert(sch("mean_byte").dataType.typeName == "double")
    assert(sch("format").dataType.typeName == "string")
  }
}
