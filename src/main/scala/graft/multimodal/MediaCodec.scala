package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

/** Header-level media codec over real public container formats.
  *
  * `build` synthesizes a VALID format header (PNG / canonical-PCM WAV /
  * JFIF JPEG / AVI) deterministically from `docId`, followed by the
  * document's UTF-8 bytes standing in for the compressed payload.
  * `decode` parses the header back with pure JVM byte arithmetic — 8-byte
  * PNG signature + IHDR chunk with CRC32 verification, RIFF/WAVE chunk
  * walking, JPEG marker scanning to the SOF segment, RIFF/'AVI ' LIST
  * walk to the avih main header — no codec libraries. This is the shape a
  * production pipeline uses at 100 TB: metadata extraction touches only
  * the first bytes of each blob; full-frame decoding (which DOES need
  * native codecs) hangs off the same `mapPartitions` plumbing.
  *
  * The deterministic synthesis rules double as the DuckDB oracle: the
  * oracle recomputes the planted width/height/sample-rate from doc_id
  * arithmetic, so any bug in EITHER the builder or the parser breaks the
  * hash match (the Spark side only ever sees the bytes).
  *
  * Format references (public): PNG spec §5.2 (signature) / §11.2.2 (IHDR);
  * RIFF/WAVE canonical 44-byte PCM header; ITU T.81 §B.2.2 (JPEG SOF);
  * AVI RIFF form (`hdrl` LIST → `avih` MainAVIHeader).
  */
object MediaCodec {

  /** Everything the header-level decode can know. Field is None when the
    * format doesn't carry it (images have no sample rate) or the payload
    * didn't parse.
    */
  final case class Decoded(
      format: Option[String],
      width: Option[Long],
      height: Option[Long],
      sampleRate: Option[Long],
      channels: Option[Long],
      bitDepth: Option[Long],
      nFrames: Option[Long],
      contentOffset: Int,
      ok: Boolean)

  val Failed: Decoded = Decoded(None, None, None, None, None, None, None, 0, ok = false)

  // ---- deterministic planting rules (mirrored by the DuckDB oracle) ----

  def formatOf(docId: Long): Int = (docId % 4).toInt // 0=png 1=wav 2=jpeg 3=avi
  def isCorrupt(docId: Long): Boolean = docId % 97 == 0
  def plantedWidth(docId: Long): Long = 16 + (docId * 7) % 2048
  def plantedHeight(docId: Long): Long = 16 + (docId * 13) % 1536
  def plantedChannels(docId: Long): Long = 1 + docId % 2
  def plantedVideoFrames(docId: Long): Long = 24 + docId % 240
  private val rates = Array(8000L, 16000L, 22050L, 44100L, 48000L)
  def plantedSampleRate(docId: Long): Long = rates((docId % 5).toInt)

  def mediaType(docId: Long): String = formatOf(docId) match {
    case 0 => "image/png"
    case 1 => "audio/wav"
    case 2 => "image/jpeg"
    case _ => "video/x-msvideo"
  }

  /** Synthesize header + content bytes for one document. A corrupt doc
    * (docId % 97 == 0) gets its first magic byte zeroed — a claimed-type /
    * actual-bytes mismatch, the case a real ingest must survive.
    */
  def build(docId: Long, text: String): Array[Byte] = {
    val content = if (text == null) Array.emptyByteArray
                  else text.getBytes(StandardCharsets.UTF_8)
    val header = formatOf(docId) match {
      case 0 => pngHeader(plantedWidth(docId), plantedHeight(docId))
      case 1 => wavHeader(plantedSampleRate(docId), plantedChannels(docId).toInt, content.length)
      case 2 => jpegHeader(plantedWidth(docId), plantedHeight(docId))
      case _ => aviHeader(plantedWidth(docId), plantedHeight(docId),
        plantedVideoFrames(docId), content.length)
    }
    if (isCorrupt(docId)) header(0) = 0
    header ++ content
  }

  /** 33 bytes: 8-byte signature + IHDR (len, type, 13-byte data, CRC32). */
  private def pngHeader(width: Long, height: Long): Array[Byte] = {
    val bb = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13)
    bb.put("IHDR".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(width.toInt).putInt(height.toInt)
    bb.put(8.toByte)  // bit depth
    bb.put(6.toByte)  // color type RGBA
    bb.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    val arr = bb.array()
    val crc = new CRC32
    crc.update(arr, 12, 17) // chunk type + data
    ByteBuffer.wrap(arr, 29, 4).order(ByteOrder.BIG_ENDIAN).putInt(crc.getValue.toInt)
    arr
  }

  /** Canonical 44-byte RIFF/WAVE PCM header; dataLen = content bytes. */
  private def wavHeader(sampleRate: Long, channels: Int, dataLen: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    val blockAlign = channels * 2 // 16-bit samples
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(16)                     // fmt chunk size
    bb.putShort(1)                    // PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate.toInt)
    bb.putInt((sampleRate * blockAlign).toInt) // byte rate
    bb.putShort(blockAlign.toShort)
    bb.putShort(16)                   // bits per sample
    bb.put("data".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(dataLen)
    bb.array()
  }

  /** 39 bytes: SOI + APP0/JFIF (18) + SOF0 baseline (19). */
  private def jpegHeader(width: Long, height: Long): Array[Byte] = {
    val bb = ByteBuffer.allocate(39).order(ByteOrder.BIG_ENDIAN)
    bb.put(0xff.toByte).put(0xd8.toByte)                      // SOI
    bb.put(0xff.toByte).put(0xe0.toByte).putShort(16)         // APP0, len
    bb.put("JFIF".getBytes(StandardCharsets.US_ASCII)).put(0.toByte)
    bb.put(1.toByte).put(1.toByte)                            // version 1.1
    bb.put(0.toByte)                                          // units
    bb.putShort(1).putShort(1)                                // x/y density
    bb.put(0.toByte).put(0.toByte)                            // thumbnail
    bb.put(0xff.toByte).put(0xc0.toByte).putShort(17)         // SOF0, len
    bb.put(8.toByte)                                          // precision
    bb.putShort(height.toShort).putShort(width.toShort)
    bb.put(3.toByte)                                          // 3 components
    bb.put(1.toByte).put(0x22.toByte).put(0.toByte)
    bb.put(2.toByte).put(0x11.toByte).put(1.toByte)
    bb.put(3.toByte).put(0x11.toByte).put(1.toByte)
    bb.array()
  }

  /** 88 bytes: RIFF/'AVI ' + LIST('hdrl') + avih main header (56-byte
    * data: µs/frame, rates, flags, TOTAL FRAMES, streams, dims, reserved).
    */
  private def aviHeader(width: Long, height: Long, frames: Long, contentLen: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(88).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(80 + contentLen)
    bb.put("AVI ".getBytes(StandardCharsets.US_ASCII))
    bb.put("LIST".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(68)                    // 'hdrl' + avih chunk (8 + 56)
    bb.put("hdrl".getBytes(StandardCharsets.US_ASCII))
    bb.put("avih".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(56)
    bb.putInt(41667)                 // µs per frame (24 fps)
    bb.putInt(0)                     // max bytes/sec
    bb.putInt(0)                     // padding granularity
    bb.putInt(0x10)                  // flags: AVIF_HASINDEX
    bb.putInt(frames.toInt)          // total frames
    bb.putInt(0)                     // initial frames
    bb.putInt(1)                     // streams
    bb.putInt(0)                     // suggested buffer size
    bb.putInt(width.toInt)
    bb.putInt(height.toInt)
    // 16 reserved bytes remain zero
    bb.array()
  }

  // ------------------------------ decode ------------------------------

  /** Dispatch on magic bytes; any structural violation → `Failed`. RIFF
    * containers sub-dispatch on the form type (WAVE vs 'AVI ').
    */
  def decode(payload: Array[Byte]): Decoded = {
    if (payload == null || payload.length < 12) Failed
    else if ((payload(0) & 0xff) == 0x89 && payload(1) == 'P') decodePng(payload)
    else if (payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F') {
      if (payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E')
        decodeWav(payload)
      else if (payload(8) == 'A' && payload(9) == 'V' && payload(10) == 'I' && payload(11) == ' ')
        decodeAvi(payload)
      else Failed
    }
    else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) decodeJpeg(payload)
    else Failed
  }

  /** Walk top-level RIFF chunks for LIST('hdrl'), then its sub-chunks for
    * 'avih'; frames/width/height live at fixed offsets in the avih data.
    */
  private def decodeAvi(p: Array[Byte]): Decoded = {
    if (p.length < 88) return Failed
    val bb = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    while (off + 8 <= p.length) {
      val id = new String(p, off, 4, StandardCharsets.US_ASCII)
      val size = bb.getInt(off + 4).toLong & 0xffffffffL
      if (id == "LIST" && off + 12 <= p.length &&
          new String(p, off + 8, 4, StandardCharsets.US_ASCII) == "hdrl") {
        // size is UNSIGNED 32-bit: clamp in Long arithmetic — truncating
        // to Int can go negative (crafted payload → loop never advances)
        val listEnd = math.min(off.toLong + 8L + size, p.length.toLong).toInt
        var sub = off + 12
        while (sub + 8 <= listEnd) {
          val subId = new String(p, sub, 4, StandardCharsets.US_ASCII)
          val subSize = bb.getInt(sub + 4).toLong & 0xffffffffL
          if (subId == "avih") {
            if (subSize < 40 || sub + 8 + 40 > p.length) return Failed
            val d = sub + 8
            val frames = bb.getInt(d + 16).toLong & 0xffffffffL
            val w = bb.getInt(d + 32).toLong & 0xffffffffL
            val h = bb.getInt(d + 36).toLong & 0xffffffffL
            if (w == 0 || h == 0) return Failed
            return Decoded(Some("avi"), Some(w), Some(h), None, None, None,
              Some(frames), listEnd, ok = true)
          }
          val subNext = sub.toLong + 8L + (subSize + 1) / 2 * 2
          sub = if (subNext > listEnd) listEnd else subNext.toInt
        }
        return Failed // hdrl without avih
      }
      val next = off.toLong + 8L + (size + 1) / 2 * 2
      off = if (next > p.length) p.length else next.toInt
    }
    Failed
  }

  private val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def decodePng(p: Array[Byte]): Decoded = {
    if (p.length < 33) return Failed
    var i = 0
    while (i < 8) { if (p(i) != pngSig(i)) return Failed; i += 1 }
    val bb = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
    val len = bb.getInt(8)
    if (len != 13) return Failed
    if (!(p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')) return Failed
    val crc = new CRC32
    crc.update(p, 12, 4 + len)
    if (crc.getValue.toInt != bb.getInt(16 + len)) return Failed
    val w = bb.getInt(16).toLong & 0xffffffffL
    val h = bb.getInt(20).toLong & 0xffffffffL
    if (w == 0 || h == 0) return Failed
    Decoded(Some("png"), Some(w), Some(h), None, None, Some((p(24) & 0xff).toLong),
      Some(1L), 20 + len, ok = true)
  }

  /** Walk RIFF chunks: require WAVE form, read `fmt ` fields, locate
    * `data`; frames = dataLen / blockAlign.
    */
  private def decodeWav(p: Array[Byte]): Decoded = {
    if (p.length < 44) return Failed
    val bb = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    if (!(p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')) return Failed
    var off = 12
    var sr, ch, bits, blockAlign = -1L
    var dataLen = -1L
    var dataOff = -1
    while (off + 8 <= p.length && (dataLen < 0 || sr < 0)) {
      val id = new String(p, off, 4, StandardCharsets.US_ASCII)
      val size = bb.getInt(off + 4).toLong & 0xffffffffL
      if (id == "fmt ") {
        if (size < 16 || off + 8 + 16 > p.length) return Failed
        ch = bb.getShort(off + 10).toLong
        sr = bb.getInt(off + 12).toLong & 0xffffffffL
        blockAlign = bb.getShort(off + 20).toLong
        bits = bb.getShort(off + 22).toLong
      } else if (id == "data") {
        dataLen = size
        dataOff = off + 8
      }
      // chunks are word-aligned in RIFF; data chunk payload may run to
      // EOF. Advance in LONG arithmetic: the 32-bit size is UNSIGNED, and
      // truncating a huge claimed size to Int yields a negative advance —
      // an infinite loop on a crafted payload, not a Failed
      val next = off.toLong + 8L + (if (id == "data") size else (size + 1) / 2 * 2)
      off = if (next > p.length) p.length else next.toInt
    }
    if (sr <= 0 || ch <= 0 || blockAlign <= 0 || dataLen < 0) return Failed
    Decoded(Some("wav"), None, None, Some(sr), Some(ch), Some(bits),
      Some(dataLen / blockAlign), dataOff, ok = true)
  }

  /** Scan marker segments from SOI until a SOF (C0–CF except C4/C8/CC),
    * then read precision/height/width. Handles the two T.81 cases a naive
    * scanner misparses: 0xFF fill bytes before a marker (§B.1.1.2 allows
    * any number) and STANDALONE markers (TEM 01, RST0–7 D0–D7, SOI D8)
    * that carry no length field.
    */
  private def decodeJpeg(p: Array[Byte]): Decoded = {
    var off = 2
    while (off + 1 < p.length) {
      if ((p(off) & 0xff) != 0xff) return Failed
      // skip fill bytes: a run of 0xFF ends at the last one before the
      // marker code
      while (off + 1 < p.length && (p(off + 1) & 0xff) == 0xff) off += 1
      if (off + 1 >= p.length) return Failed
      val marker = p(off + 1) & 0xff
      if (marker == 0xda || marker == 0xd9) return Failed // SOS/EOI before SOF
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
        off += 2 // standalone marker, no length segment
      } else {
        if (off + 4 > p.length) return Failed
        val len = ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
        if (len < 2 || off + 2 + len > p.length) return Failed
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 8) return Failed
          val precision = (p(off + 4) & 0xff).toLong
          val h = (((p(off + 5) & 0xff) << 8) | (p(off + 6) & 0xff)).toLong
          val w = (((p(off + 7) & 0xff) << 8) | (p(off + 8) & 0xff)).toLong
          if (w == 0 || h == 0) return Failed
          return Decoded(Some("jpeg"), Some(w), Some(h), None, None, Some(precision),
            Some(1L), off + 2 + len, ok = true)
        }
        off += 2 + len
      }
    }
    Failed
  }
}
