package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio/video container metadata from binary headers — `AvMeta(content)`
  * returns `struct&lt;format string, channels int, sample_rate int, bits int,
  * duration_ms bigint&gt;` or NULL when the bytes are not a recognized
  * container. The audio/video sibling of [[ImageDims]]: the multimodal
  * curation filters that matter (length gates, sample-rate routing,
  * mono/stereo splits) need only fixed documented header fields, not a
  * codec — so they run at scan speed inside whole-stage codegen with zero
  * external deps, while sample/frame decode stays behind
  * [[graft.llmops.Multimodal]]'s documented stub.
  *
  * Parsed containers:
  *   - WAV (RIFF/WAVE): `fmt ` chunk → channels/rate/bits, `data` chunk
  *     size → duration via block alignment;
  *   - MP4/MOV (ISO BMFF): top-level box walk to `moov`/`mvhd` (v0 and
  *     v1) → timescale + duration; channels/rate/bits are NULL (they live
  *     per-track and gate nothing at curation time);
  *   - MP3 (MPEG-1 Layer III): optional ID3v2 tag skip, then the first
  *     frame header → sample rate + mono/stereo, CBR duration from the
  *     audio byte count. TWO consecutive valid frame headers are
  *     required (the second at exactly the frame length the first
  *     implies) — a stray 0xFF in arbitrary bytes matches the sync
  *     pattern far too easily for a single-header sniff. `bits` is NULL
  *     (MP3 has no sample depth); VBR files report the first frame's
  *     rate, the documented CBR assumption.
  */
case class AvMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AvMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_av_meta"

  override protected def nullSafeEval(input: Any): Any =
    AvMeta.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.AvMeta.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AvMeta =
    copy(child = newChild)
}

object AvMeta {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFF).toLong) | ((b(i + 1) & 0xFF).toLong << 8) |
      ((b(i + 2) & 0xFF).toLong << 16) | ((b(i + 3) & 0xFF).toLong << 24)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFF).toLong << 24) | ((b(i + 1) & 0xFF).toLong << 16) |
      ((b(i + 2) & 0xFF).toLong << 8) | (b(i + 3) & 0xFF).toLong
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b.length >= i + 4 && b(i) == t.charAt(0).toByte && b(i + 1) == t.charAt(1).toByte &&
      b(i + 2) == t.charAt(2).toByte && b(i + 3) == t.charAt(3).toByte

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) wav(b)
    else if (tag(b, 0, "RIFF") && tag(b, 8, "AVI ")) avi(b)
    else if (tag(b, 4, "ftyp")) mp4(b)
    else if (tag(b, 0, "fLaC")) flac(b)
    else if (tag(b, 0, "OggS")) ogg(b)
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xF6) == 0xF0) adts(b)
    else mp3(b)
  }

  private val AacRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** ADTS-framed AAC (the raw `.aac` shape and the payload of streaming
    * audio): sync + layer 00 distinguishes it from MPEG audio. Sample
    * rate / channel configuration from the fixed header; duration by
    * WALKING every frame (ADTS is commonly VBR — 1024 samples per frame
    * regardless of frame bytes). A malformed continuation frame reports
    * NULL duration (streaming-truncation posture, like the mp3 arm);
    * a malformed FIRST frame refuses.
    */
  private def adts(b: Array[Byte]): InternalRow = {
    def frameLen(i: Int): Int = {
      if (i + 7 > b.length) return -1
      if ((b(i) & 0xFF) != 0xFF || (b(i + 1) & 0xF6) != 0xF0) return -1
      ((b(i + 3) & 0x03) << 11) | ((b(i + 4) & 0xFF) << 3) |
        ((b(i + 5) & 0xE0) >>> 5)
    }
    val sfi = (b(2) & 0x3C) >>> 2
    if (sfi >= AacRates.length) return null
    val rate = AacRates(sfi)
    val chanCfg = ((b(2) & 0x01) << 2) | ((b(3) & 0xC0) >>> 6)
    if (chanCfg == 0) return null // channel config in a PCE: out of scope
    val channels = if (chanCfg == 7) 8 else chanCfg
    val len1 = frameLen(0)
    if (len1 < 7 || len1 > b.length) return null
    // anti-false-positive like mp3: second frame must start exactly at
    // len1 with a valid header (or the file is a single exact frame)
    if (len1 < b.length && frameLen(len1) <= 0) return null
    var frames = 0L
    var i = 0
    var clean = true
    while (i < b.length && clean) {
      val fl = frameLen(i)
      if (fl < 7 || i + fl > b.length) clean = false
      else { frames += 1; i += fl }
    }
    val ms: Any =
      if (clean && i == b.length) java.lang.Long.valueOf(
        frames * 1024L * 1000L / rate)
      else null
    row("aac", channels, rate, null, ms)
  }

  /** FLAC STREAMINFO (the mandatory first metadata block): sample rate
    * (20 bits), channels, bit depth and total samples → duration. The
    * header-metadata arm of the lossless-audio family; payload decode
    * is out of scope (rice/LPC is a codec tier, not a header walk).
    */
  private def flac(b: Array[Byte]): InternalRow = {
    if (b.length < 42) return null
    if ((b(4) & 0x7F) != 0) return null // first block must be STREAMINFO
    val len = ((b(5) & 0xFF) << 16) | ((b(6) & 0xFF) << 8) | (b(7) & 0xFF)
    if (len < 34) return null
    val sr = ((b(18) & 0xFF) << 12) | ((b(19) & 0xFF) << 4) |
      ((b(20) & 0xFF) >>> 4)
    if (sr <= 0) return row("flac", null, null, null, null)
    val channels = ((b(20) >> 1) & 7) + 1
    val bits = (((b(20) & 1) << 4) | ((b(21) & 0xFF) >>> 4)) + 1
    val total = ((b(21) & 0x0FL) << 32) | ((b(22) & 0xFFL) << 24) |
      ((b(23) & 0xFFL) << 16) | ((b(24) & 0xFFL) << 8) | (b(25) & 0xFFL)
    val ms = if (total == 0) null else java.lang.Long.valueOf(total * 1000 / sr)
    row("flac", channels, sr, bits, ms)
  }

  /** Ogg first page: the identification header names the codec —
    * `vorbis` (channels u8, rate LE32) or `OpusHead` (channels
    * u8, input rate LE32). Duration: a page-header tail walk (lacing
    * hops, no CRC, no payload decode) reads the final granule position
    * of the first stream's serial — sample count at the stream's clock
    * (Vorbis: audio rate; Opus: 48 kHz by spec, pre-skip ignored at
    * header grade). Zero/absent granule (ident-only stubs, live
    * captures) reports NULL.
    */
  private def ogg(b: Array[Byte]): InternalRow = {
    if (b.length < 28 || (b(4) & 0xFF) != 0) return null
    val nsegs = b(26) & 0xFF
    val body = 27 + nsegs
    if (body + 19 > b.length) return null
    if ((b(body) & 0xFF) == 1 && tag(b, body + 1, "vorbis")) {
      val channels = b(body + 11) & 0xFF
      val rate = (b(body + 12) & 0xFF) | ((b(body + 13) & 0xFF) << 8) |
        ((b(body + 14) & 0xFF) << 16) | ((b(body + 15) & 0xFF) << 24)
      if (rate <= 0 || channels == 0) return row("vorbis", null, null, null, null)
      val g = lastGranule(b)
      val ms = if (g <= 0) null else java.lang.Long.valueOf(g * 1000 / rate)
      row("vorbis", channels, rate, null, ms)
    } else if (tag(b, body, "Opus") && body + 19 <= b.length &&
        tag(b, body + 4, "Head")) {
      val channels = b(body + 9) & 0xFF
      val rate = (b(body + 12) & 0xFF) | ((b(body + 13) & 0xFF) << 8) |
        ((b(body + 14) & 0xFF) << 16) | ((b(body + 15) & 0xFF) << 24)
      if (rate <= 0 || channels == 0) return row("opus", null, null, null, null)
      val g = lastGranule(b)
      val ms = if (g <= 0) null else java.lang.Long.valueOf(g * 1000 / 48000)
      row("opus", channels, rate, null, ms)
    } else null
  }

  /** Final granule position of the FIRST stream's serial: page-header
    * hops only (27-byte header + lacing sum), stopping at the first
    * malformed page — a truncated tail degrades to the last intact
    * granule, never to garbage.
    */
  private def lastGranule(b: Array[Byte]): Long = {
    var pos = 0
    var granule = -1L
    var serial = 0L
    var first = true
    var pages = 0
    while (pos + 27 <= b.length && pages < (1 << 20)) {
      if (!(b(pos) == 'O' && b(pos + 1) == 'g' && b(pos + 2) == 'g' &&
        b(pos + 3) == 'S') || b(pos + 4) != 0) return granule
      var ser = 0L
      var i = 0
      while (i < 4) { ser |= (b(pos + 14 + i) & 0xFFL) << (8 * i); i += 1 }
      if (first) { serial = ser; first = false }
      val nsegs = b(pos + 26) & 0xFF
      if (pos + 27 + nsegs > b.length) return granule
      var bodyLen = 0
      i = 0
      while (i < nsegs) { bodyLen += b(pos + 27 + i) & 0xFF; i += 1 }
      if (pos.toLong + 27 + nsegs + bodyLen > b.length) return granule
      if (ser == serial) {
        var g = 0L
        i = 0
        while (i < 8) { g |= (b(pos + 6 + i) & 0xFFL) << (8 * i); i += 1 }
        if (g >= 0) granule = math.max(granule, g)
      }
      pos += 27 + nsegs + bodyLen
      pages += 1
    }
    granule
  }

  // MPEG-1 Layer III tables (ISO 11172-3): bitrate kbps by index, sample
  // rate by index
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** Frame length in bytes for MPEG-1 Layer III: ⌊144·bitrate/rate⌋ +
    * padding. Returns -1 when the 4 bytes at `i` are not a valid V1L3
    * frame header.
    */
  private def mp3FrameLen(b: Array[Byte], i: Int): Int = {
    if (i + 4 > b.length) return -1
    // sync (11 bits) + MPEG-1 (0b11) + Layer III (0b01)
    if ((b(i) & 0xFF) != 0xFF || (b(i + 1) & 0xFE) != 0xFA) return -1
    val brIdx = (b(i + 2) & 0xF0) >>> 4
    val srIdx = (b(i + 2) & 0x0C) >>> 2
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return -1 // free/bad/reserved
    val pad = (b(i + 2) & 0x02) >>> 1
    144000 * Mp3Bitrates(brIdx) / Mp3Rates(srIdx) + pad
  }

  private def mp3(b: Array[Byte]): InternalRow = {
    // skip one leading ID3v2 tag: 'ID3' + version(2) + flags + 4-byte
    // syncsafe size (7 bits per byte)
    var off = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      val next = 10L + size
      if (next >= b.length) return null
      off = next.toInt
    }
    // strip one trailing ID3v1 tag (fixed 128 bytes starting 'TAG') so a
    // single-frame file with the ubiquitous v1 trailer still validates
    // against "next frame or exact EOF", and so multi-frame files don't
    // count tag bytes as audio when computing the CBR duration
    var end = b.length
    if (end - off >= 128 && b(end - 128) == 'T' && b(end - 127) == 'A' &&
        b(end - 126) == 'G') end -= 128
    val len1 = mp3FrameLen(b, off)
    if (len1 <= 0) return null
    // anti-false-positive: the next frame must start exactly where this
    // frame's length says, with its own valid header (or be end-of-file)
    val second = off + len1
    if (second < end && mp3FrameLen(b, second) <= 0) return null
    if (second > end) return null // truncated single frame
    val brIdx = (b(off + 2) & 0xF0) >>> 4
    val srIdx = (b(off + 2) & 0x0C) >>> 2
    val mode = (b(off + 3) & 0xC0) >>> 6
    val channels = if (mode == 3) 1 else 2
    val audioBytes = (end - off).toLong
    val ms = audioBytes * 8L / Mp3Bitrates(brIdx)
    row("mp3", channels, Mp3Rates(srIdx), null,
      java.lang.Long.valueOf(ms))
  }

  private def row(fmt: String, ch: Any, rate: Any, bits: Any, ms: Any): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), ch, rate, bits, ms))

  /** RIFF chunk walk: needs a complete `fmt ` chunk; `data` is optional
    * (streaming-truncated files report NULL duration instead of failing).
    */
  private def wav(b: Array[Byte]): InternalRow = {
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var blockAlign = -1
    var dataSize = -1L
    var walking = true
    while (walking && i + 8 <= b.length) {
      val size = le32(b, i + 4)
      val body = i + 8
      if (tag(b, i, "fmt ") && body + 16 <= b.length) {
        channels = le16(b, body + 2)
        rate = le32(b, body + 4).toInt
        blockAlign = le16(b, body + 12)
        bits = le16(b, body + 14)
      } else if (tag(b, i, "data")) {
        dataSize = size
      }
      // word-aligned advance in Long space: a corrupt 32-bit size must not
      // wrap the index negative or stall the walk
      val next = body.toLong + size + (size & 1L)
      if (next <= i || next > b.length) walking = false else i = next.toInt
    }
    if (channels < 0 || rate <= 0) return null
    val ms: Any =
      if (dataSize < 0 || blockAlign <= 0) null
      else java.lang.Long.valueOf(dataSize / blockAlign * 1000L / rate)
    row("wav", channels, rate, bits, ms)
  }

  /** RIFF/AVI chunk walk to `LIST hdrl` → `avih` (the main AVI header,
    * required first in hdrl): duration = totalFrames · µsPerFrame.
    * Audio fields stay NULL — they belong to the stream headers, and a
    * metadata scan shouldn't pretend container-level knowledge it
    * doesn't have. Recognized-but-unparseable AVIs report
    * `("avi", nulls)` like the mp4 branch.
    */
  private def avi(b: Array[Byte]): InternalRow = {
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      val body = i + 8
      if (tag(b, i, "LIST") && body + 4 <= b.length && tag(b, body, "hdrl")) {
        val a = body + 4
        if (a + 8 <= b.length && tag(b, a, "avih")) {
          val asz = le32(b, a + 4)
          if (asz >= 20 && a + 8 + asz <= b.length) {
            val us = le32(b, a + 8)
            val frames = le32(b, a + 24)
            // both fields are untrusted 32-bit values; refuse the product
            // rather than overflow it
            val ms: Any =
              if (us <= 0 || frames < 0 || frames > Long.MaxValue / us) null
              else java.lang.Long.valueOf(frames * us / 1000L)
            return row("avi", null, null, null, ms)
          }
        }
        return row("avi", null, null, null, null)
      }
      val next = body.toLong + size + (size & 1L)
      if (next <= i || next > b.length) return row("avi", null, null, null, null)
      i = next.toInt
    }
    row("avi", null, null, null, null)
  }

  /** ISO BMFF top-level box walk to moov/mvhd; v0 (32-bit) and v1
    * (64-bit) movie headers.
    */
  /** First child box with the given type inside `[start,end)`; returns
    * (bodyStart, bodyEnd) or null. Malformed sizes end the walk.
    */
  private def child(b: Array[Byte], start: Int, end: Int,
      tpe: String): (Int, Int) = {
    var i = start
    while (i + 8 <= end) {
      val size = be32(b, i)
      if (size < 8 || i + size > end) return null
      if (tag(b, i + 4, tpe)) return (i + 8, (i + size).toInt)
      i += size.toInt
    }
    null
  }

  /** ISO BMFF: movie-level duration from `mvhd`; when a `trak` carries a
    * `soun` handler with an `mp4a` sample entry the row upgrades to
    * format "m4a" with channels / sample rate / sample size from the
    * sample entry and the duration from that track's `mdhd` (media
    * timescale — the honest per-track clock). Payload decode (AAC
    * entropy coding) is a codec tier, not a header walk; this arm is
    * the documented metadata boundary.
    */
  private def mp4(b: Array[Byte]): InternalRow = {
    val moov = child(b, 0, b.length, "moov")
    if (moov == null) return row("mp4", null, null, null, null)
    val (ms, me) = moov
    var movieMs: Any = null
    val mvhd = child(b, ms, me, "mvhd")
    if (mvhd != null && mvhd._1 + 4 <= mvhd._2) {
      val j = mvhd._1 - 8
      val end = mvhd._2
      val version = b(j + 8) & 0xFF
      movieMs =
        if (version == 1 && j + 8 + 4 + 16 + 8 + 8 <= end) {
          val timescale = be32(b, j + 8 + 4 + 16)
          val duration = be64(b, j + 8 + 4 + 16 + 4)
          if (timescale > 0) java.lang.Long.valueOf(duration * 1000L / timescale) else null
        } else if (version == 0 && j + 8 + 4 + 8 + 4 + 4 <= end) {
          val timescale = be32(b, j + 8 + 4 + 8)
          val duration = be32(b, j + 8 + 4 + 8 + 4)
          if (timescale > 0) java.lang.Long.valueOf(duration * 1000L / timescale) else null
        } else null
    }
    // audio track: trak → mdia → (mdhd, hdlr=soun, minf → stbl → stsd → mp4a)
    var i = ms
    while (i + 8 <= me) {
      val size = be32(b, i)
      if (size < 8 || i + size > me) return row("mp4", null, null, null, movieMs)
      if (tag(b, i + 4, "trak")) {
        val te = (i + size).toInt
        val mdia = child(b, i + 8, te, "mdia")
        if (mdia != null) {
          val hdlr = child(b, mdia._1, mdia._2, "hdlr")
          val isSoun = hdlr != null && hdlr._1 + 12 <= hdlr._2 &&
            tag(b, hdlr._1 + 8, "soun")
          if (isSoun) {
            var trackMs: Any = null
            val mdhd = child(b, mdia._1, mdia._2, "mdhd")
            if (mdhd != null && mdhd._1 + 4 <= mdhd._2) {
              val j = mdhd._1
              val version = b(j) & 0xFF
              if (version == 1 && j + 4 + 16 + 4 + 8 <= mdhd._2) {
                val timescale = be32(b, j + 4 + 16)
                val duration = be64(b, j + 4 + 16 + 4)
                if (timescale > 0)
                  trackMs = java.lang.Long.valueOf(duration * 1000L / timescale)
              } else if (version == 0 && j + 4 + 8 + 4 + 4 <= mdhd._2) {
                val timescale = be32(b, j + 4 + 8)
                val duration = be32(b, j + 4 + 8 + 4)
                if (timescale > 0)
                  trackMs = java.lang.Long.valueOf(duration * 1000L / timescale)
              }
            }
            val minf = child(b, mdia._1, mdia._2, "minf")
            val stbl = if (minf == null) null else child(b, minf._1, minf._2, "stbl")
            val stsd = if (stbl == null) null else child(b, stbl._1, stbl._2, "stsd")
            if (stsd != null && stsd._1 + 8 <= stsd._2) {
              val entry = child(b, stsd._1 + 8, stsd._2, "mp4a")
              if (entry != null && entry._1 + 28 <= entry._2) {
                val e = entry._1
                // sample entry: 6 reserved + 2 data_ref + 8 reserved,
                // then channelcount(2) samplesize(2) predef(4) rate(16.16)
                val channels = ((b(e + 16) & 0xFF) << 8) | (b(e + 17) & 0xFF)
                val sampleSize = ((b(e + 18) & 0xFF) << 8) | (b(e + 19) & 0xFF)
                val rate = be32(b, e + 24) >>> 16
                return row("m4a",
                  if (channels > 0) channels else null,
                  if (rate > 0) rate.toInt else null,
                  if (sampleSize > 0) sampleSize else null,
                  if (trackMs != null) trackMs else movieMs)
              }
            }
          }
        }
      }
      i += size.toInt
    }
    row("mp4", null, null, null, movieMs)
  }
}
