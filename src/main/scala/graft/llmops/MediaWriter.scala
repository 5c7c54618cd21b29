package graft.llmops

import java.io.ByteArrayOutputStream

/** Minimal, structurally valid audio/video container builders — the
  * synthetic-input partner of [[graft.expressions.AvMeta]], on the same
  * pattern as [[ImageWriter]]: gate queries and specs build real WAV/MP4
  * headers with known properties instead of shipping binary fixtures.
  * Deterministic bytes for identical inputs.
  */
object MediaWriter {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)

  /** PCM WAV: RIFF header + `fmt ` chunk + `data` chunk of `nSamples`
    * zeroed frames (each frame = channels × bits/8 bytes).
    */
  def wav(channels: Int, sampleRate: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = nSamples * blockAlign
    val out = new ByteArrayOutputStream(44 + dataSize)
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(36L + dataSize))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32(16))
    out.write(le16(1)) // PCM
    out.write(le16(channels))
    out.write(le32(sampleRate))
    out.write(le32(sampleRate.toLong * blockAlign)) // byte rate
    out.write(le16(blockAlign))
    out.write(le16(bits))
    out.write("data".getBytes("US-ASCII"))
    out.write(le32(dataSize))
    out.write(new Array[Byte](dataSize))
    if ((dataSize & 1) == 1) out.write(0) // RIFF word alignment
    out.toByteArray
  }

  /** COMPLETE 16-bit PCM WAV from caller-supplied samples —
    * `samples(frame * channels + c)` interleaved, little-endian on the
    * wire — the audio partner of [[ImageWriter.pngFromPixels]] for
    * fixtures whose content must be controlled exactly.
    */
  def wavFromSamples(channels: Int, sampleRate: Int,
      samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0, s"bad wav: $channels ch @ $sampleRate")
    require(samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    val blockAlign = channels * 2
    val dataSize = samples.length * 2
    val out = new ByteArrayOutputStream(44 + dataSize)
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(36L + dataSize))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32(16))
    out.write(le16(1)) // PCM
    out.write(le16(channels))
    out.write(le32(sampleRate))
    out.write(le32(sampleRate.toLong * blockAlign))
    out.write(le16(blockAlign))
    out.write(le16(16))
    out.write("data".getBytes("US-ASCII"))
    out.write(le32(dataSize))
    samples.foreach(s => out.write(le16(s & 0xFFFF)))
    if ((dataSize & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** COMPLETE 16-bit PCM WAV with the closed-form signal
    * `s(n, c) = ((5n + 11c + seed) mod 4096) - 2048` (frame `n`, channel
    * `c`) — all-integer, so an external SQL engine recomputes every
    * sample, sum, and fingerprint bit from (channels, nFrames, seed)
    * alone, exactly as [[ImageWriter.pngWithPixels]]'s pixel pattern
    * does for images.
    */
  def wavWithSamples(channels: Int, sampleRate: Int, nFrames: Int,
      seed: Int): Array[Byte] =
    wavFromSamples(channels, sampleRate,
      Array.tabulate(nFrames * channels) { i =>
        val n = i / channels
        val c = i % channels
        (((5 * n + 11 * c + seed) % 4096) - 2048).toShort
      })

  /** CBR MPEG-1 Layer III frame stream: `frames` frames with REAL
    * headers (sync, bitrate/sample-rate indices, channel mode) and
    * seed-derived filler payloads — frame-header metadata is the parsed
    * surface ([[graft.expressions.AvMeta]]), not audio. Optionally
    * prefixed by an ID3v2.3 tag with `id3Body` body bytes (syncsafe
    * size, like every real tagger writes). Frame length is the spec's
    * `⌊144·bitrate/rate⌋` (padding bit 0), so external engines compute
    * byte counts and CBR durations closed-form.
    */
  def mp3(frames: Int, bitrateKbps: Int, sampleRate: Int, mono: Boolean,
      seed: Int, id3Body: Int = 0): Array[Byte] = {
    val brIdx = Mp3Bitrates.indexOf(bitrateKbps)
    val srIdx = Mp3Rates.indexOf(sampleRate)
    require(brIdx > 0, s"unsupported CBR bitrate: $bitrateKbps")
    require(srIdx >= 0, s"unsupported MPEG-1 rate: $sampleRate")
    require(frames > 0, s"frames must be positive: $frames")
    val frameLen = 144000 * bitrateKbps / sampleRate
    val out = new ByteArrayOutputStream()
    if (id3Body > 0) {
      out.write("ID3".getBytes("US-ASCII"))
      out.write(Array[Byte](3, 0, 0)) // v2.3, no flags
      out.write(Array(
        ((id3Body >> 21) & 0x7F).toByte, ((id3Body >> 14) & 0x7F).toByte,
        ((id3Body >> 7) & 0x7F).toByte, (id3Body & 0x7F).toByte))
      for (i <- 0 until id3Body) out.write((i * 7 + seed) % 128) // tag filler
    }
    for (f <- 0 until frames) {
      out.write(0xFF)
      out.write(0xFB) // MPEG-1, Layer III, no CRC
      out.write((brIdx << 4) | (srIdx << 2)) // padding 0, private 0
      out.write(if (mono) 0xC0 else 0x00) // mode in the top two bits
      for (i <- 4 until frameLen) out.write((f * 131 + i * 31 + seed) % 251)
    }
    out.toByteArray
  }

  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** ISO BMFF skeleton: `ftyp` + `moov`(`mvhd` v0 or v1) with the given
    * movie timescale and duration (in timescale units).
    */
  def mp4(timescale: Long, duration: Long, version: Int = 0): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0x200) ++
        "isomiso2".getBytes("US-ASCII"))
    val mvhdBody =
      if (version == 1)
        Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(timescale) ++
          be64(duration) ++ mvhdTail
      else
        Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
          be32(duration) ++ mvhdTail
    val moov = box("moov", box("mvhd", mvhdBody))
    ftyp ++ moov
  }

  /** ADTS-framed AAC metadata shape: `frames` frames with valid fixed
    * headers (MPEG-4, layer 00, the given sampling-frequency index and
    * channel configuration) over deterministic filler payloads — the
    * header-walk twin for the `aac` metadata arm (payload entropy coding
    * is out of the metadata arm's scope, exactly like [[ogg]]).
    */
  def adts(frames: Int, sfIndex: Int, channelCfg: Int,
      payloadBytes: Int = 64): Array[Byte] = {
    require(sfIndex >= 0 && sfIndex <= 12 && channelCfg >= 1 && channelCfg <= 7)
    val out = new java.io.ByteArrayOutputStream(frames * (7 + payloadBytes))
    var f = 0
    while (f < frames) {
      val len = 7 + payloadBytes
      out.write(0xFF)
      out.write(0xF1) // MPEG-4, layer 00, no CRC
      out.write((1 << 6) | (sfIndex << 2) | ((channelCfg >> 2) & 1)) // AAC-LC
      out.write(((channelCfg & 3) << 6) | ((len >> 11) & 3))
      out.write((len >> 3) & 0xFF)
      out.write(((len & 7) << 5) | 0x1F)
      out.write(0xFC) // buffer fullness + 1 raw block
      var p = 0
      while (p < payloadBytes) { out.write((f * 31 + p) & 0xFF); p += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** M4A skeleton: `ftyp` + `moov`(`mvhd`, `trak`(`mdia`(`mdhd` with the
    * media timescale/duration, `hdlr` soun, `minf`(`stbl`(`stsd`(`mp4a`
    * sample entry: channels, 16-bit samples, 16.16 sample rate)))))).
    * The header-walk twin for the `m4a` metadata arm.
    */
  def m4a(channels: Int, sampleRate: Int, timescale: Long,
      duration: Long): Array[Byte] = {
    val ftyp = box("ftyp",
      "M4A ".getBytes("US-ASCII") ++ be32(0) ++
        "M4A isomiso2".getBytes("US-ASCII"))
    val mvhdBody = Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ mvhdTail
    val mdhdBody = Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ be32(0x55C40000L) // und language
    val hdlrBody = be32(0) ++ be32(0) ++ "soun".getBytes("US-ASCII") ++
      new Array[Byte](12) ++ "aud ".getBytes("ISO-8859-1")
    val mp4aBody =
      new Array[Byte](6) ++ Array[Byte](0, 1) ++ // reserved + data_ref_idx
        new Array[Byte](8) ++ // reserved
        Array[Byte]((channels >> 8).toByte, channels.toByte, 0, 16) ++
        be32(0) ++ be32(sampleRate.toLong << 16)
    val stsdBody = be32(0) ++ be32(1) ++ box("mp4a", mp4aBody)
    val stbl = box("stbl", box("stsd", stsdBody))
    val minf = box("minf", stbl)
    val mdia = box("mdia", box("mdhd", mdhdBody) ++ box("hdlr", hdlrBody) ++ minf)
    val moov = box("moov", box("mvhd", mvhdBody) ++ box("trak", mdia))
    ftyp ++ moov ++ box("mdat", Array.tabulate[Byte](32)(i => (i * 7).toByte))
  }

  // rate, volume, reserved, matrix, predefined, next-track-id
  private def mvhdTail: Array[Byte] =
    be32(0x00010000L) ++ Array[Byte](0, 0, 0, 0, 0, 0) ++ // rate, volume, reserved16
      new Array[Byte](8) ++ // reserved32 x2
      (be32(0x00010000L) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000L) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000L)) ++ // unity matrix
      new Array[Byte](24) ++ // predefined x6
      be32(2) // next track id

  private def box(tpe: String, body: Array[Byte]): Array[Byte] =
    be32(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body

  /** FLAC stream head: fLaC magic + STREAMINFO block (the mandatory
    * first metadata block) with the packed rate/channels/bits/total
    * fields; no frames — the header-metadata fixture.
    */
  def flac(channels: Int, sampleRate: Int, bits: Int,
      totalSamples: Long): Array[Byte] = {
    val info = new Array[Byte](34)
    // min/max blocksize 4096
    info(0) = 0x10; info(1) = 0x00; info(2) = 0x10; info(3) = 0x00
    // min/max framesize 0 (unknown): bytes 4..9 stay 0
    info(10) = ((sampleRate >> 12) & 0xFF).toByte
    info(11) = ((sampleRate >> 4) & 0xFF).toByte
    info(12) = (((sampleRate & 0xF) << 4) | (((channels - 1) & 7) << 1) |
      (((bits - 1) >> 4) & 1)).toByte
    info(13) = ((((bits - 1) & 0xF) << 4) | ((totalSamples >> 32) & 0xF)).toByte
    info(14) = ((totalSamples >> 24) & 0xFF).toByte
    info(15) = ((totalSamples >> 16) & 0xFF).toByte
    info(16) = ((totalSamples >> 8) & 0xFF).toByte
    info(17) = (totalSamples & 0xFF).toByte
    "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ info // last-block flag set
  }

  /** Ogg first page holding a Vorbis (or Opus) identification header. */
  def ogg(channels: Int, sampleRate: Int, opus: Boolean = false): Array[Byte] = {
    val body =
      if (opus) "OpusHead".getBytes("US-ASCII") ++
        Array[Byte](1, channels.toByte, 0, 0) ++ le32(sampleRate).take(4) ++
        Array[Byte](0, 0, 0)
      else Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++
        le32(0) ++ Array[Byte](channels.toByte) ++ le32(sampleRate).take(4) ++
        le32(0) ++ le32(0) ++ le32(0) ++ Array[Byte](0xB8.toByte, 1)
    val head = new java.io.ByteArrayOutputStream()
    head.write("OggS".getBytes("US-ASCII"))
    head.write(0) // version
    head.write(2) // beginning-of-stream
    head.write(new Array[Byte](8)) // granule
    head.write(le32(1).take(4)) // serial
    head.write(le32(0).take(4)) // page seq
    head.write(le32(0).take(4)) // crc (unchecked by the metadata walk)
    head.write(1) // one segment
    head.write(body.length)
    head.write(body)
    head.toByteArray
  }

  /** Minimal TIFF: header + IFD0 with ImageWidth/ImageLength, either
    * byte order; LONG values.
    */
  def tiff(width: Int, height: Int, littleEndian: Boolean = true): Array[Byte] = {
    def w16(v: Int): Array[Byte] =
      if (littleEndian) Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
      else Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def w32(v: Int): Array[Byte] =
      if (littleEndian) le32(v).take(4) else be32(v).slice(0, 4)
    val magic =
      if (littleEndian) Array[Byte]('I', 'I', 42, 0)
      else Array[Byte]('M', 'M', 0, 42)
    def entry(tag: Int, typ: Int, value: Int): Array[Byte] = {
      val v = if (typ == 3) w16(value) ++ Array[Byte](0, 0) else w32(value)
      w16(tag) ++ w16(typ) ++ w32(1) ++ v
    }
    magic ++ w32(8) ++ w16(2) ++
      entry(256, 4, width) ++ entry(257, 3, height) ++ w32(0)
  }
}
