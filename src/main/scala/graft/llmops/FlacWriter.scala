package graft.llmops

import java.io.ByteArrayOutputStream

/** FLAC writer twin of [[Flac]] — real RFC 9639 streams with correct
  * CRC-8/CRC-16 trailers, built independently (its own bit packer, its
  * own Rice coder). Subframe strategies cover the decoder's paths:
  * `verbatim`, `constant` (auto-detected), `fixed` orders 0–4 with
  * Rice-coded residuals (parameter chosen per partition), and `lpc`
  * with caller-given quantized coefficients — the encode-side forward
  * prediction mirrors the decoder's Long-accumulated inverse exactly,
  * so round trips are sample-exact at every setting.
  */
object FlacWriter {

  private final class Bw {
    val out = new ByteArrayOutputStream()
    private var buf = 0
    private var cnt = 0
    def writeBit(v: Int): Unit = {
      buf = (buf << 1) | (v & 1)
      cnt += 1
      if (cnt == 8) { out.write(buf); buf = 0; cnt = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1).toInt); i -= 1 }
    }
    def alignByte(): Unit = while (cnt != 0) writeBit(0)
    def bytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  private def crc8(b: Array[Byte], from: Int, to: Int): Int = {
    var crc = 0
    var i = from
    while (i < to) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    crc
  }

  private def crc16(b: Array[Byte], from: Int, to: Int): Int = {
    var crc = 0
    var i = from
    while (i < to) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
        else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  /** Encode 16-bit interleaved samples. `mode`: "verbatim", "fixed"
    * (order auto 0–2 by trial), or "lpc" (uses `lpcCoefs`/`lpcShift`).
    * `blockSize` frames per FLAC frame; mid/side off (independent
    * channels) — decorrelation is a decoder-coverage concern for
    * hand-built streams, not the twin's.
    */
  def flac(channels: Int, sampleRate: Int, samples: Array[Int],
      blockSize: Int = 4096, mode: String = "fixed",
      lpcCoefs: Array[Int] = Array(2, -1), lpcShift: Int = 0): Array[Byte] = {
    require(samples.length % channels == 0)
    val nFrames = samples.length / channels
    val head = new ByteArrayOutputStream()
    head.write("fLaC".getBytes("US-ASCII"))
    val info = new Array[Byte](34)
    val bsz = math.min(blockSize, 65535)
    info(0) = ((bsz >> 8) & 0xFF).toByte; info(1) = (bsz & 0xFF).toByte
    info(2) = info(0); info(3) = info(1)
    info(10) = ((sampleRate >> 12) & 0xFF).toByte
    info(11) = ((sampleRate >> 4) & 0xFF).toByte
    info(12) = (((sampleRate & 0xF) << 4) | (((channels - 1) & 7) << 1) |
      (((16 - 1) >> 4) & 1)).toByte
    info(13) = ((((16 - 1) & 0xF) << 4) | ((nFrames.toLong >> 32) & 0xF)).toByte
    info(14) = ((nFrames >> 24) & 0xFF).toByte
    info(15) = ((nFrames >> 16) & 0xFF).toByte
    info(16) = ((nFrames >> 8) & 0xFF).toByte
    info(17) = (nFrames & 0xFF).toByte
    head.write(Array[Byte](0x80.toByte, 0, 0, 34))
    head.write(info)

    var frameIdx = 0
    var off = 0
    while (off < nFrames) {
      val n = math.min(blockSize, nFrames - off)
      head.write(frame(channels, samples, off, n, frameIdx, mode,
        lpcCoefs, lpcShift))
      off += n
      frameIdx += 1
    }
    head.toByteArray
  }

  private def utf8Coded(v: Int): Array[Byte] = {
    if (v < 0x80) Array(v.toByte)
    else if (v < 0x800) Array((0xC0 | (v >> 6)).toByte,
      (0x80 | (v & 0x3F)).toByte)
    else Array((0xE0 | (v >> 12)).toByte, (0x80 | ((v >> 6) & 0x3F)).toByte,
      (0x80 | (v & 0x3F)).toByte)
  }

  private def frame(channels: Int, samples: Array[Int], off: Int, n: Int,
      idx: Int, mode: String, lpcCoefs: Array[Int],
      lpcShift: Int): Array[Byte] = {
    val bw = new Bw
    bw.writeBits(0xFF, 8)
    bw.writeBits(0xF8, 8) // sync tail, fixed blocksize strategy
    bw.writeBits(7, 4) // block size: 16-bit value-1 follows
    bw.writeBits(0, 4) // sample rate from STREAMINFO
    bw.writeBits(channels - 1, 4) // independent channels
    bw.writeBits(4, 3) // 16-bit samples
    bw.writeBits(0, 1)
    utf8Coded(idx).foreach(b => bw.writeBits(b & 0xFF, 8))
    bw.writeBits(n - 1, 16)
    // header CRC-8 over everything so far
    bw.alignByte()
    val headBytes = bw.out.toByteArray
    bw.writeBits(crc8(headBytes, 0, headBytes.length), 8)

    var c = 0
    while (c < channels) {
      val chan = Array.tabulate(n)(i => samples((off + i) * channels + c))
      writeSubframe(bw, chan, mode, lpcCoefs, lpcShift)
      c += 1
    }
    bw.alignByte()
    val body = bw.out.toByteArray
    bw.writeBits(crc16(body, 0, body.length), 16)
    bw.bytes
  }

  private def writeSubframe(bw: Bw, s: Array[Int], mode: String,
      lpcCoefs: Array[Int], lpcShift: Int): Unit = {
    bw.writeBits(0, 1) // pad
    val constant = s.forall(_ == s(0))
    if (constant) {
      bw.writeBits(0, 6)
      bw.writeBits(0, 1) // no wasted bits
      bw.writeBits(s(0).toLong & 0xFFFF, 16)
      return
    }
    mode match {
      case "verbatim" =>
        bw.writeBits(1, 6)
        bw.writeBits(0, 1)
        s.foreach(v => bw.writeBits(v.toLong & 0xFFFF, 16))
      case "lpc" =>
        val order = lpcCoefs.length
        require(order >= 1 && order <= 32 && order < s.length)
        bw.writeBits(0x20 | (order - 1), 6)
        bw.writeBits(0, 1)
        for (i <- 0 until order) bw.writeBits(s(i).toLong & 0xFFFF, 16)
        val precision = 15
        bw.writeBits(precision - 1, 4)
        bw.writeBits(lpcShift.toLong & 0x1F, 5)
        lpcCoefs.foreach(cf => bw.writeBits(cf.toLong & 0x7FFF, precision))
        val resid = Array.tabulate(s.length - order) { k =>
          val i = k + order
          var acc = 0L
          for (j <- 0 until order) acc += lpcCoefs(j).toLong * s(i - 1 - j)
          s(i) - (acc >> lpcShift).toInt
        }
        writeRice(bw, resid)
      case _ => // fixed: pick order 0..2 by residual magnitude
        val cands = (0 to 2).map { o =>
          val r = fixedResiduals(s, o)
          (o, r, r.map(v => math.abs(v.toLong)).sum)
        }
        val (order, resid, _) = cands.minBy(_._3)
        bw.writeBits(0x08 | order, 6)
        bw.writeBits(0, 1)
        for (i <- 0 until order) bw.writeBits(s(i).toLong & 0xFFFF, 16)
        writeRice(bw, resid)
    }
  }

  private def fixedResiduals(s: Array[Int], order: Int): Array[Int] =
    Array.tabulate(s.length - order) { k =>
      val i = k + order
      val p = order match {
        case 0 => 0L
        case 1 => s(i - 1).toLong
        case _ => 2L * s(i - 1) - s(i - 2)
      }
      (s(i) - p).toInt
    }

  /** One partition (order 0), Rice parameter chosen from the mean
    * magnitude; zigzag then unary-quotient + param-bit remainder.
    */
  private def writeRice(bw: Bw, resid: Array[Int]): Unit = {
    bw.writeBits(0, 2) // 4-bit rice parameters
    bw.writeBits(0, 4) // partition order 0
    val zig = resid.map(v => ((v.toLong << 1) ^ (v.toLong >> 63)))
    val mean = if (zig.isEmpty) 0L else zig.sum / math.max(1, zig.length)
    var param = 0
    while (param < 14 && (1L << param) < mean) param += 1
    bw.writeBits(param, 4)
    zig.foreach { u =>
      val q = u >>> param
      require(q < (1 << 20), "rice quotient blowup — pick a better mode")
      var i = 0L
      while (i < q) { bw.writeBit(0); i += 1 }
      bw.writeBit(1)
      if (param > 0) bw.writeBits(u & ((1L << param) - 1), param)
    }
  }
}
