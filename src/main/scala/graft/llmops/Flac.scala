package graft.llmops

/** FLAC decoder (RFC 9639) — the lossless member of the compressed-audio
  * family (MP3 covered lossy earlier this round). Because FLAC is
  * lossless and this decoder is integer-exact, a 16-bit WAV and its
  * FLAC encode produce IDENTICAL sample arrays — the audio fingerprint
  * family's strongest possible twin (bit-equal hashes, not merely
  * Hamming-0).
  *
  * Implemented: STREAMINFO + metadata-block walk; frame headers (all
  * block-size/sample-rate/sample-size codes, UTF-8-coded frame/sample
  * numbers); subframe types constant, verbatim, fixed orders 0–4 and
  * LPC orders 1–32 (quantized coefficients, signed shift, Long
  * accumulation); wasted-bits shifts; Rice residual coding (4- and
  * 5-bit parameters, partition orders, escape-to-raw partitions);
  * stereo decorrelation (independent, left/side, right/side,
  * mid/side with the odd-bit reconstruction). CRCs are parsed past,
  * not verified (a corrupt stream that still parses structurally
  * decodes to its literal content; structural damage refuses).
  * Refusals: reserved codes, oversubscribed orders, truncation
  * anywhere, streams over the 64 MB sample cap.
  */
object Flac {

  final class FlacPcm(val channels: Int, val sampleRate: Int,
      val bits: Int, val samples: Array[Int]) // interleaved

  private val MaxSamples = 16 * 1024 * 1024 // ints (64 MB)

  /** MSB-first bit reader with sticky overrun flag. */
  private final class Br(b: Array[Byte], var pos: Int) {
    var bit = 0
    var overrun = false
    def readBit(): Int = {
      if (pos >= b.length) { overrun = true; return 0 }
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readBitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      if (n == 0) return 0
      val v = readBitsLong(n)
      (v << (64 - n) >> (64 - n)).toInt // sign-extend
    }
    def readUnary(): Int = {
      var q = 0
      while (!overrun && readBit() == 0) {
        q += 1
        if (q > (1 << 24)) { overrun = true; return 0 } // runaway guard
      }
      q
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  private val FixedRates = Array(-1, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000)

  def decode(b: Array[Byte]): FlacPcm = {
    if (b == null || b.length < 42) return null
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return null
    // metadata walk: STREAMINFO must come first
    if ((b(4) & 0x7F) != 0) return null
    var pos = 4
    var last = false
    var sRate = 0
    var sChannels = 0
    var sBits = 0
    var total = 0L
    var first = true
    while (!last) {
      if (pos + 4 > b.length) return null
      last = (b(pos) & 0x80) != 0
      val len = ((b(pos + 1) & 0xFF) << 16) | ((b(pos + 2) & 0xFF) << 8) |
        (b(pos + 3) & 0xFF)
      if (pos + 4 + len > b.length) return null
      if (first) {
        if (len < 34) return null
        val s = pos + 4
        sRate = ((b(s + 10) & 0xFF) << 12) | ((b(s + 11) & 0xFF) << 4) |
          ((b(s + 12) & 0xFF) >>> 4)
        sChannels = ((b(s + 12) >> 1) & 7) + 1
        sBits = (((b(s + 12) & 1) << 4) | ((b(s + 13) & 0xFF) >>> 4)) + 1
        total = ((b(s + 13) & 0x0FL) << 32) | ((b(s + 14) & 0xFFL) << 24) |
          ((b(s + 15) & 0xFFL) << 16) | ((b(s + 16) & 0xFFL) << 8) |
          (b(s + 17) & 0xFFL)
        if (sRate <= 0 || sBits < 4 || sBits > 32) return null
        first = false
      }
      pos += 4 + len
    }
    if (total > MaxSamples / math.max(1, sChannels)) return null
    val outBuf = new java.util.ArrayList[Array[Int]]()
    var decoded = 0L
    val br = new Br(b, pos)
    while (br.pos < b.length - 1 && (total == 0 || decoded < total)) {
      val frame = decodeFrame(br, sRate, sChannels, sBits)
      if (frame == null) {
        if (outBuf.isEmpty) return null
        // tolerate trailing garbage only after at least one clean frame
        // when the stream declared no total (streaming rip); otherwise
        // refuse wholesale
        if (total != 0) return null
        return assemble(sChannels, sRate, sBits, outBuf)
      }
      outBuf.add(frame)
      decoded += frame.length / sChannels
      if (decoded > MaxSamples / math.max(1, sChannels)) return null
    }
    if (total != 0 && decoded < total) return null
    if (outBuf.isEmpty) return null
    assemble(sChannels, sRate, sBits, outBuf)
  }

  private def assemble(ch: Int, rate: Int, bits: Int,
      bufs: java.util.ArrayList[Array[Int]]): FlacPcm = {
    var n = 0
    var i = 0
    while (i < bufs.size()) { n += bufs.get(i).length; i += 1 }
    val out = new Array[Int](n)
    var off = 0
    i = 0
    while (i < bufs.size()) {
      val a = bufs.get(i)
      System.arraycopy(a, 0, out, off, a.length)
      off += a.length
      i += 1
    }
    new FlacPcm(ch, rate, bits, out)
  }

  /** One frame → interleaved samples, or null on refusal. */
  private def decodeFrame(br: Br, sRate: Int, sChannels: Int,
      sBits: Int): Array[Int] = {
    br.alignByte()
    // sync: 11111111 111110xx
    if (br.readBits(8) != 0xFF) return null
    val b2 = br.readBits(8)
    if ((b2 & 0xFC) != 0xF8) return null // 6-bit sync tail + reserved 0
    val bsCode = br.readBits(4)
    val srCode = br.readBits(4)
    val chAssign = br.readBits(4)
    val ssCode = br.readBits(3)
    if (br.readBits(1) != 0) return null // reserved
    // UTF-8-coded frame/sample number: lead byte determines length
    val lead = br.readBits(8)
    var follow =
      if ((lead & 0x80) == 0) 0
      else if ((lead & 0xE0) == 0xC0) 1
      else if ((lead & 0xF0) == 0xE0) 2
      else if ((lead & 0xF8) == 0xF0) 3
      else if ((lead & 0xFC) == 0xF8) 4
      else if ((lead & 0xFE) == 0xFC) 5
      else if (lead == 0xFE) 6
      else -1
    if (follow < 0) return null
    while (follow > 0) {
      if ((br.readBits(8) & 0xC0) != 0x80) return null
      follow -= 1
    }
    val blockSize = bsCode match {
      case 0 => return null // reserved
      case 1 => 192
      case n if n <= 5 => 576 << (n - 2)
      case 6 => br.readBits(8) + 1
      case 7 => br.readBits(16) + 1
      case n => 256 << (n - 8)
    }
    srCode match {
      case 0 => () // from STREAMINFO
      case 12 => br.readBits(8)
      case 13 => br.readBits(16)
      case 14 => br.readBits(16)
      case 15 => return null
      case n => if (FixedRates(n) <= 0) return null
    }
    val bits = ssCode match {
      case 0 => sBits
      case 1 => 8
      case 2 => 12
      case 3 => return null // reserved
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
    }
    val channels =
      if (chAssign <= 7) chAssign + 1
      else if (chAssign <= 10) 2
      else return null
    if (channels != sChannels) return null
    br.readBits(8) // frame-header CRC-8 (not verified)
    if (br.overrun || blockSize <= 0) return null

    val chans = new Array[Array[Int]](channels)
    var c = 0
    while (c < channels) {
      val extra = chAssign match {
        case 8 => if (c == 1) 1 else 0 // left/side
        case 9 => if (c == 0) 1 else 0 // side/right
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      val s = decodeSubframe(br, blockSize, bits + extra)
      if (s == null) return null
      chans(c) = s
      c += 1
    }
    br.alignByte()
    br.readBits(16) // frame footer CRC-16 (not verified)
    if (br.overrun) return null

    // stereo decorrelation
    chAssign match {
      case 8 => // left/side: right = left - side
        var i = 0
        while (i < blockSize) {
          chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1
        }
      case 9 => // side/right: left = right + side
        var i = 0
        while (i < blockSize) {
          chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1
        }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          var mid = chans(0)(i) << 1
          mid |= side & 1
          chans(0)(i) = (mid + side) >> 1
          chans(1)(i) = (mid - side) >> 1
          i += 1
        }
      case _ => ()
    }
    val out = new Array[Int](blockSize * channels)
    var i = 0
    while (i < blockSize) {
      var cc = 0
      while (cc < channels) {
        out(i * channels + cc) = chans(cc)(i)
        cc += 1
      }
      i += 1
    }
    out
  }

  private def decodeSubframe(br: Br, n: Int, bits: Int): Array[Int] = {
    if (br.readBits(1) != 0) return null // zero pad
    val typ = br.readBits(6)
    var wasted = 0
    if (br.readBits(1) == 1) wasted = br.readUnary() + 1
    if (br.overrun) return null
    val eb = bits - wasted
    if (eb <= 0 || eb > 32) return null
    val out = new Array[Int](n)
    if (typ == 0) { // constant
      val v = br.readSigned(eb)
      java.util.Arrays.fill(out, v)
    } else if (typ == 1) { // verbatim
      var i = 0
      while (i < n) { out(i) = br.readSigned(eb); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 7) <= 4) { // fixed
      val order = typ & 7
      if (order > n) return null // same guard as LPC: blockSize 1, order 2
      var i = 0
      while (i < order) { out(i) = br.readSigned(eb); i += 1 }
      if (!decodeResiduals(br, n, order, out)) return null
      i = order
      while (i < n) {
        val r = out(i).toLong
        val p = order match {
          case 0 => 0L
          case 1 => out(i - 1).toLong
          case 2 => 2L * out(i - 1) - out(i - 2)
          case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
          case _ => 4L * out(i - 1) - 6L * out(i - 2) + 4L * out(i - 3) -
            out(i - 4)
        }
        out(i) = (r + p).toInt
        i += 1
      }
    } else if ((typ & 0x20) != 0) { // LPC
      val order = (typ & 0x1F) + 1
      if (order > n) return null
      var i = 0
      while (i < order) { out(i) = br.readSigned(eb); i += 1 }
      val precision = br.readBits(4) + 1
      if (precision == 16) return null // 1111 reserved
      val shift = br.readSigned(5)
      if (shift < 0) return null
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = br.readSigned(precision); i += 1 }
      if (!decodeResiduals(br, n, order, out)) return null
      i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) {
          acc += coefs(j).toLong * out(i - 1 - j)
          j += 1
        }
        out(i) = (out(i) + (acc >> shift)).toInt
        i += 1
      }
    } else return null // reserved types
    if (br.overrun) return null
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Rice-coded residuals into out(order until n); true on success. */
  private def decodeResiduals(br: Br, n: Int, order: Int,
      out: Array[Int]): Boolean = {
    val method = br.readBits(2)
    if (method > 1) return false
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val pOrder = br.readBits(4)
    val partitions = 1 << pOrder
    if (n % partitions != 0) return false
    val perPart = n >> pOrder
    // the warmup samples occupy the head of partition 0
    if (perPart <= 0 || perPart < order) return false
    var p = 0
    var idx = order
    while (p < partitions) {
      val count = if (p == 0) perPart - order else perPart
      if (count < 0) return false
      val param = br.readBits(paramBits)
      if (param == escape) {
        val raw = br.readBits(5)
        var i = 0
        while (i < count) {
          out(idx) = if (raw == 0) 0 else br.readSigned(raw)
          idx += 1
          i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = br.readUnary()
          val r = if (param == 0) 0 else br.readBits(param)
          val u = (q.toLong << param) | r
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt
          idx += 1
          i += 1
        }
      }
      if (br.overrun) return false
      p += 1
    }
    true
  }
}
