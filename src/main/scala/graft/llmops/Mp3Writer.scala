package graft.llmops

import java.io.ByteArrayOutputStream

/** MPEG-1 Layer III encoder twin of [[Mp3]] — the audio member of the
  * writer-twin family ([[JpegWriter]], [[Mp4Writer]], [[OoxmlWriter]]):
  * gate queries and specs plant real compressed streams with known
  * content instead of shipping binary fixtures.
  *
  * Deliberately small but REAL: CBR, long blocks, per-scalefactor-band
  * gain selection (scalefac_scale 0), global_gain search, spectral
  * Huffman coding restricted to the structurally-validated table subset
  * in [[Mp3Tables]] (quantized magnitudes ≤ 7 by construction, so the
  * unshipped escape books are never needed), `main_data_begin` 0 (each
  * frame self-contained — the reservoir stays a decoder capability),
  * padding bit 0 (valid CBR, marginally under nominal rate at 44.1 kHz).
  * The first frame is a Xing/`Info` frame in the LAME-shaped layout
  * carrying frame count plus delay/padding so [[Mp3.decode]] returns
  * exactly the encoder's input grid — the alignment the WAV↔MP3 twin
  * gate's Hamming-0 contract rides on.
  *
  * Analysis is the exact adjoint of the decoder's synthesis: polyphase
  * with the closed-form sine window (Mp3Tables doc), frequency
  * inversion, per-subband 36-point MDCT, then the inverse of the
  * decoder's alias-reduction rotation (so decoder output reconstructs
  * the PCM, not an alias-mangled cousin). Mono and LR stereo; 32/44.1/48
  * kHz.
  */
object Mp3Writer {

  import Mp3Tables._

  /** Chain delay stamped into the Info tag (measured for this
    * analysis+synthesis pair; asserted in Mp3Spec).
    */
  val Delay: Int = Mp3.ChainDelay

  private[llmops] final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1)
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def bitLength: Int = out.size * 8 + nbits
    def toBytes: Array[Byte] = {
      if (nbits > 0) { out.write(cur << (8 - nbits)); cur = 0; nbits = 0 }
      out.toByteArray
    }
  }

  /** Encode interleaved 16-bit samples; layout mirrors
    * [[MediaWriter.wavFromSamples]]. `kbps` must be a valid MPEG-1 L3
    * bitrate; rate one of 32000/44100/48000.
    */
  def mp3FromSamples(channels: Int, sampleRate: Int, samples: Array[Short],
      kbps: Int = 320): Array[Byte] = {
    require(channels == 1 || channels == 2, "mono or stereo")
    val rateIdx = Rates.indexOf(sampleRate)
    require(rateIdx >= 0, s"unsupported rate $sampleRate")
    val brIdx = Bitrates.indexOf(kbps)
    require(brIdx > 0, s"unsupported bitrate $kbps")

    val nIn = samples.length / channels
    val nFrames = math.max(1, (nIn + Delay + 1151) / 1152)
    val total = nFrames * 1152
    val padding = total - Delay - nIn

    // per-channel padded input
    val x = Array.ofDim[Double](channels, total)
    var i = 0
    while (i < nIn) {
      var c = 0
      while (c < channels) { x(c)(i) = samples(i * channels + c).toDouble; c += 1 }
      i += 1
    }

    // analysis: polyphase -> freq inversion -> MDCT -> inverse alias
    // lines(ch)(granule)(576)
    val nGran = nFrames * 2
    val lines = Array.ofDim[Double](channels, nGran, 576)
    var c = 0
    while (c < channels) {
      analyzeChannel(x(c), lines(c))
      c += 1
    }

    val frameBytes = 144000 * kbps / sampleRate
    val sideLen = if (channels == 1) 17 else 32
    val mainBudget = (frameBytes - 4 - sideLen) * 8

    val out = new ByteArrayOutputStream()
    // audio frames first (Info frame needs the total byte count)
    val audio = new ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      audio.write(encodeFrame(lines, f, channels, rateIdx, brIdx,
        frameBytes, mainBudget))
      f += 1
    }
    val audioBytes = audio.toByteArray
    out.write(infoFrame(channels, rateIdx, brIdx, frameBytes, nFrames,
      frameBytes + audioBytes.length, Delay, padding))
    out.write(audioBytes)
    out.toByteArray
  }

  /** Polyphase analysis + frequency inversion + MDCT + inverse alias
    * reduction for one channel into granule line arrays.
    */
  private[llmops] def analyzeChannel(x: Array[Double],
      lines: Array[Array[Double]]): Unit = {
    val nBlk = x.length / 32
    val X = new Array[Double](512)
    val S = Array.ofDim[Double](nBlk, 32)
    var t = 0
    while (t < nBlk) {
      System.arraycopy(X, 0, X, 32, 480)
      var j = 0
      while (j < 32) { X(j) = x(t * 32 + 31 - j); j += 1 }
      // C = sine window / 16, first 64 taps only
      var k = 0
      while (k < 32) {
        var s = 0.0
        val row = CosAna(k)
        var ii = 0
        while (ii < 64) { s += row(ii) * Win64(ii) * X(ii); ii += 1 }
        // /256: puts a full-scale (±32767) tone's peak MDCT line around
        // 2.3e4 — inside the ISO-representable ceiling 7^(4/3)·2^((255-210)/4)
        // ≈ 3.3e4 with ~45% headroom, so global_gain never saturates
        S(t)(k) = s / 256.0
        k += 1
      }
      // frequency inversion (encoder side of the decoder's flip)
      if ((t & 1) == 1) {
        k = 1
        while (k < 32) { S(t)(k) = -S(t)(k); k += 2 }
      }
      t += 1
    }
    val nGran = lines.length
    var k = 0
    while (k < 32) {
      val prev = new Array[Double](18)
      var g = 0
      while (g < nGran) {
        // forward MDCT over [prev(18) ++ cur(18)] with sine window
        val blk = new Array[Double](36)
        var ii = 0
        while (ii < 18) {
          blk(ii) = prev(ii)
          blk(18 + ii) = S(g * 18 + ii)(k)
          ii += 1
        }
        ii = 0
        while (ii < 18) { prev(ii) = S(g * 18 + ii)(k); ii += 1 }
        var l = 0
        while (l < 18) {
          var s = 0.0
          ii = 0
          while (ii < 36) { s += Win36(ii) * blk(ii) * CosImdct(ii)(l); ii += 1 }
          lines(g)(k * 18 + l) = s
          l += 1
        }
        g += 1
      }
      k += 1
    }
    // inverse alias-reduction rotation (transpose of decoder butterflies)
    var g = 0
    while (g < nGran) {
      val xr = lines(g)
      var sb = 1
      while (sb < 32) {
        var j = 0
        while (j < 8) {
          val u = 18 * sb - 1 - j
          val d = 18 * sb + j
          val a = xr(u); val b = xr(d)
          xr(u) = a * AliasCs(j) + b * AliasCa(j)
          xr(d) = b * AliasCs(j) - a * AliasCa(j)
          j += 1
        }
        sb += 1
      }
      g += 1
    }
  }

  private[llmops] final case class QGranule(q: Array[Int], gg: Int, sf: Array[Int],
      scalefacCompress: Int, bits: BitWriter, part23: Int,
      bigValues: Int, tableSel: Array[Int], r0: Int, r1: Int,
      count1Table: Int)

  /** Quantize + Huffman one granule/channel under a bit budget. */
  private[llmops] def quantizeGranule(xr: Array[Double], rateIdx: Int,
      budget: Int): QGranule = {
    val bands = SfbLong(rateIdx)
    val bmax = new Array[Double](22)
    var b = 0
    while (b < 22) {
      var m = 0.0
      var i = bands(b)
      while (i < bands(b + 1)) {
        val a = math.abs(xr(i)); if (a > m) m = a; i += 1
      }
      bmax(b) = m
      b += 1
    }
    val m0 = bmax.max
    if (m0 <= 1e-9)
      return QGranule(new Array[Int](576), 0, new Array[Int](22), 0,
        new BitWriter, 0, 0, Array(0, 0, 0), 0, 0, 0)

    var gg = 0
    // smallest gg whose step quantizes the global max to <= 7
    while (gg < 255 &&
        quantVal(m0, step(gg)) > 7) gg += 1

    var attempt = 0
    while (attempt < 60) {
      val st = step(gg)
      // per-band boosts (sf reduces effective step by 2^(sf/2))
      val sf = new Array[Int](22)
      b = 0
      while (b < 21) {
        if (bmax(b) > 0 && bmax(b) < m0) {
          val cap = if (b < 11) 15 else 7
          var s = math.min(cap,
            (2.0 * (math.log(m0 / bmax(b)) / math.log(2.0))).toInt)
          while (s > 0 && quantVal(bmax(b) * math.pow(2.0, s / 2.0), st) > 7) s -= 1
          sf(b) = math.max(0, s)
        }
        b += 1
      }
      val q = new Array[Int](576)
      b = 0
      var i = 0
      while (b < 22) {
        val eff = st * math.pow(2.0, -sf(b) / 2.0)
        while (i < bands(b + 1)) {
          val a = math.abs(xr(i))
          var v = quantVal(a, eff)
          if (v > 7) v = 7 // band-21 (no scalefactor) clamp
          q(i) = if (xr(i) < 0) -v else v
          i += 1
        }
        b += 1
      }
      val enc = huffmanEncode(q, sf, rateIdx)
      if (enc.part23 <= budget) return enc.copy(gg = gg)
      gg += math.max(1, (gg * 0 + 2))
      attempt += 1
    }
    // coarse fallback: silence the granule rather than emit an invalid frame
    QGranule(new Array[Int](576), 0, new Array[Int](22), 0,
      new BitWriter, 0, 0, Array(0, 0, 0), 0, 0, 0)
  }

  private def step(gg: Int): Double = math.pow(2.0, (gg - 210) / 4.0)

  private def quantVal(a: Double, st: Double): Int =
    math.floor(math.pow(a / st, 0.75) + 0.4054).toInt

  /** Scalefactors + spectral Huffman for quantized lines; returns the
    * packed granule bitstream and side-info fields.
    */
  private def huffmanEncode(q: Array[Int], sf: Array[Int],
      rateIdx: Int): QGranule = {
    val bands = SfbLong(rateIdx)
    // scalefac_compress: smallest table covering needed slens
    def bitsFor(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)
    var need1 = 0; var need2 = 0
    var b = 0
    while (b < 21) {
      val n = bitsFor(sf(b))
      if (b < 11) need1 = math.max(need1, n) else need2 = math.max(need2, n)
      b += 1
    }
    var sfc = 0
    var bestCost = Int.MaxValue
    var t = 0
    while (t < 16) {
      val (s1, s2) = Slen(t)
      if (s1 >= need1 && s2 >= need2) {
        val cost = s1 * 11 + s2 * 10
        if (cost < bestCost) { bestCost = cost; sfc = t }
      }
      t += 1
    }
    val (slen1, slen2) = Slen(sfc)

    // partition: trailing zeros / count1 quads / big pairs
    var nz = 576
    while (nz > 0 && q(nz - 1) == 0) nz -= 1
    var lastBig = -1
    var i = 0
    while (i < nz) { if (math.abs(q(i)) > 1) lastBig = i; i += 1 }
    var bigEnd = ((lastBig + 1) + 1) / 2 * 2
    var count1End = bigEnd + (nz - bigEnd + 3) / 4 * 4
    if (count1End > 576) { // push the ragged tail into big values
      bigEnd = (nz + 1) / 2 * 2
      count1End = bigEnd
    }
    val bigValues = bigEnd / 2

    // regions at scalefactor-band boundaries
    var r0 = 0
    while (r0 < 15 && r0 + 2 < bands.length - 1 && bands(r0 + 2) <= bigEnd) r0 += 1
    var r1 = 0
    while (r1 < 7 && r0 + r1 + 3 < bands.length - 1 &&
        bands(r0 + r1 + 3) <= bigEnd) r1 += 1
    val bound1 = bands(r0 + 1)
    val bound2 = bands(r0 + r1 + 2)
    val tableSel = new Array[Int](3)
    var r = 0
    while (r < 3) {
      val from = if (r == 0) 0 else if (r == 1) bound1 else bound2
      val until = math.min(bigEnd, if (r == 0) bound1 else if (r == 1) bound2 else bigEnd)
      var m = 0
      i = from
      while (i < until) { m = math.max(m, math.abs(q(i))); i += 1 }
      tableSel(r) = tableFor(m)
      r += 1
    }

    // count1 table choice by total cost
    def count1Cost(h: Huff): Int = {
      var bits = 0
      i = bigEnd
      while (i < count1End) {
        var sym = 0; var signs = 0
        var j = 0
        while (j < 4) {
          val v = q(i + j)
          if (v != 0) { sym |= 1 << (3 - j); signs += 1 }
          j += 1
        }
        bits += h.encLen(sym) + signs
        i += 4
      }
      bits
    }
    val count1Table = if (count1Cost(HB) <= count1Cost(HA)) 1 else 0
    val c1 = if (count1Table == 1) HB else HA

    val bw = new BitWriter
    // scalefactors
    b = 0
    while (b < 21) {
      val slen = if (b < 11) slen1 else slen2
      if (slen > 0) bw.put(sf(b), slen)
      b += 1
    }
    // big values
    i = 0
    while (i < bigEnd) {
      val region = if (i < bound1) 0 else if (i < bound2) 1 else 2
      val tid = tableSel(region)
      if (tid != 0) {
        val h = BigTables(tid)
        val xv = q(i); val yv = q(i + 1)
        val ax = math.abs(xv); val ay = math.abs(yv)
        val sym = (ax << 4) | ay
        bw.put(h.encCode(sym), h.encLen(sym))
        if (ax != 0) bw.put(if (xv < 0) 1 else 0, 1)
        if (ay != 0) bw.put(if (yv < 0) 1 else 0, 1)
      }
      i += 2
    }
    // count1
    i = bigEnd
    while (i < count1End) {
      var sym = 0
      var j = 0
      while (j < 4) { if (q(i + j) != 0) sym |= 1 << (3 - j); j += 1 }
      bw.put(c1.encCode(sym), c1.encLen(sym))
      j = 0
      while (j < 4) {
        if (q(i + j) != 0) bw.put(if (q(i + j) < 0) 1 else 0, 1)
        j += 1
      }
      i += 4
    }
    QGranule(q, 0, sf, sfc, bw, bw.bitLength, bigValues, tableSel, r0, r1,
      count1Table)
  }

  private def header(rateIdx: Int, brIdx: Int, channels: Int): Array[Byte] =
    Array(0xFF.toByte, 0xFB.toByte,
      ((brIdx << 4) | (rateIdx << 2)).toByte,
      (if (channels == 1) 0xC0 else 0x00).toByte)

  private def encodeFrame(lines: Array[Array[Array[Double]]], f: Int,
      channels: Int, rateIdx: Int, brIdx: Int, frameBytes: Int,
      mainBudget: Int): Array[Byte] = {
    val perGranule = mainBudget / (2 * channels)
    val g = Array.ofDim[QGranule](2, channels)
    var gr = 0
    while (gr < 2) {
      var c = 0
      while (c < channels) {
        g(gr)(c) = quantizeGranule(lines(c)(f * 2 + gr), rateIdx, perGranule)
        c += 1
      }
      gr += 1
    }
    val bw = new BitWriter
    bw.put(0, 9) // main_data_begin
    bw.put(0, if (channels == 1) 5 else 3)
    var c = 0
    while (c < channels) { bw.put(0, 4); c += 1 } // scfsi
    gr = 0
    while (gr < 2) {
      c = 0
      while (c < channels) {
        val q = g(gr)(c)
        bw.put(q.part23, 12)
        bw.put(q.bigValues, 9)
        bw.put(q.gg, 8)
        bw.put(q.scalefacCompress, 4)
        bw.put(0, 1) // window switching
        bw.put(q.tableSel(0), 5)
        bw.put(q.tableSel(1), 5)
        bw.put(q.tableSel(2), 5)
        bw.put(q.r0, 4)
        bw.put(q.r1, 3)
        bw.put(0, 1) // preflag
        bw.put(0, 1) // scalefac_scale
        bw.put(q.count1Table, 1)
        c += 1
      }
      gr += 1
    }
    val side = bw.toBytes
    val main = new BitWriter
    gr = 0
    while (gr < 2) {
      c = 0
      while (c < channels) {
        val gb = g(gr)(c).bits.toBytes
        val nbits = g(gr)(c).part23
        var i = 0
        while (i < nbits) {
          main.put((gb(i >>> 3) >>> (7 - (i & 7))) & 1, 1)
          i += 1
        }
        c += 1
      }
      gr += 1
    }
    val mainBytes = main.toBytes
    val frame = new Array[Byte](frameBytes)
    val h = header(rateIdx, brIdx, channels)
    System.arraycopy(h, 0, frame, 0, 4)
    System.arraycopy(side, 0, frame, 4, side.length)
    System.arraycopy(mainBytes, 0, frame, 4 + side.length, mainBytes.length)
    frame
  }

  /** Xing/Info frame: valid silent frame whose main-data area carries the
    * LAME-shaped tag (frames, bytes, then after a 9-byte encoder string
    * and 12 reserved bytes the 12+12-bit delay/padding pack).
    */
  private def infoFrame(channels: Int, rateIdx: Int, brIdx: Int,
      frameBytes: Int, nFrames: Int, totalBytes: Int, delay: Int,
      padding: Int): Array[Byte] = {
    val frame = new Array[Byte](frameBytes)
    val h = header(rateIdx, brIdx, channels)
    System.arraycopy(h, 0, frame, 0, 4)
    val sideLen = if (channels == 1) 17 else 32
    var p = 4 + sideLen // side info stays all-zero (silent granules)
    def put32(v: Long): Unit = {
      frame(p) = ((v >>> 24) & 0xFF).toByte
      frame(p + 1) = ((v >>> 16) & 0xFF).toByte
      frame(p + 2) = ((v >>> 8) & 0xFF).toByte
      frame(p + 3) = (v & 0xFF).toByte
      p += 4
    }
    def putStr(s: String): Unit = {
      val b = s.getBytes("ISO-8859-1")
      System.arraycopy(b, 0, frame, p, b.length)
      p += b.length
    }
    putStr("Info")
    put32(0x3) // frames | bytes
    put32(nFrames.toLong)
    put32(totalBytes.toLong)
    putStr("GRAFT1.0 ") // 9-byte encoder string
    p += 12             // reserved block (revision/gain fields in LAME)
    frame(p) = ((delay >>> 4) & 0xFF).toByte
    frame(p + 1) = (((delay & 0xF) << 4) | ((padding >>> 8) & 0xF)).toByte
    frame(p + 2) = (padding & 0xFF).toByte
    frame
  }
}
