package graft.llmops

import java.io.ByteArrayOutputStream

/** WebP-lossless (VP8L) writer twin of
  * [[graft.expressions.WebpDecode]] — real, spec-shaped streams with a
  * genuine Huffman coder (frequencies → canonical codes → the 19-symbol
  * code-length code with 16/17/18 run coding), optional LZ77 distance-1
  * run emission, optional color cache, and forward forms of the four
  * transforms (subtract-green, constant-mode predictor, constant color
  * transform, color indexing with sub-byte packing). Independent
  * construction throughout — its own canonical-code builder and bit
  * packing — so round trips check two implementations against the
  * public bitstream spec, not one against itself.
  */
object WebpWriter {

  final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var buf = 0L
    private var cnt = 0
    def writeBits(v: Int, n: Int): Unit = {
      buf |= (v.toLong & ((1L << n) - 1)) << cnt
      cnt += n
      while (cnt >= 8) {
        out.write((buf & 0xFF).toInt)
        buf >>>= 8
        cnt -= 8
      }
    }
    /** Huffman codewords go MSB-first into the LSB-first stream. */
    def writeCode(code: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) { writeBits((code >> k) & 1, 1); k -= 1 }
    }
    def bytes: Array[Byte] = {
      if (cnt > 0) { out.write((buf & 0xFF).toInt); buf = 0; cnt = 0 }
      out.toByteArray
    }
  }

  /** Optimal prefix-code lengths by heap Huffman (fixtures stay far
    * under the 15-bit cap; asserted).
    */
  private def huffLengths(freq: Array[Long]): Array[Int] = {
    val lengths = new Array[Int](freq.length)
    val used = freq.indices.filter(freq(_) > 0)
    if (used.isEmpty) { lengths(0) = 1; return lengths } // degenerate
    if (used.size == 1) { lengths(used.head) = 1; return lengths }
    // nodes: leaves then internals; parent links give depths
    val parent = new Array[Int](2 * used.size)
    val weight = new Array[Long](2 * used.size)
    used.zipWithIndex.foreach { case (s, i) => weight(i) = freq(s) }
    val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Int)](
      Ordering.by[(Long, Int), (Long, Int)](t => (-t._1, -t._2)))
    used.indices.foreach(i => pq.enqueue((weight(i), i)))
    var next = used.size
    while (pq.size > 1) {
      val (wa, a) = pq.dequeue()
      val (wb, bNode) = pq.dequeue()
      weight(next) = wa + wb
      parent(a) = next
      parent(bNode) = next
      pq.enqueue((weight(next), next))
      next += 1
    }
    val root = next - 1
    used.zipWithIndex.foreach { case (s, i) =>
      var d = 0
      var n = i
      while (n != root) { n = parent(n); d += 1 }
      require(d <= 15, s"huffman depth $d exceeds VP8L cap")
      lengths(s) = d
    }
    lengths
  }

  /** Canonical codewords from lengths (decoder-mirroring convention). */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxLen = lengths.max
    val count = new Array[Int](maxLen + 2)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    for (l <- 1 to maxLen) {
      code = (code + count(l - 1)) << 1
      nextCode(l) = code
    }
    val codes = new Array[Int](lengths.length)
    var s = 0
    while (s < lengths.length) {
      if (lengths(s) > 0) {
        codes(s) = nextCode(lengths(s))
        nextCode(lengths(s)) += 1
      }
      s += 1
    }
    codes
  }

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Emit one prefix code's description: simple form when ≤2 symbols,
    * else code-length coding with 16/17/18 runs.
    */
  private def writeCodeDescription(bw: BitWriter, lengths: Array[Int]): Unit = {
    val used = lengths.indices.filter(lengths(_) > 0)
    if (used.size <= 2 && used.forall(_ < 256)) {
      bw.writeBits(1, 1) // simple
      bw.writeBits(used.size - 1, 1)
      if (used.size == 1) {
        val s = used.head
        if (s < 2) { bw.writeBits(0, 1); bw.writeBits(s, 1) }
        else { bw.writeBits(1, 1); bw.writeBits(s, 8) }
      } else {
        val s0 = used(0); val s1 = used(1)
        if (s0 < 2) { bw.writeBits(0, 1); bw.writeBits(s0, 1) }
        else { bw.writeBits(1, 1); bw.writeBits(s0, 8) }
        bw.writeBits(s1, 8)
      }
      return
    }
    bw.writeBits(0, 1) // normal
    // RLE the length array into CL symbols
    val syms = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    // (clSymbol, extraValue, extraBits)
    var i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l == 0) {
        var z = 0
        while (i < lengths.length && lengths(i) == 0) { z += 1; i += 1 }
        while (z >= 11) {
          val take = math.min(z, 138)
          syms += ((18, take - 11, 7)); z -= take
        }
        while (z >= 3) {
          val take = math.min(z, 10)
          syms += ((17, take - 3, 3)); z -= take
        }
        while (z > 0) { syms += ((0, 0, 0)); z -= 1 }
      } else {
        syms += ((l, 0, 0))
        i += 1
        var r = 0
        while (i < lengths.length && lengths(i) == l) { r += 1; i += 1 }
        while (r >= 3) {
          val take = math.min(r, 6)
          syms += ((16, take - 3, 2)); r -= take
        }
        while (r > 0) { syms += ((l, 0, 0)); r -= 1 }
      }
    }
    val clFreq = new Array[Long](19)
    syms.foreach { case (s, _, _) => clFreq(s) += 1 }
    val clLens = huffLengths(clFreq)
    require(clLens.max <= 7, "code-length code over 3-bit storage")
    // single-CL-symbol degenerate: decoder's zero-bit code reads nothing,
    // which desyncs the extra-bit stream — pad with a second symbol
    if (clLens.count(_ > 0) == 1) {
      val have = clLens.indexWhere(_ > 0)
      clLens(have) = 1
      clLens(if (have == 0) 1 else 0) = 1
    }
    val clCodes = canonicalCodes(clLens)
    val numCl = math.max(4,
      (0 until 19).filter(k => clLens(ClOrder(k)) > 0).lastOption
        .getOrElse(0) + 1)
    bw.writeBits(numCl - 4, 4)
    for (k <- 0 until numCl) bw.writeBits(clLens(ClOrder(k)), 3)
    bw.writeBits(0, 1) // no max_symbol shortcut: runs carry the zeros
    syms.foreach { case (s, extra, extraBits) =>
      bw.writeCode(clCodes(s), clLens(s))
      if (extraBits > 0) bw.writeBits(extra, extraBits)
    }
  }

  /** Symbol stream of one image: literals, optional distance-1 runs,
    * optional cache hits. Tokens: (kind, a, b) with kind 0 = literal
    * argb, 1 = (lengthCode, extraVal/extraBits packed), 2 = cache idx.
    */
  private final case class Tok(kind: Int, v1: Int, v2: Int, v3: Int)

  private def prefixEncode(value: Int): (Int, Int, Int) = {
    // value ≥ 1 → (code, extraBits, extraVal): inverse of the decoder
    if (value <= 4) return (value - 1, 0, 0)
    var extraBits = 1
    while ((4 << extraBits) < value) extraBits += 1
    // candidates with this extraBits: offsets (2|3) << extraBits
    val lo = 2 << extraBits
    val hi = 3 << extraBits
    if (value - 1 >= hi) (2 * extraBits + 3, extraBits, value - 1 - hi)
    else (2 * extraBits + 2, extraBits, value - 1 - lo)
  }

  /** Encode one image's pixel data (codes + symbols) into `bw`.
    * `spatial` adds the meta-prefix bit (always 0 here).
    */
  def encodeImageData(bw: BitWriter, pix: Array[Int], cacheBits: Int,
      useLz77: Boolean, spatial: Boolean): Unit = {
    bw.writeBits(if (cacheBits > 0) 1 else 0, 1)
    if (cacheBits > 0) bw.writeBits(cacheBits, 4)
    if (spatial) bw.writeBits(0, 1) // no meta-prefix image
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    val seen = if (cacheBits > 0) new Array[Boolean](1 << cacheBits) else null
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    def emitPixel(p: Int): Unit = {
      if (cache != null) {
        val h = (0x1e35a7bd * p) >>> (32 - cacheBits)
        if (seen(h) && cache(h) == p) { toks += Tok(2, h, 0, 0); return }
        cache(h) = p; seen(h) = true
      }
      toks += Tok(0, p, 0, 0)
    }
    var i = 0
    while (i < pix.length) {
      val p = pix(i)
      if (useLz77 && i > 0 && p == pix(i - 1)) {
        var run = 0
        while (i + run < pix.length && pix(i + run) == p && run < 4096) run += 1
        if (run >= 3) {
          toks += Tok(1, run, 0, 0) // distance-1 run
          if (cache != null) {
            val h = (0x1e35a7bd * p) >>> (32 - cacheBits)
            cache(h) = p; seen(h) = true
          }
          i += run
        } else {
          emitPixel(p)
          i += 1
        }
      } else {
        emitPixel(p)
        i += 1
      }
    }
    // frequencies over the five alphabets
    val greenAlpha = 256 + 24 + (if (cacheBits > 0) 1 << cacheBits else 0)
    val fG = new Array[Long](greenAlpha)
    val fR = new Array[Long](256)
    val fB = new Array[Long](256)
    val fA = new Array[Long](256)
    val fD = new Array[Long](40)
    toks.foreach {
      case Tok(0, p, _, _) =>
        fG((p >> 8) & 0xFF) += 1
        fR((p >> 16) & 0xFF) += 1
        fB(p & 0xFF) += 1
        fA((p >>> 24) & 0xFF) += 1
      case Tok(1, run, _, _) =>
        val (lc, _, _) = prefixEncode(run)
        fG(256 + lc) += 1
        fD(1) += 1 // distance code 2 → map entry (1,0) = distance 1
      case Tok(2, idx, _, _) =>
        fG(280 + idx) += 1
      case _ => ()
    }
    val lG = huffLengths(fG)
    val lR = huffLengths(fR)
    val lB = huffLengths(fB)
    val lA = huffLengths(fA)
    val lD = huffLengths(fD)
    Seq(lG, lR, lB, lA, lD).foreach(writeCodeDescription(bw, _))
    val cG = canonicalCodes(lG)
    val cR = canonicalCodes(lR)
    val cB = canonicalCodes(lB)
    val cA = canonicalCodes(lA)
    val cD = canonicalCodes(lD)
    // a single-symbol code is ZERO bits on the wire (the decoder never
    // reads for it) — emitting its 1-length codeword would desync
    val nG = lG.count(_ > 0)
    val nR = lR.count(_ > 0)
    val nB = lB.count(_ > 0)
    val nA = lA.count(_ > 0)
    val nD = lD.count(_ > 0)
    def put(codes: Array[Int], lens: Array[Int], n: Int, s: Int): Unit =
      if (n > 1) bw.writeCode(codes(s), lens(s))
    toks.foreach {
      case Tok(0, p, _, _) =>
        put(cG, lG, nG, (p >> 8) & 0xFF)
        put(cR, lR, nR, (p >> 16) & 0xFF)
        put(cB, lB, nB, p & 0xFF)
        put(cA, lA, nA, (p >>> 24) & 0xFF)
      case Tok(1, run, _, _) =>
        val (lc, extraBits, extraVal) = prefixEncode(run)
        put(cG, lG, nG, 256 + lc)
        if (extraBits > 0) bw.writeBits(extraVal, extraBits)
        put(cD, lD, nD, 1) // prefix code 1 → distance 1, no extra bits
      case Tok(2, idx, _, _) =>
        put(cG, lG, nG, 280 + idx)
      case _ => ()
    }
  }

  private def riffWrap(vp8l: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 24) & 0xFF).toByte)
    val padded = vp8l.length + (vp8l.length & 1)
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(4 + 8 + padded))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII"))
    out.write(le32(vp8l.length))
    out.write(vp8l)
    if ((vp8l.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  private def header(bw: BitWriter, w: Int, h: Int): Unit = {
    bw.writeBits(0x2F, 8)
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(0, 1) // alpha hint
    bw.writeBits(0, 3) // version
  }

  /** Plain lossless encode: no transforms; optional cache and LZ77. */
  def lossless(w: Int, h: Int, argb: Array[Int], cacheBits: Int = 0,
      useLz77: Boolean = true): Array[Byte] = {
    require(argb.length == w * h)
    val bw = new BitWriter
    header(bw, w, h)
    bw.writeBits(0, 1) // no transforms
    encodeImageData(bw, argb, cacheBits, useLz77, spatial = true)
    riffWrap(bw.bytes)
  }

  /** Subtract-green transform + data. */
  def losslessSubGreen(w: Int, h: Int, argb: Array[Int],
      cacheBits: Int = 0): Array[Byte] = {
    val bw = new BitWriter
    header(bw, w, h)
    bw.writeBits(1, 1); bw.writeBits(2, 2) // transform: subtract green
    bw.writeBits(0, 1) // end of transforms
    val t = argb.map { p =>
      val g = (p >> 8) & 0xFF
      val r = (((p >> 16) & 0xFF) - g) & 0xFF
      val b = ((p & 0xFF) - g) & 0xFF
      (p & 0xFF00FF00.toInt) | (r << 16) | b
    }
    encodeImageData(bw, t, cacheBits, useLz77 = true, spatial = true)
    riffWrap(bw.bytes)
  }

  /** Constant-mode predictor transform (block size 2^bits). */
  def losslessPredictor(w: Int, h: Int, argb: Array[Int], mode: Int,
      bits: Int = 4): Array[Byte] = {
    require(mode >= 0 && mode <= 13 && bits >= 2 && bits <= 9)
    val bw = new BitWriter
    header(bw, w, h)
    bw.writeBits(1, 1); bw.writeBits(0, 2) // predictor transform
    bw.writeBits(bits - 2, 3)
    val pw = (w + (1 << bits) - 1) >> bits
    val ph = (h + (1 << bits) - 1) >> bits
    val sub = Array.fill(pw * ph)(0xFF000000 | (mode << 8))
    encodeImageData(bw, sub, cacheBits = 0, useLz77 = true, spatial = false)
    bw.writeBits(0, 1) // end of transforms
    // forward residuals: the decoder's own predictor (it applies the
    // spec edge rules internally and reads only raster-earlier pixels,
    // so original == reconstructed at every read)
    val resid = new Array[Int](argb.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred = graft.expressions.WebpDecode.predict(mode, x, y, w, argb)
        resid(y * w + x) = subPixels(argb(y * w + x), pred)
        x += 1
      }
      y += 1
    }
    encodeImageData(bw, resid, cacheBits = 0, useLz77 = true, spatial = true)
    riffWrap(bw.bytes)
  }

  private def subPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) - (b >>> 24)) & 0xFF) << 24
    val rr = ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
    val gg = ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
    val bb = ((a & 0xFF) - (b & 0xFF)) & 0xFF
    aa | rr | gg | bb
  }

  /** Constant color-transform element (g2r/g2b/r2b as signed bytes). */
  def losslessColorTransform(w: Int, h: Int, argb: Array[Int],
      g2r: Int, g2b: Int, r2b: Int, bits: Int = 4): Array[Byte] = {
    val bw = new BitWriter
    header(bw, w, h)
    bw.writeBits(1, 1); bw.writeBits(1, 2) // color transform
    bw.writeBits(bits - 2, 3)
    val pw = (w + (1 << bits) - 1) >> bits
    val ph = (h + (1 << bits) - 1) >> bits
    val m = 0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) |
      (g2r & 0xFF)
    encodeImageData(bw, Array.fill(pw * ph)(m), cacheBits = 0,
      useLz77 = true, spatial = false)
    bw.writeBits(0, 1) // end of transforms
    def delta(t: Int, c: Int): Int = (t.toByte.toInt * c.toByte.toInt) >> 5
    val t = argb.map { p =>
      val g = (p >> 8) & 0xFF
      val r0 = (p >> 16) & 0xFF
      val b0 = p & 0xFF
      val r = (r0 - delta(g2r, g)) & 0xFF
      val b = (b0 - delta(g2b, g) - delta(r2b, r0)) & 0xFF
      (p & 0xFF00FF00.toInt) | (r << 16) | b
    }
    encodeImageData(bw, t, cacheBits = 0, useLz77 = true, spatial = true)
    riffWrap(bw.bytes)
  }

  /** Color-indexing transform: palette + packed indices (1/2/4/8-bit
    * packing chosen from palette size, as the spec mandates).
    */
  def losslessIndexed(w: Int, h: Int, palette: Array[Int],
      idx: (Int, Int) => Int): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256)
    val bw = new BitWriter
    header(bw, w, h)
    bw.writeBits(1, 1); bw.writeBits(3, 2) // color indexing
    bw.writeBits(palette.length - 1, 8)
    // palette entries delta-coded against the previous entry
    val deltas = palette.indices.map { i =>
      if (i == 0) palette(0) else subPixels(palette(i), palette(i - 1))
    }.toArray
    encodeImageData(bw, deltas, cacheBits = 0, useLz77 = false,
      spatial = false)
    bw.writeBits(0, 1) // end of transforms
    val packBits =
      if (palette.length <= 2) 3 else if (palette.length <= 4) 2
      else if (palette.length <= 16) 1 else 0
    val bitsPerIdx = 8 >> packBits
    val perPixel = 1 << packBits
    val effW = (w + perPixel - 1) >> packBits
    val packed = new Array[Int](effW * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = idx(x, y)
        require(v >= 0 && v < palette.length)
        val cell = y * effW + (x >> packBits)
        val sub = (x & (perPixel - 1)) * bitsPerIdx
        packed(cell) |= (v << (sub + 8)) // green channel
        x += 1
      }
      y += 1
    }
    // alpha 0xff on packed pixels (any value decodes; keep realistic)
    for (i <- packed.indices) packed(i) |= 0xFF000000
    encodeImageData(bw, packed, cacheBits = 0, useLz77 = true,
      spatial = true)
    riffWrap(bw.bytes)
  }

  /** Grayscale convenience: r = g = b = f(x, y), opaque alpha. */
  def gray(w: Int, h: Int, f: (Int, Int) => Int,
      cacheBits: Int = 0): Array[Byte] =
    lossless(w, h, Array.tabulate(w * h) { k =>
      val v = f(k % w, k / w) & 0xFF
      0xFF000000 | (v << 16) | (v << 8) | v
    }, cacheBits)
}
