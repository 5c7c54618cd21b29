package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** WebP lossless (VP8L) pixel decode — the fourth leg of the crawl
  * image stack (PNG/JPEG/GIF landed earlier; WebP is now a double-digit
  * share of web images and crawls re-encode aggressively into it).
  * Built from the public "WebP Lossless Bitstream Specification";
  * reference-semantics anchor as with the other codecs:
  * `aje_libs/documents/helpers/document_processor.py:10-83` routes
  * arbitrary media through format hooks — this engine gives the format
  * a native, codegen-friendly kernel instead.
  *
  * Implemented, the FULL still-image spec:
  *  - RIFF container walk (`VP8L` directly or behind a `VP8X` extended
  *    header), 14-bit dimensions, version-0 streams,
  *  - canonical prefix codes: "simple" 1/2-symbol codes and full
  *    code-length codes (the 19-symbol permuted code-length alphabet,
  *    16/17/18 repeat codes, optional max-symbol early stop),
  *  - meta-prefix images (per-block code groups), color cache
  *    (1..11 bits, 0x1e35a7bd multiplicative hash), LZ77 backward
  *    references with the 120-entry 2-D distance neighborhood map,
  *  - all four transforms, inverted in reverse stream order:
  *    subtract-green, predictor (14 modes with the spec's edge rules),
  *    cross-channel color transform (signed ×/≫5 deltas), and color
  *    indexing with sub-byte index packing (1/2/4-bit palettes),
  *  - refusals: lossy `VP8 ` payloads (metadata stays in [[ImageDims]]
  *    — an entropy-coded DCT decoder is a different engine), `ANIM`
  *    animations, over/under-subscribed prefix codes, truncated
  *    streams, bad transform duplicates, out-of-range cache sizes,
  *    canvases over the 64 MB cap.
  *
  * Output is ARGB words; the perceptual-hash and histogram arms reduce
  * with the shared integer `(r+g+b)/3` convention, so a WebP re-encode
  * of a PNG lands at Hamming 0 in the ONE image space.
  */
object WebpDecode {

  final class Argb(val width: Int, val height: Int, val pix: Array[Int])

  private val MaxPixels = (64L * 1024 * 1024 / 4).toInt

  /** LSB-first bit reader with sticky overrun flag. */
  private final class Br(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bitBuf = 0L
    private var bitCnt = 0
    var overrun = false
    def readBits(n: Int): Int = {
      while (bitCnt < n) {
        if (pos >= end) { overrun = true; return 0 }
        bitBuf |= (b(pos) & 0xFFL) << bitCnt
        pos += 1
        bitCnt += 8
      }
      val v = (bitBuf & ((1L << n) - 1)).toInt
      bitBuf >>>= n
      bitCnt -= n
      v
    }
    def readBit(): Int = readBits(1)
  }

  /** Canonical prefix decoder (DEFLATE-style counts walk); built from
    * per-symbol code lengths. A single-symbol code reads zero bits.
    */
  private final class Huff(lengths: Array[Int]) {
    private val MaxLen = 15
    private val count = new Array[Int](MaxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    private val total = count.sum
    val valid: Boolean = {
      var kraft = 0L
      var l = 1
      while (l <= MaxLen) { kraft += count(l).toLong << (MaxLen - l); l += 1 }
      total > 0 && (total == 1 || kraft == (1L << MaxLen))
    }
    private val single: Int =
      if (total == 1) lengths.indexWhere(_ > 0) else -1
    // canonical: firstCode(l+1) = (firstCode(l) + count(l)) << 1;
    // symbols assigned in (length, symbol) order
    private val firstCode = new Array[Int](MaxLen + 1)
    private val offset = new Array[Int](MaxLen + 1)
    private val sorted: Array[Int] = {
      val out = new Array[Int](math.max(total, 1))
      var code = 0
      var sum = 0
      var l = 1
      while (l <= MaxLen) {
        code = (code + count(l - 1)) << 1
        firstCode(l) = code
        offset(l) = sum
        sum += count(l)
        l += 1
      }
      val next = offset.clone()
      var s = 0
      while (s < lengths.length) {
        val len = lengths(s)
        if (len > 0) { out(next(len)) = s; next(len) += 1 }
        s += 1
      }
      out
    }
    def decode(br: Br): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < MaxLen) {
        code = (code << 1) | br.readBit()
        len += 1
        if (br.overrun) return -1
        val c = count(len)
        if (c > 0 && code - firstCode(len) < c)
          return sorted(offset(len) + code - firstCode(len))
      }
      -1
    }
  }

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** spec distance map: dist_code 1..120 → (dx, dy) neighborhood. */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (-8, 3), (5, 8), (-5, 8), (8, 5), (-8, 5), (6, 7), (-6, 7), (7, 6),
    (-7, 6), (8, 4), (-8, 4), (7, 7), (-7, 7), (8, 6), (-8, 6), (8, 7),
    (-8, 7))

  /** Read one prefix code's length table ("simple" or code-length
    * coded); null on malformed.
    */
  private def readCode(br: Br, alphabetSize: Int): Huff = {
    val lengths = new Array[Int](alphabetSize)
    if (br.readBit() == 1) { // simple: one zero-bit or two one-bit symbols
      val numSymbols = br.readBit() + 1
      val first8 = br.readBit()
      val s0 = br.readBits(if (first8 == 1) 8 else 1)
      if (s0 >= alphabetSize) return null
      lengths(s0) = 1
      if (numSymbols == 2) {
        val s1 = br.readBits(8)
        if (s1 >= alphabetSize || s1 == s0) return null
        lengths(s1) = 1
      }
      if (br.overrun) return null
      val h = new Huff(lengths)
      return if (h.valid) h else null
    }
    val numCl = 4 + br.readBits(4)
    val clLens = new Array[Int](19)
    var i = 0
    while (i < numCl) {
      clLens(ClOrder(i)) = br.readBits(3)
      i += 1
    }
    if (br.overrun) return null
    val clHuff = new Huff(clLens)
    if (!clHuff.valid) return null
    var maxSymbol = alphabetSize
    if (br.readBit() == 1) {
      val lengthNBits = 2 + 2 * br.readBits(3)
      maxSymbol = 2 + br.readBits(lengthNBits)
    }
    var symbol = 0
    var prevLen = 8
    while (symbol < alphabetSize) {
      if (maxSymbol <= 0) {
        // remaining lengths are zero
        symbol = alphabetSize
      } else {
        maxSymbol -= 1
        val cl = clHuff.decode(br)
        if (cl < 0 || br.overrun) return null
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) prevLen = cl
        } else {
          val (repeatVal, extra, base) = cl match {
            case 16 => (prevLen, 2, 3)
            case 17 => (0, 3, 3)
            case _ => (0, 7, 11)
          }
          var n = base + br.readBits(extra)
          if (br.overrun) return null
          if (symbol + n > alphabetSize) return null
          while (n > 0) { lengths(symbol) = repeatVal; symbol += 1; n -= 1 }
        }
      }
    }
    val h = new Huff(lengths)
    if (h.valid) h else null
  }

  private def subResDims(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** Decode one (possibly entropy-sub) image: `allowMeta` enables the
    * meta-prefix block image (spatial image only, per spec).
    */
  private def decodeImage(br: Br, width: Int, height: Int,
      allowMeta: Boolean): Array[Int] = {
    if (width <= 0 || height <= 0 ||
      width.toLong * height > MaxPixels) return null
    // spec stream order: color-cache-info, then the meta-prefix image
    var cacheBits = 0
    if (br.readBit() == 1) {
      cacheBits = br.readBits(4)
      if (cacheBits < 1 || cacheBits > 11) return null
    }
    var metaBits = 0
    var metaImg: Array[Int] = null
    if (allowMeta && br.readBit() == 1) {
      metaBits = br.readBits(3) + 2
      metaImg = decodeImage(br, subResDims(width, metaBits),
        subResDims(height, metaBits), allowMeta = false)
      if (metaImg == null) return null
    }
    if (br.overrun) return null
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    val numGroups =
      if (metaImg == null) 1
      else {
        var mx = 0
        metaImg.foreach { p =>
          val idx = ((p >> 8) & 0xFFFF)
          if (idx > mx) mx = idx
        }
        mx + 1
      }
    if (numGroups > 1024) return null // sanity: forged meta image
    val greenAlpha = 256 + 24 + (if (cacheBits > 0) 1 << cacheBits else 0)
    val codes = new Array[Array[Huff]](numGroups)
    var g = 0
    while (g < numGroups) {
      val green = readCode(br, greenAlpha)
      val red = readCode(br, 256)
      val blue = readCode(br, 256)
      val alpha = readCode(br, 256)
      val dist = readCode(br, 40)
      if (green == null || red == null || blue == null || alpha == null ||
        dist == null) return null
      codes(g) = Array(green, red, blue, alpha, dist)
      g += 1
    }
    val n = width * height
    val out = new Array[Int](n)
    val metaW = if (metaImg != null) subResDims(width, metaBits) else 0

    def prefixValue(code: Int, br: Br): Int = {
      if (code < 4) return code + 1
      val extra = (code - 2) >> 1
      val off = (2 + (code & 1)) << extra
      off + br.readBits(extra) + 1
    }

    var pos = 0
    while (pos < n) {
      val x = pos % width
      val group =
        if (metaImg == null) codes(0)
        else {
          val y = pos / width
          val mp = metaImg((y >> metaBits) * metaW + (x >> metaBits))
          codes((mp >> 8) & 0xFFFF)
        }
      val s = group(0).decode(br)
      if (s < 0 || br.overrun) return null
      if (s < 256) { // literal: green, then red, blue, alpha
        val r = group(1).decode(br)
        val b = group(2).decode(br)
        val a = group(3).decode(br)
        if (r < 0 || b < 0 || a < 0 || br.overrun) return null
        val argb = (a << 24) | (r << 16) | (s << 8) | b
        out(pos) = argb
        if (cache != null)
          cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
        pos += 1
      } else if (s < 280) { // LZ77 backward reference
        val length = prefixValue(s - 256, br)
        val distSym = group(4).decode(br)
        if (distSym < 0 || br.overrun) return null
        val distCode = prefixValue(distSym, br)
        if (br.overrun) return null
        val dist0 =
          if (distCode > 120) distCode - 120
          else {
            val (dx, dy) = DistMap(distCode - 1)
            val d = dy * width + dx
            if (d < 1) 1 else d
          }
        if (dist0 > pos || pos + length > n) return null
        var k = 0
        while (k < length) {
          val v = out(pos - dist0)
          out(pos) = v
          if (cache != null)
            cache((0x1e35a7bd * v) >>> (32 - cacheBits)) = v
          pos += 1
          k += 1
        }
      } else { // color cache hit
        if (cache == null) return null
        val idx = s - 280
        if (idx >= cache.length) return null
        out(pos) = cache(idx)
        pos += 1
      }
    }
    out
  }

  private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  private def addPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) & 0xFF) << 24
    val rr = ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
    val gg = ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
    val bb = ((a & 0xFF) + (b & 0xFF)) & 0xFF
    aa | rr | gg | bb
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(a: Int, b: Int, c: Int): Int = {
    def ch(sh: Int): Int = clamp255(((a >>> sh) & 0xFF) + ((b >>> sh) & 0xFF) -
      ((c >>> sh) & 0xFF))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(a: Int, b: Int): Int = {
    def ch(sh: Int): Int = {
      val a0 = (a >>> sh) & 0xFF
      val b0 = (b >>> sh) & 0xFF
      clamp255(a0 + (a0 - b0) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def select(t: Int, l: Int, tl: Int): Int = {
    def sub3(sh: Int): Int = {
      val a = (t >>> sh) & 0xFF
      val b = (l >>> sh) & 0xFF
      val c = (tl >>> sh) & 0xFF
      math.abs(b - c) - math.abs(a - c)
    }
    if (sub3(24) + sub3(16) + sub3(8) + sub3(0) <= 0) t else l
  }

  /** Exposed to the writer twin: predicting from the original pixels at
    * encode time equals predicting from the progressively reconstructed
    * image at decode time (only raster-earlier positions are read).
    */
  private[graft] def predict(mode: Int, x: Int, y: Int, w: Int,
      out: Array[Int]): Int = {
    val pos = y * w + x
    if (x == 0 && y == 0) return 0xFF000000
    if (y == 0) return out(pos - 1) // top row: L
    if (x == 0) return out(pos - w) // left column: T
    val l = out(pos - 1)
    val t = out(pos - w)
    val tl = out(pos - w - 1)
    val tr = out(pos - w + 1) // x = w-1 wraps to (0, y): decoded, per spec
    mode match {
      case 0 => 0xFF000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(t, l, tl)
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(avg2(l, t), tl)
      case _ => 0xFF000000
    }
  }

  private def ctDelta(t: Int, c: Int): Int =
    (t.toByte.toInt * c.toByte.toInt) >> 5

  /** Decode the VP8L payload (after the RIFF walk isolated it). */
  private def decodeVp8l(b: Array[Byte], from: Int, to: Int): Argb = {
    if (to - from < 5 || (b(from) & 0xFF) != 0x2F) return null
    val br = new Br(b, from + 1, to)
    val width = br.readBits(14) + 1
    val height = br.readBits(14) + 1
    br.readBits(1) // alpha hint
    if (br.readBits(3) != 0) return null // version
    if (width.toLong * height > MaxPixels) return null

    // transform list, in stream order
    var haveTransform = 0 // bitmask by type
    var predBits = 0
    var predImg: Array[Int] = null
    var colorBits = 0
    var colorImg: Array[Int] = null
    var subtractGreen = false
    var palette: Array[Int] = null
    var packBits = 0 // index-packing: width shrink exponent
    var effWidth = width
    val order = scala.collection.mutable.ArrayBuffer.empty[Int]
    var reading = true
    while (reading) {
      if (br.readBit() == 1) {
        val typ = br.readBits(2)
        if ((haveTransform & (1 << typ)) != 0) return null // dup transform
        haveTransform |= 1 << typ
        order += typ
        typ match {
          case 0 => // predictor
            predBits = br.readBits(3) + 2
            predImg = decodeImage(br, subResDims(effWidth, predBits),
              subResDims(height, predBits), allowMeta = false)
            if (predImg == null) return null
          case 1 => // color transform
            colorBits = br.readBits(3) + 2
            colorImg = decodeImage(br, subResDims(effWidth, colorBits),
              subResDims(height, colorBits), allowMeta = false)
            if (colorImg == null) return null
          case 2 =>
            subtractGreen = true
          case _ => // color indexing
            val size = br.readBits(8) + 1
            val palImg = decodeImage(br, size, 1, allowMeta = false)
            if (palImg == null) return null
            palette = new Array[Int](size)
            var acc = 0
            var i = 0
            while (i < size) { // entries delta-accumulate per channel
              acc = addPixels(acc, palImg(i))
              palette(i) = acc
              i += 1
            }
            packBits =
              if (size <= 2) 3 else if (size <= 4) 2
              else if (size <= 16) 1 else 0
            effWidth = subResDims(effWidth, packBits)
        }
      } else reading = false
      if (br.overrun) return null
    }

    var img = decodeImage(br, effWidth, height, allowMeta = true)
    if (img == null) return null
    var curW = effWidth

    // inverse transforms in REVERSE stream order
    order.reverseIterator.foreach {
      case 3 => // color indexing: unpack sub-byte indices, map palette
        val unpacked = new Array[Int](width * height)
        // bits per index: packBits 3→1, 2→2, 1→4, 0→8 (LSB-first in green)
        val bitsPerIdx = 8 >> packBits
        val perPixel = 1 << packBits
        val mask = (1 << bitsPerIdx) - 1
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val packed = img(y * curW + (x >> packBits))
            val green = (packed >> 8) & 0xFF
            val sub = (x & (perPixel - 1)) * bitsPerIdx
            val idx = (green >> sub) & mask
            unpacked(y * width + x) =
              if (idx < palette.length) palette(idx) else 0
            x += 1
          }
          y += 1
        }
        img = unpacked
        curW = width
      case 2 => // add green back to red and blue
        var i = 0
        while (i < img.length) {
          val p = img(i)
          val gr = (p >> 8) & 0xFF
          val r = (((p >> 16) & 0xFF) + gr) & 0xFF
          val bl = ((p & 0xFF) + gr) & 0xFF
          img(i) = (p & 0xFF00FF00) | (r << 16) | bl
          i += 1
        }
      case 1 => // color transform inverse
        val cw = subResDims(curW, colorBits)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < curW) {
            val m = colorImg((y >> colorBits) * cw + (x >> colorBits))
            val g2r = m & 0xFF
            val g2b = (m >> 8) & 0xFF
            val r2b = (m >> 16) & 0xFF
            val p = img(y * curW + x)
            val g = (p >> 8) & 0xFF
            var r = (p >> 16) & 0xFF
            var bl = p & 0xFF
            r = (r + ctDelta(g2r, g)) & 0xFF
            bl = (bl + ctDelta(g2b, g)) & 0xFF
            bl = (bl + ctDelta(r2b, r)) & 0xFF
            img(y * curW + x) = (p & 0xFF00FF00) | (r << 16) | bl
            x += 1
          }
          y += 1
        }
      case 0 => // predictor inverse
        val pw = subResDims(curW, predBits)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < curW) {
            val mode =
              (predImg((y >> predBits) * pw + (x >> predBits)) >> 8) & 0xFF
            if (mode > 13) return null
            val pred = predict(mode, x, y, curW, img)
            img(y * curW + x) = addPixels(img(y * curW + x), pred)
            x += 1
          }
          y += 1
        }
      case _ => ()
    }
    if (curW != width) return null // packing bookkeeping must close
    new Argb(width, height, img)
  }

  /** RIFF walk → VP8L payload → full decode; null on refusal. */
  def decodeArgb(b: Array[Byte]): Argb = {
    if (b == null || b.length < 20) return null
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P')
      return null
    var i = 12
    while (i + 8 <= b.length) {
      val tag = new String(b, i, 4, "US-ASCII")
      val size = (b(i + 4) & 0xFF) | ((b(i + 5) & 0xFF) << 8) |
        ((b(i + 6) & 0xFF) << 16) | ((b(i + 7) & 0xFF) << 24)
      if (size < 0 || i.toLong + 8 + size > b.length) return null
      tag match {
        case "VP8L" => return decodeVp8l(b, i + 8, i + 8 + size)
        case "VP8 " => return null // lossy: honestly refused (dims in ImageDims)
        case "ANIM" | "ANMF" => return null // animations out of scope
        case _ => () // VP8X, ICCP, EXIF, XMP, ALPH: skip
      }
      i += 8 + size + (size & 1) // chunks pad to even
    }
    null
  }
}

/** 64-bit perceptual dHash of a lossless WebP — the same 9×8 grid,
  * integer gray reduction and bit layout as [[PngDHash]]/[[JpegDHash]]/
  * [[GifDHash]]: one Hamming space across all four web image formats.
  * NULL for anything [[WebpDecode]] refuses or under the 9×8 grid.
  */
case class WebpDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_webp_dhash"

  override protected def nullSafeEval(input: Any): Any =
    WebpDHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, never a literal: two of these in one whole-stage
      // span would redefine the local and kick the WHOLE stage to
      // interpreted (janino "Redefinition of local variable")
      val v = ctx.freshName("wdh")
      s"""
         |java.lang.Long $v = graft.expressions.WebpDHash.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
       """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): WebpDHash =
    copy(child = newChild)
}

object WebpDHash {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): java.lang.Long = {
    val d = WebpDecode.decodeArgb(b)
    if (d == null || d.width < PngDHash.GridW || d.height < PngDHash.GridH)
      return null
    val sums = new Array[Long](PngDHash.GridW * PngDHash.GridH)
    val cnts = new Array[Long](PngDHash.GridW * PngDHash.GridH)
    var y = 0
    while (y < d.height) {
      val cy = PngDHash.cellIndex(y, d.height, PngDHash.GridH)
      var x = 0
      while (x < d.width) {
        val cx = PngDHash.cellIndex(x, d.width, PngDHash.GridW)
        val p = d.pix(y * d.width + x)
        val gray = (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
        val cell = cy * PngDHash.GridW + cx
        sums(cell) += gray
        cnts(cell) += 1L
        x += 1
      }
      y += 1
    }
    java.lang.Long.valueOf(PngDHash.gradientHash(sums, cnts))
  }
}
