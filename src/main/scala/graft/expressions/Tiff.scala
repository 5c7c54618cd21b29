package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** TIFF pixel decode — the sixth [[ImageDims]] image format
  * (scanned-document corpora are overwhelmingly TIFF). Scope, per
  * TIFF 6.0: both byte orders, IFD0 with inline OR offset-stored
  * value arrays; grayscale at 1/4/8/16 bits (both `WhiteIsZero` and
  * `BlackIsZero` photometrics; 16-bit samples reduced by their high
  * byte), 8- and 16-bit RGB (+ RGBA with the alpha sample ignored),
  * palette-color at 4/8 bits (16-bit ColorMap
  * planes reduced by their high byte); strip layouts
  * (`RowsPerStrip`/`StripOffsets`/`StripByteCounts`) AND tiled
  * layouts (`TileWidth`/`TileLength`/`TileOffsets`/`TileByteCounts`,
  * TIFF 6.0 §15); segment compression none (1), LZW (5, §13 with the
  * early-change convention), Deflate (8 and legacy 32946, zlib
  * streams) or PackBits (32773); horizontal-differencing Predictor 2
  * (§14, 8-bit samples) under any compression; chunky AND planar
  * (config 2, per-channel strip planes) sample layouts.
  * JPEG-in-TIFF, tiled-planar and 16-bit palette indices are refused
  * honestly (wholesale NULL), as are truncated segments, short
  * ColorMaps and forged dims past the 64 MB cap.
  */
object TiffDecode {

  final class Rgb(val width: Int, val height: Int, val rgb: Array[Byte])

  private final case class Entry(typ: Int, count: Int, raw: Int)

  /** `true` for little-endian, `false` for big-endian, null magic
    * mismatch is signalled by the Integer result being null.
    */
  private def byteOrder(b: Array[Byte]): java.lang.Boolean =
    if (b == null || b.length < 8) null
    else if (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0)
      java.lang.Boolean.TRUE
    else if (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)
      java.lang.Boolean.FALSE
    else null

  def decode(b: Array[Byte]): Rgb = {
    val leB = byteOrder(b)
    if (leB == null) return null
    val le = leB.booleanValue()
    val ifd0 =
      if (le) (b(4) & 0xFF) | ((b(5) & 0xFF) << 8) |
        ((b(6) & 0xFF) << 16) | ((b(7) & 0xFF) << 24)
      else ((b(4) & 0xFF) << 24) | ((b(5) & 0xFF) << 16) |
        ((b(6) & 0xFF) << 8) | (b(7) & 0xFF)
    decodeIfd(b, le, ifd0)
  }

  /** Every page of a multi-page TIFF (the IFD chain — how scanned
    * documents actually ship): ALL pages must decode and the combined
    * canvas must fit the 64 MB cap, else wholesale null (a partially
    * readable scan never surfaces as a shorter document). Cycle-safe
    * via the page cap.
    */
  def decodePages(b: Array[Byte], maxPages: Int = 256): Array[Rgb] = {
    val leB = byteOrder(b)
    if (leB == null) return null
    val le = leB.booleanValue()
    def u16(i: Int): Int =
      if (i < 0 || i + 2 > b.length) -1
      else if (le) (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
      else ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    def u32(i: Int): Int =
      if (i < 0 || i + 4 > b.length) -1
      else if (le) (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
        ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
      else ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
        ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
    val pages = scala.collection.mutable.ArrayBuffer.empty[Rgb]
    var off = u32(4)
    var total = 0L
    while (off != 0) {
      if (pages.length >= maxPages) return null
      val r = decodeIfd(b, le, off)
      if (r == null) return null
      total += r.rgb.length
      if (total > 64L * 1024 * 1024) return null
      pages += r
      val n = u16(off)
      if (n <= 0) return null
      off = u32(off + 2 + n * 12)
      if (off < 0) return null
    }
    if (pages.isEmpty) null else pages.toArray
  }

  private def decodeIfd(b: Array[Byte], le: Boolean, ifd: Int): Rgb = {
    def u16(i: Int): Int =
      if (i < 0 || i + 2 > b.length) -1
      else if (le) (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
      else ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    def u32(i: Int): Int =
      if (i < 0 || i + 4 > b.length) -1
      else if (le) (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
        ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
      else ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
        ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val n = u16(ifd)
    if (n <= 0) return null
    val entries = scala.collection.mutable.Map.empty[Int, Entry]
    var e = 0
    while (e < n) {
      val off = ifd + 2 + e * 12
      if (off + 12 > b.length) return null
      entries(u16(off)) = Entry(u16(off + 2), u32(off + 4), off + 8)
      e += 1
    }
    val typeSize = Map(1 -> 1, 3 -> 2, 4 -> 4)
    // value array for a tag: SHORT/LONG/BYTE; inline when it fits 4 bytes
    def values(tag: Int): Array[Int] = entries.get(tag) match {
      case None => null
      case Some(Entry(typ, count, raw)) =>
        val sz = typeSize.getOrElse(typ, -1)
        if (sz < 0 || count < 0 || count > (1 << 24)) return null
        val base =
          if (sz.toLong * count <= 4) raw
          else {
            val o = u32(raw)
            if (o < 0 || o.toLong + sz.toLong * count > b.length) return null
            o
          }
        if (base.toLong + sz.toLong * count > b.length) return null
        Array.tabulate(count) { i =>
          typ match {
            case 1 => b(base + i) & 0xFF
            case 3 => u16(base + i * 2)
            case _ => u32(base + i * 4)
          }
        }
    }
    def scalar(tag: Int, default: Int): Int = {
      val v = values(tag)
      if (v == null) default
      else if (v.isEmpty) return -1
      else v(0)
    }
    val width = scalar(256, -1)
    val height = scalar(257, -1)
    if (width <= 0 || height <= 0) return null
    if (width.toLong * height * 3 > 64L * 1024 * 1024) return null
    val compression = scalar(259, 1)
    if (compression != 1 && compression != 32773 && compression != 5 &&
      compression != 8 && compression != 32946) return null
    val spp = scalar(277, 1)
    val bitsArr = values(258)
    val bits = if (bitsArr == null) 1 else bitsArr(0)
    if (bitsArr != null && bitsArr.exists(_ != bits)) return null
    val photometric = scalar(262, 1)
    val planar = scalar(284, 1)
    if (planar != 1 && planar != 2) return null
    // planar 2: separate per-channel planes; meaningful for RGB(A) only
    // (a 1-sample image is identical either way), strips only (tiled
    // planar is vanishingly rare in the wild)
    val ok = (spp, photometric) match {
      case (1, 0) | (1, 1) =>
        bits == 1 || bits == 4 || bits == 8 || bits == 16
      case (1, 3) => bits == 4 || bits == 8
      case (3, 2) | (4, 2) => bits == 8 || bits == 16
      case _ => false
    }
    if (!ok) return null
    var palette: Array[Int] = null
    if (photometric == 3) {
      val cm = values(320)
      val levels = 1 << bits
      if (cm == null || cm.length < 3 * levels) return null
      palette = cm
    }
    val predictor = scalar(317, 1)
    if (predictor != 1 && predictor != 2) return null
    if (predictor == 2 && bits != 8) return null // §14: per-sample diffs
    val bitsPP = bits * spp
    val levels = 1 << bits
    val scale = if (bits == 8) 1 else 255 / (levels - 1)
    val out = new Array[Byte](width * height * 3)

    // decompress one segment (strip or tile) to exactly `need` bytes
    def segment(off: Int, len: Int, need: Int): Array[Byte] = {
      if (off < 0 || len < 0 || off.toLong + len > b.length) return null
      // the canvas cap bounds PIXELS; a 64-bpp tile forged far wider than
      // the image would still demand a multi-hundred-MB segment buffer
      // here (compressed input, so not bounded by the blob size) — cap
      // the decode target itself, same allocation-bomb posture
      if (need < 0 || need > (128 << 20)) return null
      compression match {
        case 1 =>
          if (len < need || off.toLong + need > b.length) null
          else java.util.Arrays.copyOfRange(b, off, off + need)
        case 32773 => packBits(b, off, len, need)
        case 5 => lzw(b, off, len, need)
        case _ => inflate(b, off, len, need)
      }
    }

    // §14 Predictor 2: undo horizontal differencing in place, per
    // segment row, with one accumulator per sample channel
    def unpredict(data: Array[Byte], segRowBytes: Int, cols: Int): Unit = {
      var p = 0
      while (p < data.length) {
        var i = spp
        val rowEnd = math.min(p + cols * spp, p + segRowBytes)
        while (p + i < rowEnd) {
          data(p + i) = (data(p + i) + data(p + i - spp)).toByte
          i += 1
        }
        p += segRowBytes
      }
    }

    // paint `cols`×`rows` pixels of a decoded segment into the canvas
    def paint(data: Array[Byte], segRowBytes: Int, x0: Int, y0: Int,
        cols: Int, rows: Int): Unit = {
      // 16-bit samples reduce by their high byte (the ColorMap
      // convention in reverse); position depends on the byte order
      val hiOff = if (le) 1 else 0
      var ry = 0
      while (ry < rows) {
        val y = y0 + ry
        var cx = 0
        while (cx < cols) {
          var r = 0; var g = 0; var bl = 0
          if (spp >= 3) {
            if (bits == 16) {
              val p = ry * segRowBytes + cx * spp * 2
              r = data(p + hiOff) & 0xFF
              g = data(p + 2 + hiOff) & 0xFF
              bl = data(p + 4 + hiOff) & 0xFF
            } else {
              val p = ry * segRowBytes + cx * spp
              r = data(p) & 0xFF; g = data(p + 1) & 0xFF
              bl = data(p + 2) & 0xFF
            }
          } else if (bits == 16) {
            var v = data(ry * segRowBytes + cx * 2 + hiOff) & 0xFF
            if (photometric == 0) v = 255 - v // WhiteIsZero
            r = v; g = v; bl = v
          } else {
            val bitOff = cx * bits
            val byteV = data(ry * segRowBytes + (bitOff >> 3)) & 0xFF
            val shift = 8 - bits - (bitOff & 7)
            var v = (byteV >> shift) & (levels - 1)
            if (photometric == 0) v = levels - 1 - v // WhiteIsZero
            if (photometric == 3) {
              r = (palette(v) >> 8) & 0xFF
              g = (palette(levels + v) >> 8) & 0xFF
              bl = (palette(2 * levels + v) >> 8) & 0xFF
            } else { r = v * scale; g = r; bl = r }
          }
          val dp = (y * width + x0 + cx) * 3
          out(dp) = r.toByte; out(dp + 1) = g.toByte; out(dp + 2) = bl.toByte
          cx += 1
        }
        ry += 1
      }
    }

    val tiled = entries.contains(322) || entries.contains(323) ||
      entries.contains(324) || entries.contains(325)
    if (tiled) {
      // §15 tiled layout: a full grid of fixed-size tiles, each padded
      // to tileW×tileL; strip tags must be absent (mixed layouts refuse)
      if (entries.contains(273) || entries.contains(279)) return null
      if (planar == 2 && spp >= 3) return null // tiled planar: refuse
      val tileW = scalar(322, -1)
      val tileL = scalar(323, -1)
      if (tileW <= 0 || tileL <= 0) return null
      if (tileW.toLong * tileL > 64L * 1024 * 1024) return null
      val offsets = values(324)
      val counts = values(325)
      if (offsets == null || counts == null ||
        offsets.length != counts.length) return null
      val across = (width + tileW - 1) / tileW
      val down = (height + tileL - 1) / tileL
      if (offsets.length != across * down) return null
      val tileRowBytes = (tileW * bitsPP + 7) / 8
      val need = tileRowBytes * tileL
      var t = 0
      while (t < offsets.length) {
        val data = segment(offsets(t), counts(t), need)
        if (data == null) return null
        if (predictor == 2) unpredict(data, tileRowBytes, tileW)
        val x0 = (t % across) * tileW
        val y0 = (t / across) * tileL
        paint(data, tileRowBytes, x0, y0,
          math.min(tileW, width - x0), math.min(tileL, height - y0))
        t += 1
      }
    } else if (planar == 2 && spp >= 3) {
      // §1 planar configuration 2: all strips of channel 0, then
      // channel 1, ... Each plane row carries ONE sample per pixel, so
      // the predictor stride is 1 and 16-bit reduction reads per-plane
      if (bits != 8 && bits != 16) return null
      val offsets = values(273)
      val counts = values(279)
      if (offsets == null || counts == null ||
        offsets.length != counts.length || offsets.isEmpty) return null
      val rowsPerStrip = {
        val v = scalar(278, height)
        if (v <= 0) height else math.min(v, height)
      }
      val stripsPerPlane = (height + rowsPerStrip - 1) / rowsPerStrip
      if (stripsPerPlane * spp != offsets.length) return null
      val planeRowBytes = (width * bits + 7) / 8
      val hiOff = if (le) 1 else 0
      var c = 0
      while (c < spp) {
        var strip = 0
        var y0 = 0
        while (strip < stripsPerPlane) {
          val rows = math.min(rowsPerStrip, height - y0)
          val need = rows * planeRowBytes
          val idx = c * stripsPerPlane + strip
          val data = segment(offsets(idx), counts(idx), need)
          if (data == null) return null
          if (predictor == 2) { // stride 1 within a plane
            var pr = 0
            while (pr < data.length) {
              var i = 1
              while (i < planeRowBytes && pr + i < data.length) {
                data(pr + i) = (data(pr + i) + data(pr + i - 1)).toByte
                i += 1
              }
              pr += planeRowBytes
            }
          }
          if (c < 3) { // alpha plane ignored, like chunky RGBA
            var ry = 0
            while (ry < rows) {
              var x = 0
              while (x < width) {
                val v =
                  if (bits == 16)
                    data(ry * planeRowBytes + x * 2 + hiOff) & 0xFF
                  else data(ry * planeRowBytes + x) & 0xFF
                out(((y0 + ry) * width + x) * 3 + c) = v.toByte
                x += 1
              }
              ry += 1
            }
          }
          y0 += rows
          strip += 1
        }
        c += 1
      }
    } else {
      val offsets = values(273)
      val counts = values(279)
      if (offsets == null || counts == null ||
        offsets.length != counts.length || offsets.isEmpty) return null
      val rowsPerStrip = {
        val v = scalar(278, height)
        if (v <= 0) height else math.min(v, height)
      }
      if ((height + rowsPerStrip - 1) / rowsPerStrip != offsets.length)
        return null
      val rowBytes = (width * bitsPP + 7) / 8
      var strip = 0
      var y0 = 0
      while (strip < offsets.length) {
        val rows = math.min(rowsPerStrip, height - y0)
        val need = rows * rowBytes
        val data = segment(offsets(strip), counts(strip), need)
        if (data == null) return null
        if (predictor == 2) unpredict(data, rowBytes, width)
        paint(data, rowBytes, 0, y0, width, rows)
        y0 += rows
        strip += 1
      }
    }
    new Rgb(width, height, out)
  }

  /** TIFF LZW (6.0 §13): MSB-first codes, 9→12 bit widths with the
    * early-change convention (width bumps when the NEXT free code
    * reaches `2^w - 1`), Clear (256) resets mid-stream, EOI (257)
    * ends. Decodes exactly `need` bytes or refuses.
    */
  private[graft] def lzw(b: Array[Byte], from: Int, len: Int,
      need: Int): Array[Byte] = {
    val out = new Array[Byte](need)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val strlen = new Array[Int](4096)
    val firstB = new Array[Byte](4096)
    var next = 258
    var codeSize = 9
    var prev = -1
    var o = 0
    var bitPos = from.toLong * 8
    val endBits = (from.toLong + len) * 8
    def read(): Int = {
      if (bitPos + codeSize > endBits) return -1
      var v = 0
      var n = codeSize
      while (n > 0) {
        val bi = (bitPos >> 3).toInt
        val bo = (bitPos & 7).toInt
        val take = math.min(8 - bo, n)
        v = (v << take) |
          (((b(bi) & 0xFF) >> (8 - bo - take)) & ((1 << take) - 1))
        bitPos += take
        n -= take
      }
      v
    }
    def lenOf(c: Int): Int = if (c < 256) 1 else strlen(c)
    def firstOf(c: Int): Byte = if (c < 256) c.toByte else firstB(c)
    def emit(c: Int): Boolean = {
      val l = lenOf(c)
      if (o + l > need) return false
      var k = c
      var i = o + l - 1
      while (k >= 256) { out(i) = suffix(k); i -= 1; k = prefix(k) }
      out(i) = k.toByte
      o += l
      true
    }
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return null
      if (code == 257) done = true // EOI
      else if (code == 256) { next = 258; codeSize = 9; prev = -1 }
      else if (prev < 0) {
        if (code > 255) return null // first code after clear is literal
        if (!emit(code)) return null
        prev = code
      } else {
        if (code > next) return null // forward reference past KwKwK
        if (next < 4096) {
          // the entry string(prev)+first(code-or-prev) — added BEFORE
          // emitting so the KwKwK case (code == next) resolves
          prefix(next) = prev
          suffix(next) = if (code == next) firstOf(prev) else firstOf(code)
          strlen(next) = lenOf(prev) + 1
          firstB(next) = firstOf(prev)
          next += 1
          if (next == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
        }
        if (!emit(code)) return null
        prev = code
      }
    }
    if (o != need) null else out
  }

  /** TIFF Deflate (8 / legacy 32946): one zlib stream per segment. */
  private def inflate(b: Array[Byte], from: Int, len: Int,
      need: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b, from, len)
      val out = new Array[Byte](need)
      var o = 0
      while (o < need && !inf.finished()) {
        val n = inf.inflate(out, o, need - o)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return null
        o += n
      }
      if (o != need) null else out
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  /** PackBits (TIFF 6.0 §9): decompress exactly `need` bytes from
    * `b[from, from+len)`; null on any inconsistency.
    */
  private def packBits(b: Array[Byte], from: Int, len: Int,
      need: Int): Array[Byte] = {
    val out = new Array[Byte](need)
    var i = from
    val end = from + len
    var o = 0
    while (o < need) {
      if (i >= end) return null
      val c = b(i)
      i += 1
      if (c >= 0) { // literal run of c+1
        val run = c + 1
        if (i + run > end || o + run > need) return null
        System.arraycopy(b, i, out, o, run)
        i += run
        o += run
      } else if (c != -128) { // repeat next byte 1-c times
        if (i >= end) return null
        val run = 1 - c
        if (o + run > need) return null
        java.util.Arrays.fill(out, o, o + run, b(i))
        i += 1
        o += run
      } // -128: noop
    }
    out
  }
}

/** Multi-page TIFF pages as `array<binary>` of complete 8-bit RGB PNG
  * stills ([[GifDecode.pngEncode]] re-encode) — the scanned-document
  * sibling of [[GifFrames]]: every downstream still consumer
  * ([[PngDHash]], histogram screens, page-level dedup) rides the IFD
  * chain with zero new machinery. NULL wholesale when any page
  * refuses (per [[TiffDecode.decodePages]]).
  */
case class TiffPages(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tiff_pages"

  override protected def nullSafeEval(input: Any): Any =
    TiffPages.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.TiffPages.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): TiffPages =
    copy(child = newChild)
}

object TiffPages {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val pages = TiffDecode.decodePages(b)
    if (pages == null) return null
    val out = new Array[Any](pages.length)
    var i = 0
    while (i < pages.length) {
      out(i) = GifDecode.pngEncode(pages(i).width, pages(i).height,
        pages(i).rgb)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** 64-bit perceptual dHash of a baseline TIFF — sixth arm of the
  * shared grid/bit layout; every ImageDims-recognized raster format
  * now hashes into ONE Hamming space. NULL for refusals and sub-grid.
  */
case class TiffDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tiff_dhash"

  override protected def nullSafeEval(input: Any): Any =
    TiffDHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, never a literal: two of these in one whole-stage
      // span would redefine the local and kick the WHOLE stage to
      // interpreted (janino "Redefinition of local variable")
      val v = ctx.freshName("tdh")
      s"""
         |java.lang.Long $v = graft.expressions.TiffDHash.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
       """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): TiffDHash =
    copy(child = newChild)
}

object TiffDHash {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): java.lang.Long = {
    val d = TiffDecode.decode(b)
    if (d == null || d.width < PngDHash.GridW || d.height < PngDHash.GridH)
      return null
    java.lang.Long.valueOf(GifDHash.hashCanvas(d.rgb, d.width, d.height))
  }
}
