package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Baseline TIFF pixel decode — the sixth and last [[ImageDims]] image
  * format gains pixels (scanned-document corpora are overwhelmingly
  * baseline TIFF). Scope, per TIFF 6.0 baseline: both byte orders,
  * IFD0 with inline OR offset-stored value arrays; grayscale at
  * 1/4/8 bits (both `WhiteIsZero` and `BlackIsZero` photometrics),
  * 8-bit RGB (+ RGBA with the alpha sample ignored), palette-color at
  * 4/8 bits (16-bit ColorMap planes reduced by their high byte);
  * multi-strip layouts (`RowsPerStrip`/`StripOffsets`/
  * `StripByteCounts`) with uncompressed (1) or PackBits (32773)
  * strips; chunky planar config only. LZW/JPEG-in-TIFF, tiles,
  * planar=2 and 16-bit samples are refused honestly (wholesale NULL),
  * as are truncated strips, short ColorMaps and forged dims past the
  * 64 MB cap.
  */
object TiffDecode {

  final class Rgb(val width: Int, val height: Int, val rgb: Array[Byte])

  private final case class Entry(typ: Int, count: Int, raw: Int)

  def decode(b: Array[Byte]): Rgb = {
    if (b == null || b.length < 8) return null
    val le =
      if (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) true
      else if (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42) false
      else return null
    def u16(i: Int): Int =
      if (i + 2 > b.length) -1
      else if (le) (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
      else ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    def u32(i: Int): Int =
      if (i + 4 > b.length) -1
      else if (le) (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
        ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
      else ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
        ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
    val ifd = u32(4)
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
    if (compression != 1 && compression != 32773) return null
    val spp = scalar(277, 1)
    val bitsArr = values(258)
    val bits = if (bitsArr == null) 1 else bitsArr(0)
    if (bitsArr != null && bitsArr.exists(_ != bits)) return null
    val photometric = scalar(262, 1)
    if (scalar(284, 1) != 1) return null // chunky only
    val ok = (spp, photometric) match {
      case (1, 0) | (1, 1) => bits == 1 || bits == 4 || bits == 8
      case (1, 3) => bits == 4 || bits == 8
      case (3, 2) | (4, 2) => bits == 8
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
    val bitsPP = bits * spp
    val rowBytes = (width * bitsPP + 7) / 8
    val out = new Array[Byte](width * height * 3)
    val levels = 1 << bits
    val scale = if (bits == 8) 1 else 255 / (levels - 1)
    var strip = 0
    var y0 = 0
    while (strip < offsets.length) {
      val rows = math.min(rowsPerStrip, height - y0)
      val need = rows * rowBytes
      val data: Array[Byte] =
        if (compression == 1) {
          val o = offsets(strip)
          if (o < 0 || counts(strip) < need ||
            o.toLong + need > b.length) return null
          java.util.Arrays.copyOfRange(b, o, o + need)
        } else {
          val o = offsets(strip)
          val len = counts(strip)
          if (o < 0 || len < 0 || o.toLong + len > b.length) return null
          val d = packBits(b, o, len, need)
          if (d == null) return null
          d
        }
      var ry = 0
      while (ry < rows) {
        val y = y0 + ry
        var x = 0
        while (x < width) {
          var r = 0; var g = 0; var bl = 0
          if (spp >= 3) {
            val p = ry * rowBytes + x * spp
            r = data(p) & 0xFF; g = data(p + 1) & 0xFF; bl = data(p + 2) & 0xFF
          } else {
            val bitOff = x * bits
            val byteV = data(ry * rowBytes + (bitOff >> 3)) & 0xFF
            val shift = 8 - bits - (bitOff & 7)
            var v = (byteV >> shift) & (levels - 1)
            if (photometric == 0) v = levels - 1 - v // WhiteIsZero
            if (photometric == 3) {
              r = (palette(v) >> 8) & 0xFF
              g = (palette(levels + v) >> 8) & 0xFF
              bl = (palette(2 * levels + v) >> 8) & 0xFF
            } else { r = v * scale; g = r; bl = r }
          }
          val dp = (y * width + x) * 3
          out(dp) = r.toByte; out(dp + 1) = g.toByte; out(dp + 2) = bl.toByte
          x += 1
        }
        ry += 1
      }
      y0 += rows
      strip += 1
    }
    new Rgb(width, height, out)
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
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Long tdh$$ = graft.expressions.TiffDHash.compute($c);
         |if (tdh$$ == null) { ${ev.isNull} = true; } else { ${ev.value} = tdh$$.longValue(); }
       """.stripMargin)

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
