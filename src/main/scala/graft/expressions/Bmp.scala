package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** BMP (Windows DIB) pixel decode — the last [[ImageDims]]-only still
  * format gains real pixels. Scope: the layouts that make up
  * essentially all BMPs in the wild — BITMAPINFOHEADER and the
  * V2/V3/V4/V5 extensions, bottom-up AND top-down row order, bit
  * depths 1/4/8 (palette, MSB-first packing), 16 (BI_RGB = X1R5G5B5,
  * or BI_BITFIELDS masks — R5G6B5 and friends), 24/32 (BGR/BGRx, or
  * 32-bit BI_BITFIELDS with arbitrary channel order), 4-byte row
  * padding, partial palettes (`biClrUsed`), and the RLE4/RLE8
  * compressed layouts (encoded runs, absolute mode with word padding,
  * end-of-line/bitmap markers, deltas leaving skipped pixels at
  * palette 0 — always bottom-up per spec). Bitfield channels widen to
  * 8 bits by integer rescale `(v*255 + max/2)/max` — the exact twin
  * of [[graft.llmops.ImageWriter]]'s quantizer, so a 555/565
  * round-trip is value-stable. Malformed masks (zero, non-contiguous,
  * overlapping, or past the pixel width) are refused honestly
  * (wholesale NULL), as are truncated pixel arrays/RLE streams,
  * out-of-palette indices and forged dimensions past the 64 MB cap.
  */
object BmpDecode {

  /** Packed RGB, rows top-down — the display orientation. */
  final class Rgb(val width: Int, val height: Int, val rgb: Array[Byte])

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  def decode(b: Array[Byte]): Rgb = {
    if (b == null || b.length < 54) return null
    if (b(0) != 'B' || b(1) != 'M') return null
    val dataOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize != 40 && dibSize != 52 && dibSize != 56 &&
      dibSize != 108 && dibSize != 124) return null
    val width = le32(b, 18)
    val rawH = le32(b, 22)
    val topDown = rawH < 0
    val height = math.abs(rawH)
    if (width <= 0 || height <= 0) return null
    if (width.toLong * height * 3 > 64L * 1024 * 1024) return null
    if (le16(b, 26) != 1) return null // planes
    val bpp = le16(b, 28)
    if (bpp != 1 && bpp != 4 && bpp != 8 && bpp != 16 && bpp != 24 &&
      bpp != 32) return null
    val compression = le32(b, 30)
    val rle = compression == 1 || compression == 2
    val bitfields = compression == 3
    if (compression != 0 && !rle && !bitfields) return null
    if (rle && ((compression == 1 && bpp != 8) ||
      (compression == 2 && bpp != 4) || topDown)) return null
    if (bitfields && bpp != 16 && bpp != 32) return null
    if (bpp == 16 && !bitfields && compression != 0) return null
    // channel masks: BI_BITFIELDS reads the three DWORDs at offset 54
    // (for dibSize 40 they follow the header; for V2+ they ARE the
    // header's mask fields — same absolute position either way);
    // 16-bit BI_RGB defaults to X1R5G5B5 per the DIB spec
    var masks: Array[Int] = null
    if (bitfields) {
      if (b.length < 66) return null
      masks = Array(le32(b, 54), le32(b, 58), le32(b, 62))
      if (!masksValid(masks, bpp)) return null
    } else if (bpp == 16) masks = Array(0x7C00, 0x03E0, 0x001F)
    var palette: Array[Byte] = null
    var palN = 0
    if (bpp <= 8) {
      val used = le32(b, 46)
      palN = if (used == 0) 1 << bpp else used
      if (palN < 1 || palN > (1 << bpp)) return null
      val palOff = 14 + dibSize
      if (palOff + 4L * palN > b.length) return null
      palette = java.util.Arrays.copyOfRange(b, palOff, palOff + 4 * palN)
    }
    if (rle) {
      val idx = decodeRle(b, dataOff, bpp, width, height)
      if (idx == null) return null
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = (height - 1 - y) * width // RLE rows are bottom-up
        var x = 0
        while (x < width) {
          val v = idx(srcRow + x) & 0xFF
          if (v >= palN) return null
          val dp = (y * width + x) * 3
          out(dp) = palette(v * 4 + 2)
          out(dp + 1) = palette(v * 4 + 1)
          out(dp + 2) = palette(v * 4)
          x += 1
        }
        y += 1
      }
      return new Rgb(width, height, out)
    }
    val rowSize = ((bpp.toLong * width + 31) / 32).toInt * 4
    if (dataOff < 0 || dataOff.toLong + rowSize.toLong * height > b.length)
      return null
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = dataOff + (if (topDown) y else height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        var r = 0; var g = 0; var bl = 0
        bpp match {
          case 24 =>
            val p = srcRow + x * 3
            bl = b(p) & 0xFF; g = b(p + 1) & 0xFF; r = b(p + 2) & 0xFF
          case 16 =>
            val pix = le16(b, srcRow + x * 2)
            r = channel(pix, masks(0)); g = channel(pix, masks(1))
            bl = channel(pix, masks(2))
          case 32 if masks != null =>
            val pix = le32(b, srcRow + x * 4)
            r = channel(pix, masks(0)); g = channel(pix, masks(1))
            bl = channel(pix, masks(2))
          case 32 =>
            val p = srcRow + x * 4
            bl = b(p) & 0xFF; g = b(p + 1) & 0xFF; r = b(p + 2) & 0xFF
          case _ =>
            val bitOff = x * bpp
            val byteV = b(srcRow + (bitOff >> 3)) & 0xFF
            val shift = 8 - bpp - (bitOff & 7)
            val idx = (byteV >> shift) & ((1 << bpp) - 1)
            if (idx >= palN) return null
            bl = palette(idx * 4) & 0xFF
            g = palette(idx * 4 + 1) & 0xFF
            r = palette(idx * 4 + 2) & 0xFF
        }
        val dp = (y * width + x) * 3
        out(dp) = r.toByte; out(dp + 1) = g.toByte; out(dp + 2) = bl.toByte
        x += 1
      }
      y += 1
    }
    new Rgb(width, height, out)
  }

  /** Masks must be nonzero, contiguous runs of bits, mutually
    * disjoint, and inside the pixel width — anything else is a forged
    * or unsupported header, refused rather than guessed at.
    */
  private def masksValid(masks: Array[Int], bpp: Int): Boolean = {
    val width = if (bpp == 32) 0xFFFFFFFF else (1 << bpp) - 1
    var union = 0
    var i = 0
    while (i < 3) {
      val m = masks(i)
      if (m == 0 || (m & ~width) != 0 || (m & union) != 0) return false
      val shifted = m >>> Integer.numberOfTrailingZeros(m)
      if ((shifted & (shifted + 1)) != 0) return false // not contiguous
      union |= m
      i += 1
    }
    true
  }

  /** Extract one bitfield channel and widen to 8 bits by integer
    * rescale — the exact inverse of the writer twin's quantizer.
    */
  private def channel(pix: Int, mask: Int): Int = {
    val shift = Integer.numberOfTrailingZeros(mask)
    val max = (mask >>> shift).toLong
    val v = ((pix & mask) >>> shift).toLong
    ((v * 255 + max / 2) / max).toInt
  }

  /** RLE4/RLE8 stream walk into a bottom-up palette-index canvas
    * (row 0 = bottom). Skipped pixels — deltas, early end-of-line,
    * early end-of-bitmap — stay at palette index 0, the historical
    * Windows convention. Null on any structural violation: truncated
    * stream, run past the row end, cursor past the canvas, missing
    * end-of-bitmap.
    */
  private def decodeRle(b: Array[Byte], from: Int, bpp: Int,
      width: Int, height: Int): Array[Byte] = {
    if (from < 0 || from >= b.length) return null
    val idx = new Array[Byte](width * height)
    var x = 0
    var row = 0 // bottom row first
    var i = from
    while (i + 2 <= b.length) {
      val n = b(i) & 0xFF
      val v = b(i + 1) & 0xFF
      i += 2
      if (n > 0) { // encoded run: n pixels of v (RLE4: alternating nibbles)
        if (row >= height || x + n > width) return null
        var k = 0
        while (k < n) {
          val value =
            if (bpp == 8) v else if ((k & 1) == 0) v >> 4 else v & 0xF
          idx(row * width + x) = value.toByte
          x += 1
          k += 1
        }
      } else v match {
        case 0 => // end of line
          x = 0
          row += 1
          if (row > height) return null
        case 1 => // end of bitmap
          return idx
        case 2 => // delta: skipped pixels stay 0
          if (i + 2 > b.length) return null
          x += b(i) & 0xFF
          row += b(i + 1) & 0xFF
          i += 2
          if (x > width || row > height) return null
        case cnt => // absolute mode: cnt literal pixels, word-padded
          val bytes = if (bpp == 8) cnt else (cnt + 1) / 2
          val padded = (bytes + 1) & ~1
          if (i + padded > b.length) return null
          if (row >= height || x + cnt > width) return null
          var k = 0
          while (k < cnt) {
            val by = b(i + (if (bpp == 8) k else k / 2)) & 0xFF
            val value =
              if (bpp == 8) by else if ((k & 1) == 0) by >> 4 else by & 0xF
            idx(row * width + x) = value.toByte
            x += 1
            k += 1
          }
          i += padded
      }
    }
    null // stream ended without the end-of-bitmap marker
  }
}

/** 64-bit perceptual dHash of a BMP — same grid, gray reduction and bit
  * layout as the PNG/JPEG/GIF/WebP arms: the fifth member of the ONE
  * cross-format image Hamming space. NULL for refusals and sub-grid.
  */
case class BmpDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_dhash"

  override protected def nullSafeEval(input: Any): Any =
    BmpDHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, never a literal: two of these in one whole-stage
      // span would redefine the local and kick the WHOLE stage to
      // interpreted (janino "Redefinition of local variable")
      val v = ctx.freshName("bdh")
      s"""
         |java.lang.Long $v = graft.expressions.BmpDHash.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
       """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): BmpDHash =
    copy(child = newChild)
}

object BmpDHash {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): java.lang.Long = {
    val d = BmpDecode.decode(b)
    if (d == null || d.width < PngDHash.GridW || d.height < PngDHash.GridH)
      return null
    java.lang.Long.valueOf(GifDHash.hashCanvas(d.rgb, d.width, d.height))
  }
}
