package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Image metadata from binary headers — `ImageDims(content)` returns
  * `struct&lt;format string, width int, height int&gt;` or NULL when the bytes
  * are not a recognized image.
  *
  * The container ships no imaging libraries, but none are needed for the
  * metadata a curation pipeline filters on: PNG (IHDR), JPEG (SOF frame
  * header), GIF (logical screen descriptor), and BMP (info header) all
  * carry dimensions in fixed, documented header fields. Full pixel decode
  * stays behind [[graft.llmops.Multimodal]]'s documented stub — THIS part
  * is real, so size/aspect filters and thumbnail routing run at scan
  * speed inside whole-stage codegen with zero external deps.
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageDims.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_dims"

  override protected def nullSafeEval(input: Any): Any =
    ImageDims.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.ImageDims.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
}

object ImageDims {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return null
    // PNG: 8-byte signature, then IHDR chunk — width/height at 16/20 (BE)
    if (b.length >= 24 &&
        (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return row("png", be32(b, 16), be32(b, 20))
    // GIF87a/GIF89a: logical screen descriptor at 6 (LE)
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // BMP: "BM", BITMAPINFOHEADER width at 18, height at 22 (LE, height signed
    // — negative means top-down row order, magnitude is the pixel height)
    if (b(0) == 'B' && b(1) == 'M' && b.length >= 26)
      return row("bmp", le32(b, 18), math.abs(le32(b, 22)))
    // Netpbm P1-P6: ASCII header after the magic
    if (b(0) == 'P' && b(1) >= '1' && b(1) <= '6') {
      val d = PnmDecode.dims(b)
      if (d != null) return row("pnm", d._2, d._3)
    }
    // ICO/CUR: 0x0000 + type 1/2 directory; largest entry's dims
    if (b(0) == 0 && b(1) == 0 && (b(2) == 1 || b(2) == 2) && b(3) == 0) {
      val d = IcoDecode.dims(b)
      if (d != null) return row("ico", d._1, d._2)
    }
    // WebP: RIFF....WEBP, then the first chunk names the flavor.
    //  VP8X (extended): canvas dims as 24-bit LE minus-one at 24/27.
    //  VP8L (lossless): byte 0x2F, then 14-bit w-1 / 14-bit h-1 packed LE.
    //  "VP8 " (lossy): key-frame start code 9D 01 2A, then 14-bit LE dims.
    if (b.length >= 30 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
        b(11) == 'P') {
      val tag = new String(b, 12, 4, "US-ASCII")
      if (tag == "VP8X" && b.length >= 30)
        return row("webp",
          1 + (le16(b, 24) | ((b(26) & 0xFF) << 16)),
          1 + (le16(b, 27) | ((b(29) & 0xFF) << 16)))
      if (tag == "VP8L" && b.length >= 25 && (b(20) & 0xFF) == 0x2F) {
        val bits = le32(b, 21)
        return row("webp", 1 + (bits & 0x3FFF), 1 + ((bits >> 14) & 0x3FFF))
      }
      if (tag == "VP8 " && b.length >= 30 &&
          (b(23) & 0xFF) == 0x9D && (b(24) & 0xFF) == 0x01 &&
          (b(25) & 0xFF) == 0x2A)
        return row("webp", le16(b, 26) & 0x3FFF, le16(b, 28) & 0x3FFF)
      return null
    }
    // TIFF: II*\0 (little-endian) or MM\0* (big-endian); walk IFD0 for
    // tags 256 (ImageWidth) / 257 (ImageLength), SHORT or LONG values
    if (b.length >= 8 &&
        ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
          (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))) {
      val le = b(0) == 'I'
      def u16(i: Int): Int = if (le) le16(b, i) else be16(b, i)
      def u32(i: Int): Int = if (le) le32(b, i) else be32(b, i)
      val ifd = u32(4)
      if (ifd < 8 || ifd + 2 > b.length) return null
      val n = u16(ifd)
      var w = -1
      var h = -1
      var e = 0
      while (e < n && ifd + 2 + (e + 1) * 12 <= b.length) {
        val off = ifd + 2 + e * 12
        val t = u16(off)
        if (t == 256 || t == 257) {
          val typ = u16(off + 2)
          val v =
            if (typ == 3) u16(off + 8) // SHORT: first value, left-packed
            else if (typ == 4) u32(off + 8)
            else -1
          if (t == 256) w = v else h = v
        }
        e += 1
      }
      return if (w > 0 && h > 0) row("tiff", w, h) else null
    }
    // JPEG: SOI then marker segments; dimensions live in the SOF frame
    // header (C0-CF minus the non-frame C4/C8/CC)
    if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xFF) != 0xFF) return null // lost marker sync
        val marker = b(i + 1) & 0xFF
        if (marker == 0xFF) { i += 1 } // fill byte
        else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) || marker == 0x01) {
          i += 2 // standalone marker, no length
        } else if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          // SOFn: len(2) precision(1) height(2) width(2)
          if (i + 9 > b.length) return null
          return row("jpeg", be16(b, i + 7), be16(b, i + 5))
        } else {
          if (i + 4 > b.length) return null
          val len = be16(b, i + 2)
          if (len < 2) return null
          i += 2 + len
        }
      }
      return null
    }
    null
  }
}
