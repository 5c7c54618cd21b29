package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Full PNG pixel decode — `PngPixels(content)` inflates the IDAT stream
  * (JDK zlib, no imaging library), reverses the per-scanline filters
  * (all five: None/Sub/Up/Average/Paeth), and returns per-image pixel
  * statistics:
  *
  * `struct<width int, height int, channels int, pix_sum long,
  * pix_wsum long, mean_r double, mean_g double, mean_b double>`
  *
  *  - `pix_sum`: sum of every pixel-stream byte (all channels),
  *  - `pix_wsum`: position-weighted checksum
  *    `Σ (p mod 9973 + 1) · v(p)` over 0-based pixel-stream byte index
  *    `p` — order-sensitive, so a decoder that unfilters incorrectly or
  *    permutes bytes cannot match it,
  *  - `mean_r/g/b`: per-channel means over the first three channels
  *    (alpha, when present, participates in the sums but not the means).
  *
  * Returns NULL for anything but a well-formed, non-interlaced 8-bit
  * truecolor (RGB) or truecolor-alpha (RGBA) PNG whose IDAT inflates to
  * exactly `height · (1 + width·channels)` bytes — palette, grayscale,
  * 16-bit, and Adam7 variants are out of scope for the synthetic-fixture
  * gate and refused rather than half-decoded. Decode is per-row local
  * (scan projection, no shuffle); cost is the inflate itself.
  *
  * Closes the one stubbed arm of [[graft.llmops.Multimodal]]: header
  * metadata was already real ([[ImageDims]]); pixel decode now is too.
  * The reference's document processor ambition is text-only
  * (aje_libs/documents/helpers/document_processor.py:10-83), so this is
  * engine-addition scope, not reference parity.
  */
case class PngPixels(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PngPixels.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_pixels"

  override protected def nullSafeEval(input: Any): Any =
    PngPixels.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.PngPixels.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PngPixels =
    copy(child = newChild)
}

object PngPixels {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pix_sum", LongType, nullable = false),
    StructField("pix_wsum", LongType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): InternalRow = {
    val d = decodeRaw(b)
    if (d == null) return null
    val bpp = d.channels
    val stride = d.width * bpp
    var pixSum = 0L
    var wSum = 0L
    val chanSum = new Array[Long](bpp)
    var y = 0
    while (y < d.height) {
      val rowOff = y * (1 + stride) + 1
      var i = 0
      while (i < stride) {
        val v = d.raw(rowOff + i) & 0xFF
        val p = (y.toLong * d.width + i / bpp) * bpp + i % bpp
        pixSum += v
        wSum += (p % 9973 + 1) * v
        chanSum(i % bpp) += v
        i += 1
      }
      y += 1
    }
    val n = d.width.toLong * d.height
    new GenericInternalRow(Array[Any](d.width, d.height, d.channels, pixSum,
      wSum, chanSum(0).toDouble / n, chanSum(1).toDouble / n,
      chanSum(2).toDouble / n))
  }

  /** Full decode to unfiltered scanline layout — the shared front half of
    * [[compute]] and [[PngDHash]]: chunk walk, IDAT inflate, all-five
    * -filter reversal. Same refusal envelope as documented on the
    * expression (non-interlaced 8-bit RGB/RGBA only); null on anything
    * malformed.
    */
  private[expressions] def decodeRaw(b: Array[Byte]): PngRaw = {
    if (b == null || b.length < 45) return null // sig + IHDR + empty IDAT + IEND
    if ((b(0) & 0xFF) != 0x89 || b(1) != 'P' || b(2) != 'N' || b(3) != 'G')
      return null
    // walk chunks: IHDR must come first; IDAT data segments concatenate
    // into one zlib stream
    var i = 8
    var width = 0
    var height = 0
    var channels = 0
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    while (i + 8 <= b.length) {
      val len = be32(b, i)
      // bounds math in Long: a crafted len near Int.MaxValue would wrap
      // `i + 12 + len` negative and slip past an Int comparison
      if (len < 0 || i.toLong + 12L + len > b.length) return null
      val typ = new String(b, i + 4, 4, "US-ASCII")
      if (!seenIhdr) {
        if (typ != "IHDR" || len != 13) return null
        width = be32(b, i + 8)
        height = be32(b, i + 12)
        val bitDepth = b(i + 16) & 0xFF
        val colorType = b(i + 17) & 0xFF
        val interlace = b(i + 20) & 0xFF
        if (bitDepth != 8 || interlace != 0 ||
            (colorType != 2 && colorType != 6)) return null
        if (width <= 0 || height <= 0) return null
        // bound the inflated buffer we are willing to allocate (64 MB of
        // raw pixels) — a forged IHDR must not become an allocation bomb
        channels = if (colorType == 6) 4 else 3
        val rawLen = height.toLong * (1L + width.toLong * channels)
        if (rawLen > 64L * 1024 * 1024) return null
        seenIhdr = true
      } else if (typ == "IDAT") {
        idat.write(b, i + 8, len)
      } else if (typ == "IEND") {
        return inflateUnfilter(idat.toByteArray, width, height, channels)
      }
      i += 12 + len
    }
    null
  }

  private def inflateUnfilter(z: Array[Byte], width: Int, height: Int,
      channels: Int): PngRaw = {
    if (z.isEmpty) return null
    val bpp = channels
    val stride = width * bpp
    val raw = new Array[Byte](height * (1 + stride))
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(z)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val n =
          try inflater.inflate(raw, off, raw.length - off)
          catch { case _: java.util.zip.DataFormatException => return null }
        if (n == 0 && inflater.needsInput()) return null // truncated stream
        off += n
      }
    } finally inflater.end()
    if (off != raw.length) return null

    // unfilter in place: scanline y occupies raw[y*(1+stride)+1 ..], its
    // first byte is the filter type
    var y = 0
    while (y < height) {
      val rowOff = y * (1 + stride) + 1
      val priorOff = rowOff - (1 + stride)
      val f = raw(rowOff - 1) & 0xFF
      if (f > 4) return null
      var i = 0
      while (i < stride) {
        val cur = raw(rowOff + i) & 0xFF
        val left = if (i >= bpp) raw(rowOff + i - bpp) & 0xFF else 0
        val up = if (y > 0) raw(priorOff + i) & 0xFF else 0
        val upLeft = if (y > 0 && i >= bpp) raw(priorOff + i - bpp) & 0xFF else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => // Paeth
            val p = left + up - upLeft
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
        }
        raw(rowOff + i) = ((cur + pred) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    new PngRaw(width, height, channels, raw)
  }
}

/** Decoded PNG in scanline layout: `raw(y*(1+stride) + 1 + i)` is pixel
  * byte `i` of row `y` (stride = width·channels; each row's leading byte
  * is the spent filter tag, left in place so offsets match the wire
  * layout).
  */
private[expressions] final class PngRaw(val width: Int, val height: Int,
    val channels: Int, val raw: Array[Byte])
