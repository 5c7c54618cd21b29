package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** ICO/CUR (favicon) decode — the crawl's site-identity image: a
  * directory of images, each a headerless DIB (BITMAPINFOHEADER with
  * DOUBLED height covering the XOR pixels + AND mask) or an embedded
  * PNG (the modern 256px convention). [[decodeLargest]] picks the
  * largest entry and reuses the existing BMP/PNG decoders: DIB entries
  * get a synthesized `BM` file header (height halved back, data offset
  * = 14 + dib + palette), so every BMP bit depth the BMP arm accepts
  * works inside an ICO for free. Refusals (`null`): bad header/type,
  * zero entries, entries out of bounds, undecodable largest image.
  */
object IcoDecode {

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (u16(b, i) | (u16(b, i + 2).toLong << 16)) & 0xFFFFFFFFL

  private[expressions] def isPng(img: Array[Byte]): Boolean =
    img != null && img.length >= 8 && (img(0) & 0xFF) == 0x89 &&
      img(1) == 'P' && img(2) == 'N' && img(3) == 'G'

  /** Raw bytes of the largest directory entry (PNG or headerless DIB);
    * null when no entry is in bounds.
    */
  def largestEntry(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 22) return null
    if (u16(b, 0) != 0) return null
    val tpe = u16(b, 2)
    if (tpe != 1 && tpe != 2) return null
    val count = u16(b, 4)
    if (count < 1 || count > 1024 || 6 + 16 * count > b.length) return null
    var best = -1
    var bestPx = -1L
    var i = 0
    while (i < count) {
      val e = 6 + 16 * i
      val w = if ((b(e) & 0xFF) == 0) 256 else b(e) & 0xFF
      val h = if ((b(e + 1) & 0xFF) == 0) 256 else b(e + 1) & 0xFF
      val size = u32(b, e + 8)
      val off = u32(b, e + 12)
      if (size > 0 && off + size <= b.length) {
        val px = w.toLong * h
        if (px > bestPx) { bestPx = px; best = i }
      }
      i += 1
    }
    if (best < 0) return null
    val e = 6 + 16 * best
    java.util.Arrays.copyOfRange(b, u32(b, e + 12).toInt,
      u32(b, e + 12).toInt + u32(b, e + 8).toInt)
  }

  /** RGB of the largest image when it is a DIB entry (PNG entries are
    * hashed through the PNG arm); null otherwise.
    */
  def decodeLargest(b: Array[Byte]): BmpDecode.Rgb = {
    val img = largestEntry(b)
    if (img == null) return null
    if (isPng(img)) {
      null // PNG entries hash through PngDHash directly (see IcoDHash)
    } else {
      // headerless DIB: halve the doubled height, synthesize "BM"
      if (img.length < 40) return null
      val dibSize = (u32(img, 0)).toInt
      if (dibSize < 40 || dibSize > img.length) return null
      val h2 = u32(img, 8).toInt
      if (h2 == 0) return null
      // the stored height doubles to cover XOR + AND planes; a few
      // writers store the true height — halve only when even + positive
      val trueH = if (h2 > 0 && h2 % 2 == 0) h2 / 2 else h2
      val bpp = u16(img, 14)
      val clrUsed = u32(img, 32).toInt
      val palN =
        if (bpp > 8) 0
        else if (clrUsed > 0) clrUsed
        else 1 << bpp
      // BI_BITFIELDS DIBs carry three mask DWORDs between header and
      // pixels — the synthesized data offset must step over them
      val maskBytes = if (dibSize == 40 && u32(img, 16) == 3) 12 else 0
      val dataOff = 14 + dibSize + 4 * palN + maskBytes
      val out = new java.io.ByteArrayOutputStream(14 + img.length)
      out.write('B'); out.write('M')
      def le32(v: Int): Unit = {
        out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
        out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
      }
      le32(14 + img.length); le32(0); le32(dataOff)
      val patched = img.clone()
      // write the halved height back (LE int at offset 8)
      patched(8) = (trueH & 0xFF).toByte
      patched(9) = ((trueH >>> 8) & 0xFF).toByte
      patched(10) = ((trueH >>> 16) & 0xFF).toByte
      patched(11) = ((trueH >>> 24) & 0xFF).toByte
      out.write(patched, 0, patched.length)
      BmpDecode.decode(out.toByteArray)
    }
  }

  /** (width, height) of the largest directory entry; null otherwise. */
  def dims(b: Array[Byte]): (Int, Int) = {
    if (b == null || b.length < 22 || u16(b, 0) != 0) return null
    val tpe = u16(b, 2)
    if (tpe != 1 && tpe != 2) return null
    val count = u16(b, 4)
    if (count < 1 || count > 1024 || 6 + 16 * count > b.length) return null
    var bw = -1; var bh = -1
    var i = 0
    while (i < count) {
      val e = 6 + 16 * i
      val w = if ((b(e) & 0xFF) == 0) 256 else b(e) & 0xFF
      val h = if ((b(e + 1) & 0xFF) == 0) 256 else b(e + 1) & 0xFF
      if (w.toLong * h > bw.toLong * bh) { bw = w; bh = h }
      i += 1
    }
    if (bw < 0) null else (bw, bh)
  }
}

/** 64-bit perceptual dHash of an ICO's largest image — eighth arm of
  * the shared grid/bit layout (favicon dedup: one site identity, many
  * crawl captures). NULL for refusals and sub-grid.
  */
case class IcoDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ico_dhash"

  override protected def nullSafeEval(input: Any): Any =
    IcoDHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, never a literal: two of these in one whole-stage
      // span would redefine the local and kick the WHOLE stage to
      // interpreted (janino "Redefinition of local variable")
      val v = ctx.freshName("idh")
      s"""
         |java.lang.Long $v = graft.expressions.IcoDHash.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
       """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): IcoDHash =
    copy(child = newChild)
}

object IcoDHash {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): java.lang.Long = {
    val img = IcoDecode.largestEntry(b)
    if (img == null) return null
    if (IcoDecode.isPng(img)) return PngDHash.compute(img)
    val d = IcoDecode.decodeLargest(b)
    if (d == null || d.width < PngDHash.GridW || d.height < PngDHash.GridH)
      return null
    java.lang.Long.valueOf(GifDHash.hashCanvas(d.rgb, d.width, d.height))
  }
}
