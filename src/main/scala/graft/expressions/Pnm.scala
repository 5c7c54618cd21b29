package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Netpbm (PNM) decode — P1–P6: ASCII and binary bitmaps, graymaps and
  * pixmaps. The scientific/scanned-document interchange family (OCR
  * pipelines, dataset dumps) and the seventh member of the one
  * cross-format image Hamming space. Maxval up to 65535 (two-byte
  * big-endian samples reduce through the high byte like the 16-bit TIFF
  * arm); `#` comments anywhere in the header; P1/P4 bitmaps map 1=black
  * per spec. Refusals (`null`): bad magic, zero/negative dims, maxval
  * out of range, truncated rasters, dimension caps (64 MB canvas).
  */
object PnmDecode {

  /** Packed RGB, rows top-down (the [[BmpDecode.Rgb]] convention). */
  final class Rgb(val width: Int, val height: Int, val rgb: Array[Byte])

  private final val MaxPixels = (64 << 20) / 3

  private final class P(val b: Array[Byte]) {
    var i = 0
    def skipWs(): Boolean = {
      var inComment = false
      while (i < b.length) {
        val c = b(i)
        if (inComment) { if (c == '\n' || c == '\r') inComment = false; i += 1 }
        else if (c == '#') { inComment = true; i += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
          c == 0x0b || c == '\f') i += 1
        else return true
      }
      false
    }
    def int(): Int = {
      if (!skipWs()) return -1
      var v = 0L
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0')
        if (v > Int.MaxValue) return -1
        any = true
        i += 1
      }
      if (!any) -1 else v.toInt
    }
  }

  def decode(b: Array[Byte]): Rgb = {
    if (b == null || b.length < 7 || b(0) != 'P') return null
    val kind = b(1) - '0'
    if (kind < 1 || kind > 6) return null
    val p = new P(b)
    p.i = 2
    val width = p.int()
    val height = p.int()
    if (width <= 0 || height <= 0 ||
      width.toLong * height > MaxPixels) return null
    val maxval =
      if (kind == 1 || kind == 4) 1
      else {
        val m = p.int()
        if (m <= 0 || m > 65535) return null
        m
      }
    val rgb = new Array[Byte](width * height * 3)
    def put(idx: Int, r: Int, g: Int, bl: Int): Unit = {
      rgb(idx * 3) = r.toByte
      rgb(idx * 3 + 1) = g.toByte
      rgb(idx * 3 + 2) = bl.toByte
    }
    def scale(v: Int): Int =
      if (maxval == 255) v
      else if (maxval == 65535) v >>> 8 // high byte, the 16-bit reduction
      // a NON-full-range two-byte maxval (10/12-bit scans: 1023, 4095)
      // must scale arithmetically — the high-byte shift maps 1023 to 3,
      // crushing the whole image to near-black
      else v * 255 / maxval
    kind match {
      case 1 => // ASCII bitmap: 0 = white, 1 = black
        var n = 0
        while (n < width * height) {
          if (!p.skipWs()) return null
          val c = p.b(p.i)
          if (c != '0' && c != '1') return null
          p.i += 1
          val v = if (c == '1') 0 else 255
          put(n, v, v, v)
          n += 1
        }
      case 2 | 3 => // ASCII gray / rgb
        val samples = if (kind == 2) 1 else 3
        var n = 0
        while (n < width * height) {
          if (samples == 1) {
            val v = p.int()
            if (v < 0 || v > maxval) return null
            val s = scale(v)
            put(n, s, s, s)
          } else {
            val r = p.int(); val g = p.int(); val bl = p.int()
            if (r < 0 || g < 0 || bl < 0 || r > maxval || g > maxval ||
              bl > maxval) return null
            put(n, scale(r), scale(g), scale(bl))
          }
          n += 1
        }
      case 4 => // binary bitmap: rows padded to whole bytes, 1 = black
        if (!singleWs(p)) return null
        val rowBytes = (width + 7) / 8
        if (p.i + rowBytes * height > b.length) return null
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val bit = (b(p.i + y * rowBytes + x / 8) >> (7 - (x % 8))) & 1
            val v = if (bit == 1) 0 else 255
            put(y * width + x, v, v, v)
            x += 1
          }
          y += 1
        }
      case _ => // 5 | 6: binary gray / rgb
        if (!singleWs(p)) return null
        val samples = if (kind == 5) 1 else 3
        val bytesPer = if (maxval > 255) 2 else 1
        val need = width.toLong * height * samples * bytesPer
        if (p.i + need > b.length) return null
        var n = 0
        while (n < width * height) {
          def sample(k: Int): Int = {
            val off = p.i + (n.toLong * samples + k).toInt * bytesPer
            if (bytesPer == 1) b(off) & 0xFF
            else ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
          }
          if (samples == 1) {
            val s = scale(sample(0))
            put(n, s, s, s)
          } else put(n, scale(sample(0)), scale(sample(1)), scale(sample(2)))
          n += 1
        }
    }
    new Rgb(width, height, rgb)
  }

  /** Exactly one whitespace byte separates the header from a binary
    * raster (a comment may precede it per the header grammar).
    */
  private def singleWs(p: P): Boolean = {
    if (p.i >= p.b.length) return false
    val c = p.b(p.i)
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r') { p.i += 1; true }
    else false
  }

  /** Header-only dims: (kind, width, height) or null. */
  def dims(b: Array[Byte]): (Int, Int, Int) = {
    if (b == null || b.length < 7 || b(0) != 'P') return null
    val kind = b(1) - '0'
    if (kind < 1 || kind > 6) return null
    val p = new P(b)
    p.i = 2
    val w = p.int()
    val h = p.int()
    if (w <= 0 || h <= 0) null else (kind, w, h)
  }
}

/** 64-bit perceptual dHash of a PNM image — seventh arm of the shared
  * grid, gray reduction and bit layout. NULL for refusals and sub-grid.
  */
case class PnmDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pnm_dhash"

  override protected def nullSafeEval(input: Any): Any =
    PnmDHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, never a literal: two of these in one whole-stage
      // span would redefine the local and kick the WHOLE stage to
      // interpreted (janino "Redefinition of local variable")
      val v = ctx.freshName("ndh")
      s"""
         |java.lang.Long $v = graft.expressions.PnmDHash.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
       """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): PnmDHash =
    copy(child = newChild)
}

object PnmDHash {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): java.lang.Long = {
    val d = PnmDecode.decode(b)
    if (d == null || d.width < PngDHash.GridW || d.height < PngDHash.GridH)
      return null
    java.lang.Long.valueOf(GifDHash.hashCanvas(d.rgb, d.width, d.height))
  }
}
