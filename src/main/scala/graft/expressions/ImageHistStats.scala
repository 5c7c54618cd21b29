package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Grayscale-histogram statistics of a decodable image (PNG, JPEG —
  * baseline or progressive — or GIF first frame: the same decoder
  * envelope as the cross-format dHash):
  *
  * `struct<width int, height int, channels int, gray_entropy double,
  * gray_min int, gray_max int, frac_max_bin double>`
  *
  * The quality screen a curation pass wants at scan time: near-constant
  * images (solid fills, placeholder logos, tracking pixels blown up by
  * a thumbnailer) show `gray_entropy ≈ 0` / `frac_max_bin ≈ 1`, while
  * photographs spread across the histogram. Gray reduction is the dHash
  * convention — integer `(r+g+b)/3`, luma passthrough for grayscale
  * JPEG — so every image format feeds one comparable scale.
  *
  * Determinism contract: the histogram is integer; entropy is
  * `−Σ (c/n)·ln(c/n)` folded over gray values STRICTLY ascending,
  * skipping empty bins — the association an external SQL engine replays
  * with an ordered list fold. NULL when neither decoder accepts the
  * bytes.
  */
case class ImageHistStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageHistStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_hist_stats"

  override protected def nullSafeEval(input: Any): Any =
    ImageHistStats.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.ImageHistStats.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageHistStats =
    copy(child = newChild)
}

object ImageHistStats {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("gray_entropy", DoubleType, nullable = false),
    StructField("gray_min", IntegerType, nullable = false),
    StructField("gray_max", IntegerType, nullable = false),
    StructField("frac_max_bin", DoubleType, nullable = false)))

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): InternalRow = {
    val hist = new Array[Long](256)
    var width = 0
    var height = 0
    var channels = 0
    val png = PngPixels.decodeRaw(b)
    if (png != null) {
      width = png.width; height = png.height; channels = png.channels
      val stride = width * channels
      var y = 0
      while (y < height) {
        val rowOff = y * (1 + stride) + 1
        var x = 0
        while (x < width) {
          val p = rowOff + x * channels
          hist(((png.raw(p) & 0xFF) + (png.raw(p + 1) & 0xFF) +
            (png.raw(p + 2) & 0xFF)) / 3) += 1
          x += 1
        }
        y += 1
      }
    } else {
      val jpg = JpegDecode.decodeAny(b) // baseline or full progressive
      if (jpg != null) {
        width = jpg.width; height = jpg.height; channels = jpg.channels
        var i = 0
        val n = width * height
        while (i < n) {
          val p = i * channels
          val gray =
            if (channels == 1) jpg.pix(p) & 0xFF
            else ((jpg.pix(p) & 0xFF) + (jpg.pix(p + 1) & 0xFF) +
              (jpg.pix(p + 2) & 0xFF)) / 3
          hist(gray) += 1
          i += 1
        }
      } else {
        val gif = GifDecode.decodeFrames(b) // stats of the first frame
        if (gif != null) {
          width = gif.width; height = gif.height; channels = 3
          val rgb = gif.frames(0)
          var i = 0
          val n = width * height
          while (i < n) {
            val p = i * 3
            hist(((rgb(p) & 0xFF) + (rgb(p + 1) & 0xFF) +
              (rgb(p + 2) & 0xFF)) / 3) += 1
            i += 1
          }
        } else {
          val webp = WebpDecode.decodeArgb(b)
          if (webp != null) {
            width = webp.width; height = webp.height; channels = 4
            var i = 0
            val n = width * height
            while (i < n) {
              val p = webp.pix(i)
              hist((((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3) += 1
              i += 1
            }
          } else {
            val rgb3 = {
              val bmp = BmpDecode.decode(b)
              if (bmp != null) (bmp.width, bmp.height, bmp.rgb)
              else {
                val tif = TiffDecode.decode(b)
                if (tif == null) return null
                (tif.width, tif.height, tif.rgb)
              }
            }
            width = rgb3._1; height = rgb3._2; channels = 3
            val rgb = rgb3._3
            var i = 0
            val n = width * height
            while (i < n) {
              val p = i * 3
              hist(((rgb(p) & 0xFF) + (rgb(p + 1) & 0xFF) +
                (rgb(p + 2) & 0xFF)) / 3) += 1
              i += 1
            }
          }
        }
      }
    }
    val n = width.toLong * height
    var acc = 0.0
    var mn = -1
    var mx = 0
    var maxC = 0L
    var v = 0
    while (v < 256) {
      val c = hist(v)
      if (c > 0) {
        if (mn < 0) mn = v
        mx = v
        if (c > maxC) maxC = c
        val p = c.toDouble / n
        acc += p * math.log(p)
      }
      v += 1
    }
    // 0.0 - acc, not -acc: a single-bin histogram folds to +0.0 exactly
    // (unary minus would emit -0.0, which is a different parquet bit
    // pattern than the SQL replay's subtraction)
    new GenericInternalRow(Array[Any](width, height, channels, 0.0 - acc,
      mn, mx, maxC.toDouble / n))
  }
}
