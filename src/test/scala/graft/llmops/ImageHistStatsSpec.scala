package graft.llmops

import graft.SparkTestBase
import graft.expressions.ImageHistStats
import org.apache.spark.sql.functions._

/** Histogram/entropy image quality screen over both decoders. */
class ImageHistStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def stats(bytes: Array[Byte]) =
    Option(ImageHistStats.compute(bytes)).map { r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getInt(4), r.getInt(5), r.getDouble(6))
    }

  test("solid fill: entropy exactly +0.0, one bin, frac 1.0") {
    val png = ImageWriter.pngFromPixels(10, 9,
      Array.tabulate(9, 30)((_, _) => 77.toByte))
    val got = stats(png).get
    assert(got === ((10, 9, 3, 0.0, 77, 77, 1.0)))
    // +0.0, not -0.0 — the SQL replay's 0.0 - sum shape
    assert(java.lang.Double.doubleToRawLongBits(got._4) === 0L)
    val jpegConst = JpegWriter.gray(16, 16, (_, _) => 128)
    val gj = stats(jpegConst).get
    assert(gj._4 === 0.0)
    assert(gj._7 === 1.0)
  }

  test("entropy matches a closed-form two-value histogram, PNG and JPEG agree") {
    // half the pixels one value, half another → entropy = ln 2
    def split(x: Int, y: Int): Int = if (x < 8) 40 else 200
    val jpeg = JpegWriter.gray(16, 16, split)
    val png = ImageWriter.pngFromPixels(16, 16,
      Array.tabulate(16, 48)((y, i) => split(i / 3, y).toByte))
    val ej = stats(jpeg).get
    val ep = stats(png).get
    assert(math.abs(ej._4 - math.log(2.0)) < 1e-12)
    assert(ej._4 === ep._4, "one gray scale across formats")
    assert((ej._5, ej._6) === ((40, 200)))
    assert(ej._7 === 0.5)
  }

  test("imageQualityScreen flags junk, keeps texture, false for undecodable") {
    val rows = Seq(
      (1L, ImageWriter.pngWithPixels(40, 40, 17)), // textured → keep
      (2L, ImageWriter.pngFromPixels(40, 40,
        Array.tabulate(40, 120)((_, _) => 9.toByte))), // solid → drop
      (3L, JpegWriter.gray(40, 40, (x, y) => (x * 7 + y * 3) % 256)), // keep
      (4L, "junk".getBytes("UTF-8")), // undecodable → keep = false
      (5L, ImageWriter.pngWithPixels(8, 8, 17))) // under min size → drop
      .toDF("id", "content")
    val got = Multimodal.imageQualityScreen(rows, "content",
        minW = 16, minH = 16, minEntropy = 0.5, maxFracMaxBin = 0.9)
      .select($"id", $"img_keep").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> false))
  }
}
