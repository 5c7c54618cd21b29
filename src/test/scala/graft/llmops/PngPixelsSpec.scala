package graft.llmops

import graft.SparkTestBase
import graft.expressions.PngPixels
import org.apache.spark.sql.functions._

class PngPixelsSpec extends SparkTestBase {
  import spark.implicits._

  private case class Px(width: Int, height: Int, channels: Int,
      pixSum: Long, wSum: Long, meanR: Double, meanG: Double, meanB: Double)

  private def decode(bytes: Array[Byte]): Option[Px] =
    Option(PngPixels.compute(bytes)).map(r => Px(r.getInt(0), r.getInt(1),
      r.getInt(2), r.getLong(3), r.getLong(4), r.getDouble(5),
      r.getDouble(6), r.getDouble(7)))

  /** Closed-form expectation from the writer's pixel pattern. */
  private def expected(w: Int, h: Int, seed: Int, ch: Int): Px = {
    var pixSum = 0L; var wSum = 0L
    val chanSum = new Array[Long](ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch) {
      val v = (3 * x + 7 * y + 11 * c + seed) % 256
      val p = (y.toLong * w + x) * ch + c
      pixSum += v; wSum += (p % 9973 + 1) * v; chanSum(c) += v
    }
    val n = w.toLong * h
    Px(w, h, ch, pixSum, wSum, chanSum(0).toDouble / n,
      chanSum(1).toDouble / n, chanSum(2).toDouble / n)
  }

  test("RGB roundtrip recovers exact pixel statistics (all five filters)") {
    // height >= 5 makes the writer use every filter type (row y % 5)
    for ((w, h, seed) <- Seq((1, 1, 0), (3, 5, 7), (8, 6, 250), (17, 9, 42),
        (64, 48, 123))) {
      assert(decode(ImageWriter.pngWithPixels(w, h, seed)) ===
        Some(expected(w, h, seed, 3)), s"${w}x$h seed=$seed")
    }
  }

  test("RGBA roundtrip: alpha in the sums, not the means") {
    val got = decode(ImageWriter.pngWithPixels(6, 7, 99, channels = 4))
    assert(got === Some(expected(6, 7, 99, 4)))
    assert(got.get.channels === 4)
  }

  test("agrees with the JDK's own independent PNG decoder") {
    // javax.imageio ships a complete second implementation: same bytes,
    // independently decoded, must yield the same per-channel sums
    val bytes = ImageWriter.pngWithPixels(19, 11, 77)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var r = 0L; var g = 0L; var b = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val argb = img.getRGB(x, y)
      r += (argb >> 16) & 0xFF; g += (argb >> 8) & 0xFF; b += argb & 0xFF
    }
    val got = decode(bytes).get
    val n = 19L * 11
    assert((got.meanR, got.meanG, got.meanB) ===
      (r.toDouble / n, g.toDouble / n, b.toDouble / n))
  }

  test("refuses what it cannot decode exactly") {
    // header-only PNG: valid IHDR, no IDAT
    assert(decode(ImageWriter.png(8, 8)) === None)
    // not a PNG at all
    assert(decode("plain text".getBytes("UTF-8")) === None)
    assert(decode(null) === None)
    // truncated IDAT: drop the last 8 bytes (IEND survives removal of
    // deflate tail? no — cut inside IDAT so inflate can't finish)
    val full = ImageWriter.pngWithPixels(16, 16, 5)
    val cut = full.take(full.length - 20)
    assert(decode(cut) === None)
    // unsupported color type (grayscale): patch IHDR byte 25 (the CRC is
    // not verified by the decoder, which checks fields, not checksums)
    val gray = ImageWriter.pngWithPixels(4, 4, 1).clone()
    gray(25) = 0
    assert(decode(gray) === None)
    // interlaced: patch IHDR interlace byte 28
    val adam7 = ImageWriter.pngWithPixels(4, 4, 1).clone()
    adam7(28) = 1
    assert(decode(adam7) === None)
    // 16-bit depth: patch IHDR bit-depth byte 24
    val deep = ImageWriter.pngWithPixels(4, 4, 1).clone()
    deep(24) = 16
    assert(decode(deep) === None)
  }

  test("SQL registration and the Multimodal wrapper agree") {
    graft.GraftFunctions.register(spark)
    val df = Seq((1L, ImageWriter.pngWithPixels(5, 5, 10)),
        (2L, "junk".getBytes("UTF-8")))
      .toDF("id", "content")
    df.createOrReplaceTempView("png_src")
    val viaSql = spark.sql(
      "SELECT id, graft_png_pixels(content).pix_sum AS s FROM png_src")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val viaApi = Multimodal.withPngPixels(df)
      .select(col("id"), col("px.pix_sum"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(viaSql === viaApi)
    assert(viaSql(1L) === expected(5, 5, 10, 3).pixSum && viaSql(2L) === -1L)
  }
}
