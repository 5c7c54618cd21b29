package graft.llmops

import graft.SparkTestBase
import graft.expressions.{ImageHistStats, PngDHash, TiffDHash, TiffDecode}

class TiffSpec extends SparkTestBase {

  private def gray(seed: Int)(x: Int, y: Int): Int =
    ((5 + seed % 7) * (x / 8) + (13 + seed % 11) * (y / 8) + seed) % 256

  private def px(d: TiffDecode.Rgb, x: Int, y: Int): (Int, Int, Int) = {
    val p = (y * d.width + x) * 3
    (d.rgb(p) & 0xFF, d.rgb(p + 1) & 0xFF, d.rgb(p + 2) & 0xFF)
  }

  test("gray 8-bit round trips: byte orders, strips, PackBits, photometrics") {
    val w = 25; val h = 17
    val g = gray(4) _
    for (le <- Seq(true, false); rps <- Seq(0, 5); pb <- Seq(false, true)) {
      val bytes = ImageWriter.tiffImage(w, h, g, littleEndian = le,
        rowsPerStrip = rps, packBits = pb)
      val d = TiffDecode.decode(bytes)
      assert(d != null, s"le=$le rps=$rps pb=$pb")
      for (y <- 0 until h; x <- 0 until w)
        assert(px(d, x, y)._1 === g(x, y), s"($x,$y) le=$le rps=$rps pb=$pb")
    }
    // WhiteIsZero stores inverted but decodes to the same display values
    val wiz = TiffDecode.decode(
      ImageWriter.tiffImage(w, h, g, photometric = 0))
    for (y <- 0 until h; x <- 0 until w)
      assert(px(wiz, x, y)._1 === g(x, y), s"wiz ($x,$y)")
  }

  test("sub-byte gray, RGB and palette round trips") {
    val w = 21; val h = 12
    for (bits <- Seq(1, 4)) {
      val levels = 1 << bits
      val scale = 255 / (levels - 1)
      def gq(x: Int, y: Int) = gray(bits)(x, y) % levels
      val d = TiffDecode.decode(ImageWriter.tiffImage(w, h, gq, bits = bits))
      assert(d != null, s"bits=$bits")
      for (y <- 0 until h; x <- 0 until w)
        assert(px(d, x, y)._1 === gq(x, y) * scale, s"($x,$y) bits=$bits")
    }
    def rgb(x: Int, y: Int) =
      ((x * 7 + y) % 256 << 16) | ((y * 5 + x) % 256 << 8) | ((x ^ y) % 256)
    val dr = TiffDecode.decode(ImageWriter.tiffImage(w, h, rgb, rgb = true,
      littleEndian = false, packBits = true))
    assert(dr != null)
    for (y <- 0 until h; x <- 0 until w) {
      val v = rgb(x, y)
      assert(px(dr, x, y) === (((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)),
        s"rgb ($x,$y)")
    }
    val pal = Array.tabulate(16)(i =>
      ((i * 17) << 16) | ((255 - i * 17) << 8) | (i * 10))
    val dp = TiffDecode.decode(ImageWriter.tiffImage(w, h,
      (x, y) => (x + y) % 16, bits = 4, palette = pal))
    assert(dp != null)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pal((x + y) % 16)
      assert(px(dp, x, y) === (((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)),
        s"pal ($x,$y)")
    }
  }

  test("JDK ImageIO agrees on the writer's streams") {
    val w = 19; val h = 13
    val g = gray(8) _
    for ((tag, bytes) <- Seq(
        "gray" -> ImageWriter.tiffImage(w, h, g),
        "graybe" -> ImageWriter.tiffImage(w, h, g, littleEndian = false),
        "strips" -> ImageWriter.tiffImage(w, h, g, rowsPerStrip = 4),
        "packbits" -> ImageWriter.tiffImage(w, h, g, packBits = true))) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO refused $tag")
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        assert(raster.getSample(x, y, 0) === g(x, y), s"$tag ($x,$y)")
    }
  }

  test("decoder accepts a foreign encoder: ImageIO's TIFF writer") {
    val w = 23; val h = 11
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(12)(x, y)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "tiff", bos))
    val mine = TiffDecode.decode(bos.toByteArray)
    if (mine != null) { // ImageIO may emit LZW; accept-or-refuse honestly
      assert(mine.width === w && mine.height === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(px(mine, x, y)._1 === gray(12)(x, y), s"($x,$y)")
    }
  }

  test("tiff joins the cross-format hash space; histogram arm works") {
    val w = 27; val h = 16
    val g = gray(6) _
    val tiffHash = TiffDHash.compute(ImageWriter.tiffImage(w, h, g))
    val pngHash = PngDHash.compute(ImageWriter.pngFromPixels(w, h,
      Array.tabulate(h, w * 3)((y, i) => g(i / 3, y).toByte)))
    assert(tiffHash != null && tiffHash === pngHash)
    // PackBits + big-endian + inverted photometric: same pixels, same hash
    assert(TiffDHash.compute(ImageWriter.tiffImage(w, h, g,
      littleEndian = false, packBits = true, photometric = 0)) === pngHash)
    val stats = ImageHistStats.compute(
      ImageWriter.tiffImage(16, 16, (_, _) => 77))
    assert(stats != null && stats.getInt(2) === 3)
    assert(stats.getDouble(3) === 0.0 && stats.getInt(4) === 77)
  }

  test("refusals: dims-only stub, LZW, truncation, strip overruns") {
    // the dims-only MediaWriter stub has no strip tags: refuse
    assert(TiffDecode.decode(MediaWriter.tiff(100, 50)) === null)
    val good = ImageWriter.tiffImage(20, 10, gray(1))
    assert(TiffDecode.decode(good) != null)
    for (cut <- Seq(3, 7, 30, good.length / 2, good.length - 5))
      assert(TiffDecode.decode(good.take(cut)) === null, s"cut=$cut")
    assert(TiffDecode.decode("II*".getBytes("ISO-8859-1") ++ Array[Byte](0) ++ "garbage".getBytes) === null)
    assert(TiffDecode.decode("not a tiff".getBytes) === null)
    assert(TiffDecode.decode(null) === null)
  }
}
