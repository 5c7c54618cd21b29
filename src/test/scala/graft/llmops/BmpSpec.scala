package graft.llmops

import graft.SparkTestBase
import graft.expressions.{BmpDHash, BmpDecode, ImageHistStats, PngDHash}

class BmpSpec extends SparkTestBase {

  private def gray(seed: Int)(x: Int, y: Int): Int =
    ((5 + seed % 7) * (x / 8) + (13 + seed % 11) * (y / 8) + seed) % 256

  private def grayPalette(n: Int): Array[Byte] =
    Array.tabulate(n * 3)(i => ((i / 3) * (255 / (n - 1))).toByte)

  test("24bpp round trip, bottom-up and top-down") {
    val w = 21; val h = 13
    def px(x: Int, y: Int) = ((x * 7 + y) % 256, (y * 5 + x) % 256, (x ^ y) % 256)
    for (td <- Seq(false, true)) {
      val d = BmpDecode.decode(ImageWriter.bmpFromPixels(w, h, px, td))
      assert(d != null && d.width === w && d.height === h, s"topDown=$td")
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(x, y)
        val p = (y * w + x) * 3
        assert((d.rgb(p) & 0xFF, d.rgb(p + 1) & 0xFF, d.rgb(p + 2) & 0xFF) ===
          ((r, g, b)), s"($x,$y) topDown=$td")
      }
    }
  }

  test("indexed 1/4/8 bpp round trips with row padding") {
    for (bpp <- Seq(1, 4, 8); w <- Seq(9, 20, 33)) {
      val h = 11
      val levels = 1 << bpp
      val pal = grayPalette(levels)
      def idx(x: Int, y: Int): Int = gray(bpp)(x, y) % levels
      val d = BmpDecode.decode(ImageWriter.bmpIndexed(w, h, pal, idx, bpp))
      assert(d != null, s"bpp=$bpp w=$w")
      val scale = 255 / (levels - 1)
      for (y <- 0 until h; x <- 0 until w)
        assert((d.rgb((y * w + x) * 3) & 0xFF) === idx(x, y) * scale,
          s"($x,$y) bpp=$bpp w=$w")
    }
  }

  test("JDK ImageIO agrees on the writer's streams") {
    val w = 19; val h = 12
    def px(x: Int, y: Int) = (gray(3)(x, y), gray(5)(x, y), gray(7)(x, y))
    for (td <- Seq(false, true)) {
      val bytes = ImageWriter.bmpFromPixels(w, h, px, td)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null)
      val mine = BmpDecode.decode(bytes)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val p = (y * w + x) * 3
        assert(((rgb >> 16) & 0xFF) === (mine.rgb(p) & 0xFF), s"($x,$y) $td")
        assert((rgb & 0xFF) === (mine.rgb(p + 2) & 0xFF), s"($x,$y) $td")
      }
    }
  }

  test("decoder accepts a foreign encoder: ImageIO's BMP writer") {
    val w = 17; val h = 10
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(9)(x, y)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val mine = BmpDecode.decode(bos.toByteArray)
    assert(mine != null && mine.width === w && mine.height === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((mine.rgb((y * w + x) * 3) & 0xFF) === gray(9)(x, y), s"($x,$y)")
  }

  test("BMP joins the cross-format hash space; histogram arm works") {
    val w = 27; val h = 16
    val g = gray(6) _
    val bmpHash = BmpDHash.compute(
      ImageWriter.bmpFromPixels(w, h, (x, y) => (g(x, y), g(x, y), g(x, y))))
    val pngHash = PngDHash.compute(ImageWriter.pngFromPixels(w, h,
      Array.tabulate(h, w * 3)((y, i) => g(i / 3, y).toByte)))
    assert(bmpHash != null && bmpHash === pngHash)
    val stats = ImageHistStats.compute(
      ImageWriter.bmpFromPixels(16, 16, (_, _) => (77, 77, 77)))
    assert(stats != null && stats.getInt(2) === 3)
    assert(stats.getDouble(3) === 0.0 && stats.getInt(4) === 77)
  }

  test("refusals: header-only, RLE, 16bpp, truncation, bad palette index") {
    assert(BmpDecode.decode(ImageWriter.bmp(20, 20)) === null) // no pixels
    val good = ImageWriter.bmpFromPixels(12, 9, (x, y) => (x, y, x + y))
    assert(BmpDecode.decode(good) != null)
    for (cut <- Seq(10, 53, good.length - 4))
      assert(BmpDecode.decode(good.take(cut)) === null, s"cut=$cut")
    val rle = good.clone(); rle(30) = 1 // compression = BI_RLE8
    assert(BmpDecode.decode(rle) === null)
    val deep = good.clone(); deep(28) = 16 // 16bpp
    assert(BmpDecode.decode(deep) === null)
    // palette image whose indices overrun a short palette
    val shortPal = ImageWriter.bmpIndexed(8, 4, grayPalette(4),
      (x, y) => (x + y) % 4, bpp = 4)
    // biClrUsed says 4; patch an index nibble to 0xF
    val palBroken = shortPal.clone()
    palBroken(palBroken.length - 1) = 0xFF.toByte
    assert(BmpDecode.decode(palBroken) === null)
    assert(BmpDecode.decode("not a bmp".getBytes) === null)
    assert(BmpDecode.decode(null) === null)
  }
}
