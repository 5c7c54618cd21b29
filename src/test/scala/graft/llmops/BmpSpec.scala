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

  test("RLE8/RLE4 round trips: runs, absolute mode, deltas, ImageIO agrees") {
    // a COLOR palette: an all-gray one makes ImageIO gamma-convert to
    // TYPE_BYTE_GRAY and the cross-check would compare post-transform
    val pal256 = Array.tabulate(256 * 3) { i =>
      val e = i / 3
      (i % 3 match {
        case 0 => e
        case 1 => (e * 3) % 256
        case _ => 255 - e
      }).toByte
    }
    val w = 31; val h = 13
    // blocky content (long runs) AND noisy content (absolute mode)
    val blocky = (x: Int, y: Int) => ((x / 7) * 40 + (y / 4) * 90) % 256
    val noisy = (x: Int, y: Int) => (x * 37 + y * 101) % 256
    for ((tag, f) <- Seq("blocky" -> blocky, "noisy" -> noisy)) {
      val bytes = ImageWriter.bmpRle(w, h, pal256, f)
      val d = BmpDecode.decode(bytes)
      assert(d != null, tag)
      for (y <- 0 until h; x <- 0 until w) {
        val p = (y * w + x) * 3
        val e = f(x, y)
        assert((d.rgb(p) & 0xFF, d.rgb(p + 1) & 0xFF, d.rgb(p + 2) & 0xFF)
          === ((e, (e * 3) % 256, 255 - e)), s"$tag ($x,$y)")
      }
      // ImageIO cross-check: the JDK BMP reader handles RLE8
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO refused $tag")
      for (y <- 0 until h; x <- 0 until w) {
        val e = f(x, y)
        val rgb = img.getRGB(x, y)
        assert((((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF))
          === ((e, (e * 3) % 256, 255 - e)), s"io $tag ($x,$y)")
      }
    }
    // RLE4 with a 16-entry palette
    val pal16 = grayPalette(16)
    val f4 = (x: Int, y: Int) => ((x / 5) + (y / 3)) % 16
    val b4 = ImageWriter.bmpRle(19, 11, pal16, f4, bpp = 4)
    val d4 = BmpDecode.decode(b4)
    assert(d4 != null)
    for (y <- 0 until 11; x <- 0 until 19) {
      val p = (y * 19 + x) * 3
      assert((d4.rgb(p) & 0xFF) === (f4(x, y) * (255 / 15)), s"rle4 ($x,$y)")
    }
    // hand-built delta stream: run of 5x value 3, delta (+2,+1), run,
    // EOL, EOB — skipped pixels read palette 0
    val body = Array[Byte](5, 3, 0, 2, 2, 1, 4, 7, 0, 0, 0, 1)
    val head = ImageWriter.bmpRle(12, 3, pal16, (_, _) => 0, bpp = 8)
    // splice: reuse a real header (12x3, RLE8, 16-color palette)
    val hdr = java.util.Arrays.copyOfRange(head, 0, 54 + 4 * 16)
    val sized = hdr.clone()
    val n = body.length
    sized(34) = (n & 0xFF).toByte // biSizeImage
    val crafted = sized ++ body
    val dd = BmpDecode.decode(crafted)
    assert(dd != null)
    // bottom row: x 0-4 = idx3, x 5-6 skipped (0), then delta lands at
    // (7, row 1): bottom-up row 1 = display row 1; run of 4 idx7 there
    val bottom = 2 // display row of RLE row 0 (h=3)
    for (x <- 0 until 5)
      assert((dd.rgb((bottom * 12 + x) * 3) & 0xFF) === 3 * (255 / 15))
    for (x <- 5 until 12)
      assert((dd.rgb((bottom * 12 + x) * 3) & 0xFF) === 0, s"skip $x")
    for (x <- 7 until 11)
      assert((dd.rgb((1 * 12 + x) * 3) & 0xFF) === 7 * (255 / 15), s"d $x")
    // RLE streams missing EOB refuse; truncation refuses
    val good = ImageWriter.bmpRle(w, h, pal256, blocky)
    for (cut <- Seq(60, good.length / 2, good.length - 1))
      assert(BmpDecode.decode(good.take(cut)) === null, s"cut=$cut")
    // RLE hash-space membership: same pixels as uncompressed indexed
    import graft.expressions.BmpDHash
    val a = BmpDHash.compute(ImageWriter.bmpRle(w, h, pal256, blocky))
    val b = BmpDHash.compute(ImageWriter.bmpIndexed(w, h, pal256, blocky))
    assert(a != null && a === b)
  }

  private def deq(v: Int, max: Int): Int =
    ((v * max + 127) / 255 * 255 + max / 2) / max

  test("16bpp 555/565 round trips on the quantization lattice") {
    val w = 21; val h = 13
    def px(x: Int, y: Int) =
      ((x * 7 + y) % 256, (y * 5 + x) % 256, (x ^ y) % 256)
    for (f565 <- Seq(false, true); td <- Seq(false, true)) {
      val d = BmpDecode.decode(ImageWriter.bmp16(w, h, px, f565, td))
      assert(d != null, s"565=$f565 td=$td")
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(x, y)
        val p = (y * w + x) * 3
        val gMax = if (f565) 63 else 31
        assert((d.rgb(p) & 0xFF, d.rgb(p + 1) & 0xFF,
          d.rgb(p + 2) & 0xFF) ===
          ((deq(r, 31), deq(g, gMax), deq(b, 31))), s"($x,$y) $f565 $td")
      }
    }
  }

  test("32-bit bitfields route channels by mask, not BGRx convention") {
    val w = 9; val h = 7
    def px(x: Int, y: Int) = (gray(3)(x, y), gray(5)(x, y), gray(7)(x, y))
    val d = BmpDecode.decode(ImageWriter.bmp32Bitfields(w, h, px))
    assert(d != null)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val p = (y * w + x) * 3
      assert((d.rgb(p) & 0xFF, d.rgb(p + 1) & 0xFF, d.rgb(p + 2) & 0xFF)
        === ((r, g, b)), s"($x,$y)")
    }
  }

  test("JDK ImageIO agrees on 555, 565 and 32-bit bitfield streams") {
    val w = 19; val h = 12
    def px(x: Int, y: Int) = (gray(3)(x, y), gray(5)(x, y), gray(7)(x, y))
    val streams = Seq(
      "555" -> ImageWriter.bmp16(w, h, px),
      "565" -> ImageWriter.bmp16(w, h, px, rgb565 = true),
      "32bf" -> ImageWriter.bmp32Bitfields(w, h, px))
    for ((name, bytes) <- streams) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, name)
      val mine = BmpDecode.decode(bytes)
      assert(mine != null, name)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val p = (y * w + x) * 3
        assert(((rgb >> 16) & 0xFF) === (mine.rgb(p) & 0xFF), s"($x,$y) $name")
        assert(((rgb >> 8) & 0xFF) === (mine.rgb(p + 1) & 0xFF), s"($x,$y) $name")
        assert((rgb & 0xFF) === (mine.rgb(p + 2) & 0xFF), s"($x,$y) $name")
      }
    }
  }

  test("16-bit joins the hash space: pre-quantized 24-bit twin matches") {
    val w = 24; val h = 16
    def g16(x: Int, y: Int) = deq(gray(9)(x, y), 31)
    val a = BmpDHash.compute(
      ImageWriter.bmp16(w, h, (x, y) => (gray(9)(x, y), gray(9)(x, y), gray(9)(x, y))))
    val b = BmpDHash.compute(
      ImageWriter.bmpFromPixels(w, h, (x, y) => (g16(x, y), g16(x, y), g16(x, y))))
    assert(a != null && a === b)
  }

  test("bitfield refusals: zero, overlapping, non-contiguous, oversize masks") {
    val w = 9; val h = 7
    def px(x: Int, y: Int) = (x * 9 % 256, y * 11 % 256, (x + y) % 256)
    def patched(r: Int, g: Int, b: Int): Array[Byte] = {
      val bytes = ImageWriter.bmp32Bitfields(w, h, px)
      def put(off: Int, v: Int): Unit = for (i <- 0 until 4)
        bytes(off + i) = (v >> (8 * i)).toByte
      put(54, r); put(58, g); put(62, b)
      bytes
    }
    assert(BmpDecode.decode(patched(0xFF, 0xFF00, 0xFF0000)) != null)
    assert(BmpDecode.decode(patched(0, 0xFF00, 0xFF0000)) === null)
    assert(BmpDecode.decode(patched(0xFF, 0xFF, 0xFF0000)) === null)
    assert(BmpDecode.decode(patched(0xF0F, 0xFF00, 0xFF0000)) === null)
    // 16bpp mask escaping the pixel width
    val deep = ImageWriter.bmp16(w, h, px, rgb565 = true)
    def put16(off: Int, v: Int): Unit = for (i <- 0 until 4)
      deep(off + i) = (v >> (8 * i)).toByte
    put16(54, 0x1F800) // red mask past bit 15
    assert(BmpDecode.decode(deep) === null)
    // truncated 16-bit pixel array refuses, never reads junk
    val good16 = ImageWriter.bmp16(w, h, px)
    assert(BmpDecode.decode(good16) != null)
    for (cut <- Seq(60, good16.length - 3))
      assert(BmpDecode.decode(good16.take(cut)) === null, s"cut=$cut")
    // bitfields header cut before the masks
    val bf = ImageWriter.bmp16(w, h, px, rgb565 = true)
    assert(BmpDecode.decode(bf.take(60)) === null)
  }

  test("refusals: header-only, RLE, truncation, bad palette index") {
    assert(BmpDecode.decode(ImageWriter.bmp(20, 20)) === null) // no pixels
    val good = ImageWriter.bmpFromPixels(12, 9, (x, y) => (x, y, x + y))
    assert(BmpDecode.decode(good) != null)
    for (cut <- Seq(10, 53, good.length - 4))
      assert(BmpDecode.decode(good.take(cut)) === null, s"cut=$cut")
    val rle = good.clone(); rle(30) = 1 // compression = BI_RLE8
    assert(BmpDecode.decode(rle) === null)
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
