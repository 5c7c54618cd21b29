package graft.llmops

import graft.SparkTestBase
import graft.expressions.{ImageHistStats, PngDHash, PngPixels}
import org.apache.spark.unsafe.types.UTF8String

/** Full-spec PNG decode: grayscale/palette/gray-alpha color types,
  * sub-byte and 16-bit depths, tRNS, and Adam7 interlace — all
  * normalized to the one scanline layout the dHash/histogram family
  * already consumes. Round trips against the independent writer,
  * cross-checks against JDK ImageIO in both directions, and refusal
  * tiers.
  */
class PngFullSpec extends SparkTestBase {

  private def gray(seed: Int)(x: Int, y: Int): Int =
    ((5 + seed % 7) * (x / 8) + (13 + seed % 11) * (y / 8) + seed) % 256

  private def grayPalette: Array[Byte] = {
    val p = new Array[Byte](768)
    for (i <- 0 until 256) {
      p(i * 3) = i.toByte; p(i * 3 + 1) = i.toByte; p(i * 3 + 2) = i.toByte
    }
    p
  }

  /** Reference 8-bit RGB encoding of the same pixels via the ORIGINAL
    * writer path (fast-path decoder) — the equality anchor.
    */
  private def rgbTwin(w: Int, h: Int, g: (Int, Int) => Int): Array[Byte] =
    ImageWriter.pngFromPixels(w, h,
      Array.tabulate(h, w * 3)((y, i) => g(i / 3, y).toByte))

  private def dhash(b: Array[Byte]): java.lang.Long = PngDHash.compute(b)

  test("grayscale depths 1/2/4/8 hash identically to their RGB twins") {
    val w = 27; val h = 16
    for (depth <- Seq(1, 2, 4, 8); interlaced <- Seq(false, true)) {
      val levels = 1 << depth
      val scale = 255 / (levels - 1)
      def gq(x: Int, y: Int): Int = gray(depth)(x, y) % levels
      val bytes = ImageWriter.pngGray(w, h, gq, depth, interlaced)
      val want = dhash(rgbTwin(w, h, (x, y) => gq(x, y) * scale))
      assert(dhash(bytes) === want, s"depth=$depth interlaced=$interlaced")
    }
  }

  test("16-bit gray and 16-bit RGB: v*257 samples reduce to v exactly") {
    val w = 18; val h = 12
    val g = gray(3) _
    val g16 = ImageWriter.pngGray(w, h, (x, y) => g(x, y) * 257, depth = 16)
    assert(dhash(g16) === dhash(rgbTwin(w, h, g)))
    val rgb16 = ImageWriter.pngRgb(w, h,
      (x, y) => (g(x, y) * 257, g(x, y) * 257, g(x, y) * 257), depth = 16)
    assert(dhash(rgb16) === dhash(rgbTwin(w, h, g)))
  }

  test("palette depths 1/2/4/8 (with and without tRNS) decode exactly") {
    val w = 20; val h = 10
    for (depth <- Seq(1, 2, 4, 8); interlaced <- Seq(false, true)) {
      val levels = 1 << depth
      // palette entry i → gray i*scale, so indices are the quantized image
      val scale = 255 / (levels - 1)
      val pal = new Array[Byte](levels * 3)
      for (i <- 0 until levels) {
        pal(i * 3) = (i * scale).toByte
        pal(i * 3 + 1) = (i * scale).toByte
        pal(i * 3 + 2) = (i * scale).toByte
      }
      def idx(x: Int, y: Int): Int = gray(depth + 1)(x, y) % levels
      val bytes = ImageWriter.pngIndexed(w, h, pal, idx, depth,
        interlaced = interlaced)
      val want = dhash(rgbTwin(w, h, (x, y) => idx(x, y) * scale))
      assert(dhash(bytes) === want, s"depth=$depth interlaced=$interlaced")
      // tRNS: opaque alphas — channels become 4, the gray values do not move
      val trns = Array.fill(levels)(255.toByte)
      val withT = ImageWriter.pngIndexed(w, h, pal, idx, depth, trns = trns,
        interlaced = interlaced)
      assert(dhash(withT) === want, s"tRNS depth=$depth")
      val stats = ImageHistStats.compute(withT)
      assert(stats.getInt(2) === 4, "tRNS palette image normalizes to RGBA")
    }
  }

  test("gray+alpha decodes; alpha rides channel 4, gray unchanged") {
    val w = 16; val h = 12
    val g = gray(9) _
    val ga = ImageWriter.pngGrayAlpha(w, h, g, (x, y) => (x * 11 + y * 7) % 256)
    assert(dhash(ga) === dhash(rgbTwin(w, h, g)))
    assert(ImageHistStats.compute(ga).getInt(2) === 4)
  }

  test("Adam7 interlaced truecolor equals its sequential twin") {
    val w = 33; val h = 21 // non-multiples of 8 exercise ragged passes
    val g = gray(5) _
    val seq = rgbTwin(w, h, g)
    val il = ImageWriter.pngRgb(w, h, (x, y) => (g(x, y), g(x, y), g(x, y)),
      interlaced = true)
    assert(dhash(il) === dhash(seq))
    // full pixel-statistics agreement, not just the hash
    val a = PngPixels.compute(seq)
    val b = PngPixels.compute(il)
    assert(a.getLong(3) === b.getLong(3) && a.getLong(4) === b.getLong(4))
  }

  test("JDK ImageIO decodes the writer's extended streams identically") {
    val w = 25; val h = 14
    for ((bytes, expect) <- Seq[(Array[Byte], (Int, Int) => Int)](
      (ImageWriter.pngGray(w, h, (x, y) => gray(2)(x, y) % 16, depth = 4),
        (x, y) => (gray(2)(x, y) % 16) * 17),
      (ImageWriter.pngGray(w, h, (x, y) => gray(4)(x, y) % 2, depth = 1,
        interlaced = true), (x, y) => (gray(4)(x, y) % 2) * 255),
      (ImageWriter.pngIndexed(w, h, grayPalette, gray(7)),
        (x, y) => gray(7)(x, y)))) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null)
      for (y <- 0 until h; x <- 0 until w) {
        assert(((img.getRGB(x, y) >> 16) & 0xFF) === expect(x, y), s"($x,$y)")
      }
    }
  }

  test("decoder accepts foreign encoders: ImageIO gray, binary and indexed") {
    val w = 19; val h = 13
    for (imgType <- Seq(
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY,
        java.awt.image.BufferedImage.TYPE_BYTE_BINARY,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)) {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w) {
        val g = gray(11)(x, y)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      val mine = PngPixels.compute(bos.toByteArray)
      assert(mine != null, s"type=$imgType refused")
      // agree with ImageIO's own re-read of its bytes
      val reread = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      var wantSum = 0L
      if (imgType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
        // TYPE_BYTE_GRAY getRGB applies linear→sRGB color management;
        // both decoders must agree on the RAW stored samples instead
        val raster = reread.getRaster
        for (y <- 0 until h; x <- 0 until w)
          wantSum += 3L * raster.getSample(x, y, 0)
      } else {
        for (y <- 0 until h; x <- 0 until w) {
          val p = reread.getRGB(x, y)
          wantSum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
        }
      }
      // mine.pix_sum may include alpha for RGBA normalizations; compare
      // via the 3-channel means instead
      val meanSum = (mine.getDouble(5) + mine.getDouble(6) +
        mine.getDouble(7)) * w * h
      assert(math.abs(meanSum - wantSum) < 1e-6, s"type=$imgType")
    }
  }

  test("refusals: combos, missing PLTE, short palette, truncation") {
    val w = 12; val h = 8
    def patchAt(b: Array[Byte], i: Int, v: Int): Array[Byte] = {
      val c = b.clone(); c(i) = v.toByte; c
    }
    val gray4 = ImageWriter.pngGray(w, h, (x, y) => (x + y) % 16, depth = 4)
    assert(PngPixels.compute(gray4) != null)
    // illegal combo: depth 4 truecolor (byte 24 = depth, 25 = colorType)
    assert(PngPixels.compute(patchAt(gray4, 25, 2)) === null)
    // palette image with the PLTE chunk renamed away
    val pal = ImageWriter.pngIndexed(w, h, grayPalette, (x, y) => (x + y) % 256)
    val noPlte = pal.clone()
    val plteAt = {
      var i = 8; var found = -1
      while (found < 0 && i + 8 <= noPlte.length) {
        if (new String(noPlte, i + 4, 4, "US-ASCII") == "PLTE") found = i
        else i += 12 + ((noPlte(i) & 0xFF) << 24 | (noPlte(i + 1) & 0xFF) << 16 |
          (noPlte(i + 2) & 0xFF) << 8 | (noPlte(i + 3) & 0xFF))
      }
      found
    }
    noPlte(plteAt + 4) = 'p' // "pLTE": unknown chunk, skipped
    assert(PngPixels.compute(noPlte) === null)
    // out-of-palette index: 4-entry palette, indices up to 15
    val shortPal = Array.fill(12)(100.toByte)
    assert(PngPixels.compute(ImageWriter.pngIndexed(w, h, shortPal,
      (x, y) => (x + y) % 16, depth = 4)) === null)
    // truncations never throw, always refuse
    for (cut <- Seq(10, 30, gray4.length - 5))
      assert(PngPixels.compute(gray4.take(cut)) === null)
  }
}
