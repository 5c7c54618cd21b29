package graft.llmops

import graft.SparkTestBase
import graft.expressions.{JpegDHash, JpegDHashOriented, JpegPixels}

/** Progressive (SOF2) JPEG: the DC-only dHash fast path against the
  * progressive writer twin, cross-checked with the JDK's full
  * progressive decoder.
  */
class ProgressiveJpegSpec extends SparkTestBase {

  private def grayPat(seed: Int)(x: Int, y: Int): Int =
    (5 * (x / 8) + 13 * (y / 8) + seed) % 256

  private def smooth(x: Int, y: Int): Int = (x * 3 + y * 5) % 256

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("block-constant progressive hashes EXACTLY like its baseline twin") {
    for (seed <- Seq(0, 17, 100, 250); (w, h) <- Seq((72, 16), (9, 8), (33, 23))) {
      val base = JpegDHash.compute(JpegWriter.gray(w, h, grayPat(seed)))
      val prog = JpegDHash.compute(
        JpegWriter.grayProgressive(w, h, grayPat(seed)))
      assert(base !== null, s"$w x $h seed=$seed baseline")
      assert(prog !== null, s"$w x $h seed=$seed progressive")
      assert(base === prog, s"$w x $h seed=$seed: must be Hamming 0")
    }
  }

  test("the JDK's full progressive decoder agrees with the writer") {
    // validates the SOF2 stream end-to-end (DC scan + refinements + AC
    // EOB-run scan) through an independent decoder
    for (dcAl <- Seq(0, 1, 2); (w, h) <- Seq((24, 16), (33, 23))) {
      val bytes = JpegWriter.grayProgressive(w, h, grayPat(7), dcAl = dcAl)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"JDK refused dcAl=$dcAl")
      assert(img.getWidth === w && img.getHeight === h)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val got = img.getRaster.getSample(x, y, 0)
        maxDiff = math.max(maxDiff, math.abs(got - grayPat(7)(x, y)))
      }
      assert(maxDiff <= 3, s"dcAl=$dcAl maxDiff=$maxDiff")
    }
  }

  test("point transform (Al > 0): first-scan approximation stays Hamming-close") {
    for (seed <- Seq(3, 77)) {
      val base = JpegDHash.compute(JpegWriter.gray(48, 24, grayPat(seed)))
      val prog1 = JpegDHash.compute(
        JpegWriter.grayProgressive(48, 24, grayPat(seed), dcAl = 1))
      assert(prog1 !== null)
      // the first scan misses only the lowest DC bit: ≤ 1 quant step of
      // gray per block, far under the 5/13-per-block pattern gradient
      assert(hamming(base.longValue, prog1.longValue) <= 2,
        s"seed=$seed d=${hamming(base.longValue, prog1.longValue)}")
    }
  }

  test("smooth content: DC means track pixel means within a few bits") {
    val base = JpegDHash.compute(JpegWriter.gray(64, 40, smooth))
    val prog = JpegDHash.compute(JpegWriter.grayProgressive(64, 40, smooth))
    assert(base !== null)
    assert(prog !== null)
    assert(hamming(base.longValue, prog.longValue) <= 8,
      s"d=${hamming(base.longValue, prog.longValue)}")
  }

  test("oriented hash falls back for progressive streams (no EXIF → orientation 1)") {
    val bytes = JpegWriter.grayProgressive(24, 16, grayPat(9))
    val plain = JpegDHash.compute(bytes)
    val oriented = JpegDHashOriented.compute(bytes)
    assert(plain !== null)
    assert(oriented !== null)
    assert(plain === oriented)
  }

  test("refusal envelope: truncation and non-JPEG refuse, never throw") {
    val prog = JpegWriter.grayProgressive(24, 16, grayPat(11))
    // truncations refuse (EOI completeness + scan bounds), never throw —
    // for the hash fast path AND the full pixel decode
    for (cut <- 0 until prog.length by 7) {
      val t = java.util.Arrays.copyOfRange(prog, 0, cut)
      assert(JpegDHash.compute(t) === null, s"cut=$cut")
      assert(JpegPixels.compute(t) === null, s"cut=$cut pixels")
    }
    // sub-grid display dims refuse (hash only; pixels decode fine)
    assert(JpegDHash.compute(JpegWriter.grayProgressive(8, 8, grayPat(2))) === null)
    assert(JpegPixels.compute(JpegWriter.grayProgressive(8, 8, grayPat(2))) !== null)
    // non-JPEG refuses through the progressive arm too
    assert(JpegDHash.compute("not a jpeg".getBytes("UTF-8")) === null)
    // a baseline scan layout patched to SOF2 is malformed progressive
    // (DC scan with Se=63): refuse, don't guess
    val base = JpegWriter.gray(16, 16, grayPat(3))
    val sofAt = base.indices.find(i => (base(i) & 0xFF) == 0xFF &&
      i + 1 < base.length && (base(i + 1) & 0xFF) == 0xC0).get
    base(sofAt + 1) = 0xC2.toByte
    assert(JpegPixels.compute(base) === null)
  }

  // ---------- FULL progressive pixel decode ----------

  private val scanScripts = Seq(
    (0, 0, Seq((1, 63))),
    (2, 0, Seq((1, 63))),
    (0, 2, Seq((1, 63))),
    (2, 3, Seq((1, 5), (6, 20), (21, 63))),
    (1, 1, Seq((1, 2), (3, 63))))

  test("full decode: every scan script reconstructs bit-identically to baseline") {
    for ((w, h) <- Seq((33, 23), (9, 8), (72, 16));
         (dcAl, acAl, bands) <- scanScripts) {
      val base = JpegPixels.compute(JpegWriter.gray(w, h, grayPat(29)))
      val prog = JpegPixels.compute(JpegWriter.grayProgressive(w, h,
        grayPat(29), dcAl = dcAl, acAl = acAl, acBands = bands))
      assert(prog !== null, s"$w x $h dcAl=$dcAl acAl=$acAl $bands")
      assert(base === prog,
        s"$w x $h dcAl=$dcAl acAl=$acAl $bands: stats must be bit-equal")
    }
  }

  test("full decode: noisy content (all AC lanes, ZRL, banded refinement)") {
    def noisy(x: Int, y: Int): Int = (x * 37 + y * 91 + x * y) % 256
    val base = JpegPixels.compute(JpegWriter.gray(40, 32, noisy))
    for ((dcAl, acAl, bands) <- scanScripts) {
      val prog = JpegPixels.compute(JpegWriter.grayProgressive(40, 32, noisy,
        dcAl = dcAl, acAl = acAl, acBands = bands))
      assert(base === prog, s"dcAl=$dcAl acAl=$acAl $bands")
    }
  }

  test("JDK ImageIO agrees with our decode on writer streams (independent decoder)") {
    def noisy(x: Int, y: Int): Int = (x * 13 + y * 29 + (x ^ y)) % 256
    for ((dcAl, acAl, bands) <- scanScripts) {
      val bytes = JpegWriter.grayProgressive(41, 26, noisy,
        dcAl = dcAl, acAl = acAl, acBands = bands)
      val mine = graft.expressions.JpegTestAccess.decodeProgressive(bytes)
      assert(mine !== null)
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, s"JDK refused dcAl=$dcAl acAl=$acAl $bands")
      var maxDiff = 0
      for (y <- 0 until 26; x <- 0 until 41)
        maxDiff = math.max(maxDiff,
          math.abs((mine._4(y * 41 + x) & 0xFF) -
            jdk.getRaster.getSample(x, y, 0)))
      // two independent IDCT/rounding pipelines over the same stream
      assert(maxDiff <= 1, s"dcAl=$dcAl acAl=$acAl $bands maxDiff=$maxDiff")
    }
  }

  test("JDK-ENCODED progressive color streams decode (foreign scan script)") {
    // a stream our writer did not produce: JDK's own progressive encoder
    // (its default script uses spectral selection + successive
    // approximation over three components)
    val w = 48
    val h = 32
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 4 + y * 6) % 200 + 20
      // low-chroma content: keeps nearest-vs-fancy chroma upsampling
      // differences between the two decoders small
      val rgb = (math.min(255, g + 6) << 16) | (g << 8) | math.max(0, g - 6)
      img.setRGB(x, y, rgb)
    }
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
    assert(it.hasNext)
    val wri = it.next()
    val param = wri.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wri.setOutput(ios)
    wri.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); wri.dispose()
    val bytes = bos.toByteArray

    val mine = graft.expressions.JpegTestAccess.decodeProgressive(bytes)
    assert(mine !== null, "our decoder must accept the JDK's progressive script")
    assert(mine._1 === w && mine._2 === h && mine._3 === 3)
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sumDiff = 0L
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val mv = mine._4((y * w + x) * 3 + c) & 0xFF
      val jv = (jdk.getRGB(x, y) >> (16 - 8 * c)) & 0xFF
      val d = math.abs(mv - jv)
      sumDiff += d
      maxDiff = math.max(maxDiff, d)
    }
    val meanDiff = sumDiff.toDouble / (w * h * 3)
    assert(meanDiff <= 2.0, s"meanDiff=$meanDiff")
    assert(maxDiff <= 32, s"maxDiff=$maxDiff (chroma upsampling variance)")
  }

  test("bit-flip fuzz on progressive streams: decode never throws") {
    val bytes = JpegWriter.grayProgressive(24, 16, grayPat(5),
      dcAl = 1, acAl = 2, acBands = Seq((1, 8), (9, 63)))
    val rnd = new scala.util.Random(1337)
    var decoded = 0
    for (_ <- 0 until 400) {
      val m = bytes.clone()
      val i = rnd.nextInt(m.length)
      m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      val r = JpegPixels.compute(m) // must not throw
      if (r != null) decoded += 1
    }
    assert(decoded >= 0) // refusal or sane decode are both acceptable
  }
}
