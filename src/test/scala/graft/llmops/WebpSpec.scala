package graft.llmops

import graft.SparkTestBase
import graft.expressions.{ImageDims, ImageHistStats, PngDHash, WebpDHash, WebpDecode}

class WebpSpec extends SparkTestBase {

  private def gray(seed: Int)(x: Int, y: Int): Int =
    ((5 + seed % 7) * (x / 8) + (13 + seed % 11) * (y / 8) + seed) % 256

  private def colorArgb(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      val r = (x * 7 + y * 3 + seed) % 256
      val g = (x * 2 + y * 11 + seed * 5) % 256
      val b = (x * 13 + y + seed * 9) % 256
      val a = 255 - (k % 3)
      (a << 24) | (r << 16) | (g << 8) | b
    }

  private def assertPixelExact(bytes: Array[Byte], w: Int, h: Int,
      want: Array[Int], tag: String): Unit = {
    val d = WebpDecode.decodeArgb(bytes)
    assert(d != null, s"$tag refused")
    assert(d.width === w && d.height === h, tag)
    var i = 0
    while (i < want.length) {
      assert(d.pix(i) === want(i), s"$tag pixel $i (${i % w},${i / w})")
      i += 1
    }
  }

  test("plain lossless round trip: literals, runs, color cache") {
    for ((w, h, seed) <- Seq((9, 8, 1), (31, 17, 4), (64, 48, 9))) {
      val px = colorArgb(w, h, seed)
      assertPixelExact(WebpWriter.lossless(w, h, px), w, h, px, s"plain $seed")
      assertPixelExact(WebpWriter.lossless(w, h, px, cacheBits = 6), w, h, px,
        s"cache $seed")
      assertPixelExact(WebpWriter.lossless(w, h, px, useLz77 = false), w, h,
        px, s"nolz $seed")
    }
    // a run-heavy image exercises LZ77 length codes with extra bits
    val w = 40; val h = 30
    val runs = Array.tabulate(w * h)(k => 0xFF000000 | ((k / 97) * 37 % 256))
    assertPixelExact(WebpWriter.lossless(w, h, runs), w, h, runs, "runs")
    assertPixelExact(WebpWriter.lossless(w, h, runs, cacheBits = 4), w, h,
      runs, "runs+cache")
  }

  test("subtract-green transform round trip") {
    val w = 21; val h = 13
    val px = colorArgb(w, h, 7)
    assertPixelExact(WebpWriter.losslessSubGreen(w, h, px), w, h, px, "subg")
    assertPixelExact(WebpWriter.losslessSubGreen(w, h, px, cacheBits = 5),
      w, h, px, "subg+cache")
  }

  test("predictor transform round trip, every mode") {
    val w = 19; val h = 14
    val px = colorArgb(w, h, 3)
    for (mode <- 0 to 13; bits <- Seq(2, 4)) {
      assertPixelExact(WebpWriter.losslessPredictor(w, h, px, mode, bits),
        w, h, px, s"pred mode=$mode bits=$bits")
    }
  }

  test("color transform round trip") {
    val w = 23; val h = 11
    val px = colorArgb(w, h, 8)
    for ((g2r, g2b, r2b) <- Seq((16, 8, 4), (0xF0, 0x80, 0x40), (1, 255, 127)))
      assertPixelExact(
        WebpWriter.losslessColorTransform(w, h, px, g2r, g2b, r2b),
        w, h, px, s"ct $g2r/$g2b/$r2b")
  }

  test("color indexing round trip at every packing width") {
    val w = 22; val h = 9
    for (palSize <- Seq(2, 4, 13, 200)) {
      val palette = Array.tabulate(palSize)(i =>
        0xFF000000 | ((i * 17 % 256) << 16) | ((i * 29 % 256) << 8) |
          (i * 41 % 256))
      def idx(x: Int, y: Int): Int = (x * 3 + y * 7) % palSize
      val want = Array.tabulate(w * h)(k => palette(idx(k % w, k / w)))
      assertPixelExact(WebpWriter.losslessIndexed(w, h, palette, idx),
        w, h, want, s"pal $palSize")
    }
  }

  test("webp joins the cross-format perceptual hash space") {
    val w = 27; val h = 16
    val g = gray(6) _
    val webpHash = WebpDHash.compute(WebpWriter.gray(w, h, g))
    val pngHash = PngDHash.compute(ImageWriter.pngFromPixels(w, h,
      Array.tabulate(h, w * 3)((y, i) => g(i / 3, y).toByte)))
    assert(webpHash != null && webpHash === pngHash)
    assert(WebpDHash.compute(WebpWriter.gray(8, 8, g)) === null) // sub-grid
    // histogram stats ride the fourth arm
    val stats = ImageHistStats.compute(WebpWriter.gray(16, 16, (_, _) => 77))
    assert(stats != null && stats.getInt(2) === 4)
    assert(stats.getDouble(3) === 0.0 && stats.getInt(4) === 77)
  }

  test("ImageDims reads VP8L, VP8X and VP8 headers") {
    val d = ImageDims.compute(WebpWriter.gray(33, 21, gray(1)))
    assert(d != null && d.getUTF8String(0).toString === "webp" &&
      d.getInt(1) === 33 && d.getInt(2) === 21)
    // handcrafted VP8X canvas header: (w-1, h-1) as 24-bit LE
    val vp8x = "RIFF".getBytes ++ Array.fill[Byte](4)(0) ++
      "WEBPVP8X".getBytes ++ Array[Byte](10, 0, 0, 0) ++
      Array.fill[Byte](4)(0) ++
      Array[Byte]((799 & 0xFF).toByte, (799 >> 8).toByte, 0) ++
      Array[Byte]((599 & 0xFF).toByte, (599 >> 8).toByte, 0)
    val dx = ImageDims.compute(vp8x)
    assert(dx != null && dx.getInt(1) === 800 && dx.getInt(2) === 600)
    // handcrafted lossy VP8 key-frame header
    val vp8 = "RIFF".getBytes ++ Array.fill[Byte](4)(0) ++
      "WEBPVP8 ".getBytes ++ Array[Byte](12, 0, 0, 0) ++
      Array.fill[Byte](3)(0) ++ Array(0x9D, 0x01, 0x2A).map(_.toByte) ++
      Array[Byte]((320 & 0xFF).toByte, (320 >> 8).toByte,
        (240 & 0xFF).toByte, (240 >> 8).toByte, 0)
    val dv = ImageDims.compute(vp8)
    assert(dv != null && dv.getInt(1) === 320 && dv.getInt(2) === 240)
    // but PIXEL decode honestly refuses lossy payloads
    assert(WebpDecode.decodeArgb(vp8) === null)
  }

  test("refusals: truncation, bad version, garbage, animations") {
    val good = WebpWriter.gray(24, 16, gray(2))
    assert(WebpDecode.decodeArgb(good) != null)
    for (cut <- Seq(4, 11, 19, 25, 60, good.length - 3, good.length - 2))
      assert(WebpDecode.decodeArgb(good.take(cut)) === null, s"cut=$cut")
    // losing ONLY the RIFF even-padding byte leaves the payload intact —
    // that one still decodes, by design
    assert(WebpDecode.decodeArgb(good.take(good.length - 1)) != null)
    assert(WebpDecode.decodeArgb("not webp at all".getBytes) === null)
    assert(WebpDecode.decodeArgb(null) === null)
    // version bits != 0 refuse: the version field sits in byte 24 bits 5..7
    val badVer = good.clone()
    badVer(24) = (badVer(24) | 0x20).toByte
    assert(WebpDecode.decodeArgb(badVer) === null)
    val anim = "RIFF".getBytes ++ Array.fill[Byte](4)(0) ++
      "WEBPANIM".getBytes ++ Array[Byte](6, 0, 0, 0) ++ Array.fill[Byte](6)(0)
    assert(WebpDecode.decodeArgb(anim) === null)
  }

  test("fuzz: bit flips over a genuine stream never throw") {
    val base = WebpWriter.lossless(20, 12, colorArgb(20, 12, 5), cacheBits = 4)
    for (i <- base.indices by 3) {
      val mutated = base.clone()
      mutated(i) = (mutated(i) ^ 0x5A).toByte
      WebpDecode.decodeArgb(mutated) // refuse or decode, never throw
    }
  }
}
