package graft.llmops

import graft.SparkTestBase
import graft.expressions.{GifDHash, GifDecode, GifFrames, ImageHistStats, PngDHash, VideoFrames}
import org.apache.spark.sql.functions._

class GifSpec extends SparkTestBase {
  import spark.implicits._

  private def gray(seed: Int)(x: Int, y: Int): Int =
    ((5 + seed % 7) * (x / 8) + (13 + seed % 11) * (y / 8) + seed) % 256

  /** Decoded first frame's gray value at (x, y) — palette is grayscale
    * so r = g = b = index.
    */
  private def framePx(d: GifDecode.GifRaw, f: Int, x: Int, y: Int): Int =
    d.frames(f)((y * d.width + x) * 3) & 0xFF

  test("writer → decoder round trip recovers every pixel") {
    for ((w, h, seed) <- Seq((9, 8, 0), (31, 17, 42), (64, 48, 7))) {
      val d = GifDecode.decodeFrames(GifWriter.gray(w, h, gray(seed)))
      assert(d != null && d.width === w && d.height === h &&
        d.frames.length === 1)
      for (y <- 0 until h; x <- 0 until w)
        assert(framePx(d, 0, x, y) === gray(seed)(x, y), s"($x,$y) seed=$seed")
    }
  }

  test("interlaced stream decodes to the same pixels as sequential") {
    for ((w, h) <- Seq((20, 15), (9, 8), (33, 9))) {
      val seq = GifDecode.decodeFrames(GifWriter.gray(w, h, gray(3)))
      val il = GifDecode.decodeFrames(
        GifWriter.gray(w, h, gray(3), interlaced = true))
      assert(il != null)
      assert(java.util.Arrays.equals(seq.frames(0), il.frames(0)))
    }
  }

  test("87a version tag and local-palette-only layouts decode") {
    val base = GifDecode.decodeFrames(GifWriter.gray(24, 16, gray(9)))
    val v87 = GifDecode.decodeFrames(
      GifWriter.gray(24, 16, gray(9), version = "87a"))
    val lct = GifDecode.decodeFrames(
      GifWriter.gray(24, 16, gray(9), localPalette = true))
    assert(v87 != null && java.util.Arrays.equals(base.frames(0), v87.frames(0)))
    assert(lct != null && java.util.Arrays.equals(base.frames(0), lct.frames(0)))
  }

  test("LZW dictionary growth past 12-bit widths and the 4096 reset") {
    // high-entropy pattern over a large frame forces thousands of
    // dictionary entries, the 12-bit code width, and the full-table
    // clear/reset path in both encoder and decoder
    def noisy(x: Int, y: Int): Int = (x * 31 + y * 17 + (x * y) % 97) % 256
    val d = GifDecode.decodeFrames(GifWriter.gray(200, 150, noisy))
    assert(d != null)
    for (y <- 0 until 150 by 7; x <- 0 until 200 by 3)
      assert(framePx(d, 0, x, y) === noisy(x, y), s"($x,$y)")
  }

  test("JDK ImageIO decodes the writer's streams to identical pixels") {
    for ((w, h, seed, il) <- Seq((40, 30, 5, false), (40, 30, 5, true),
        (9, 8, 1, false))) {
      val bytes = GifWriter.gray(w, h, gray(seed), interlaced = il)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO refused interlaced=$il")
      val mine = GifDecode.decodeFrames(bytes)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xFF) === framePx(mine, 0, x, y),
          s"($x,$y) interlaced=$il")
      }
    }
  }

  test("decoder accepts a foreign encoder: JDK ImageIO's GIF writer") {
    val w = 37; val h = 23
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(13)(x, y)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val mine = GifDecode.decodeFrames(bos.toByteArray)
    assert(mine != null && mine.width === w && mine.height === h)
    // compare against ImageIO's own re-read (its palette quantization is
    // its business; both decoders must agree on the resulting colors)
    val reread = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    for (y <- 0 until h; x <- 0 until w)
      assert(((reread.getRGB(x, y) >> 16) & 0xFF) === framePx(mine, 0, x, y),
        s"($x,$y)")
  }

  test("animation compositing: accumulate, background and previous disposal") {
    val w = 20; val h = 10
    // frame 0: full canvas; frame 1: partial overlay at (5,2) 8x4
    val f0 = GifWriter.Frame(0, 0, w, h,
      Array.tabulate(w * h)(k => (gray(1)(k % w, k / w)).toByte))
    val overlay = GifWriter.Frame(5, 2, 8, 4,
      Array.tabulate(32)(k => (200 + k % 8).toByte))
    // disposal 0 (leave): frame-2 snapshot keeps the overlay
    val keep = GifDecode.decodeFrames(GifWriter.gif(w, h,
      Seq(f0, overlay, GifWriter.Frame(0, 0, 1, 1, Array[Byte](7)))))
    assert(keep.frames.length === 3)
    // overlay pixel (6,3): local k = (3-2)*8 + (6-5) = 9 → index 200+9%8
    assert(framePx(keep, 2, 6, 3) === 201)
    assert(framePx(keep, 2, 6, 3) === framePx(keep, 1, 6, 3))
    // disposal 2 (background): the overlay rectangle resets to bg color
    val bg = GifDecode.decodeFrames(GifWriter.gif(w, h,
      Seq(f0, overlay.copy(disposal = 2),
        GifWriter.Frame(0, 0, 1, 1, Array[Byte](7))), bgIndex = 33))
    assert(framePx(bg, 1, 6, 3) === 201) // overlay visible in its own frame
    assert(framePx(bg, 2, 6, 3) === 33) // then restored to background
    // disposal 3 (previous): the canvas reverts to the pre-overlay state
    val prev = GifDecode.decodeFrames(GifWriter.gif(w, h,
      Seq(f0, overlay.copy(disposal = 3),
        GifWriter.Frame(0, 0, 1, 1, Array[Byte](7)))))
    assert(framePx(prev, 2, 6, 3) === gray(1)(6, 3))
  }

  test("transparent pixels leave the prior canvas visible") {
    val w = 12; val h = 9
    val f0 = GifWriter.Frame(0, 0, w, h,
      Array.tabulate(w * h)(k => (gray(4)(k % w, k / w)).toByte))
    // second frame: checkerboard of transparent (index 99) and solid 50
    val f1 = GifWriter.Frame(0, 0, w, h,
      Array.tabulate(w * h)(k => (if (k % 2 == 0) 99 else 50).toByte),
      transparentIdx = Some(99))
    val d = GifDecode.decodeFrames(GifWriter.gif(w, h, Seq(f0, f1)))
    for (y <- 0 until h; x <- 0 until w) {
      val k = y * w + x
      val want = if (k % 2 == 0) gray(4)(x, y) else 50
      assert(framePx(d, 1, x, y) === want, s"($x,$y)")
    }
  }

  test("refusal tiers: truncation, bad rects, bad indices, no table, junk") {
    val good = GifWriter.gray(24, 16, gray(2))
    assert(GifDecode.decodeFrames(good) != null)
    // every truncation of a valid stream refuses (trailer byte is last)
    for (cut <- Seq(5, 12, 13, 40, good.length - 1))
      assert(GifDecode.decodeFrames(good.take(cut)) === null, s"cut=$cut")
    // header-only stub (no image descriptor)
    assert(GifDecode.decodeFrames(ImageWriter.gif(20, 20)) === null)
    // frame rectangle outside the logical screen
    assert(GifDecode.decodeFrames(GifWriter.gif(10, 10,
      Seq(GifWriter.Frame(5, 5, 8, 8, new Array[Byte](64))))) === null)
    // pixel index beyond a 4-entry palette
    val smallPal = Array[Byte](0, 0, 0, 50, 50, 50, 100, 100, 100,
      (200).toByte, (200).toByte, (200).toByte)
    assert(GifDecode.decodeFrames(GifWriter.gif(4, 4,
      Seq(GifWriter.Frame(0, 0, 4, 4,
        Array.tabulate(16)(k => (k % 7).toByte))),
      globalPalette = Some(smallPal))) === null)
    // image descriptor with no color table anywhere in scope
    assert(GifDecode.decodeFrames(GifWriter.gif(4, 4,
      Seq(GifWriter.Frame(0, 0, 4, 4, new Array[Byte](16))),
      globalPalette = None)) === null)
    assert(GifDecode.decodeFrames("not a gif".getBytes("UTF-8")) === null)
    assert(GifDecode.decodeFrames(null) === null)
  }

  test("GifDHash lands in the shared cross-format Hamming space") {
    val w = 27; val h = 16
    val g = gray(6) _
    val gifHash = GifDHash.compute(GifWriter.gray(w, h, g))
    val pngHash = PngDHash.compute(ImageWriter.pngFromPixels(w, h,
      Array.tabulate(h, w * 3)((y, i) => g(i / 3, y).toByte)))
    assert(gifHash != null && gifHash === pngHash)
    // sub-grid and undecodable refuse
    assert(GifDHash.compute(GifWriter.gray(8, 8, g)) === null)
    assert(GifDHash.compute("junk".getBytes) === null)
  }

  test("histogram stats flow through the GIF arm") {
    val r = ImageHistStats.compute(GifWriter.gray(16, 16, (_, _) => 77))
    assert(r != null)
    assert(r.getInt(0) === 16 && r.getInt(1) === 16 && r.getInt(2) === 3)
    assert(r.getDouble(3) === 0.0) // solid fill: zero entropy
    assert(r.getInt(4) === 77 && r.getInt(5) === 77)
    assert(r.getDouble(6) === 1.0)
  }

  test("animated GIFs ride the video family: frames → PNG → frame hashes") {
    val pats: Seq[(Int, Int) => Int] = Seq(gray(1), gray(55), gray(200))
    val bytes = GifWriter.animatedGray(72, 16, pats)
    val arr = GifFrames.compute(bytes)
    assert(arr != null && arr.numElements() === 3)
    for (i <- 0 until 3) {
      val png = arr.getBinary(i)
      val want = PngDHash.compute(ImageWriter.pngFromPixels(72, 16,
        Array.tabulate(16, 72 * 3)((y, k) => pats(i)(k / 3, y).toByte)))
      assert(PngDHash.compute(png) === want, s"frame $i")
    }
    // the container-agnostic dispatcher routes GIF bytes here
    assert(VideoFrames.compute(bytes).numElements() === 3)
    // and the Spark-level signature explode sees (key, idx, hash) rows
    val df = Seq((1L, bytes)).toDF("doc_id", "content")
    val sigs = Multimodal.videoFrameSignatures(df, "doc_id", "content")
      .collect()
    assert(sigs.length === 3)
  }

  test("cross-container video near-dup: an animated GIF matches its MP4 remux") {
    def pat(s: Int)(x: Int, y: Int): Int = {
      val k = (y / 8) * 9 + (x / 8)
      (s * s * (k + 1) + s * k * k + 13 * k + 7 * s) % 256
    }
    val seeds = Seq(11, 29, 47, 63)
    val gif = GifWriter.animatedGray(72, 16, seeds.map(pat))
    val mp4 = Mp4Writer.mp4(72, 16,
      seeds.map(s => JpegWriter.gray(72, 16, pat(s))))
    val other = GifWriter.animatedGray(72, 16, Seq(91, 77).map(pat))
    val df = Seq((1L, gif), (2L, mp4), (3L, other)).toDF("doc_id", "content")
    val pairs = Multimodal.videoNearDups(df, "doc_id", "content",
      minSharedFrac = 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }
}
