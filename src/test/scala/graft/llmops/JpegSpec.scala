package graft.llmops

import graft.SparkTestBase
import graft.expressions.{JpegDHash, JpegPixels}
import org.apache.spark.sql.functions._

/** Baseline JPEG codec: the hand-rolled decoder against the writer twin
  * (two independent implementations — separate DCT bases, zigzag tables
  * and canonical-code builders) and against the JDK's own libjpeg-backed
  * ImageIO decoder as a third opinion.
  */
class JpegSpec extends SparkTestBase {
  import spark.implicits._

  private case class Px(width: Int, height: Int, channels: Int,
      pixSum: Long, wSum: Long, meanR: Double, meanG: Double, meanB: Double)

  private def decode(bytes: Array[Byte]): Option[Px] =
    Option(JpegPixels.compute(bytes)).map(r => Px(r.getInt(0), r.getInt(1),
      r.getInt(2), r.getLong(3), r.getLong(4), r.getDouble(5),
      r.getDouble(6), r.getDouble(7)))

  // --- closed-form expectations for block-constant content --------------

  /** Block-constant gray pattern (one value per 8×8 block). */
  private def grayPat(seed: Int)(x: Int, y: Int): Int =
    (5 * (x / 8) + 13 * (y / 8) + seed) % 256

  /** Block-constant YCbCr patterns; chroma functions are in CHROMA plane
    * coordinates, one value per chroma 8×8 block.
    */
  private def yPat(seed: Int)(x: Int, y: Int): Int =
    (5 * (x / 8) + 13 * (y / 8) + seed) % 256
  private def cbPat(seed: Int)(cx: Int, cy: Int): Int =
    (7 * (cx / 8) + 3 * (cy / 8) + 2 * seed) % 256
  private def crPat(seed: Int)(cx: Int, cy: Int): Int =
    (11 * (cx / 8) + 5 * (cy / 8) + 3 * seed) % 256

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def fx(t: Int): Int = (t + 32768) >> 16

  /** The decoder's documented RGB formula applied to closed-form YCbCr —
    * for `sub = 2` the chroma sample for output (x, y) is chroma plane
    * pixel (x/2, y/2).
    */
  private def expectedRgb(w: Int, h: Int, seed: Int, sub: Int): Px = {
    var pixSum = 0L; var wSum = 0L
    val chanSum = new Array[Long](3)
    for (y <- 0 until h; x <- 0 until w) {
      val lum = yPat(seed)(x, y)
      val cb = cbPat(seed)(x / sub, y / sub) - 128
      val cr = crPat(seed)(x / sub, y / sub) - 128
      val rgb = Array(
        clamp(lum + fx(91881 * cr)),
        clamp(lum + fx(-22554 * cb - 46802 * cr)),
        clamp(lum + fx(116130 * cb)))
      for (c <- 0 to 2) {
        val p = (y.toLong * w + x) * 3 + c
        pixSum += rgb(c); wSum += (p % 9973 + 1) * rgb(c); chanSum(c) += rgb(c)
      }
    }
    val n = w.toLong * h
    Px(w, h, 3, pixSum, wSum, chanSum(0).toDouble / n,
      chanSum(1).toDouble / n, chanSum(2).toDouble / n)
  }

  private def expectedGray(w: Int, h: Int, seed: Int): Px = {
    var pixSum = 0L; var wSum = 0L; var s = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = grayPat(seed)(x, y)
      val p = y.toLong * w + x
      pixSum += v; wSum += (p % 9973 + 1) * v; s += v
    }
    val n = w.toLong * h
    Px(w, h, 1, pixSum, wSum, s.toDouble / n, s.toDouble / n, s.toDouble / n)
  }

  // --- exact roundtrips (flat-8 quantizer, DC-only spectra) -------------

  test("block-constant gray roundtrips bit-exactly (flat-8 quantizer)") {
    for ((w, h, seed) <- Seq((8, 8, 0), (16, 8, 40), (24, 24, 7),
        (20, 13, 99), (7, 5, 250), (33, 17, 128))) {
      assert(decode(JpegWriter.gray(w, h, grayPat(seed))) ===
        Some(expectedGray(w, h, seed)), s"${w}x$h seed=$seed")
    }
  }

  test("block-constant 4:4:4 color roundtrips bit-exactly") {
    for ((w, h, seed) <- Seq((8, 8, 3), (16, 16, 77), (24, 10, 200),
        (19, 14, 5))) {
      val bytes = JpegWriter.color(w, h, yPat(seed), cbPat(seed), crPat(seed))
      assert(decode(bytes) === Some(expectedRgb(w, h, seed, sub = 1)),
        s"${w}x$h seed=$seed")
    }
  }

  test("block-constant 4:2:0 color roundtrips bit-exactly") {
    for ((w, h, seed) <- Seq((16, 16, 9), (32, 16, 50), (24, 21, 130),
        (18, 11, 77))) {
      val bytes = JpegWriter.color(w, h, yPat(seed), cbPat(seed), crPat(seed),
        sub = 2)
      assert(decode(bytes) === Some(expectedRgb(w, h, seed, sub = 2)),
        s"${w}x$h seed=$seed")
    }
  }

  test("restart markers: DRI/RSTn streams decode to the same exact pixels") {
    for (ri <- Seq(1, 2, 5)) {
      val bytes = JpegWriter.gray(40, 24, grayPat(60), restartInterval = ri)
      assert(decode(bytes) === Some(expectedGray(40, 24, 60)), s"ri=$ri")
      val color = JpegWriter.color(32, 32, yPat(8), cbPat(8), crPat(8),
        sub = 2, restartInterval = ri)
      assert(decode(color) === Some(expectedRgb(32, 32, 8, sub = 2)),
        s"color ri=$ri")
    }
  }

  test("Annex K multi-length Huffman tables decode identically to uniform") {
    for ((w, h, seed) <- Seq((16, 16, 21), (24, 13, 180))) {
      val uni = JpegWriter.gray(w, h, grayPat(seed))
      val std = JpegWriter.gray(w, h, grayPat(seed), stdTables = true)
      assert(decode(std) === decode(uni))
      val stdC = JpegWriter.color(w, h, yPat(seed), cbPat(seed), crPat(seed),
        stdTables = true)
      assert(decode(stdC) === Some(expectedRgb(w, h, seed, sub = 1)))
    }
  }

  // --- general (lossy) content against the JDK's independent decoder ----

  private def imageIoPixels(bytes: Array[Byte]): Array[Array[Int]] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val gray = img.getRaster.getNumBands == 1
    Array.tabulate(img.getHeight, img.getWidth * 3) { (y, i) =>
      if (gray) img.getRaster.getSample(i / 3, y, 0)
      else {
        // raster bands, not getRGB: getRGB would push a grayscale image
        // through the linear-gray → sRGB gamma curve
        val argb = img.getRGB(i / 3, y)
        (i % 3) match {
          case 0 => (argb >> 16) & 0xFF
          case 1 => (argb >> 8) & 0xFF
          case _ => argb & 0xFF
        }
      }
    }
  }

  private def ownPixels(bytes: Array[Byte]): Array[Array[Int]] = {
    // route through a 1-px fixture? no — re-decode via the public kernels:
    // JpegPixels only exposes statistics, so reach the raw planes through
    // the dHash-free path: decode twice and reconstruct from stats is not
    // possible; instead compare statistics AND dHash below. For pixel-level
    // comparison use the package-private decoder.
    val d = graft.expressions.JpegTestAccess.decode(bytes)
    assert(d != null)
    if (d._3 == 3)
      Array.tabulate(d._2, d._1 * 3)((y, i) => d._4((y * d._1 * 3) + i) & 0xFF)
    else
      Array.tabulate(d._2, d._1 * 3)((y, i) => d._4(y * d._1 + i / 3) & 0xFF)
  }

  test("arbitrary content: decoded pixels within 3 of the JDK decoder (gray + 4:4:4)") {
    // dense non-constant content exercises the full AC Huffman + IDCT path
    def busyY(x: Int, y: Int): Int = (x * x * 3 + y * y * 7 + x * y + 31) % 256
    def busyCb(x: Int, y: Int): Int = (x * 5 + y * 11 + 64) % 256
    def busyCr(x: Int, y: Int): Int = (x * 13 + y * 3 + 190) % 256
    for (stdT <- Seq(false, true); quant <- Seq(JpegWriter.QFlat8,
        JpegWriter.StdLumQ)) {
      val g = JpegWriter.gray(40, 32, busyY, quant = quant, stdTables = stdT)
      val (gi, go) = (imageIoPixels(g), ownPixels(g))
      for (y <- gi.indices; i <- gi(y).indices)
        assert(math.abs(gi(y)(i) - go(y)(i)) <= 3,
          s"gray std=$stdT y=$y i=$i: imageio=${gi(y)(i)} own=${go(y)(i)}")
      val c = JpegWriter.color(32, 24, busyY, busyCb, busyCr,
        lumQuant = quant, chromQuant = quant, stdTables = stdT)
      val (ci, co) = (imageIoPixels(c), ownPixels(c))
      for (y <- ci.indices; i <- ci(y).indices)
        assert(math.abs(ci(y)(i) - co(y)(i)) <= 3,
          s"color std=$stdT y=$y i=$i: imageio=${ci(y)(i)} own=${co(y)(i)}")
    }
  }

  test("the JDK can decode every stream shape the writer emits") {
    // container-level validity: ImageIO returns non-null with the right dims
    val shapes = Seq(
      JpegWriter.gray(17, 9, grayPat(1)),
      JpegWriter.gray(16, 16, grayPat(2), restartInterval = 3),
      JpegWriter.color(20, 12, yPat(3), cbPat(3), crPat(3)),
      JpegWriter.color(20, 12, yPat(4), cbPat(4), crPat(4), sub = 2),
      JpegWriter.color(16, 16, yPat(5), cbPat(5), crPat(5), sub = 2,
        restartInterval = 2, stdTables = true))
    for ((bytes, i) <- shapes.zipWithIndex) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"shape $i")
    }
  }

  // --- dHash -------------------------------------------------------------

  /** Independent spec-side dHash over a gray pixel function. */
  private def expectedDHash(w: Int, h: Int, gray: (Int, Int) => Int): Long = {
    val sums = Array.fill(9 * 8)(0L)
    val cnts = Array.fill(9 * 8)(0L)
    def cell(v: Int, n: Int, g: Int) = (((v + 1).toLong * g - 1) / n).toInt
    for (y <- 0 until h; x <- 0 until w) {
      val c = cell(y, h, 8) * 9 + cell(x, w, 9)
      sums(c) += gray(x, y); cnts(c) += 1
    }
    var hash = 0L
    for (j <- 0 until 8; i <- 0 until 8) {
      val l = j * 9 + i
      if (sums(l + 1) * cnts(l) > sums(l) * cnts(l + 1))
        hash |= 1L << (j * 8 + i)
    }
    hash
  }

  test("JPEG dHash matches the closed form and shifts are invariant") {
    val seed = 33
    val bytes = JpegWriter.gray(24, 16, grayPat(seed))
    val got = JpegDHash.compute(bytes)
    assert(got !== null)
    assert(got.longValue === expectedDHash(24, 16, grayPat(seed)))
    // +10 uniform brightness: every cell average shifts equally → same hash
    val brighter = JpegWriter.gray(24, 16,
      (x, y) => math.min(255, grayPat(seed)(x, y) + 10))
    assert(JpegDHash.compute(brighter).longValue === got.longValue)
  }

  test("PNG and JPEG of the same image share one dHash space") {
    // gray JPEG (luma = v) vs RGB PNG with r=g=b=v: gray reduction gives
    // the identical value per pixel, so the hashes are equal bit-for-bit
    val seed = 91
    val w = 27; val h = 18
    val jpeg = JpegWriter.gray(w, h, grayPat(seed))
    val png = ImageWriter.pngFromPixels(w, h,
      Array.tabulate(h, w * 3)((y, i) => grayPat(seed)(i / 3, y).toByte))
    val jh = JpegDHash.compute(jpeg)
    val ph = graft.expressions.PngDHash.compute(png)
    assert(jh !== null)
    assert(ph !== null)
    assert(jh.longValue === ph.longValue)
    // and the format-agnostic Multimodal.imageDHash sees both
    val df = Seq((1L, jpeg), (2L, png), (3L, "noise".getBytes("UTF-8")))
      .toDF("id", "content")
    val hashes = df.select(col("id"),
        Multimodal.imageDHash(col("content")).alias("h"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hashes(1L) === Some(jh.longValue))
    assert(hashes(2L) === Some(ph.longValue))
    assert(hashes(3L) === None)
  }

  test("EXIF orientation: both byte orders parse, absence is NULL") {
    import graft.expressions.JpegExifOrientation
    for (o <- 1 to 8; bigE <- Seq(false, true)) {
      val b = JpegWriter.gray(16, 16, grayPat(3), orientation = o,
        exifBigEndian = bigE)
      assert(JpegExifOrientation.compute(b) === o, s"o=$o bigE=$bigE")
    }
    assert(JpegExifOrientation.compute(JpegWriter.gray(16, 16, grayPat(3))) === null)
    assert(JpegExifOrientation.compute("nope".getBytes("UTF-8")) === null)
    assert(JpegExifOrientation.compute(null) === null)
  }

  test("oriented dHash: a tagged camera file equals its physically rotated re-save") {
    import graft.expressions.{JpegDHash, JpegDHashOriented}
    // h multiple of 8 keeps the rotated content block-aligned, so both
    // encodes stay DC-exact and the equality is bit-level, not fuzzy
    val w = 24; val h = 16; val seed = 57
    def pat(x: Int, y: Int) = (5 * (x / 8) + 13 * (y / 8) + seed) % 256
    // orientation 6 (rotate 90 CW to display): display(a, b) = sensor(b, h-1-a)
    val tagged = JpegWriter.gray(w, h, pat, orientation = 6)
    val rotated = JpegWriter.gray(h, w, (a, b) => pat(b, h - 1 - a))
    val ot = JpegDHashOriented.compute(tagged)
    val or = JpegDHashOriented.compute(rotated) // no EXIF → identity
    assert(ot !== null)
    assert(or !== null)
    assert(ot.longValue === or.longValue,
      "tagged sensor bytes and rotated display bytes must hash together")
    // the UN-normalized hash sees them as different pictures
    assert(JpegDHash.compute(tagged).longValue !==
      JpegDHash.compute(rotated).longValue)
    // without EXIF, oriented == plain
    val plain = JpegWriter.gray(w, h, pat)
    assert(JpegDHashOriented.compute(plain).longValue ===
      JpegDHash.compute(plain).longValue)
    // display dims under the grid refuse: 16×8 is hashable upright (h =
    // GridH exactly) but its rotated display is 8 wide < GridW
    val land = JpegWriter.gray(16, 8, pat)
    assert(JpegDHash.compute(land) !== null)
    val landTagged = JpegWriter.gray(16, 8, pat, orientation = 6)
    assert(JpegDHashOriented.compute(landTagged) === null,
      "8-wide display must refuse the 9x8 grid horizontally")
  }

  test("imageNearDups(oriented = true): rotated camera copies pair, plain mode misses them") {
    val w = 24; val h = 16; val seed = 57
    def pat(x: Int, y: Int) = (5 * (x / 8) + 13 * (y / 8) + seed) % 256
    val df = Seq(
      (1L, JpegWriter.gray(w, h, pat, orientation = 6)),
      (2L, JpegWriter.gray(h, w, (a, b) => pat(b, h - 1 - a))), // rotated re-save
      (3L, "not an image".getBytes("UTF-8")))
      .toDF("id", "content")
    val orientedPairs = Multimodal.imageNearDups(df, "id", "content",
        maxDist = 0, oriented = true)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    assert(orientedPairs === Set((1L, 2L)))
    val plainPairs = Multimodal.imageNearDups(df, "id", "content", maxDist = 3)
      .count()
    assert(plainPairs === 0L, "sensor-space hashes must NOT pair the rotated copy")
  }

  // --- refusal envelope --------------------------------------------------

  test("refuses what it cannot decode honestly") {
    assert(decode(null) === None)
    assert(decode("not a jpeg".getBytes("UTF-8")) === None)
    assert(decode(Array[Byte](0xFF.toByte, 0xD8.toByte)) === None)
    // header-only SOF0 (ImageWriter.jpeg: dims but no tables/scan)
    assert(decode(ImageWriter.jpeg(32, 32)) === None)
    val good = JpegWriter.gray(16, 16, grayPat(17))
    // progressive: patch SOF0 (FFC0) to SOF2 (FFC2)
    val prog = good.clone()
    val sofAt = prog.indices.find(i => (prog(i) & 0xFF) == 0xFF &&
      i + 1 < prog.length && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(decode(prog) === None)
    // truncations anywhere must refuse, not throw
    for (cut <- 0 until good.length by 3)
      assert(decode(java.util.Arrays.copyOfRange(good, 0, cut)) === None,
        s"cut=$cut")
    // JpegDHash: sub-grid images refuse
    assert(JpegDHash.compute(JpegWriter.gray(8, 8, grayPat(4))) === null)
    assert(JpegDHash.compute(JpegWriter.gray(9, 8, grayPat(4))) !== null)
  }

  test("SQL registration and the Multimodal wrapper agree") {
    graft.GraftFunctions.register(spark)
    val bytes = JpegWriter.gray(16, 8, grayPat(44))
    val df = Seq((1L, bytes), (2L, "junk".getBytes("UTF-8")))
      .toDF("id", "content")
    df.createOrReplaceTempView("jpeg_src")
    val viaSql = spark.sql(
      "SELECT id, graft_jpeg_pixels(content).pix_sum AS s FROM jpeg_src")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val viaApi = Multimodal.withJpegPixels(df)
      .select(col("id"), col("px.pix_sum"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(viaSql === viaApi)
    assert(viaSql(1L) === expectedGray(16, 8, 44).pixSum && viaSql(2L) === -1L)
  }

  test("Adobe CMYK and YCCK 4-component decode, ImageIO raster agreement") {
    // whole-image-constant stored planes + flat-8 quant → DC-only and
    // bit-exact, so the composite is closed-form: R = c'·k'/255
    val (c0, m0, y0, k0) = (200, 120, 64, 220)
    val cmykBytes = JpegWriter.cmyk(16, 8,
      (_, _) => c0, (_, _) => m0, (_, _) => y0, (_, _) => k0,
      transform = 0)
    val d = graft.expressions.JpegTestAccess.decode(cmykBytes)
    assert(d != null && d._1 == 16 && d._2 == 8 && d._3 == 3)
    val (er, eg, eb) = (c0 * k0 / 255, m0 * k0 / 255, y0 * k0 / 255)
    d._4.grouped(3).foreach { px =>
      assert((px(0) & 0xFF) == er && (px(1) & 0xFF) == eg &&
        (px(2) & 0xFF) == eb)
    }

    // the JDK's libjpeg reads the same wire stream: raster (no color
    // conversion) must return the stored constants on all 4 bands
    val rdrs = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
    assert(rdrs.hasNext)
    val rdr = rdrs.next()
    rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(cmykBytes)))
    val raster = rdr.readRaster(0, null)
    assert(raster.getNumBands == 4)
    for (x <- 0 until 16; y <- 0 until 8) {
      assert(raster.getSample(x, y, 0) == c0)
      assert(raster.getSample(x, y, 1) == m0)
      assert(raster.getSample(x, y, 2) == y0)
      assert(raster.getSample(x, y, 3) == k0)
    }
    rdr.dispose()

    // YCCK (transform 2) with a gray c'=m'=y' plane: the forward YCbCr
    // is exact (Cb=Cr=128), so the decode composite is closed-form too
    val (g0, k1) = (150, 180)
    val ycck = JpegWriter.cmyk(16, 8,
      (_, _) => g0, (_, _) => g0, (_, _) => g0, (_, _) => k1,
      transform = 2)
    val d2 = graft.expressions.JpegTestAccess.decode(ycck)
    assert(d2 != null && d2._3 == 3)
    val ev = g0 * k1 / 255
    d2._4.foreach(b => assert((b & 0xFF) == ev))

    // refusals: APP14 missing (patched to a COM marker) and an Adobe
    // transform byte of 1 (YCbCr is not a 4-component transform)
    val noApp14 = cmykBytes.clone()
    val app14At = noApp14.indices.find(i =>
      (noApp14(i) & 0xFF) == 0xFF && i + 1 < noApp14.length &&
        (noApp14(i + 1) & 0xFF) == 0xEE).get
    noApp14(app14At + 1) = 0xFE.toByte // COM: tag gone, length intact
    assert(graft.expressions.JpegTestAccess.decode(noApp14) == null)
    val badTransform = cmykBytes.clone()
    badTransform(app14At + 15) = 1 // transform byte inside the segment
    assert(graft.expressions.JpegTestAccess.decode(badTransform) == null)

    // block-varying planes: decoder and the JDK raster still agree
    // sample-exact (DC-only content, 3 blocks × 1 block)
    def cP(x: Int, y: Int): Int = 40 + (x / 8) * 60
    val varied = JpegWriter.cmyk(24, 8, cP,
      (_, _) => 99, (_, _) => 33, (_, _) => 255, transform = 0)
    val dv = graft.expressions.JpegTestAccess.decode(varied)
    assert(dv != null)
    for (x <- 0 until 24; y <- 0 until 8) {
      val o = (y * 24 + x) * 3
      assert((dv._4(o) & 0xFF) == cP(x, y) * 255 / 255)
      assert((dv._4(o + 1) & 0xFF) == 99)
    }
  }

  test("12-bit SOF1: block-constant exact through the >>4 contract") {
    // block-constant 12-bit samples with the flat-8 quantizer are
    // DC-only and exact; decode normalizes to 8-bit (v >> 4). Large
    // per-block jumps force DC categories past the 8-bit table's 11
    def v12(x: Int, y: Int): Int = ((x / 8) * 1363 + (y / 8) * 677) % 4096
    val bytes = JpegWriter.gray12(48, 24, v12)
    val d = graft.expressions.JpegTestAccess.decode(bytes)
    assert(d != null && d._1 == 48 && d._2 == 24 && d._3 == 1)
    for (x <- 0 until 48; y <- 0 until 24)
      assert((d._4(y * 48 + x) & 0xFF) == (v12(x, y) >> 4),
        s"($x,$y): ${d._4(y * 48 + x) & 0xFF} vs ${v12(x, y) >> 4}")

    // extreme values and restart intervals survive
    def hi(x: Int, y: Int): Int = if ((x / 8) % 2 == 0) 4095 else 0
    val d2 = graft.expressions.JpegTestAccess.decode(
      JpegWriter.gray12(32, 8, hi, restartInterval = 2))
    assert(d2 != null)
    for (x <- 0 until 32)
      assert((d2._4(x) & 0xFF) == (hi(x, 0) >> 4))

    // a 12-bit frame behind SOF0 refuses (baseline is 8-bit by
    // definition); the same stream as SOF1 decodes
    val patched = bytes.clone()
    val sofAt = patched.indices.find(i =>
      (patched(i) & 0xFF) == 0xFF && (patched(i + 1) & 0xFF) == 0xC1).get
    patched(sofAt + 1) = 0xC0.toByte
    assert(graft.expressions.JpegTestAccess.decode(patched) == null)

    // SOF1 with 8-bit precision is plain extended-sequential: decodes
    val gray8 = JpegWriter.gray(16, 8, (x, _) => 10 + (x / 8) * 100)
    val s8 = gray8.clone()
    val at8 = s8.indices.find(i =>
      (s8(i) & 0xFF) == 0xFF && (s8(i + 1) & 0xFF) == 0xC0).get
    s8(at8 + 1) = 0xC1.toByte
    val d8 = graft.expressions.JpegTestAccess.decode(s8)
    assert(d8 != null && (d8._4(0) & 0xFF) == 10)
  }
}
