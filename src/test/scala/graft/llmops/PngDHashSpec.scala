package graft.llmops

import graft.SparkTestBase
import graft.expressions.PngDHash
import org.apache.spark.sql.functions._

class PngDHashSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent reimplementation: cell sums from a gray(x, y) function,
    * bits from the same cross-multiplied average comparison. The
    * expression walks decoded scanline bytes; this walks the abstract
    * pixel function — agreement checks decode + layout + arithmetic.
    */
  private def expectedHash(gray: (Int, Int) => Int, w: Int, h: Int): Long = {
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    for (y <- 0 until h; x <- 0 until w) {
      val i = ((x + 1) * 9 - 1) / w
      val j = ((y + 1) * 8 - 1) / h
      sums(j)(i) += gray(x, y)
      cnts(j)(i) += 1
    }
    var hash = 0L
    for (j <- 0 until 8; i <- 0 until 8)
      if (sums(j)(i + 1) * cnts(j)(i) > sums(j)(i) * cnts(j)(i + 1))
        hash |= 1L << (j * 8 + i)
    hash
  }

  private def closedFormGray(seed: Int)(x: Int, y: Int): Int = {
    val a = 3 * x + 7 * y + seed
    ((a % 256) + ((a + 11) % 256) + ((a + 22) % 256)) / 3
  }

  /** RGB image with r = g = b = gray(x, y) via the explicit-pixel writer. */
  private def grayPng(gray: (Int, Int) => Int, w: Int, h: Int,
      channels: Int = 3): Array[Byte] =
    ImageWriter.pngFromPixels(w, h,
      Array.tabulate(h, w * channels) { (y, i) =>
        val c = i % channels
        if (channels == 4 && c == 3) ((y * 31 + i) % 256).toByte // noise alpha
        else gray(i / channels, y).toByte
      }, channels)

  test("matches the independent closed-form hash on writer images") {
    for ((w, h, seed) <- Seq((9, 8, 0), (17, 11, 42), (36, 32, 7),
        (23, 29, 250))) {
      val got = PngDHash.compute(ImageWriter.pngWithPixels(w, h, seed))
      assert(got === expectedHash(closedFormGray(seed), w, h),
        s"${w}x$h seed=$seed")
    }
  }

  test("refuses sub-grid, header-only, and non-PNG bytes") {
    assert(PngDHash.compute(ImageWriter.pngWithPixels(8, 8, 1)) === null)
    assert(PngDHash.compute(ImageWriter.pngWithPixels(9, 7, 1)) === null)
    assert(PngDHash.compute(ImageWriter.png(20, 20)) === null)
    assert(PngDHash.compute("not a png".getBytes("UTF-8")) === null)
  }

  test("alpha channel is ignored: RGBA with noisy alpha hashes like RGB") {
    val g = closedFormGray(5) _
    assert(PngDHash.compute(grayPng(g, 27, 16)) ===
      PngDHash.compute(grayPng(g, 27, 16, channels = 4)))
  }

  test("uniform brightness shift preserves the hash") {
    // dHash encodes gradient DIRECTION; +20 on every pixel (no clamping
    // in range) flips no comparison
    def base(x: Int, y: Int): Int = (x * 5 + y * 3) % 200
    assert(PngDHash.compute(grayPng(base, 36, 32)) ===
      PngDHash.compute(grayPng((x, y) => base(x, y) + 20, 36, 32)))
  }

  // 36×32 = exact 4×4-pixel cells; constant-per-cell gray makes bit
  // flips craftable. Base: brightness rises left to right → all 64
  // comparisons true.
  private def cellGray(g: (Int, Int) => Int)(x: Int, y: Int): Int =
    g(x / 4, y / 4)
  private val baseCells: (Int, Int) => Int = (i, _) => i * 10

  test("crafted single-cell change flips exactly one bit") {
    val base = grayPng(cellGray(baseCells), 36, 32)
    // brighten cell (4, 2): comparison (3,2) stays true (200 > 30),
    // comparison (4,2) flips (50 > 200 false) — Hamming 1
    val oneOff = grayPng(cellGray((i, j) =>
      if (i == 4 && j == 2) 200 else baseCells(i, j)), 36, 32)
    val hb = PngDHash.compute(base).longValue()
    val ho = PngDHash.compute(oneOff).longValue()
    assert(hb === -1L) // every bit set
    assert(java.lang.Long.bitCount(hb ^ ho) === 1)
  }

  test("imageNearDups: pigeonhole recall, exact verification, null safety") {
    val base = grayPng(cellGray(baseCells), 36, 32)
    val oneOff = grayPng(cellGray((i, j) =>
      if (i == 4 && j == 2) 200 else baseCells(i, j)), 36, 32)
    // 4 flips confined to rows 0-1 (= chunk 0's bits): chunks 1-3 still
    // agree, so blocking finds the pair; distance 4 exceeds maxDist 3
    val fourOff = grayPng(cellGray((i, j) =>
      if (j == 0 && (i == 1 || i == 3 || i == 5 || i == 7)) 200
      else baseCells(i, j)), 36, 32)
    val reversed = grayPng(cellGray((i, _) => 80 - i * 10), 36, 32)
    val rows = Seq(
      (1L, base), (2L, oneOff), (3L, fourOff), (4L, reversed),
      (5L, "junk".getBytes("UTF-8")), (6L, ImageWriter.png(30, 30)))
    val df = rows.toDF("doc_id", "content").repartition(4)

    val strict = Multimodal.imageNearDups(df, "doc_id", "content")
      .select("key_a", "key_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    assert(strict === Set((1L, 2L, 1)))

    val loose = Multimodal.imageNearDups(df, "doc_id", "content", maxDist = 10)
      .select("key_a", "key_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    // fourOff is 4 flips from base and 4±1 from oneOff (whose one flip
    // is in a different row) — compute, don't guess
    val hb = PngDHash.compute(base).longValue()
    val h1 = PngDHash.compute(oneOff).longValue()
    val h4 = PngDHash.compute(fourOff).longValue()
    assert(java.lang.Long.bitCount(hb ^ h4) === 4)
    assert(loose === Set(
      (1L, 2L, 1), (1L, 3L, 4),
      (2L, 3L, java.lang.Long.bitCount(h1 ^ h4))))
  }

  test("imageDedupAgainstSignatures: batch screens against the store only") {
    val base = grayPng(cellGray(baseCells), 36, 32)
    val oneOff = grayPng(cellGray((i, j) =>
      if (i == 4 && j == 2) 200 else baseCells(i, j)), 36, 32)
    val reversed = grayPng(cellGray((i, _) => 80 - i * 10), 36, 32)
    val corpus = Seq((1L, base)).toDF("doc_id", "content")
    val batch = Seq(
      (10L, oneOff),              // Hamming 1 from corpus → dropped
      (11L, reversed),            // far from corpus → survives
      (12L, "junk".getBytes("UTF-8")), // undecodable → survives
      (13L, base)                 // exact dup → dropped
    ).toDF("doc_id", "content").repartition(3)
    val sigs = Multimodal.imageSignatures(corpus, "doc_id", "content")
    val survivors = Multimodal.imageDedupAgainstSignatures(
        batch, "doc_id", "content", sigs)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === Set(11L, 12L))
    // batch does NOT screen against itself (within-batch is
    // imageNearDups' job): two identical new images both survive
    val twins = Seq((20L, reversed), (21L, reversed))
      .toDF("doc_id", "content")
    assert(Multimodal.imageDedupAgainstSignatures(
        twins, "doc_id", "content", sigs)
      .select("doc_id").as[Long].collect().toSet === Set(20L, 21L))
  }

  test("SQL registration: graft_png_dhash") {
    graft.GraftFunctions.register(spark)
    val bytes = ImageWriter.pngWithPixels(12, 10, 33)
    Seq(Tuple1(bytes)).toDF("content").createOrReplaceTempView("png_one")
    val got = spark.sql("SELECT graft_png_dhash(content) AS dh FROM png_one")
      .as[java.lang.Long].head()
    assert(got === PngDHash.compute(bytes))
  }
}
