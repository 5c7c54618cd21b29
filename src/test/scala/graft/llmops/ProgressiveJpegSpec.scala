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

  test("refusal envelope: pixels stay refused, hash refuses what it cannot serve") {
    val prog = JpegWriter.grayProgressive(24, 16, grayPat(11))
    // full pixel decode still refuses progressive — DC-only is a hash
    // fast path, not a pixel decode
    assert(JpegPixels.compute(prog) === null)
    // truncations refuse (EOI completeness + scan bounds), never throw
    for (cut <- 0 until prog.length by 7)
      assert(JpegDHash.compute(java.util.Arrays.copyOfRange(prog, 0, cut)) === null,
        s"cut=$cut")
    // sub-grid display dims refuse
    assert(JpegDHash.compute(JpegWriter.grayProgressive(8, 8, grayPat(2))) === null)
    // non-JPEG refuses through the progressive arm too
    assert(JpegDHash.compute("not a jpeg".getBytes("UTF-8")) === null)
  }
}
