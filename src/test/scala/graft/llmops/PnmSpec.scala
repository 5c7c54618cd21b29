package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.{PnmDecode, PnmDHash}

/** Netpbm decode: all six kinds, comments, 16-bit widening, bitmap
  * polarity, hash-space membership, refusal tiers.
  */
class PnmSpec extends AnyFunSuite {

  private def g(x: Int, y: Int) = (x * 7 + y * 13) % 256

  test("P2/P5/P6/16-bit decode to identical pixels") {
    val w = 20; val h = 12
    val base = PnmDecode.decode(ImageWriter.pnm(w, h, g, kind = 5))
    assert(base != null && base.width == w && base.height == h)
    for (variant <- Seq(
      ImageWriter.pnm(w, h, g, kind = 2, comment = "c"),
      ImageWriter.pnm(w, h, g, kind = 6),
      ImageWriter.pnm(w, h, g, kind = 5, maxval = 65535))) {
      val d = PnmDecode.decode(variant)
      assert(d != null && java.util.Arrays.equals(d.rgb, base.rgb))
    }
    // and the shared-space hash matches across kinds
    val h5 = PnmDHash.compute(ImageWriter.pnm(w, h, g, kind = 5))
    val h2 = PnmDHash.compute(ImageWriter.pnm(w, h, g, kind = 2))
    assert(h5 != null && h5 == h2)
  }

  test("P1 and P4 bitmaps agree (1 = black) and parse dense P1 digits") {
    def black(x: Int, y: Int): Boolean = (x + y) % 3 == 0
    val w = 17; val h = 9
    val p4 = PnmDecode.decode(ImageWriter.pnmBitmap(w, h, black))
    assert(p4 != null)
    val p1Txt = new StringBuilder(s"P1\n$w $h\n")
    for (y <- 0 until h) {
      for (x <- 0 until w) p1Txt.append(if (black(x, y)) '1' else '0')
      p1Txt.append('\n')
    }
    val p1 = PnmDecode.decode(p1Txt.toString.getBytes)
    assert(p1 != null && java.util.Arrays.equals(p1.rgb, p4.rgb))
    assert((p4.rgb(0) & 0xFF) == 0) // (0,0) is black
  }

  test("dims header walk and maxval scaling") {
    val d = PnmDecode.dims("P6\n# comment\n640 480\n255\n".getBytes ++
      new Array[Byte](10))
    assert(d == (6, 640, 480))
    // maxval 15 scales to full range
    val lo = PnmDecode.decode("P2\n2 1\n15\n0 15\n".getBytes)
    assert((lo.rgb(0) & 0xFF) == 0 && (lo.rgb(3) & 0xFF) == 255)
    // a NON-full-range two-byte maxval (10-bit scan) scales arithmetically
    // — the high-byte shift would crush 1023 to 3
    val tenBit = PnmDecode.decode("P2\n3 1\n1023\n0 512 1023\n".getBytes)
    assert((tenBit.rgb(0) & 0xFF) == 0)
    assert((tenBit.rgb(3) & 0xFF) == 512 * 255 / 1023)
    assert((tenBit.rgb(6) & 0xFF) == 255)
    // full-range 16-bit keeps the documented high-byte reduction (exact
    // on the writer's v·257 widening)
    val full16 = PnmDecode.decode("P2\n2 1\n65535\n0 65535\n".getBytes)
    assert((full16.rgb(0) & 0xFF) == 0 && (full16.rgb(3) & 0xFF) == 255)
  }

  test("refusals: truncation, bad magic, zero dims, overflow values, junk") {
    val full = ImageWriter.pnm(30, 20, g)
    assert(PnmDecode.decode(java.util.Arrays.copyOf(full, full.length - 5)) == null)
    assert(PnmDecode.decode("P7\n1 1\n255\nx".getBytes) == null)
    assert(PnmDecode.decode("P5\n0 5\n255\n".getBytes) == null)
    assert(PnmDecode.decode("P2\n2 1\n255\n300 1\n".getBytes) == null)
    assert(PnmDecode.decode("plain words".getBytes) == null)
    assert(PnmDecode.decode(null) == null)
    assert(PnmDHash.compute(ImageWriter.pnm(4, 4, g)) == null) // sub-grid
  }
}
