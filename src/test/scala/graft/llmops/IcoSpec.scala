package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.{IcoDecode, IcoDHash, PngDHash}

/** ICO favicon decode: DIB and PNG entries, largest-entry selection,
  * hash-space membership, refusal tiers.
  */
class IcoSpec extends AnyFunSuite {

  private def g(x: Int, y: Int) = (x * 5 + y * 11) % 256

  test("DIB entry decodes; largest wins over a decoy; PNG entry matches") {
    val w = 24; val h = 16
    val single = ImageWriter.ico(Seq((w, h, g _, false)))
    val d = IcoDecode.decodeLargest(single)
    assert(d != null && d.width == w && d.height == h)
    val hSingle = IcoDHash.compute(single)
    assert(hSingle != null)
    // multi-entry: an 8x8 decoy must not displace the large image
    def decoy(x: Int, y: Int) = (x * 31 + y * 17) % 256
    val multi = ImageWriter.ico(Seq((8, 8, decoy _, false), (w, h, g _, false)))
    assert(IcoDHash.compute(multi) == hSingle)
    // PNG-entry icon hashes identically (same pixels, PNG arm)
    val pngIco = ImageWriter.ico(Seq((w, h, g _, true)))
    assert(IcoDHash.compute(pngIco) == hSingle)
    // and all match the bare PNG of the same pixels
    val png = ImageWriter.pngFromPixels(w, h,
      Array.tabulate(h, w * 3)((y, i) => g(i / 3, y).toByte))
    assert(PngDHash.compute(png) == hSingle)
  }

  test("dims reports the largest directory entry") {
    val ico = ImageWriter.ico(Seq((8, 8, g _, false), (32, 20, g _, false)))
    assert(IcoDecode.dims(ico) == (32, 20))
  }

  test("refusals: truncation, bad type, junk, sub-grid") {
    val full = ImageWriter.ico(Seq((24, 16, g _, false)))
    assert(IcoDecode.largestEntry(java.util.Arrays.copyOf(full, 14)) == null)
    val badType = full.clone(); badType(2) = 9
    assert(IcoDecode.largestEntry(badType) == null)
    assert(IcoDHash.compute("not an icon".getBytes) == null)
    assert(IcoDHash.compute(null) == null)
    assert(IcoDHash.compute(ImageWriter.ico(Seq((8, 8, g _, false)))) == null)
  }
}
