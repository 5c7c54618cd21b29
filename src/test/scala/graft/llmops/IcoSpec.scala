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

  test("16-bit DIB entries: 555 and bitfield 565 join the hash space") {
    val w = 24; val h = 16
    def deq(v: Int, max: Int): Int =
      ((v * max + 127) / 255 * 255 + max / 2) / max
    // hand-built one-entry ICO around a 16bpp DIB (XOR bottom-up + AND plane)
    def ico16(rgb565: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
      def le32(v: Int): Unit = { le16(v & 0xFFFF); le16(v >>> 16) }
      val xorRow = ((16 * w + 31) / 32) * 4
      val andRow = ((w + 31) / 32) * 4
      val bodyLen = 40 + (if (rgb565) 12 else 0) + (xorRow + andRow) * h
      le16(0); le16(1); le16(1) // ICONDIR type 1, one entry
      out.write(w); out.write(h); out.write(0); out.write(0)
      le16(1); le16(16); le32(bodyLen); le32(22) // ICONDIRENTRY
      le32(40); le32(w); le32(2 * h) // doubled height
      le16(1); le16(16)
      le32(if (rgb565) 3 else 0) // BI_BITFIELDS / BI_RGB
      le32(0); le32(0); le32(0); le32(0); le32(0)
      if (rgb565) { le32(0xF800); le32(0x07E0); le32(0x001F) }
      for (y <- (h - 1) to 0 by -1) {
        val row = new Array[Byte](xorRow)
        for (x <- 0 until w) {
          val v = g(x, y)
          val pix =
            if (rgb565) ((v * 31 + 127) / 255 << 11) |
              ((v * 63 + 127) / 255 << 5) | ((v * 31 + 127) / 255)
            else ((v * 31 + 127) / 255 << 10) |
              ((v * 31 + 127) / 255 << 5) | ((v * 31 + 127) / 255)
          row(x * 2) = pix.toByte; row(x * 2 + 1) = (pix >> 8).toByte
        }
        out.write(row)
      }
      for (_ <- 0 until h) out.write(new Array[Byte](andRow)) // AND: opaque
      out.toByteArray
    }
    for (f565 <- Seq(false, true)) {
      def gEq(x: Int, y: Int) =
        if (f565) (2 * deq(g(x, y), 31) + deq(g(x, y), 63)) / 3
        else deq(g(x, y), 31)
      val a = IcoDHash.compute(ico16(f565))
      val b = IcoDHash.compute(ImageWriter.ico(Seq((w, h, gEq _, false))))
      assert(a != null && a == b, s"565=$f565")
    }
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
