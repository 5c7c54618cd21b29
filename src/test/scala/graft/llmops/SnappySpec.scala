package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** Snappy codec pair, cross-checked BOTH directions against snappy-java —
  * the exact implementation Spark bundles — in raw-block and framing
  * formats, plus refusal tiers.
  */
class SnappySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(17)
  private val cases = Seq[Array[Byte]](
    Array.emptyByteArray,
    "tiny".getBytes,
    ("the quick brown fox " * 400).getBytes,
    Array.fill[Byte](3000)(rnd.nextInt(256).toByte),
    Array.fill[Byte](200000)('Z'),
    Iterator.continually("shard line payload ").take(9000).mkString.getBytes)

  test("raw roundtrip through own encoder and decoder") {
    for (c <- cases) {
      val enc = SnappyWriter.encodeRaw(c)
      val dec = Snappy.decodeRaw(enc, 0, enc.length)
      assert(dec != null && java.util.Arrays.equals(dec, c), s"n=${c.length}")
    }
  }

  test("snappy-java decodes the twin's raw blocks") {
    for (c <- cases if c.nonEmpty) {
      val enc = SnappyWriter.encodeRaw(c)
      val dec = org.xerial.snappy.Snappy.uncompress(enc)
      assert(java.util.Arrays.equals(dec, c), s"n=${c.length}")
    }
  }

  test("the decoder reads snappy-java's raw blocks") {
    for (c <- cases if c.nonEmpty) {
      val enc = org.xerial.snappy.Snappy.compress(c)
      val dec = Snappy.decodeRaw(enc, 0, enc.length)
      assert(dec != null && java.util.Arrays.equals(dec, c), s"n=${c.length}")
    }
  }

  test("framed roundtrip + snappy-java framed interop both directions") {
    for (c <- cases) {
      val enc = SnappyWriter.encode(c)
      val dec = Snappy.decodeFramed(enc)
      assert(dec != null && java.util.Arrays.equals(dec, c), s"own n=${c.length}")
      // snappy-java reads the twin's framed stream
      val in = new org.xerial.snappy.SnappyFramedInputStream(
        new java.io.ByteArrayInputStream(enc))
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      assert(java.util.Arrays.equals(buf.toByteArray, c), s"sj-read n=${c.length}")
      // the decoder reads snappy-java's framed stream
      val sjOut = new java.io.ByteArrayOutputStream()
      val fr = new org.xerial.snappy.SnappyFramedOutputStream(sjOut)
      fr.write(c); fr.close()
      val dec2 = Snappy.decodeFramed(sjOut.toByteArray)
      assert(dec2 != null && java.util.Arrays.equals(dec2, c), s"sj-write n=${c.length}")
    }
  }

  test("compression is real on repetitive text") {
    val data = ("token budget shard " * 5000).getBytes
    assert(SnappyWriter.encode(data).length < data.length / 10)
  }

  test("refusals: crc damage, truncation, bad varint, offset 0, junk") {
    val enc = SnappyWriter.encode(("damage me " * 50).getBytes)
    val bad = enc.clone()
    bad(14) = (bad(14) ^ 1).toByte // crc of first chunk
    assert(Snappy.decodeFramed(bad) == null)
    assert(Snappy.decodeFramed(java.util.Arrays.copyOf(enc, enc.length - 3)) == null)
    assert(Snappy.decodeFramed("not snappy at all".getBytes) == null)
    assert(Snappy.decodeFramed(null) == null)
    // raw: declared length larger than the real output
    val raw = SnappyWriter.encodeRaw("abcdefgh".getBytes)
    val longer = raw.clone(); longer(0) = (longer(0) + 1).toByte
    assert(Snappy.decodeRaw(longer, 0, longer.length) == null)
    // offset zero copy
    assert(Snappy.decodeRaw(Array[Byte](4, 0x02, 0, 0), 0, 4) == null)
  }

  test("crafted 4-byte literal length near Int.MaxValue refuses, never throws") {
    // varint len=10; 1-byte literal 'A' (so o>=1); then a 4-byte-length
    // literal tag declaring 0x7FFFFFFE+1 bytes — with additive guards
    // both `i+len` and `o+len` wrap negative and arraycopy throws AIOOBE
    val crafted = Array[Byte](10, 0x00, 'A',
      0xFC.toByte, 0xFE.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F)
    assert(Snappy.decodeRaw(crafted, 0, crafted.length) == null)
    // same body behind the framing format front door
    val crc = Snappy.maskedCrc(Array[Byte]('A'), 0, 1) // any value; decode fails first
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0xFF.toByte, 6, 0, 0, 's', 'N', 'a', 'P', 'p', 'Y'))
    val chunkLen = 4 + crafted.length
    bos.write(Array[Byte](0x00, chunkLen.toByte, 0, 0))
    bos.write(Array[Byte](crc.toByte, (crc >> 8).toByte, (crc >> 16).toByte,
      (crc >> 24).toByte))
    bos.write(crafted)
    assert(Snappy.decodeFramed(bos.toByteArray) == null)
  }
}
