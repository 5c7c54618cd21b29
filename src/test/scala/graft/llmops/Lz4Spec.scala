package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** lz4 codec pair: twin roundtrips, reference-tool interop (default,
  * content-sized, block-checksummed frames; skippable-frame multi-frame
  * stream), checksum verification and refusal tiers.
  */
class Lz4Spec extends AnyFunSuite {

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getMimeDecoder.decode(s)

  private def roundtrip(data: Array[Byte], bc: Boolean = false): Unit = {
    val enc = Lz4Writer.encode(data, blockChecksums = bc)
    val dec = Lz4.decode(enc)
    assert(dec != null && java.util.Arrays.equals(dec, data),
      s"roundtrip mismatch n=${data.length} bc=$bc")
  }

  test("roundtrip: text, runs, random, multi-block, edge sizes") {
    val rnd = new scala.util.Random(5)
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,
      Array[Byte]('x'),
      "hello world, hello world, hello world".getBytes,
      Array.fill[Byte](100000)('R'), // long run spans two 64K blocks
      Array.fill[Byte](5000)(rnd.nextInt(256).toByte),
      Iterator.continually("token budget shard ").take(9000).mkString.getBytes
    )
    for (c <- cases; bc <- Seq(false, true)) roundtrip(c, bc)
  }

  test("twin compresses repetitive text hard") {
    val data = Iterator.continually("shard ").take(20000).mkString.getBytes
    val enc = Lz4Writer.encode(data)
    assert(enc.length < data.length / 50)
  }

  test("decodes reference-tool frame (level 9 text)") {
    val dec = Lz4.decode(b64(Lz4Fixtures.cliTextL9))
    assert(dec != null && dec.length == 2275)
    assert(md5(dec) == "cb526a8b26033daa0b8301ce71f70f88")
  }

  test("decodes reference-tool frame with content size (runs)") {
    val dec = Lz4.decode(b64(Lz4Fixtures.cliRunsSized))
    assert(dec != null && dec.length == 1790)
    assert(md5(dec) == "f8a99897bd657cea65a5cf219425cf00")
  }

  test("decodes reference-tool frame with block checksums (stored block)") {
    val dec = Lz4.decode(b64(Lz4Fixtures.cliBinaryBX))
    assert(dec != null && dec.length == 3000)
    assert(md5(dec) == "4ae169c2537049a9f3e0986888ba16fb")
  }

  test("steps over a skippable frame and walks both real frames") {
    val dec = Lz4.decode(b64(Lz4Fixtures.cliSkipMulti))
    assert(dec != null && dec.length == 2275 + 1790)
    assert(md5(java.util.Arrays.copyOfRange(dec, 0, 2275)) ==
      "cb526a8b26033daa0b8301ce71f70f88")
  }

  test("decodes reference-tool block-LINKED frame (-B4 -BD, 3 blocks)") {
    val dec = Lz4.decode(b64(Lz4Fixtures.cliLinkedBD))
    assert(dec != null && dec.length == 150000)
    val txt = new String(dec, java.nio.charset.StandardCharsets.US_ASCII)
    assert(txt.startsWith("the quick brown fox jumps over the lazy dog"))
    // periodic content: block 2/3 openings must have resolved against
    // prior-block history (the old empty-history decode returned null)
    assert(txt.substring(70000, 70147) == txt.substring(70147, 70294))
  }

  test("refuses content-checksum damage, truncation, junk, offset-0") {
    val enc = Lz4Writer.encode("damage target damage target damage".getBytes)
    val bad = enc.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 1).toByte // content xxh32
    assert(Lz4.decode(bad) == null)
    assert(Lz4.decode(java.util.Arrays.copyOf(enc, enc.length - 5)) == null)
    assert(Lz4.decode(Array.fill[Byte](32)(9)) == null)
    assert(Lz4.decode(null) == null)
    // header checksum damage
    val hb = enc.clone(); hb(6) = (hb(6) ^ 0x7f).toByte
    assert(Lz4.decode(hb) == null)
  }

  test("xxh32/xxh64 known-answer vectors") {
    // xxh32("",0)=0x02CC5D05; xxh64("",0)=0xEF46DB3751D8E999
    assert(XxHash.xxh32(Array.emptyByteArray, 0, 0, 0) == 0x02CC5D05)
    assert(XxHash.xxh64(Array.emptyByteArray, 0, 0, 0L) == 0xEF46DB3751D8E999L)
    // canonical sanity: hashes of short strings are stable and distinct
    val a = "a".getBytes; val abc = "abc".getBytes
    assert(XxHash.xxh32(abc, 0, 3, 0) == 0x32D153FF) // public test vector
    assert(XxHash.xxh64(a, 0, 1, 0L) != XxHash.xxh64(abc, 0, 3, 0L))
  }
}
