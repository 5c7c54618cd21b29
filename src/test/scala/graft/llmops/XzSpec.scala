package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** xz/LZMA2 decoder against reference-tool files (levels 1/3/9e, CRC32 /
  * CRC64 / SHA-256 / none checks, multi-block, concatenated streams),
  * the stored-chunk twin, and refusal tiers.
  */
class XzSpec extends AnyFunSuite {

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getMimeDecoder.decode(s)

  test("decodes level-1 text (CRC64 default check)") {
    val dec = XzLzma.decode(b64(XzFixtures.cliTextL1))
    assert(dec != null, "null decode")
    assert(dec.length == 2275 && md5(dec) == "cb526a8b26033daa0b8301ce71f70f88")
  }

  test("decodes level-9e run ladder") {
    val dec = XzLzma.decode(b64(XzFixtures.cliRunsL9e))
    assert(dec != null, "null decode")
    assert(dec.length == 1790 && md5(dec) == "f8a99897bd657cea65a5cf219425cf00")
  }

  test("decodes incompressible binary with CRC32 check") {
    val dec = XzLzma.decode(b64(XzFixtures.cliBinaryCrc32))
    assert(dec != null, "null decode")
    assert(dec.length == 3000 && md5(dec) == "4ae169c2537049a9f3e0986888ba16fb")
  }

  test("decodes 150 KB level-3 with SHA-256 check") {
    val dec = XzLzma.decode(b64(XzFixtures.cliBigSha256))
    assert(dec != null, "null decode")
    assert(dec.length == 156535 && md5(dec) == "e09d2cc0f8c70352a7f7c00522e333b7")
  }

  test("decodes the empty stream (check type none) and multi-block files") {
    val e = XzLzma.decode(b64(XzFixtures.cliEmptyNone))
    assert(e != null && e.length == 0)
    val mb = XzLzma.decode(b64(XzFixtures.cliMultiBlock))
    assert(mb != null && mb.length == 156535)
    assert(md5(mb) == "e09d2cc0f8c70352a7f7c00522e333b7")
  }

  test("walks padded concatenated streams") {
    val dec = XzLzma.decode(b64(XzFixtures.cliMultiStream))
    assert(dec != null && dec.length == 2275 + 1790)
    assert(md5(java.util.Arrays.copyOfRange(dec, 0, 2275)) ==
      "cb526a8b26033daa0b8301ce71f70f88")
  }

  test("twin roundtrip (stored LZMA2 chunks) and CLI fixture concat") {
    val rnd = new scala.util.Random(21)
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,
      "tiny".getBytes,
      Array.fill[Byte](200000)(rnd.nextInt(256).toByte) // spans chunks
    )
    for (c <- cases) {
      val enc = XzWriter.encode(c)
      val dec = XzLzma.decode(enc)
      assert(dec != null && java.util.Arrays.equals(dec, c),
        s"roundtrip n=${c.length}")
    }
  }

  test("stream padding BETWEEN concatenated streams decodes (xz §2.2, r17)") {
    // `cat a.xz b.xz` where a.xz carries trailing 4-byte-zero padding:
    // the padding is inter-stream, not terminal — refusing it rejected
    // files `xz -dc` accepts
    val a = XzWriter.encode("first stream ".getBytes("UTF-8"))
    val b = XzWriter.encode("second stream".getBytes("UTF-8"))
    val padded = a ++ new Array[Byte](8) ++ b
    val dec = XzLzma.decode(padded)
    assert(dec != null)
    assert(new String(dec, "UTF-8") === "first stream second stream")
    // terminal padding still fine; leading padding still refuses
    assert(XzLzma.decode(a ++ new Array[Byte](4)) != null)
    assert(XzLzma.decode(new Array[Byte](4) ++ a) == null)
    // non-multiple-of-4 padding between streams refuses
    assert(XzLzma.decode(a ++ new Array[Byte](6) ++ b) == null)
  }

  test("refuses damage: payload, check value, header CRC, truncation, junk") {
    val cli = b64(XzFixtures.cliTextL1)
    val pay = cli.clone()
    pay(cli.length / 2) = (pay(cli.length / 2) ^ 0x20).toByte
    assert(XzLzma.decode(pay) == null)
    val hdr = cli.clone()
    hdr(13) = (hdr(13) ^ 0x01).toByte // inside block header → CRC32 fails
    assert(XzLzma.decode(hdr) == null)
    assert(XzLzma.decode(java.util.Arrays.copyOf(cli, cli.length - 6)) == null)
    assert(XzLzma.decode("garbage garbage garbage garbage!".getBytes) == null)
    assert(XzLzma.decode(null) == null)
  }

  test("crc64 known-answer vector") {
    // CRC-64/XZ of "123456789" = 0x995DC9BBDF1939FA
    val v = "123456789".getBytes
    assert(XzLzma.crc64(v, 0, v.length) == 0x995DC9BBDF1939FAL)
  }
}
