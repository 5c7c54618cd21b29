package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** zstd decoder against reference-tool frames (levels 1/3/19 — FSE,
  * 1- and 4-stream Huffman literals, repeat tables, repeat offsets),
  * twin roundtrips, checksum verification and refusal tiers.
  */
class ZstdSpec extends AnyFunSuite {

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getMimeDecoder.decode(s)

  test("decodes reference-tool level-1 text frame") {
    val dec = Zstd.decode(b64(ZstdFixtures.cliTextL1))
    assert(dec != null, "null decode")
    assert(dec.length == 2275 && md5(dec) == "cb526a8b26033daa0b8301ce71f70f88")
  }

  test("decodes reference-tool level-19 text frame") {
    val dec = Zstd.decode(b64(ZstdFixtures.cliTextL19))
    assert(dec != null, "null decode")
    assert(dec.length == 2275 && md5(dec) == "cb526a8b26033daa0b8301ce71f70f88")
  }

  test("decodes a 150 KB level-3 frame (4-stream literals, multi-block)") {
    val dec = Zstd.decode(b64(ZstdFixtures.cliBigL3))
    assert(dec != null, "null decode")
    assert(dec.length == 156535 && md5(dec) == "e09d2cc0f8c70352a7f7c00522e333b7")
  }

  test("decodes run-heavy level-19 frame without checksum") {
    val dec = Zstd.decode(b64(ZstdFixtures.cliRunsL19NoCheck))
    assert(dec != null, "null decode")
    assert(dec.length == 1790 && md5(dec) == "f8a99897bd657cea65a5cf219425cf00")
  }

  test("decodes incompressible binary (raw blocks) and the empty frame") {
    val dec = Zstd.decode(b64(ZstdFixtures.cliBinaryL1))
    assert(dec != null && dec.length == 3000)
    assert(md5(dec) == "4ae169c2537049a9f3e0986888ba16fb")
    val e = Zstd.decode(b64(ZstdFixtures.cliEmpty))
    assert(e != null && e.length == 0)
  }

  test("walks concatenated frames with an embedded skippable frame") {
    val dec = Zstd.decode(b64(ZstdFixtures.cliSkipMulti))
    assert(dec != null && dec.length == 2275 + 1790)
    assert(md5(java.util.Arrays.copyOfRange(dec, 0, 2275)) ==
      "cb526a8b26033daa0b8301ce71f70f88")
    assert(md5(java.util.Arrays.copyOfRange(dec, 2275, dec.length)) ==
      "f8a99897bd657cea65a5cf219425cf00")
  }

  test("twin roundtrip: raw/RLE frames with checksums") {
    val rnd = new scala.util.Random(13)
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,
      "small".getBytes,
      Array.fill[Byte](400)('r'), // pure RLE
      ("prefix " + "x" * 500 + " suffix").getBytes, // raw/RLE/raw split
      Array.fill[Byte](300000)(rnd.nextInt(4).toByte), // multi-block
      Array.fill[Byte](70000)(rnd.nextInt(256).toByte)
    )
    for (c <- cases) {
      val enc = ZstdWriter.encode(c)
      val dec = Zstd.decode(enc)
      assert(dec != null && java.util.Arrays.equals(dec, c),
        s"roundtrip n=${c.length}")
    }
  }

  test("refuses checksum damage, payload damage, truncation, junk") {
    val cli = b64(ZstdFixtures.cliTextL1)
    val bad = cli.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 1).toByte // xxh64 low bits
    assert(Zstd.decode(bad) == null)
    val mid = cli.clone()
    mid(cli.length / 2) = (mid(cli.length / 2) ^ 0x40).toByte
    assert(Zstd.decode(mid) == null) // entropy stream damage → structural or checksum refusal
    assert(Zstd.decode(java.util.Arrays.copyOf(cli, cli.length - 4)) == null)
    assert(Zstd.decode("not a zstd frame at all".getBytes) == null)
    assert(Zstd.decode(null) == null)
  }

  test("bit-flip fuzz on reference frames: refuse or decode, never throw") {
    // r17: skip() now flags bitstream over-consumption instead of
    // clamping — a truncated/corrupt Huffman literal stream must refuse,
    // not end at exactly 0 bits and pass the exact-consumption check
    val r = new java.util.Random(77)
    for (fix <- Seq(ZstdFixtures.cliTextL1, ZstdFixtures.cliTextL19)) {
      val good = b64(fix)
      val want = Zstd.decode(good)
      assert(want != null)
      (0 until 400).foreach { _ =>
        val m = good.clone()
        val flips = 1 + r.nextInt(3)
        (0 until flips).foreach { _ =>
          val p = r.nextInt(m.length)
          m(p) = (m(p) ^ (1 << r.nextInt(8))).toByte
        }
        val d = Zstd.decode(m) // never throws
        // content checksum gates payload damage: a non-null decode means
        // the flips missed the payload (header/meta bits) — bytes match
        if (d != null) assert(java.util.Arrays.equals(d, want))
      }
    }
  }

  test("refuses dictionary frames") {
    // magic LE + FHD 0x01 (window descriptor follows, 1-byte dict id)
    val magic = Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte)
    val hdr = magic ++ Array[Byte](0x01, 0x42, 0x01, 0x00, 0x00, 0x00)
    assert(Zstd.decode(hdr) == null)
  }
}
