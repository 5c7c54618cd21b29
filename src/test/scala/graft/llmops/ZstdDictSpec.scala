package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** External-dictionary zstd decode (RFC 8878 section 5). Fixtures are
  * reference-CLI artifacts: `zstd --train` built the 1 KB trained
  * dictionary, `zstd -9/-19 -D` compressed the payloads against it
  * (one with `--no-dictID`, one against a RAW-CONTENT dictionary), and
  * the CLI round-trips them — our decoder must agree byte-exactly and
  * refuse every wrong-dictionary pairing.
  */
class ZstdDictSpec extends AnyFunSuite {

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getMimeDecoder.decode(s)

  private val DictB64: String =
    """N6Qw7IS/9ysqEBhZ0wEAAAAAAAAAP8/zPM+zSQolhKRYb9Ja0biujScRIXt3w4dWtXcBQwAA
      |GDBUeFAvHQ4AAARAxshExtJRkKeEsSRjyBgCAAAAAAAAAAAAAAAAAAAA5FydAgAAAAAAAAAA
      |AAAAAAAAAQAAAAQAAAAIAAAAaXRoIGF0IHdpdGggdG9rZW5zIGRvY3VtZW50cyBtb2RlbHMg
      |dGhlIHRyYWluaW5nIHRleHQgYW5kIGRhdGEgc2NhbGUgY3VyYXRlZCBkYXRhIGFuZCBkb2N1
      |bWVudHMKc2FtcGxlIDI3OiB0cmFpbmluZyBkb2N1bWVudHMgZG9jdW1lbnRzIGluZ2VzdHMg
      |ZGF0YSBkYXRhIGRvY3VtZW50cyBhdCBhbmQgd2l0aCBkb2N1bWVudHMgd2l0aCBhdCBhdCBj
      |dXJhdGVkIGxha2UgaW5nZXN0cyBzY2FsZSBpbmdlc3RzIHRleHQgYXQgZGF0YSB0cmFpbmlu
      |ZyBzY2FsZSBmb3IgdG9rZW5zIGZvciBkYXRhIHRva2VucyBhdCBjdXJhdGVkIG1vZGVscyBj
      |dXJhdGVkIHRyYWluaW5nIHRoZSBmb3IgdGV4dCB3aXRoIHRoZSBhdCBhdCBmb3IgdGV4dCBk
      |b2N1bWVudHMgbGFrZSB0b2tlbnMgd2l0aCB0b2tlbnMgZm9yIGluZ2VzdHMgdHJhaW5pbmcg
      |YXQgYW5kIGxha2UgZGF0YSBjdXJhdGVkIG1vZGVscyBkb2N1bWVudHMgc2NhbGUgdHJhaW5p
      |bmcgbW9kZWxzIHNjYWxlIHRoZSBtb2RlbHMgbGFrZSB0aGUgYW5kIHRleHQgd2l0aCBkYXRh
      |IGluZ2VzdHMgdHJhaW5pbmcgd2l0aCB0aGUgY3VyYXRlZCBhdCBsYWtlIHRva2VucyB3aXRo
      |IGN1cmF0ZWQgY3VyYXRlZCBkb2N1bWVudHMgYXQgZm9yIGRvY3VtZW50cyB0ZXh0IGxha2Ug
      |Zm9yIGRvY3VtZW50cyBmb3Igd2l0aCBsYWtlIHRleHQgbW9kZWxzIGF0IGluZ2VzdHMgdGV4
      |dCB0b2tlbnMgY3VyYXRlZCB0aGUgdG9rZW5zIHRoZSBpbmdlc3RzIGxha2UgaW5nZXN0cyBz
      |Y2FsZSBkb2N1bWVudHMgYW5kIHdpdGggbW9kZWxzIHNjYWxlIGluZ2VzdHMgd2l0aCBmb3Ig
      |YW5kIHRleHQgY3VyYXRlZCB0ZXh0IGRhdGEgZm9yIHRva2VucyB3aXRoIGF0IGFuZCBsYWtl
      |IGF0IGluZ2VzdHMgY3VyYXRlZCBpbmdlc3RzIHRoZSB0aGUgdGV4dCBkb2N1bWVudHMgYQ==""".stripMargin
  private val FxP1: String =
    """KLUv/SeEv/crYjUBAIB0aCwgdHdpY2Ugb3ZlciAuCfwXZLyZYAhs4D5tIz2dKPTdgN5NBcVX
      |cQ==""".stripMargin
  private val FxP2: String =
    """KLUv/WeEv/crhAKVAAAYbm5kBPxcgwSoS8sf3Kai0KO+twKk""".stripMargin
  private val FxP3: String =
    """KLUv/SeEv/crKUkBAGNvbXBsZXRlbHkgdW5yZWxhdGVkIHBheWxvYWQgenpxcXh4IDEyMzQ1
      |Uk+ZQQ==""".stripMargin
  private val FxP1noid: String =
    """KLUv/SRiNQEAgHRoLCB0d2ljZSBvdmVyIC4J/BdkvJlgCGzgPm0jPZ0o9N2A3k0FxVdx""".stripMargin
  private val FxP1raw: String =
    """KLUv/SRiPQIA8sQOEbDrBAzRdZtoKWVOkqszJRABQXPdDfRgMh9N0qbFdS81/Ke30ONq6fJ1
      |Zk+KWiphdqYkrdXgMR6FtTwCAFcccPQhmAEFxVdx""".stripMargin
  private val RawDictB64: String =
    """cmF3IGNvbnRlbnQgcHJlZml4IGRpY3Rpb25hcnk6IHRoZSBxdWljayBicm93biBmb3gganVt
      |cHMgb3ZlciB0aGUgbGF6eSBkb2cgcmVwZWF0ZWRseSBhbmQgb2Z0ZW4uIA==""".stripMargin

  private val p1 = "the data lake ingests documents with curated text for " +
    "training at scale, twice over the data lake."
  private val p2 = "tokens and documents and text " * 30
  private val p3 = "completely unrelated payload zzqqxx 12345"

  private def dict = b64(DictB64)
  private def rawDict = b64(RawDictB64)

  test("trained-dictionary frames decode byte-exactly (CLI artifacts)") {
    assert(new String(Zstd.decode(b64(FxP1), dict), "UTF-8") === p1)
    assert(new String(Zstd.decode(b64(FxP2), dict), "UTF-8") === p2)
    assert(new String(Zstd.decode(b64(FxP3), dict), "UTF-8") === p3)
    // --no-dictID frames carry no id but still need the dictionary
    assert(new String(Zstd.decode(b64(FxP1noid), dict), "UTF-8") === p1)
  }

  test("raw-content dictionary: pure history prefix, no tables") {
    assert(new String(Zstd.decode(b64(FxP1raw), rawDict), "UTF-8") === p1)
  }

  test("wrong or missing dictionary refuses, it never mis-decodes") {
    // dictionary frames without their dict
    assert(Zstd.decode(b64(FxP1)) == null)
    assert(Zstd.decode(b64(FxP1), null: Array[Byte]) == null)
    // declared id vs a raw dict (id 0): mismatch
    assert(Zstd.decode(b64(FxP1), rawDict) == null)
    // wrong-history raw frame against the trained dict: the checksum
    // catches the corrupt back-references
    assert(Zstd.decode(b64(FxP1raw), dict) == null)
    // a truncated trained dictionary (magic kept, tables cut) is refused
    assert(Zstd.decode(b64(FxP1), java.util.Arrays.copyOf(dict, 20)) == null)
  }

  test("dictionary-less frames still decode when a dictionary is supplied") {
    val body = ("ordinary frame beside a supplied dictionary " * 10)
      .getBytes("UTF-8")
    val enc = Compression.encode(body, "zstd") // the store-mode twin
    assert(java.util.Arrays.equals(Zstd.decode(enc, dict), body))
    assert(java.util.Arrays.equals(Zstd.decode(enc, rawDict), body))
  }

  test("mutation fuzz over dictionary frames never throws") {
    val seeds = Seq(b64(FxP1), b64(FxP2), b64(FxP1raw))
    val r = new java.util.Random(42)
    for (seed <- seeds; _ <- 0 until 300) {
      val m = seed.clone()
      m(r.nextInt(m.length)) = (m(r.nextInt(m.length)) ^ (1 << r.nextInt(8))).toByte
      val out = Zstd.decode(m, dict)
      if (out != null) assert(out.length <= (64 << 20))
    }
    // and fuzz the dictionary itself
    for (_ <- 0 until 300) {
      val d = dict.clone()
      d(r.nextInt(d.length)) = (d(r.nextInt(d.length)) ^ (1 << r.nextInt(8))).toByte
      val out = Zstd.decode(b64(FxP1), d)
      if (out != null) assert(out.length <= (64 << 20))
    }
  }
}
