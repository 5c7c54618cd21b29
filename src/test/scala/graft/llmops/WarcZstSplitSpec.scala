package graft.llmops

import graft.SparkTestBase

/** Splittable `.warc.zst` (IIPC layout): per-record zstd frames with an
  * optional leading skippable dictionary frame. The dict-compressed
  * fixture is a reference-CLI artifact (`zstd -19 -D` per record behind
  * a raw dictionary frame); the store-mode archives come from the twin.
  */
class WarcZstSplitSpec extends SparkTestBase {

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getMimeDecoder.decode(s)

  // skippable dict frame (raw 1 KB trained dict) + three zstd -19 -D frames
  private val ArchiveB64: String =
    """XSpNGAAEAAA3pDDshL/3KyoQGFnTAQAAAAAAAAA/z/M8z7NJCiWEpFhv0lrRuK6NJxEhe3fD
      |h1a1dwFDAAAYMFR4UC8dDgAABEDGyETG0lGQp4SxJGPIGAIAAAAAAAAAAAAAAAAAAADkXJ0C
      |AAAAAAAAAAAAAAAAAAABAAAABAAAAAgAAABpdGggYXQgd2l0aCB0b2tlbnMgZG9jdW1lbnRz
      |IG1vZGVscyB0aGUgdHJhaW5pbmcgdGV4dCBhbmQgZGF0YSBzY2FsZSBjdXJhdGVkIGRhdGEg
      |YW5kIGRvY3VtZW50cwpzYW1wbGUgMjc6IHRyYWluaW5nIGRvY3VtZW50cyBkb2N1bWVudHMg
      |aW5nZXN0cyBkYXRhIGRhdGEgZG9jdW1lbnRzIGF0IGFuZCB3aXRoIGRvY3VtZW50cyB3aXRo
      |IGF0IGF0IGN1cmF0ZWQgbGFrZSBpbmdlc3RzIHNjYWxlIGluZ2VzdHMgdGV4dCBhdCBkYXRh
      |IHRyYWluaW5nIHNjYWxlIGZvciB0b2tlbnMgZm9yIGRhdGEgdG9rZW5zIGF0IGN1cmF0ZWQg
      |bW9kZWxzIGN1cmF0ZWQgdHJhaW5pbmcgdGhlIGZvciB0ZXh0IHdpdGggdGhlIGF0IGF0IGZv
      |ciB0ZXh0IGRvY3VtZW50cyBsYWtlIHRva2VucyB3aXRoIHRva2VucyBmb3IgaW5nZXN0cyB0
      |cmFpbmluZyBhdCBhbmQgbGFrZSBkYXRhIGN1cmF0ZWQgbW9kZWxzIGRvY3VtZW50cyBzY2Fs
      |ZSB0cmFpbmluZyBtb2RlbHMgc2NhbGUgdGhlIG1vZGVscyBsYWtlIHRoZSBhbmQgdGV4dCB3
      |aXRoIGRhdGEgaW5nZXN0cyB0cmFpbmluZyB3aXRoIHRoZSBjdXJhdGVkIGF0IGxha2UgdG9r
      |ZW5zIHdpdGggY3VyYXRlZCBjdXJhdGVkIGRvY3VtZW50cyBhdCBmb3IgZG9jdW1lbnRzIHRl
      |eHQgbGFrZSBmb3IgZG9jdW1lbnRzIGZvciB3aXRoIGxha2UgdGV4dCBtb2RlbHMgYXQgaW5n
      |ZXN0cyB0ZXh0IHRva2VucyBjdXJhdGVkIHRoZSB0b2tlbnMgdGhlIGluZ2VzdHMgbGFrZSBp
      |bmdlc3RzIHNjYWxlIGRvY3VtZW50cyBhbmQgd2l0aCBtb2RlbHMgc2NhbGUgaW5nZXN0cyB3
      |aXRoIGZvciBhbmQgdGV4dCBjdXJhdGVkIHRleHQgZGF0YSBmb3IgdG9rZW5zIHdpdGggYXQg
      |YW5kIGxha2UgYXQgaW5nZXN0cyBjdXJhdGVkIGluZ2VzdHMgdGhlIHRoZSB0ZXh0IGRvY3Vt
      |ZW50cyBhKLUv/SeEv/crdM0CAJPED0yBKeh0uhxTGHNt3+3WIzP+1r9wPmqQqVGjiV/+ba6J
      |NIEy46vb0CtwWIQj1mGu65cxT2YwBR2NWcNHEx5SAggwNwE0hMHVBuqu+A2wWgAYDFQbSHcB
      |Gz36Rii1L/0nhL/3K3TFAgDDRBBMgSlMnS7HFMZc23e79ciMv/UvnA+mMGuQqVGjiV/+ba6J
      |NIEy46vb0CtwWIQj1mGu65cxT2YwBR2NWcNHEx5SAgc8N4CGOLjqQJ0CHGW8xKC1KaS7bt1o
      |FCi1L/0nhL/3K3TFAgDDRBBMgSnsdLocUxhzbd/t1iMz/ta/cD6Ywq4GmRo1mvjl3+aaSBMo
      |M766Db0Ch0U4Yh3mun4Z82QGU9DRmDV8NOEhJQc8N4CGOLjqQJ0CHGW8xKC1KaS7BYW6mw==""".stripMargin

  private val recs = (0 until 3).map(i =>
    s"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: https://z/$i\r\n" +
      s"Content-Length: 30\r\n\r\nthe data lake ingests doc 00$i\r\n\r\n")

  private def writeTemp(bytes: Array[Byte], suffix: String): String = {
    val f = java.nio.file.Files.createTempFile("graft-warczst", suffix)
    java.nio.file.Files.write(f, bytes)
    f.toString
  }

  private def memberRows(path: String, range: Int = 1 << 16,
      dict: Option[Array[Byte]] = None) =
    Warc.splitZstdArchiveMembers(spark, path, range, dict).collect()
      .map(r => (r.getAs[Long]("offset"), r.getAs[Array[Byte]]("content")))
      .sortBy(_._1)

  test("store-mode twin archives recover exactly once at any range size") {
    val entries = (0 until 80).map { i =>
      (s"https://zsplit.example.org/p/$i", "2026-03-02T00:00:00Z", 200,
        "text/plain", (s"record $i body " + ("x" * (i % 90))).getBytes("UTF-8"))
    }
    val archive = WarcWriter.writeZstMembers(entries)
    val path = writeTemp(archive, ".warc.zst")
    val whole = Zstd.decode(archive)
    for (range <- Seq(1 << 16, 1 << 20)) {
      val rows = memberRows(path, range)
      assert(rows.length === 81, s"range=$range") // warcinfo + 80
      assert(java.util.Arrays.equals(rows.flatMap(_._2), whole),
        s"range=$range")
    }
  }

  test("the leading dictionary frame is found and applied automatically") {
    val path = writeTemp(b64(ArchiveB64), ".warc.zst")
    val rows = memberRows(path)
    assert(rows.length === 3)
    rows.zip(recs).foreach { case ((_, got), want) =>
      assert(new String(got, "UTF-8") === want)
    }
  }

  test("a zstd-wrapped dictionary payload unwraps the same way") {
    val archive = b64(ArchiveB64)
    // reassemble: same dict, compressed payload, same record frames
    val dictLen = (archive(4) & 0xff) | ((archive(5) & 0xff) << 8) |
      ((archive(6) & 0xff) << 16) | ((archive(7) & 0xff) << 24)
    val dict = java.util.Arrays.copyOfRange(archive, 8, 8 + dictLen)
    val frames = java.util.Arrays.copyOfRange(archive, 8 + dictLen,
      archive.length)
    val wrapped = Compression.encode(dict, "zstd")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x5D, 0x2A, 0x4D, 0x18))
    var v = wrapped.length
    for (_ <- 0 until 4) { out.write(v & 0xff); v >>= 8 }
    out.write(wrapped)
    out.write(frames)
    val path = writeTemp(out.toByteArray, ".warc.zst")
    val rows = memberRows(path)
    assert(rows.length === 3)
    assert(new String(rows(0)._2, "UTF-8") === recs(0))
    // explicit override beats the archive's own frame — a WRONG raw
    // dict refuses every member (dictID mismatch), rows drop to zero
    assert(memberRows(path, dict = Some("not the dictionary".getBytes))
      .isEmpty)
  }

  test("junk with planted frame magic contributes nothing") {
    val rnd = new java.util.Random(9)
    val junk = new Array[Byte](4096)
    rnd.nextBytes(junk)
    junk(100) = 0x28; junk(101) = 0xB5.toByte
    junk(102) = 0x2F; junk(103) = 0xFD.toByte
    val path = writeTemp(junk, ".warc.zst")
    assert(memberRows(path).isEmpty)
  }
}
