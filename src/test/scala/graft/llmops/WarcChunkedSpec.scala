package graft.llmops

import graft.SparkTestBase

/** HTTP `Transfer-Encoding: chunked` de-chunking in the WARC entity
  * peel — wire order (chunk outermost, content coding inside), trailer
  * fields, and the malformed-chunk degrade tier that keeps wire bytes.
  */
class WarcChunkedSpec extends SparkTestBase {
  import spark.implicits._

  private val page = ("<html><body><p>chunked body with several " +
    "plain words repeated for good measure</p></body></html>")
    .getBytes("UTF-8")

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(b); gz.finish()
    out.toByteArray
  }

  private def payloadOf(warc: Array[Byte]): Array[Byte] = {
    val df = Seq((1L, warc)).toDF("doc_id", "content")
    val rows = Warc.warcResponses(df, "doc_id", "content").collect()
    assert(rows.length == 1)
    rows(0).getAs[Array[Byte]]("payload")
  }

  private def archive(rec: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(WarcWriter.warcinfo("2026-01-01T00:00:00Z"))
    out.write(rec)
    out.toByteArray
  }

  test("chunked body de-chunks to the plain twin") {
    val plain = payloadOf(WarcWriter.write(Seq(
      ("https://e/c", null, 200, "text/html", page))))
    for (sz <- Seq(1, 7, 4096)) {
      val rec = WarcWriter.responseRecordWire("https://e/c",
        "2026-01-01T00:00:00Z", 200, "text/html",
        Seq("Transfer-Encoding" -> "chunked"), WarcWriter.chunked(page, sz))
      assert(payloadOf(archive(rec)).toSeq == plain.toSeq, s"chunk size $sz")
    }
  }

  test("wire order: de-chunk first, then peel Content-Encoding; trailers ok") {
    val wire = WarcWriter.chunked(gzip(page), 11,
      trailer = Seq("X-Checksum" -> "abc"))
    val rec = WarcWriter.responseRecordWire("https://e/cg",
      "2026-01-01T00:00:00Z", 200, "text/html",
      Seq("Content-Encoding" -> "gzip", "Transfer-Encoding" -> "chunked"),
      wire)
    assert(payloadOf(archive(rec)).toSeq == page.toSeq)
    // chunk extensions on the size line are ignored
    val withExt = new String(WarcWriter.chunked(page, 8),
      java.nio.charset.StandardCharsets.ISO_8859_1)
      .replaceFirst("^8\r\n", "8;ext=1\r\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val rec2 = WarcWriter.responseRecordWire("https://e/ce",
      "2026-01-01T00:00:00Z", 200, "text/html",
      Seq("Transfer-Encoding" -> "chunked"), withExt)
    assert(payloadOf(archive(rec2)).toSeq == page.toSeq)
  }

  test("Content-Encoding: br peels through the brotli kernel, also chunked") {
    val enc = Brotli.encode(page) // store-mode twin; any valid stream works
    val rec = WarcWriter.responseRecordWire("https://e/br",
      "2026-01-01T00:00:00Z", 200, "text/html",
      Seq("Content-Encoding" -> "br"), enc)
    assert(payloadOf(archive(rec)).toSeq == page.toSeq)
    val rec2 = WarcWriter.responseRecordWire("https://e/brc",
      "2026-01-01T00:00:00Z", 200, "text/html",
      Seq("Content-Encoding" -> "br", "Transfer-Encoding" -> "chunked"),
      WarcWriter.chunked(enc, 13))
    assert(payloadOf(archive(rec2)).toSeq == page.toSeq)
    // a mangled br body keeps the wire bytes (degrade, never refuse):
    // truncation is unconditionally invalid (a payload bit-flip in a
    // store-mode stream would just decode to modified content)
    val bad = java.util.Arrays.copyOf(enc, enc.length - 2)
    val rec3 = WarcWriter.responseRecordWire("https://e/brb",
      "2026-01-01T00:00:00Z", 200, "text/html",
      Seq("Content-Encoding" -> "br"), bad)
    assert(payloadOf(archive(rec3)).toSeq == bad.toSeq)
  }

  test("layered transfer codings: 'gzip, chunked' peels right-to-left") {
    // legal though rare: gzip applied first, chunked last on the wire —
    // the reader de-chunks, then gunzips the transfer layer, with no
    // Content-Encoding header involved
    val wire = WarcWriter.chunked(gzip(page), 17)
    val rec = WarcWriter.responseRecordWire("https://e/tc",
      "2026-01-01T00:00:00Z", 200, "text/html",
      Seq("Transfer-Encoding" -> "gzip, chunked"), wire)
    assert(payloadOf(archive(rec)).toSeq == page.toSeq)
  }

  test("malformed chunks keep the wire bytes; archive never refuses") {
    val good = WarcWriter.chunked(page, 9)
    val bads = Seq[Array[Byte]](
      "zz\r\nnothex\r\n0\r\n\r\n".getBytes("ISO-8859-1"), // non-hex size
      java.util.Arrays.copyOf(good, good.length / 2),      // truncated
      { val b = good.clone(); b(1) = 'Q'; b },             // CRLF misplaced
      "7fffffff\r\nx\r\n0\r\n\r\n".getBytes("ISO-8859-1")) // size over cap
    for ((bad, i) <- bads.zipWithIndex) {
      val rec = WarcWriter.responseRecordWire("https://e/m" + i,
        "2026-01-01T00:00:00Z", 200, "text/html",
        Seq("Transfer-Encoding" -> "chunked"), bad)
      assert(payloadOf(archive(rec)).toSeq == bad.toSeq, s"tier $i")
    }
  }
}
