package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** WARC web-archive codec pair: writer-twin round trips over both
  * real-world layouts (raw records, per-record gzip members), HTTP
  * envelope peeling, non-response filtering, wholesale refusal tiers,
  * and mutation fuzz over genuine streams.
  */
class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def entries(n: Int) = (0 until n).map { i =>
    (s"https://example.org/p/$i", "2026-02-0" + (1 + i % 9) + "T00:00:00Z",
      if (i % 7 == 3) 404 else 200,
      if (i % 3 == 2) "text/plain" else "text/html",
      (s"<html><body><p>page $i body with several words here</p></body></html>")
        .getBytes("UTF-8"))
  }

  test("round trip: raw and gzip-member layouts parse identically") {
    for (gz <- Seq(false, true)) {
      val es = entries(6)
      val bytes = WarcWriter.write(es, gzipMembers = gz)
      val df = Seq((1L, bytes)).toDF("doc_id", "content")
      val rows = Warc.warcResponses(df, "doc_id", "content")
        .orderBy("rec").collect()
      assert(rows.length == es.length, s"gz=$gz")
      rows.zip(es).foreach { case (r, (uri, date, status, mime, body)) =>
        assert(r.getAs[String]("target_uri") == uri)
        assert(r.getAs[String]("warc_date") == date)
        assert(r.getAs[Int]("http_status") == status)
        assert(r.getAs[String]("mime") == mime)
        assert(r.getAs[Array[Byte]]("payload").toSeq == body.toSeq)
      }
      // warcinfo is parsed but filtered: rec indices start at 1
      assert(rows.head.getAs[Int]("rec") == 1)
    }
  }

  test("warcPages extracts HTML main content and passes text/plain through") {
    val es = Seq(
      ("https://a/x", null, 200, "text/html",
        Html.writePage(Seq("Title Words", "body paragraph with many plain words")),
      ),
      ("https://a/y", null, 200, "text/plain", "just plain text".getBytes("UTF-8")))
    val bytes = WarcWriter.write(es.map(e => (e._1, e._2, e._3, e._4, e._5)))
    val df = Seq((9L, bytes)).toDF("doc_id", "content")
    val out = Warc.warcPages(df, "doc_id", "content").orderBy("rec")
      .select("mime", "page_text").collect()
    assert(out(0).getString(0) == "text/html")
    assert(out(0).getString(1).contains("body paragraph with many plain words"))
    assert(out(1).getString(1) == "just plain text")
  }

  test("refusal is wholesale: garbage, bad magic, truncation, corrupt gzip") {
    val good = WarcWriter.write(entries(3))
    val goodGz = WarcWriter.write(entries(3), gzipMembers = true)
    val cases = Seq(
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9),
      "HTTP/1.1 200 OK\r\n\r\nnope".getBytes("UTF-8"),
      good.take(good.length - 40), // payload truncated mid-record
      { val c = goodGz.clone(); c(goodGz.length / 2) = (c(goodGz.length / 2) ^ 0xFF).toByte; c })
    val df = cases.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("doc_id", "content")
    val out = df.select(Warc.warcRecords(col("content")).alias("r")).collect()
    val nulls = out.count(_.isNullAt(0))
    // bit-flip in a gzip payload may or may not break the CRC mid-member;
    // the structural tiers (garbage, bad magic, truncation) must all refuse
    assert(nulls >= 3, s"expected >= 3 wholesale refusals, got $nulls")
  }

  test("truncation sweep never crashes and never yields partial archives") {
    val good = WarcWriter.write(entries(4))
    val full = Seq((0L, good)).toDF("doc_id", "content")
      .select(Warc.warcRecords(col("content")).alias("r"))
      .collect()(0).getSeq[Any](0).length
    (1 until good.length by 97).foreach { cut =>
      val rows = Seq((0L, good.take(cut))).toDF("doc_id", "content")
        .select(Warc.warcRecords(col("content")).alias("r")).collect()
      val r = rows(0)
      assert(r.isNullAt(0) || r.getSeq[Any](0).length <= full)
    }
  }

  test("multi-record single gzip member also parses (non-Common-Crawl layout)") {
    val raw = WarcWriter.write(entries(3))
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(raw); gz.finish()
    val df = Seq((0L, out.toByteArray)).toDF("doc_id", "content")
    val rows = Warc.warcResponses(df, "doc_id", "content").collect()
    assert(rows.length == 3)
  }


  test("ingestCrawlBatch: keep-latest per URL, then screen-and-append") {
    val root = java.nio.file.Files.createTempDirectory("graft-crawl").toString
    def page(words: String) = Html.writePage(Seq("Title Here", words))
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val textB = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val textC = "red orange yellow green blue indigo violet cyan magenta " +
      "maroon olive navy teal silver gray black white pink brown gold"

    // archive 1: u1 visited twice (old then new content), u2 once
    val arc1 = WarcWriter.write(Seq(
      ("https://e/u1", "2026-01-01T00:00:00Z", 200, "text/html", page(textA)),
      ("https://e/u1", "2026-03-01T00:00:00Z", 200, "text/html", page(textB)),
      ("https://e/u2", "2026-01-02T00:00:00Z", 200, "text/html", page(textC))))
    val b1 = Seq((1L, arc1)).toDF("doc_id", "content")
    val n1 = Warc.ingestCrawlBatch(spark, b1, "doc_id", "content",
      s"$root/corpus", signaturePath = Some(s"$root/sigs"))
    assert(n1 == 2)
    val c1 = spark.read.parquet(s"$root/corpus").collect()
    val u1 = c1.find(_.getAs[String]("url") == "https://e/u1").get
    assert(u1.getAs[String]("warc_date") == "2026-03-01T00:00:00Z",
      "revisit must keep the latest capture")
    assert(u1.getAs[String]("text").contains("one two three"))

    // archive 2: exact dup of u2's content under a new URL + fresh page
    val arc2 = WarcWriter.write(Seq(
      ("https://e/u4", "2026-04-01T00:00:00Z", 200, "text/html", page(textC)),
      ("https://e/u5", "2026-04-01T00:00:00Z", 200, "text/html",
        page("solar lunar stellar nebular quasar pulsar magnetar blazar " +
          "kilonova supernova hypernova micronova galaxy cluster void " +
          "filament horizon singularity accretion jet"))),
      gzipMembers = true)
    val b2 = Seq((2L, arc2)).toDF("doc_id", "content")
    val n2 = Warc.ingestCrawlBatch(spark, b2, "doc_id", "content",
      s"$root/corpus", signaturePath = Some(s"$root/sigs"))
    assert(n2 == 1, "the re-hosted duplicate must drop against the store")
    val urls = spark.read.parquet(s"$root/corpus")
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls == Set("https://e/u1", "https://e/u2", "https://e/u5"))
  }

  test("WET archives: conversion records surface pre-extracted UTF-8 text") {
    for (gz <- Seq(false, true)) {
      val es = Seq(
        ("https://example.org/w/0", "2026-02-01T00:00:00Z", "first page text"),
        ("https://example.org/w/1", "2026-02-02T00:00:00Z",
          "snowman \u2603 and accents \u00e9\u00e8"))
      val bytes = WarcWriter.writeWet(es, gzipMembers = gz)
      val df = Seq((1L, bytes)).toDF("doc_id", "content")
      val rows = Warc.wetTexts(df, "doc_id", "content").orderBy("rec").collect()
      assert(rows.length === 2, s"gz=$gz")
      rows.zip(es).foreach { case (r, (uri, date, text)) =>
        assert(r.getAs[String]("target_uri") === uri)
        assert(r.getAs[String]("warc_date") === date)
        assert(r.getAs[String]("mime") === "text/plain")
        assert(r.getAs[String]("wet_text") === text, s"gz=$gz")
      }
    }
  }

  test("crawlTexts is source-format-blind: WARC and WET in one schema") {
    val text = "shared body words enough for extraction"
    val warc = WarcWriter.write(Seq(("https://e/a", null, 200, "text/html",
      Html.writePage(Seq("T", text)))))
    val wet = WarcWriter.writeWet(Seq(("https://e/b", null, s"T\n$text")))
    val df = Seq((1L, warc), (2L, wet)).toDF("doc_id", "content")
    val rows = Warc.crawlTexts(df, "doc_id", "content").orderBy("doc_id")
      .collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("warc_type") === "response")
    assert(rows(0).getAs[Int]("http_status") === 200)
    assert(rows(1).getAs[String]("warc_type") === "conversion")
    assert(rows(1).isNullAt(rows(1).fieldIndex("http_status")))
    // the point: identical extracted text through either source format
    assert(rows(0).getAs[String]("page_text") ===
      rows(1).getAs[String]("page_text"))
  }

  test("ingestCrawlBatch accepts a WET batch end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("wetingest").toString
    val corpus = s"$dir/corpus"
    val b1 = Seq((1L, WarcWriter.writeWet(Seq(
      ("https://e/p1", "2026-02-01T00:00:00Z", "alpha beta gamma delta epsilon zeta eta theta"),
      ("https://e/p1", "2026-02-03T00:00:00Z", "alpha beta gamma delta epsilon zeta eta LATEST")))))
      .toDF("doc_id", "content")
    val n1 = Warc.ingestCrawlBatch(spark, b1, "doc_id", "content", corpus)
    assert(n1 === 1) // keep-latest collapsed the revisit
    val kept = spark.read.parquet(corpus).collect()
    assert(kept.length === 1)
    assert(kept(0).getAs[String]("text").endsWith("LATEST"))
    // second batch: an exact re-host dropped by the store, fresh text appended
    val b2 = Seq((2L, WarcWriter.writeWet(Seq(
      ("https://e/p2", "2026-02-04T00:00:00Z", "alpha beta gamma delta epsilon zeta eta LATEST"),
      ("https://e/p3", "2026-02-04T00:00:00Z", "completely different words forming a fresh page here")),
      gzipMembers = true)))
      .toDF("doc_id", "content")
    val n2 = Warc.ingestCrawlBatch(spark, b2, "doc_id", "content", corpus)
    assert(n2 === 1)
    assert(spark.read.parquet(corpus).count() === 2)
  }

  test("curateCrawl collapses alias captures onto one canonical key") {
    val page1 = Html.writePage(Seq("T", "older capture body words"),
      canonical = "/story")
    val page2 = Html.writePage(Seq("T", "newer capture body words"),
      canonical = "/story")
    val noindexed = Html.writePage(Seq("T", "hidden body words"),
      robots = "noindex")
    val b = Seq(
      (1L, WarcWriter.write(Seq(
        ("https://e.com/story?utm_source=tw", "2026-02-01T00:00:00Z", 200,
          "text/html", page1),
        ("https://e.com/story?ref=rss", "2026-02-05T00:00:00Z", 200,
          "text/html", page2)))),
      (2L, WarcWriter.write(Seq(("https://e.com/secret",
        "2026-02-02T00:00:00Z", 200, "text/html", noindexed))))
    ).toDF("doc_id", "content")
    val out = Warc.curateCrawl(b, "doc_id", "content").collect()
    // two alias captures -> ONE row, the latest capture's text;
    // the noindexed page is gone entirely
    assert(out.length === 1)
    assert(out(0).getAs[String]("url_key") === "https://e.com/story")
    assert(out(0).getAs[String]("text").contains("newer capture"))
  }

  test("binary mimes never become page text: mojibake gate") {
    // an image/jpeg response whose bytes would decode latin-1 to a long
    // "text" — the classic mojibake-page hole; the mime gate must NULL
    // it in every text arm and curateCrawl must drop the row entirely
    val jpegish = Array.tabulate(512)(i => ((i * 37 + 11) % 256).toByte)
    val b = Seq((1L, WarcWriter.write(Seq(
      ("https://e.com/page", "2026-02-01T00:00:00Z", 200, "text/html",
        Html.writePage(Seq("T", "real page body with words"))),
      ("https://e.com/img.jpg", "2026-02-01T00:00:00Z", 200, "image/jpeg",
        jpegish),
      ("https://e.com/doc.pdf", "2026-02-01T00:00:00Z", 200,
        "application/pdf", jpegish),
      ("https://e.com/notes.txt", "2026-02-01T00:00:00Z", 200, "text/plain",
        "plain notes survive".getBytes("UTF-8"))))))
      .toDF("doc_id", "content")
    val pages = Warc.warcPages(b, "doc_id", "content").orderBy("rec")
      .select("mime", "page_text").collect()
    assert(pages.map(r => Option(r.getString(1)).isDefined).toSeq ===
      Seq(true, false, false, true))
    val crawl = Warc.crawlTexts(b, "doc_id", "content").orderBy("rec")
      .select("mime", "page_text").collect()
    assert(crawl.map(r => Option(r.getString(1)).isDefined).toSeq ===
      Seq(true, false, false, true))
    val curated = Warc.curateCrawl(b, "doc_id", "content").collect()
    assert(curated.map(_.getAs[String]("url_key")).sorted.toSeq ===
      Seq("https://e.com/notes.txt", "https://e.com/page"))
  }

  test("curateCrawlMedia routes crawl binaries into the modality corpora") {
    val dir = java.nio.file.Files.createTempDirectory("crawlmedia").toString
    def png(seed: Int) = ImageWriter.pngGray(16, 16,
      (x, y) => (x * 7 + y * 13 + seed) % 256)
    val b = Seq(
      (1L, WarcWriter.write(Seq(
        ("https://e.com/page", "2026-02-01T00:00:00Z", 200, "text/html",
          Html.writePage(Seq("T", "text page body"))),
        ("https://e.com/a.png", "2026-02-01T00:00:00Z", 200, "image/png",
          png(0)),
        // revisit of the same image URL: keep-latest collapses it
        ("https://e.com/a.png", "2026-02-03T00:00:00Z", 200, "image/png",
          png(0)),
        // near-dup of a.png under a different URL: within-batch screen
        ("https://e.com/a-copy.png", "2026-02-01T00:00:00Z", 200,
          "image/png", png(0)),
        ("https://e.com/b.png", "2026-02-01T00:00:00Z", 200, "image/png",
          png(128)),
        ("https://e.com/c.wav", "2026-02-01T00:00:00Z", 200, "audio/wav",
          MediaWriter.wav(1, 8000, 16, 4000))))))
      .toDF("doc_id", "content")
    val counts = Warc.curateCrawlMedia(spark, b, "doc_id", "content",
      imageCorpusPath = Some(s"$dir/img"),
      audioCorpusPath = Some(s"$dir/aud"),
      imageSignaturePath = Some(s"$dir/imgsig"),
      audioSignaturePath = Some(s"$dir/audsig"))
    // a.png/a-copy.png are pixel-identical: the within-batch screen
    // keeps the lexicographically lowest URL (a-copy.png)
    assert(counts("image") === 2)
    assert(counts("audio") === 1)
    assert(counts("video") === 0) // no corpus path passed
    val imgs = spark.read.parquet(s"$dir/img").select("url").collect()
      .map(_.getString(0)).sorted
    assert(imgs.toSeq ===
      Seq("https://e.com/a-copy.png", "https://e.com/b.png"))
    // the HTML page leaked into no corpus; signatures match the image arm
    val sigs = spark.read.parquet(s"$dir/imgsig").count()
    assert(sigs === 2)
    // replay idempotency: the same batch appends nothing
    val again = Warc.curateCrawlMedia(spark, b, "doc_id", "content",
      imageCorpusPath = Some(s"$dir/img"),
      audioCorpusPath = Some(s"$dir/aud"),
      imageSignaturePath = Some(s"$dir/imgsig"),
      audioSignaturePath = Some(s"$dir/audsig"))
    assert(again("image") === 0 && again("audio") === 0)
  }

  test("curateCrawlMediaStream: media archives land via the batch path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("crawlmediastream").toString
    def png(seed: Int) = ImageWriter.pngGray(16, 16,
      (x, y) => (x * 7 + y * 13 + seed) % 256)
    val ms = MemoryStream[(Long, Array[Byte])]
    ms.addData((1L, WarcWriter.write(Seq(
      ("https://e.com/a.png", "2026-02-01T00:00:00Z", 200, "image/png",
        png(0))))))
    ms.addData((2L, WarcWriter.write(Seq(
      ("https://e.com/a.png", "2026-02-02T00:00:00Z", 200, "image/png",
        png(0)), // re-delivery: signature store screens it
      ("https://e.com/b.png", "2026-02-02T00:00:00Z", 200, "image/png",
        png(128))))))
    val q = Warc.curateCrawlMediaStream(spark,
      ms.toDF.toDF("doc_id", "content"), "doc_id", "content",
      s"$dir/chk", imageCorpusPath = Some(s"$dir/img"),
      imageSignaturePath = Some(s"$dir/imgsig"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(s"$dir/img").select("url").collect()
      .map(_.getString(0)).sorted
    assert(kept.toSeq === Seq("https://e.com/a.png", "https://e.com/b.png"))
  }

  test("ingestCrawlStream: micro-batched archives land via the same path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("crawlstream").toString
    val corpus = s"$dir/corpus"
    val ms = MemoryStream[(Long, Array[Byte])]
    ms.addData((1L, WarcWriter.writeWet(Seq(
      ("https://e/s1", "2026-02-01T00:00:00Z",
        "streaming page one with several distinct words")))))
    ms.addData((2L, WarcWriter.writeWet(Seq(
      ("https://e/s1", "2026-02-02T00:00:00Z",
        "streaming page one with several distinct words"), // re-delivery
      ("https://e/s2", "2026-02-02T00:00:00Z",
        "a different page entirely about other matters")))))
    val q = Warc.ingestCrawlStream(spark,
      ms.toDF.toDF("doc_id", "content"), "doc_id", "content", corpus,
      s"$dir/chk", signaturePath = Some(s"$dir/sigs"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(corpus).select("url").collect()
      .map(_.getString(0)).sorted
    // the re-hosted duplicate dropped against the store; both URLs end
    // up present exactly once
    assert(kept.toSeq === Seq("https://e/s1", "https://e/s2"))
  }

  test("whole-archive zstd/bzip2/xz containers parse like the raw bytes") {
    val raw = WarcWriter.write(Seq(
      ("https://z.example/a", null, 200, "text/html", "<p>zstd warc</p>".getBytes)))
    val base = graft.expressions.WarcRecords.compute(raw)
    assert(base != null)
    for (codec <- Seq("zstd", "bzip2", "xz", "lz4")) {
      val wrapped = Compression.encode(raw, codec)
      val got = graft.expressions.WarcRecords.compute(wrapped)
      assert(got != null && got.numElements() == base.numElements(), codec)
      val p = got.getStruct(1, 6)
      assert(new String(p.getBinary(5)) == "<p>zstd warc</p>", codec)
    }
    // corrupt container refuses wholesale
    val bad = Compression.encode(raw, "zstd")
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x11).toByte
    assert(graft.expressions.WarcRecords.compute(bad) == null)
  }

  test("HTTP Content-Encoding gzip/deflate bodies are peeled to entity bytes") {
    def record(encoding: String, body: Array[Byte]): Array[Byte] = {
      val http = new java.io.ByteArrayOutputStream()
      val hdr = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        (if (encoding != null) s"Content-Encoding: $encoding\r\n" else "") + "\r\n"
      http.write(hdr.getBytes("ISO-8859-1")); http.write(body)
      val payload = http.toByteArray
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: https://enc.example/x\r\n" +
        "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        payload ++ "\r\n\r\n".getBytes
    }
    val plain = "<html><body>wire bytes peeled</body></html>".getBytes
    val gz = Compression.encode(plain, "gzip")
    val outGz = graft.expressions.WarcRecords.compute(record("gzip", gz))
    assert(outGz != null)
    assert(new String(outGz.getStruct(0, 6).getBinary(5)) == new String(plain))
    // zlib-wrapped deflate
    val d = new java.util.zip.Deflater()
    d.setInput(plain); d.finish()
    val zBuf = new Array[Byte](4096)
    val zn = d.deflate(zBuf)
    val outZ = graft.expressions.WarcRecords.compute(
      record("deflate", java.util.Arrays.copyOf(zBuf, zn)))
    assert(new String(outZ.getStruct(0, 6).getBinary(5)) == new String(plain))
    // unknown encoding / mangled stream keep the wire bytes (no refusal)
    val outBr = graft.expressions.WarcRecords.compute(record("br", plain))
    assert(new String(outBr.getStruct(0, 6).getBinary(5)) == new String(plain))
    val mangled = gz.clone(); mangled(8) = (mangled(8) ^ 0x55).toByte
    val outBad = graft.expressions.WarcRecords.compute(record("gzip", mangled))
    assert(outBad != null && outBad.getStruct(0, 6).getBinary(5).nonEmpty)
  }

  test("planFetches: index-driven fetch lists, keep-latest, pruned, sorted") {
    val C = Cdx
    def rec(url: String, ts: String, status: Int, mime: String,
        file: String, off: Long) =
      C.CdxRecord("surt)/" + url, ts, url, mime, status, "sha1:x", file,
        off, 100L)
    val shard = C.writeIndex(Seq(
      rec("https://e/a", "20260101000000", 200, "text/html", "w1.warc.gz", 500L),
      rec("https://e/a", "20260301000000", 200, "text/html", "w1.warc.gz", 100L),
      rec("https://e/b", "20260101000000", 404, "text/html", "w1.warc.gz", 900L),
      rec("https://e/c", "20260101000000", 200, "image/png", "w2.warc.gz", 10L),
      rec("https://e/d", "20260101000000", 200, "text/plain", "w2.warc.gz", 7L)),
      Some("zstd"))
    val df = Seq((0L, shard)).toDF("doc_id", "content")
    val plan = Warc.planFetches(df, "content").collect()
    // a: latest capture only; b: 404 pruned; c: image pruned; d kept
    assert(plan.length == 2)
    val byUrl = plan.map(r => r.getAs[String]("url") -> r).toMap
    assert(byUrl("https://e/a").getAs[Long]("offset") == 100L)
    assert(byUrl("https://e/a").getAs[String]("ts") == "20260301000000")
    assert(byUrl("https://e/d").getAs[String]("filename") == "w2.warc.gz")
  }
}
