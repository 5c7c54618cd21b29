package graft.llmops

import graft.SparkTestBase

/** Splittable `.warc.gz`: parallel member recovery must equal the
  * whole-file parse for every range size, reject planted header
  * look-alikes, survive odd-but-legal gzip headers, and degrade on
  * truncation without inventing records.
  */
class WarcSplitSpec extends SparkTestBase {

  private def entries(n: Int) = (0 until n).map { i =>
    (s"https://split.example.org/p/$i", "2026-03-01T00:00:00Z", 200,
      "text/html",
      (s"<html><body><p>member $i with some body text for length " +
        ("pad " * (i % 40)) + "</p></body></html>").getBytes("UTF-8"))
  }

  private def writeTemp(bytes: Array[Byte]): String = {
    val f = java.nio.file.Files.createTempFile("graft-warcsplit", ".warc.gz")
    java.nio.file.Files.write(f, bytes)
    f.toString
  }

  private def memberRows(path: String, rangeBytes: Int) =
    Warc.splitArchiveMembers(spark, path, rangeBytes).collect()
      .map(r => (r.getAs[Long]("offset"), r.getAs[Array[Byte]]("content")))
      .sortBy(_._1)

  test("members recovered exactly once at any range size; union = whole file") {
    val archive = WarcWriter.write(entries(120), gzipMembers = true)
    val path = writeTemp(archive)
    val whole = Compression.decode(archive, "gzip") // concatenated members
    for (range <- Seq(1 << 16, 1 << 20)) {
      val rows = memberRows(path, range)
      assert(rows.length === 121, s"range=$range (warcinfo + 120)") // exact
      // offsets strictly increasing, first at 0
      assert(rows.head._1 === 0L)
      assert(rows.map(_._1).toSeq === rows.map(_._1).toSeq.sorted)
      // concatenated member bodies reproduce the whole-file decode
      val cat = rows.flatMap(_._2)
      assert(java.util.Arrays.equals(cat, whole), s"range=$range")
    }
    // and the parsed-record view matches the single-row whole-archive path
    import spark.implicits._
    val viaSplit = Warc.warcResponses(
      Warc.splitArchiveMembers(spark, path, 1 << 16)
        .withColumnRenamed("offset", "doc_id"), "doc_id", "content")
      .select("target_uri").as[String].collect().sorted
    val viaWhole = Warc.warcResponses(
      Seq((1L, archive)).toDF("doc_id", "content"), "doc_id", "content")
      .select("target_uri").as[String].collect().sorted
    assert(viaSplit.toSeq === viaWhole.toSeq)
  }

  test("header look-alikes without a valid trailer never start a task") {
    // junk that BEGINS with a plausible gzip header, then a real member:
    // the first-candidate validation must reject the fake (no CRC) and
    // land on the true member
    val real = WarcWriter.write(entries(3), gzipMembers = true)
    val rnd = new java.util.Random(5)
    val junk = new Array[Byte](300)
    rnd.nextBytes(junk)
    junk(0) = 0x1f; junk(1) = 0x8b.toByte; junk(2) = 0x08; junk(3) = 0
    val path = writeTemp(junk ++ real)
    val rows = memberRows(path, 1 << 20)
    assert(rows.length === 4) // warcinfo + 3, none from the junk
    assert(rows.head._1 === 300L)
  }

  test("legal-but-uncommon gzip headers (FNAME, FEXTRA, FHCRC) decode") {
    def member(body: Array[Byte], flg: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x1f, 0x8b.toByte, 8, flg.toByte, 0, 0, 0, 0, 0, 3))
      if ((flg & 4) != 0) { out.write(4); out.write(0); out.write("EXTR".getBytes) }
      if ((flg & 8) != 0) { out.write("name.warc".getBytes); out.write(0) }
      if ((flg & 16) != 0) { out.write("a comment".getBytes); out.write(0) }
      if ((flg & 2) != 0) { out.write(0x55); out.write(0x55) } // unchecked FHCRC
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(body); d.finish()
      val buf = new Array[Byte](body.length + 64)
      val n = d.deflate(buf)
      out.write(buf, 0, n)
      d.end()
      val crc = new java.util.zip.CRC32
      crc.update(body)
      var v = crc.getValue
      for (_ <- 0 until 4) { out.write((v & 0xff).toInt); v >>= 8 }
      var sz = body.length.toLong
      for (_ <- 0 until 4) { out.write((sz & 0xff).toInt); sz >>= 8 }
      out.toByteArray
    }
    val bodies = (0 until 4).map(i =>
      WarcWriter.responseRecordWire(s"https://h/$i", "2026-03-01T00:00:00Z",
        200, "text/plain", Nil, s"payload $i".getBytes))
    val file = member(bodies(0), 0) ++ member(bodies(1), 8) ++
      member(bodies(2), 4 | 16) ++ member(bodies(3), 2 | 8)
    val path = writeTemp(file)
    val rows = memberRows(path, 1 << 16)
    assert(rows.length === 4)
    rows.zip(bodies).foreach { case ((_, got), want) =>
      assert(java.util.Arrays.equals(got, want))
    }
  }

  test("a directory of archives fans out into one member list") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warcglob")
    for (k <- 0 until 3) {
      val es = (0 until 5).map(i =>
        (s"https://g$k.example.org/p/$i", "2026-03-01T00:00:00Z", 200,
          "text/plain", s"file $k rec $i".getBytes("UTF-8")))
      java.nio.file.Files.write(dir.resolve(f"crawl-$k%02d.warc.gz"),
        WarcWriter.write(es, gzipMembers = true))
    }
    val rows = Warc.splitArchiveMembers(spark, dir.toString, 1 << 16)
      .collect()
    assert(rows.length === 18) // 3 files x (warcinfo + 5)
    val byPath = rows.groupBy(_.getAs[String]("path")).view.mapValues(_.length)
    assert(byPath.size === 3 && byPath.values.forall(_ == 6))
    // glob form names the same set
    assert(Warc.splitArchiveMembers(spark,
      dir.toString + "/crawl-*.warc.gz", 1 << 16).count() === 18)
  }

  test("truncation drops the cut member, earlier members survive") {
    val archive = WarcWriter.write(entries(20), gzipMembers = true)
    val path = writeTemp(java.util.Arrays.copyOf(archive,
      archive.length - archive.length / 4))
    val rows = memberRows(path, 1 << 16)
    assert(rows.nonEmpty && rows.length < 21)
    // every surviving member is intact (its records parse)
    import spark.implicits._
    val parsed = Warc.warcResponses(
      Warc.splitArchiveMembers(spark, path, 1 << 16)
        .withColumnRenamed("offset", "doc_id"), "doc_id", "content")
    assert(parsed.count() === rows.length - 1) // minus the warcinfo member
  }
}
