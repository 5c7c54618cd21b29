package graft.llmops

import graft.SparkTestBase

/** Multistream dump splitting: parallel magic scan, slice decode, page
  * boundary re-fragmenting, and identity with the pre-split batch path.
  */
class WikiMultistreamSpec extends SparkTestBase {

  private val lexicon = Array("river", "basalt", "meridian", "quartz",
    "harbor", "lattice", "ember", "compass", "juniper", "granite",
    "signal", "meadow", "cipher", "tundra", "orchard", "beacon")

  private def page(id: Long): WikiDump.WikiPage = {
    // word sequences must be genuinely distinct per page or the ingest
    // near-dup screen (correctly) collapses them — mix the id through
    // a multiplicative hash so no two pages share shingle sets
    val words = (0 until 18).map(k =>
      lexicon((((id * 2654435761L + k * 40503L + k * k * id) >>> 3)
        % 16).toInt))
    WikiDump.WikiPage(s"Article $id", 0, id, null,
      s"== Head$id ==\n'''Article''' $id covers ${words.mkString(" ")} " +
        s"and [[Topic$id|topic $id]] in detail number $id.")
  }

  private def batches(nBatches: Int, per: Int): Seq[Seq[WikiDump.WikiPage]] =
    (0 until nBatches).map(b =>
      (0 until per).map(i => page(b.toLong * per + i)))

  private def writeTemp(bytes: Array[Byte]): String = {
    val f = java.nio.file.Files.createTempFile("graft-multistream", ".xml.bz2")
    java.nio.file.Files.write(f, bytes)
    f.toString
  }

  test("stream offsets: every bz2 member found once, any range size") {
    val bs = batches(7, 15)
    val full = WikiDump.writeMultistreamDump(bs)
    val path = writeTemp(full)
    // count the true starts by scanning the fixture directly
    val expected = (0 until full.length - 9)
      .filter(i => WikiDump.isBz2StreamMagic(full, i)).map(_.toLong)
    assert(expected.size == 8, "7 page streams + trailer")
    assert(expected.head == 0L)
    for (range <- Seq(1024, 1 << 20)) {
      val got = WikiDump.dumpStreamOffsets(spark, path, rangeBytes = range)
        .collect().map(_.getLong(0)).toSeq
      assert(got == expected, s"rangeBytes=$range")
    }
  }

  test("fragments: capped, whole pages, identical to the pre-split path") {
    val bs = batches(6, 12)
    val path = writeTemp(WikiDump.writeMultistreamDump(bs))
    val cap = 1500 // far below a decompressed stream: forces re-splits
    val frags = WikiDump.readDumpFragments(spark, path,
      maxFragmentBytes = cap, rangeBytes = 2048).collect()
      .map(_.getAs[Array[Byte]]("content"))
    assert(frags.length > bs.size, "streams must split into more fragments")
    assert(frags.forall(_.length <= cap))
    val viaFile = WikiDump.articles(
      WikiDump.readDumpFragments(spark, path, cap, 2048), "content")
      .select("page_id", "title", "plain").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    import spark.implicits._
    val preSplit = bs.map(ps => WikiDump.writeDump(ps, Some("bzip2")))
      .zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("batch", "content")
    val viaBatches = WikiDump.articles(preSplit, "content")
      .select("page_id", "title", "plain").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(viaFile == viaBatches)
    assert(viaFile.size == 72)
  }

  test("a single page over the cap is dropped, the rest survive") {
    val big = WikiDump.WikiPage("Giant", 0, 999L, null,
      "x " * 4000) // ~8 KB of text
    val bs = Seq(Seq(page(1), big, page(2)))
    val path = writeTemp(WikiDump.writeMultistreamDump(bs))
    val ids = WikiDump.articles(
      WikiDump.readDumpFragments(spark, path, maxFragmentBytes = 2000),
      "content").select("page_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
  }

  test("ingestDumpFile: the one-call path lands the same corpus") {
    val bs = batches(4, 10)
    val path = writeTemp(WikiDump.writeMultistreamDump(bs))
    val c1 = java.nio.file.Files.createTempDirectory("graft-wiki-c1")
      .toString + "/corpus"
    val c2 = java.nio.file.Files.createTempDirectory("graft-wiki-c2")
      .toString + "/corpus"
    import spark.implicits._
    val preSplit = bs.map(ps => WikiDump.writeDump(ps, Some("bzip2")))
      .zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("batch", "content")
    val n1 = WikiDump.ingestDumps(spark, preSplit, "content", c1)
    val n2 = WikiDump.ingestDumpFile(spark, path, c2,
      maxFragmentBytes = 4000, rangeBytes = 4096)
    assert(n1 == n2)
    def titles(p: String) = spark.read.parquet(p)
      .select("title").collect().map(_.getString(0)).toSet
    assert(titles(c1) == titles(c2))
    assert(titles(c1).size == 40)
  }
}
