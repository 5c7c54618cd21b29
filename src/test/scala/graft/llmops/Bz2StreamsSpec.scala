package graft.llmops

import graft.SparkTestBase

/** The shared concatenated-bz2 splitter: member recovery, the pbzip2
  * JSONL path, and false-magic degrade.
  */
class Bz2StreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def writeTemp(bytes: Array[Byte]): String = {
    val f = java.nio.file.Files.createTempFile("graft-bz2s", ".bz2")
    java.nio.file.Files.write(f, bytes)
    f.toString
  }

  test("member streams recover exactly, any range size") {
    val parts = (0 until 9).map(i =>
      (s"member $i: " + ("payload " * (10 + i * 7))).getBytes("UTF-8"))
    val file = parts.map(Compression.encode(_, "bzip2"))
      .foldLeft(Array.emptyByteArray)(_ ++ _)
    val path = writeTemp(file)
    for (range <- Seq(1024, 1 << 20)) {
      val rows = Bz2Streams.readStreams(spark, path, range).collect()
        .map(r => (r.getLong(0), r.getAs[Array[Byte]]("content")))
        .sortBy(_._1)
      assert(rows.length === 9, s"range=$range")
      rows.map(_._2).zip(parts).foreach { case (got, want) =>
        assert(java.util.Arrays.equals(got, want), s"range=$range")
      }
    }
  }

  test("pbzip2-shaped giant JSONL reads as per-stream line rows") {
    // 6 member streams of 40 lines each — the pbzip2 block layout
    val lines = (0 until 240).map(i =>
      s"""{"doc_id":$i,"text":"line payload number $i"}""")
    val file = lines.grouped(40).map(g =>
      Compression.encode(g.mkString("", "\n", "\n").getBytes("UTF-8"),
        "bzip2")).foldLeft(Array.emptyByteArray)(_ ++ _)
    val path = writeTemp(file)
    val got = TrainExport.readJsonlMultistream(spark, path, rangeBytes = 2048)
      .select("line").as[String].collect()
    assert(got.sorted.toSeq === lines.sorted)
    // per-member provenance: 6 distinct file@offset keys, 40 lines each
    val byFile = TrainExport.readJsonlMultistream(spark, path, 2048)
      .groupBy("file").count().collect().map(_.getLong(1))
    assert(byFile.length === 6 && byFile.forall(_ === 40L))
  }

  test("readJsonlMultistream stitches lines split across member boundaries") {
    // real pbzip2 cuts at byte offsets, not line boundaries: member 1
    // ends mid-line and member 2 starts with the line's tail — the
    // stitched read must yield whole lines, never two corrupt halves
    val m1 = Compression.encode(
      "{\"a\":1}\n{\"b\":".getBytes("UTF-8"), "bzip2")
    val m2 = Compression.encode(
      "2}\n{\"c\":3}\n".getBytes("UTF-8"), "bzip2")
    val path = writeTemp(m1 ++ m2)
    val got = TrainExport.readJsonlMultistream(spark, path, rangeBytes = 1024)
      .select("line").as[String].collect().sorted.toSeq
    assert(got === Seq("{\"a\":1}", "{\"b\":2}", "{\"c\":3}").sorted)
  }

  test("readJsonlMultistream keeps the final line when no trailing newline") {
    // externally produced pbzip2 JSONL often lacks the trailing \n — the
    // last member's tail has no successor member to stitch it into and
    // must be emitted as the final line, not silently dropped
    val m1 = Compression.encode(
      "{\"a\":1}\n{\"b\":".getBytes("UTF-8"), "bzip2")
    val m2 = Compression.encode(
      "2}\n{\"c\":3}".getBytes("UTF-8"), "bzip2") // NB: no trailing \n
    val path = writeTemp(m1 ++ m2)
    val got = TrainExport.readJsonlMultistream(spark, path, rangeBytes = 1024)
      .select("line").as[String].collect().sorted.toSeq
    assert(got === Seq("{\"a\":1}", "{\"b\":2}", "{\"c\":3}").sorted)
    // single member, no newline anywhere: the whole text is one line
    val solo = writeTemp(Compression.encode("{\"only\":1}".getBytes("UTF-8"), "bzip2"))
    val got2 = TrainExport.readJsonlMultistream(spark, solo, rangeBytes = 1024)
      .select("line").as[String].collect().toSeq
    assert(got2 === Seq("{\"only\":1}"))
  }

  test("planted false magic degrades its slice pair, the rest survive") {
    val parts = (0 until 4).map(i =>
      (s"stream $i " + ("data " * 50)).getBytes("UTF-8"))
    val encs = parts.map(Compression.encode(_, "bzip2"))
    // splice a fake stream magic into the MIDDLE of member 1's bytes:
    // the scan splits member 1 into two undecodable slices; members
    // 0/2/3 must still land
    val fake = Array[Byte]('B', 'Z', 'h', '9', 0x31, 0x41, 0x59, 0x26,
      0x53, 0x59)
    val m1 = encs(1).clone()
    System.arraycopy(fake, 0, m1, m1.length / 2, fake.length)
    val file = encs(0) ++ m1 ++ encs(2) ++ encs(3)
    val path = writeTemp(file)
    val rows = Bz2Streams.readStreams(spark, path, 1 << 20).collect()
      .map(r => new String(r.getAs[Array[Byte]]("content"), "UTF-8"))
    assert(rows.length === 3)
    assert(rows.toSet === Set(0, 2, 3).map(i =>
      s"stream $i " + ("data " * 50)))
  }
}
