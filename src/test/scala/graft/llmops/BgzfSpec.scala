package graft.llmops

import graft.SparkTestBase
import java.nio.file.Files

class BgzfSpec extends SparkTestBase {

  private def chunksFor(n: Int): Seq[Array[Byte]] =
    (0 until n).map(i =>
      (s"bgzf member $i " + ("payload " * (i % 9 + 1))).getBytes("UTF-8"))

  test("member-parallel read is the identity; tiny ranges chain exactly") {
    val chunks = chunksFor(40)
    val dir = Files.createTempDirectory("graft-bgzf").toString
    val path = s"$dir/c.bgz"
    Files.write(java.nio.file.Paths.get(path), Bgzf.write(chunks))
    for (rangeBytes <- Seq(32 << 20, 1024)) {
      val rows = Bgzf.readBgzf(spark, path, rangeBytes).collect()
        .sortBy(_.getLong(0))
      assert(rows.length == 40, s"rangeBytes=$rangeBytes")
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Array[Byte]](1).toSeq == chunks(i).toSeq)
      }
    }
  }

  test("any gzip decoder decompresses the whole file") {
    val chunks = chunksFor(12)
    val dir = Files.createTempDirectory("graft-bgzf").toString
    val path = s"$dir/c.bgz"
    Files.write(java.nio.file.Paths.get(path), Bgzf.write(chunks))
    val rc = new ProcessBuilder("sh", "-c",
      s"zcat '$path' > '$dir/out.bin'").inheritIO().start().waitFor()
    assert(rc == 0)
    val got = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/out.bin"))
    assert(got.toSeq == chunks.flatten.toSeq)
    // the repo's own gzip path agrees
    val whole = Compression.decode(
      Files.readAllBytes(java.nio.file.Paths.get(path)), "gzip")
    assert(whole != null && whole.toSeq == chunks.flatten.toSeq)
  }

  test("empty documents refuse loudly (a BGZF member cannot carry them)") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bgzf-empty").toString
    val df = (0 until 6).map(i => (i.toLong, if (i == 3) "" else s"doc $i"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Bgzf.writeShards(df, "doc_id", "text", dir, 1)
    }
    // the guided refusal (not a bare NPE), and no partial shard survives
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(chain.exists(_.contains("xz/tar")), chain.mkString(" | "))
    val leftover = new java.io.File(dir).listFiles()
    assert(leftover == null || !leftover.exists(_.getName.endsWith(".bgz")))
  }

  test("shard protocol: distributed export, one-plan multi-file read") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-bgzf-sh").toString
    val df = (0 until 300).map(i => (i.toLong, s"bdoc $i " + ("q" * (i % 11))))
      .toDF("doc_id", "text")
    Bgzf.writeShards(df, "doc_id", "text", dir, 4)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".bgz")).sortBy(_.getName)
    assert(shards.length == 4)
    val back = Bgzf.readBgzfFiles(spark, dir)
      .select(org.apache.spark.sql.functions.col("content")
        .cast("string"))
      .collect().map(_.getString(0)).sorted
    assert(back.toSeq ==
      (0 until 300).map(i => s"bdoc $i " + ("q" * (i % 11))).sorted)
    // byte determinism
    val dir2 = Files.createTempDirectory("graft-bgzf-sh2").toString
    Bgzf.writeShards(df, "doc_id", "text", dir2, 4)
    new java.io.File(dir2).listFiles().filter(_.getName.endsWith(".bgz"))
      .sortBy(_.getName).zip(shards).foreach { case (b, a) =>
        assert(java.util.Arrays.equals(
          Files.readAllBytes(a.toPath), Files.readAllBytes(b.toPath)))
      }
  }

  test("truncated deflate payload refuses, never spins (r17)") {
    // corrupt BSIZE to cut the deflate stream at a valid prefix:
    // inflate() then returns 0 wanting more input forever — memberAt
    // must refuse the member, not hang the task
    val good = Bgzf.write(Seq(("payload " * 200).getBytes("UTF-8")))
    val bad = good.clone()
    // BSIZE lives in the BC extra subfield at offset 16..17 (little
    // endian, total-1); shrink it by 30 bytes
    val bsize = ((bad(16) & 0xff) | ((bad(17) & 0xff) << 8)) - 30
    bad(16) = (bsize & 0xff).toByte
    bad(17) = ((bsize >> 8) & 0xff).toByte
    val t0 = System.nanoTime()
    assert(Bgzf.memberAt(bad, 0) == null)
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "must not spin")
  }

  test("writeShards routes NULL keys to shard 0 (r17)") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-bgzf-nulkey").toString
    val df = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "nullkey"))
      .toDF("doc_id", "text")
    Bgzf.writeShards(df, "doc_id", "text", dir, 2)
    assert(Bgzf.readBgzfFiles(spark, dir).count() === 2L)
  }

  test("refusals and damage containment") {
    val dir = Files.createTempDirectory("graft-bgzf").toString
    // plain gzip (no BC subfield) refuses with guidance
    val plain = s"$dir/plain.gz"
    Files.write(java.nio.file.Paths.get(plain),
      Compression.encode("not blocked".getBytes("UTF-8"), "gzip"))
    val e = intercept[IllegalArgumentException] {
      Bgzf.readBgzf(spark, plain)
    }
    assert(e.getMessage.contains("Compression.decode"))
    // oversized chunk refuses at write
    intercept[IllegalArgumentException] {
      Bgzf.write(Seq(new Array[Byte](Bgzf.MaxChunk + 1)))
    }
    // flip a byte inside one member's deflate data: that member's CRC
    // fails and the chain stops there FOR ITS RANGE; earlier members
    // survive (single-range read → prefix survives)
    val chunks = chunksFor(20)
    val good = Bgzf.write(chunks)
    val bad = good.clone()
    // find the 10th member's start by walking the chain
    var off = 0
    for (_ <- 0 until 10) {
      val m = Bgzf.memberAt(good, off)
      off += m._2
    }
    bad(off + 20) = (bad(off + 20) ^ 0x40).toByte
    val badPath = s"$dir/bad.bgz"
    Files.write(java.nio.file.Paths.get(badPath), bad)
    val rows = Bgzf.readBgzf(spark, badPath).collect().sortBy(_.getLong(0))
    assert(rows.length >= 10 && rows.length < 20)
    rows.take(10).zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Array[Byte]](1).toSeq == chunks(i).toSeq)
    }
  }
}
