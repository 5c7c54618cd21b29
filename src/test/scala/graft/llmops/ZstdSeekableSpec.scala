package graft.llmops

import graft.SparkTestBase
import java.nio.file.Files

class ZstdSeekableSpec extends SparkTestBase {

  private def chunksFor(n: Int): Seq[Array[Byte]] =
    (0 until n).map { i =>
      (s"chunk $i body " + ("abcdefgh" * (i % 7 + 1)) +
        ("z" * (if (i % 3 == 0) 40 else 0))).getBytes("UTF-8")
    }

  test("frame-parallel read is the identity on chunks, both descriptors") {
    for (withCk <- Seq(true, false)) {
      val chunks = chunksFor(23)
      val bytes = ZstdSeekable.write(chunks, withChecksum = withCk)
      val dir = Files.createTempDirectory("graft-zsk").toString
      val path = s"$dir/c.zst"
      Files.write(java.nio.file.Paths.get(path), bytes)
      val rows = ZstdSeekable.readSeekable(spark, path).collect()
        .sortBy(_.getLong(0))
      assert(rows.length == 23)
      rows.foreach { r =>
        val i = r.getLong(0).toInt
        assert(r.getAs[Array[Byte]](1).toSeq == chunks(i).toSeq)
      }
    }
  }

  test("any conformant zstd decoder decompresses the whole file") {
    val chunks = chunksFor(9)
    val dir = Files.createTempDirectory("graft-zsk").toString
    val path = s"$dir/c.zst"
    Files.write(java.nio.file.Paths.get(path),
      ZstdSeekable.write(chunks))
    // the reference CLI skips the seek-table skippable frame and
    // concatenates the frames — byte identity with the chunk stream.
    // Environments without the CLI still prove whole-file identity
    // through our own multi-frame decoder below.
    val cli = Seq("/usr/bin/zstd", "/usr/local/bin/zstd", "/bin/zstd")
      .map(new java.io.File(_)).find(_.canExecute)
    cli.foreach { bin =>
      val rc = new ProcessBuilder(bin.getPath, "-d", "-f", path,
        "-o", s"$dir/out.bin").inheritIO().start().waitFor()
      assert(rc == 0)
      val got = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/out.bin"))
      assert(got.toSeq == chunks.flatten.toSeq)
    }
    // our own whole-file decoder agrees (multi-frame concat decode)
    val whole = Compression.decode(
      Files.readAllBytes(java.nio.file.Paths.get(path)), "zstd")
    assert(whole != null && whole.toSeq == chunks.flatten.toSeq)
  }

  test("empty documents refuse loudly (a zero-size frame reads as padding)") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("zsk-empty").toString
    val df = (0 until 6).map(i => (i.toLong, if (i == 3) "" else s"doc $i"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      ZstdSeekable.writeShards(df, "doc_id", "text", dir, 1)
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(chain.exists(_.contains("xz/tar")), chain.mkString(" | "))
    val leftover = new java.io.File(dir).listFiles()
    assert(leftover == null || !leftover.exists(_.getName.endsWith(".zst")))
  }

  test("shard protocol: distributed export, grouped multi-file read-back") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-zsk-sh").toString
    val df = (0 until 300).map(i => (i.toLong, s"doc $i " + ("w" * (i % 13))))
      .toDF("doc_id", "text")
    ZstdSeekable.writeShards(df, "doc_id", "text", dir, 4)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".zst")).sortBy(_.getName)
    assert(shards.length == 4)
    val back = ZstdSeekable.readSeekableFiles(spark, dir)
      .select(org.apache.spark.sql.functions.col("content")
        .cast("string").as("text"))
      .collect().map(_.getString(0)).sorted
    val want = (0 until 300).map(i => s"doc $i " + ("w" * (i % 13)))
      .sorted
    assert(back.toSeq == want)
    // tiny group size degrades to per-frame tasks, same rows
    val fine = ZstdSeekable.readSeekableFiles(spark, dir, groupBytes = 1)
      .count()
    assert(fine == 300)
    // byte determinism across runs
    val dir2 = Files.createTempDirectory("graft-zsk-sh2").toString
    ZstdSeekable.writeShards(df, "doc_id", "text", dir2, 4)
    val shards2 = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".zst")).sortBy(_.getName)
    shards.zip(shards2).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(a.toPath), Files.readAllBytes(b.toPath)))
    }
  }

  test("refusals: plain zstd has no footer; damaged entries refuse") {
    val dir = Files.createTempDirectory("graft-zsk").toString
    val plain = s"$dir/plain.zst"
    Files.write(java.nio.file.Paths.get(plain),
      ZstdWriter.encode("not seekable".getBytes("UTF-8")))
    val e = intercept[IllegalArgumentException] {
      ZstdSeekable.readSeekTable(
        spark.sparkContext.hadoopConfiguration, plain)
    }
    assert(e.getMessage.contains("Zstd.decode"))

    val chunks = chunksFor(5)
    val good = ZstdSeekable.write(chunks)
    // oversized entry: coverage check catches table/body disagreement
    val bad = good.clone()
    // first entry's compressed_size lives right after the skippable
    // header at (bodyLen); find it via the table position from the end
    val tableLen = 5 * 12 + 9
    val entryAt = bad.length - 9 - tableLen + 8 - 8
    bad(entryAt + 8) = (bad(entryAt + 8) + 1).toByte
    val badPath = s"$dir/bad.zst"
    Files.write(java.nio.file.Paths.get(badPath), bad)
    intercept[IllegalArgumentException] {
      ZstdSeekable.readSeekTable(
        spark.sparkContext.hadoopConfiguration, badPath)
    }
    // flipped checksum: the frame task refuses loudly
    val ckBad = good.clone()
    val ckAt = ckBad.length - 9 - tableLen + 8 + 8
    ckBad(ckAt) = (ckBad(ckAt) ^ 0x5a).toByte
    val ckPath = s"$dir/ck.zst"
    Files.write(java.nio.file.Paths.get(ckPath), ckBad)
    val ex = intercept[org.apache.spark.SparkException] {
      ZstdSeekable.readSeekable(spark, ckPath).collect()
    }
    assert(ex.getMessage.contains("checksum") ||
      ex.getCause != null)
  }
}
