package graft.llmops

import graft.SparkTestBase
import java.nio.file.Files

/** Block-parallel xz: the index-driven splittable read over multi-block
  * files — `xz -T`/`--block-size` output and the twin's encodeBlocks
  * both carry the index the reader uses.
  */
class XzBlocksSpec extends SparkTestBase {

  test("twin multi-block roundtrip; xz CLI decodes the twin") {
    val chunks = (0 until 30).map(i =>
      (s"xz block $i " + ("lorem " * (i % 8 + 1))).getBytes("UTF-8"))
    val dir = Files.createTempDirectory("graft-xzb").toString
    val path = s"$dir/c.xz"
    Files.write(java.nio.file.Paths.get(path),
      XzWriter.encodeBlocks(chunks))
    for (groupBytes <- Seq(4 << 20, 64)) {
      val rows = XzLzma.readXzBlocks(spark, path, groupBytes).collect()
        .sortBy(_.getLong(0))
      assert(rows.length == 30, s"groupBytes=$groupBytes")
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Array[Byte]](1).toSeq == chunks(i).toSeq)
      }
    }
    // the reference CLI accepts the twin's multi-block container
    val rc = new ProcessBuilder("sh", "-c",
      s"xz -dc '$path' > '$dir/out.bin'").inheritIO().start().waitFor()
    assert(rc == 0)
    assert(Files.readAllBytes(java.nio.file.Paths.get(s"$dir/out.bin"))
      .toSeq == chunks.flatten.toSeq)
    // the repo's own sequential decoder agrees
    val whole = XzLzma.decode(
      Files.readAllBytes(java.nio.file.Paths.get(path)))
    assert(whole != null && whole.toSeq == chunks.flatten.toSeq)
  }

  test("CLI multi-block files (real LZMA entropy) read block-parallel") {
    val dir = Files.createTempDirectory("graft-xzb").toString
    val data = (0 until 4000).map(i =>
      s"line $i of the corpus body with some repetition repetition\n")
      .mkString.getBytes("UTF-8")
    Files.write(java.nio.file.Paths.get(s"$dir/raw.bin"), data)
    val rc = new ProcessBuilder("sh", "-c",
      s"xz --block-size=16384 -6 -k -f '$dir/raw.bin'")
      .inheritIO().start().waitFor()
    assert(rc == 0)
    val rows = XzLzma.readXzBlocks(spark, s"$dir/raw.bin.xz")
      .collect().sortBy(_.getLong(0))
    assert(rows.length > 1, "CLI fixture must be multi-block")
    val joined = rows.flatMap(_.getAs[Array[Byte]](1))
    assert(joined.toSeq == data.toSeq)
  }

  test("shard protocol: distributed export, one-plan multi-file read") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-xz-sh").toString
    val df = (0 until 300).map(i => (i.toLong, s"xdoc $i " + ("q" * (i % 11))))
      .toDF("doc_id", "text")
    XzWriter.writeShards(df, "doc_id", "text", dir, 4)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".xz")).sortBy(_.getName)
    assert(shards.length == 4)
    // xz CLI accepts a shard whole (one stream, many blocks)
    val p = new ProcessBuilder("xz", "-dc", shards.head.getPath)
      .redirectErrorStream(false).start()
    val dec = p.getInputStream.readAllBytes()
    assert(p.waitFor() == 0 && dec.nonEmpty)
    val back = XzLzma.readXzFiles(spark, dir)
    assert(back.schema.fieldNames.toSeq ==
      Seq("path", "block_idx", "content"))
    val texts = back
      .select(org.apache.spark.sql.functions.col("content")
        .cast("string"))
      .collect().map(_.getString(0)).sorted
    assert(texts.toSeq ==
      (0 until 300).map(i => s"xdoc $i " + ("q" * (i % 11))).sorted)
    assert(back.select("path").distinct().count() == 4)
    // byte determinism across identical exports
    val dir2 = Files.createTempDirectory("graft-xz-sh2").toString
    XzWriter.writeShards(df, "doc_id", "text", dir2, 4)
    new java.io.File(dir2).listFiles().filter(_.getName.endsWith(".xz"))
      .sortBy(_.getName).zip(shards).foreach { case (b, a) =>
        assert(java.util.Arrays.equals(
          Files.readAllBytes(a.toPath), Files.readAllBytes(b.toPath)))
      }
  }

  test("empty documents shard losslessly; xz CLI accepts empty blocks") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-xz-empty").toString
    // doc 2 and 5 are empty — the BGZF/zstd siblings accept empty
    // payloads, so the xz protocol must not fail the export
    val df = (0 until 8).map(i =>
      (i.toLong, if (i == 2 || i == 5) "" else s"doc $i"))
      .toDF("doc_id", "text")
    XzWriter.writeShards(df, "doc_id", "text", dir, 2)
    val back = XzLzma.readXzFiles(spark, dir)
      .select(org.apache.spark.sql.functions.col("content").cast("string"))
      .collect().map(_.getString(0)).sorted
    assert(back.count(_.isEmpty) == 2)
    assert(back.filter(_.nonEmpty).toSeq ==
      (0 until 8).filterNot(i => i == 2 || i == 5).map(i => s"doc $i").sorted)
    // the CLI decodes a shard carrying an empty block
    for (f <- new java.io.File(dir).listFiles()
        if f.getName.endsWith(".xz")) {
      val p = new ProcessBuilder("xz", "-dc", f.getPath).start()
      p.getInputStream.readAllBytes()
      assert(p.waitFor() == 0, f.getName)
    }
  }

  test("a failed export deletes its partial shard, never a valid file") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-xz-abort").toString
    // null content NPEs mid-shard executor-side; the task's partial
    // file must not survive as a structurally valid xz missing rows
    val df = (0 until 40).map(i =>
      (i.toLong, if (i == 25) null else s"doc $i"))
      .toDF("doc_id", "text")
    intercept[Exception] {
      XzWriter.writeShards(df, "doc_id", "text", dir, 1)
    }
    val leftover = new java.io.File(dir).listFiles()
    assert(leftover == null || !leftover.exists(_.getName.endsWith(".xz")),
      s"partial shard survived: ${leftover.map(_.getName).mkString(",")}")
  }

  test("refusals: multi-stream concat, damaged block") {
    val dir = Files.createTempDirectory("graft-xzb").toString
    val a = XzWriter.encode("stream one".getBytes("UTF-8"))
    val b = XzWriter.encode("stream two".getBytes("UTF-8"))
    val cat = s"$dir/cat.xz"
    Files.write(java.nio.file.Paths.get(cat), a ++ b)
    val e = intercept[IllegalArgumentException] {
      XzLzma.blockMap(spark.sparkContext.hadoopConfiguration, cat)
    }
    assert(e.getMessage.contains("multi-stream"))
    // sequential decode still handles the concatenation
    assert(new String(XzLzma.decode(a ++ b), "UTF-8") ==
      "stream onestream two")

    // flip a payload byte: the block's check fails loudly
    val chunks = (0 until 6).map(i => s"blk $i data".getBytes("UTF-8"))
    val good = XzWriter.encodeBlocks(chunks)
    val bad = good.clone()
    bad(40) = (bad(40) ^ 0x11).toByte
    val badPath = s"$dir/bad.xz"
    Files.write(java.nio.file.Paths.get(badPath), bad)
    intercept[org.apache.spark.SparkException] {
      XzLzma.readXzBlocks(spark, badPath).collect()
    }
  }
}
