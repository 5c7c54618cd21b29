package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** USTAR tar-shard export: lossless binary round trip, deterministic
  * shard layout, header validity against an independent decode, and the
  * no-throw posture on malformed archives.
  */
class TarShardsSpec extends SparkTestBase {
  import spark.implicits._

  test("round trip: binary content with zero and high bytes survives") {
    val dir = Files.createTempDirectory("graft-tar").toString + "/s"
    val rows = Seq(
      ("a", Array[Byte](0, 1, 2, 127, -1, -128)),
      ("b", Array.emptyByteArray),
      ("c", Array.tabulate[Byte](1500)(i => (i % 251).toByte))) // > 2 blocks
    TarShards.write(rows.toDF("name", "content"), "name", "content", dir, 2)
    val got = TarShards.read(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(got.keySet === Set("a", "b", "c"))
    rows.foreach { case (k, v) => assert(got(k) === v.toSeq, k) }
  }

  test("headers parse with an independent USTAR decode") {
    val h = TarShards.headerFor("doc-42", 1234L)
    assert(h.length === 512)
    assert(new String(h, 257, 5, "ISO-8859-1") === "ustar")
    assert(java.lang.Long.parseLong(
      new String(h, 124, 11, "ISO-8859-1"), 8) === 1234L)
    // checksum recomputes: sum with chksum field spaced out
    val copy = h.clone()
    java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
    val sum = copy.map(_ & 0xFF).sum
    assert(java.lang.Long.parseLong(
      new String(h, 148, 6, "ISO-8859-1"), 8) === sum)
  }

  test("shard layout is deterministic and every member lands in its hash shard") {
    // 40 keys cover all 4 shard ids with overwhelming probability; assert
    // coverage up front so a missing file can never pass silently
    val rows = (0 until 40).map(i => (s"k$i", s"payload-$i".getBytes("UTF-8")))
    val expectShard = rows.map { case (k, _) =>
      k -> (graft.llmops.Similarity.portable60Of(k) % 4).toInt
    }.toMap
    assert(expectShard.values.toSet === Set(0, 1, 2, 3),
      "fixture must cover every shard id")
    val d1 = Files.createTempDirectory("graft-tar-d1").toString + "/s"
    val d2 = Files.createTempDirectory("graft-tar-d2").toString + "/s"
    TarShards.write(rows.toDF("name", "content"), "name", "content", d1, 4)
    TarShards.write(rows.toDF("name", "content"), "name", "content", d2, 4)
    (0 until 4).foreach { s =>
      val f1 = java.nio.file.Paths.get(d1, f"shard-$s%05d.tar")
      val f2 = java.nio.file.Paths.get(d2, f"shard-$s%05d.tar")
      assert(java.nio.file.Files.exists(f1), s"shard $s missing in d1")
      assert(java.nio.file.Files.exists(f2), s"shard $s missing in d2")
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(f1),
        java.nio.file.Files.readAllBytes(f2)), s"shard $s differs")
    }
    // each tar's members all hash to the shard id in its filename: read
    // every shard file in isolation and check its member names
    var total = 0
    (0 until 4).foreach { s =>
      val solo = Files.createTempDirectory(s"graft-tar-solo$s").toString
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(d1, f"shard-$s%05d.tar"),
        java.nio.file.Paths.get(solo, f"shard-$s%05d.tar"))
      val names = TarShards.read(spark, solo).select("name")
        .collect().map(_.getString(0))
      assert(names.nonEmpty, s"shard $s file is empty")
      names.foreach { n =>
        assert(expectShard(n) === s,
          s"$n in shard file $s, expected ${expectShard(n)}")
      }
      total += names.length
    }
    assert(total === 40, "every member must be readable back")
  }

  test("truncated and garbage archives parse to partial/empty, never throw") {
    val dir = Files.createTempDirectory("graft-tar-bad").toString + "/s"
    TarShards.write(Seq(("k", "hello".getBytes("UTF-8")))
      .toDF("name", "content"), "name", "content", dir, 1)
    val tar = java.nio.file.Paths.get(dir, "shard-00000.tar")
    val bytes = java.nio.file.Files.readAllBytes(tar)
    // mutating behind Hadoop's back invalidates its .crc sidecar — drop it
    // (production writes go through the FS API; this corruption is staged)
    def dropCrc(): Unit = {
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dir, ".shard-00000.tar.crc"))
      ()
    }
    // truncate mid-member and overwrite with garbage in turn
    java.nio.file.Files.write(tar,
      java.util.Arrays.copyOfRange(bytes, 0, 600))
    dropCrc()
    assert(TarShards.read(spark, dir).count() === 1) // header+partial data ends parse
    java.nio.file.Files.write(tar, Array.fill[Byte](700)(0x5A))
    dropCrc()
    val n = TarShards.read(spark, dir).count() // garbage: parses nothing real
    assert(n >= 0) // no throw is the contract
  }

  test("a failed export deletes its partial tar (no valid-looking archive missing members)") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tar-abort").toString
    // member 25 carries an over-long name: headerFor refuses mid-shard
    val docs = (0 until 40).map(i =>
      (if (i == 25) "n" * 101 else s"d$i", s"body $i".getBytes("UTF-8")))
      .toDF("name", "content")
    intercept[Exception] {
      TarShards.write(docs, "name", "content", dir, nShards = 1)
    }
    val leftover = new java.io.File(dir).listFiles()
    assert(leftover == null || !leftover.exists(_.getName.endsWith(".tar")),
      s"partial tar survived: ${leftover.map(_.getName).mkString(",")}")
  }

  test("compressed tar shards (.tar.zst / .tar.bz2) read like plain tars") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (s"d$i", s"tar body $i".getBytes))
      .toDF("name", "content")
    val dir = java.nio.file.Files.createTempDirectory("tarz").toString
    TarShards.write(docs, "name", "content", dir, nShards = 2)
    // wrap each written tar with a codec and a matching extension
    for ((f, codec) <- new java.io.File(dir).listFiles()
        .filterNot(_.getName.startsWith(".")).sortBy(_.getName)
        .zip(Seq("zstd", "bzip2"))) {
      val raw = java.nio.file.Files.readAllBytes(f.toPath)
      java.nio.file.Files.write(new java.io.File(dir,
        f.getName + Compression.extension(codec)).toPath,
        Compression.encode(raw, codec))
      f.delete()
    }
    val back = TarShards.read(spark, dir)
    assert(back.count() == 40L)
    val one = back.filter(org.apache.spark.sql.functions.col("name") === "d7")
      .select("content").as[Array[Byte]].collect()(0)
    assert(new String(one) == "tar body 7")
  }
}
