package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TfRecordSpec extends SparkTestBase {
  import TfRecord._

  // ------------------------------------------------------------- framing

  test("record framing round-trips and verifies both CRCs") {
    val payloads = Seq("", "a", "hello tfrecord", "x" * 10000)
      .map(_.getBytes("UTF-8"))
    val out = new java.io.ByteArrayOutputStream()
    payloads.foreach(writeRecord(out, _))
    val back = readRecords(out.toByteArray)
    assert(back.map(new String(_, "UTF-8")) ==
      payloads.map(new String(_, "UTF-8")).toVector)
  }

  test("corrupt payload CRC drops the record and the unreachable tail") {
    val out = new java.io.ByteArrayOutputStream()
    writeRecord(out, "first".getBytes)
    val cut = out.size()
    writeRecord(out, "second".getBytes)
    writeRecord(out, "third".getBytes)
    val bytes = out.toByteArray
    bytes(cut + 12 + 1) = (bytes(cut + 12 + 1) ^ 0x40).toByte // in "second"
    val back = readRecords(bytes)
    assert(back.map(new String(_, "UTF-8")) == Vector("first"))
  }

  test("corrupt length CRC and truncation refuse cleanly") {
    val out = new java.io.ByteArrayOutputStream()
    writeRecord(out, "only".getBytes)
    val bytes = out.toByteArray
    val lenCrcHit = bytes.clone(); lenCrcHit(8) = (lenCrcHit(8) ^ 1).toByte
    assert(readRecords(lenCrcHit).isEmpty)
    assert(readRecords(bytes.dropRight(2)).isEmpty)
    assert(readRecords(Array.emptyByteArray).isEmpty)
    assert(readRecords(null).isEmpty)
  }

  // ------------------------------------------------------------ protobuf

  test("Example encode/decode round-trips all three feature kinds") {
    val feats = Seq(
      "text" -> BytesFeature(Vector("héllo".getBytes("UTF-8"),
        Array[Byte](0, 1, -1))),
      "ids" -> Int64Feature(Vector(0L, 1L, -1L, Long.MaxValue, Long.MinValue)),
      "score" -> FloatFeature(Vector(0f, -1.5f, 3.25e7f)))
    val back = decodeExample(encodeExample(feats))
    assert(back.map(_._1) == Vector("text", "ids", "score"))
    val bf = back(0)._2.asInstanceOf[BytesFeature]
    assert(bf.values.map(new String(_, "UTF-8")) ==
      Vector("héllo", new String(Array[Byte](0, 1, -1), "UTF-8")))
    assert(back(1)._2 == Int64Feature(Vector(0L, 1L, -1L, Long.MaxValue,
      Long.MinValue)))
    assert(back(2)._2 == FloatFeature(Vector(0f, -1.5f, 3.25e7f)))
  }

  test("decode skips unknown fields and accepts unpacked int64/float") {
    // Hand-built Example: features(1){ entry{ key "n", Feature{
    //   int64_list(3){ value UNPACKED varint 7; value 9 } } } } with an
    // extra unknown field 9 (varint 5) at Example level.
    def varint(v: Long): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      var x = v
      while ((x & ~0x7fL) != 0) { o.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      o.write(x.toInt); o.toByteArray
    }
    def delim(field: Int, body: Array[Byte]): Array[Byte] =
      varint((field << 3) | 2) ++ varint(body.length.toLong) ++ body
    val int64List = varint(1 << 3) ++ varint(7) ++ varint(1 << 3) ++ varint(9)
    val feature = delim(3, int64List)
    val entry = delim(1, "n".getBytes) ++ delim(2, feature)
    val ex = delim(1, delim(1, entry)) ++ varint((9 << 3) | 0) ++ varint(5)
    val back = decodeExample(ex)
    assert(back == Vector("n" -> Int64Feature(Vector(7L, 9L))))
  }

  test("malformed Examples refuse to null") {
    assert(decodeExample(Array[Byte](0x0a, 0x7f)) == null) // overlong length
    assert(decodeExample("random garbage bytes".getBytes) == null)
  }

  // ------------------------------------------------------- Spark surface

  test("shard write + readExamples is the identity (plain and gzip)") {
    val ss = spark
    import ss.implicits._
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 120)
      .select(col("doc_id"), col("text"),
        array(col("doc_id") * 2, col("doc_id") * 2 + 1).as("pair"),
        (col("doc_id") / 4.0).as("w"))
    val expected = df.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    for (gz <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory("graft-tfrec")
        .toString + "/sh"
      TfRecord.writeShards(df, "doc_id", 4, dir, gzip = gz)
      val files = new java.io.File(dir).listFiles().map(_.getName)
        .filterNot(_.startsWith(".")).sorted // drop Hadoop .crc sidecars
      assert(files.length == 4)
      val ext = if (gz) ".tfrecord.gz" else ".tfrecord"
      assert(files.forall(f => f.startsWith("shard-") && f.endsWith(ext)))
      val back = TfRecord.readExamples(spark, dir)
        .select(
          element_at(col("int64_feats"), "doc_id").getItem(0).as("doc_id"),
          decode(element_at(col("bytes_feats"), "text").getItem(0), "UTF-8")
            .as("text"),
          element_at(col("int64_feats"), "pair").as("pair"),
          element_at(col("float_feats"), "w").getItem(0).as("w"))
      val rows = back.collect().sortBy(_.getLong(0))
      assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq == expected)
      rows.foreach { r =>
        val id = r.getLong(0)
        assert(r.getSeq[Long](2) == Seq(id * 2, id * 2 + 1))
        assert(math.abs(r.getDouble(3) - id / 4.0) < 1e-6)
      }
    }
  }

  test("readExamples accepts globs and single files, not only dirs (r17)") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tfr-glob").toString
    val df = (0 until 20).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    TfRecord.writeShards(df, "doc_id", nShards = 2, path = dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).sorted
    assert(TfRecord.readExamples(spark, dir).count() === 20L) // dir
    assert(TfRecord.readExamples(spark,
      s"$dir/shard-*.tfrecord").count() === 20L) // glob
    assert(TfRecord.readExamples(spark,
      files.head.getAbsolutePath).count() > 0L) // single file
  }

  test("streamed shard export is byte-deterministic across runs") {
    val ss = spark
    import ss.implicits._
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 150)
      .select(col("doc_id"), col("text"))
    for (gz <- Seq(false, true)) {
      val ext = if (gz) ".tfrecord.gz" else ".tfrecord"
      val dirs = (0 until 2).map { _ =>
        val d = java.nio.file.Files.createTempDirectory("graft-tfdet")
          .toString + "/sh"
        TfRecord.writeShards(df, "doc_id", 3, d, gzip = gz)
        d
      }
      (0 until 3).foreach { s =>
        val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          dirs(0), f"shard-$s%05d$ext"))
        val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          dirs(1), f"shard-$s%05d$ext"))
        assert(java.util.Arrays.equals(a, b), s"shard $s$ext differs")
      }
    }
  }

  test("shard assignment matches the portable hash (trainer determinism)") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (42L, "c")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tfdet")
      .toString + "/sh"
    TfRecord.writeShards(df, "doc_id", 3, dir)
    val byFile = TfRecord.readExamples(spark, dir)
      .select(col("file"),
        element_at(col("int64_feats"), "doc_id").getItem(0).as("doc_id"))
      .as[(String, Long)].collect()
    byFile.foreach { case (file, id) =>
      val want = java.lang.Math.floorMod(
        Similarity.portable60Of(id.toString), 3L)
      assert(file.contains(f"shard-$want%05d"), s"doc $id in $file")
    }
  }

  test("unsupported column types refuse at plan time") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, Map("k" -> 1))).toDF("doc_id", "m")
    val e = intercept[IllegalArgumentException] {
      TfRecord.writeShards(df, "doc_id", 2, "/tmp/never")
    }
    assert(e.getMessage.contains("no TFRecord feature mapping"))
  }

  test("null values become empty feature lists, not crashes") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, "has text"), (2L, null: String)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tfnull")
      .toString + "/sh"
    TfRecord.writeShards(df, "doc_id", 1, dir)
    val back = TfRecord.readExamples(spark, dir)
      .select(
        element_at(col("int64_feats"), "doc_id").getItem(0).as("doc_id"),
        size(element_at(col("bytes_feats"), "text")).as("n_text"))
      .as[(Long, Int)].collect().sortBy(_._1)
    assert(back.toSeq == Seq((1L, 1), (2L, 0)))
  }

  test("a corrupt shard keeps its prefix; other shards are unaffected") {
    val ss = spark
    import ss.implicits._
    val df = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tfcor")
      .toString + "/sh"
    TfRecord.writeShards(df, "doc_id", 2, dir)
    val f0 = new java.io.File(dir, "shard-00000.tfrecord")
    val bytes = java.nio.file.Files.readAllBytes(f0.toPath)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x11).toByte
    java.nio.file.Files.write(f0.toPath, bytes)
    // the Hadoop checksum sidecar now disagrees with the mutated file
    new java.io.File(dir, ".shard-00000.tfrecord.crc").delete()
    val shard1Rows = (0L until 40L).count(i =>
      java.lang.Math.floorMod(Similarity.portable60Of(i.toString), 2L) == 1L)
    val perFile = TfRecord.readExamples(spark, dir)
      .groupBy("file").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // shard 1 intact, shard 0 reduced to the prefix before the corruption
    assert(perFile.collect {
      case (f, n) if f.contains("shard-00001") => n }.sum == shard1Rows)
    assert(perFile.collect {
      case (f, n) if f.contains("shard-00000") => n }.sum < 40L - shard1Rows)
  }
}
