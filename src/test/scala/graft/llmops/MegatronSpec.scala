package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MegatronSpec extends SparkTestBase {

  private def pair(sizes: Seq[Int], dtype: String,
      tokens: Seq[Long]): (Array[Byte], Array[Byte]) = {
    val widths = Map("uint8" -> 1, "int8" -> 1, "int16" -> 2, "uint16" -> 2,
      "int32" -> 4, "int64" -> 8)
    val w = widths(dtype)
    val bin = new java.io.ByteArrayOutputStream()
    tokens.foreach { v =>
      var k = 0
      while (k < w) { bin.write(((v >>> (8 * k)) & 0xff).toInt); k += 1 }
    }
    (Megatron.idxBytes(sizes, dtype), bin.toByteArray)
  }

  test("idx+bin round-trips every integer dtype incl. signed negatives") {
    val cases = Seq(
      ("uint8", Seq(0L, 1L, 255L)),
      ("int8", Seq(-128L, -1L, 127L)),
      ("int16", Seq(-32768L, -7L, 32767L)),
      ("uint16", Seq(0L, 40000L, 65535L)),
      ("int32", Seq(Int.MinValue.toLong, -5L, Int.MaxValue.toLong)),
      ("int64", Seq(Long.MinValue, -9L, Long.MaxValue)))
    cases.foreach { case (dtype, toks) =>
      val (idx, bin) = pair(Seq(1, 2), dtype, toks)
      val back = Megatron.parsePair(idx, bin)
      assert(back != null, dtype)
      assert(back.map(_.toSeq).toSeq == Seq(Seq(toks.head), toks.tail),
        dtype)
    }
  }

  test("structural violations refuse the pair wholesale") {
    val (idx, bin) = pair(Seq(2, 1), "uint16", Seq(1L, 2L, 3L))
    assert(Megatron.parsePair(idx, bin) != null)
    val badMagic = idx.clone(); badMagic(0) = 'X'.toByte
    assert(Megatron.parsePair(badMagic, bin) == null)
    val badVersion = idx.clone(); badVersion(9) = 2
    assert(Megatron.parsePair(badVersion, bin) == null)
    val floatDtype = idx.clone(); floatDtype(17) = 6
    assert(Megatron.parsePair(floatDtype, bin) == null)
    val badPtr = idx.clone()
    badPtr(34 + 8 + 8) = 99 // second pointer no longer the running sum
    assert(Megatron.parsePair(badPtr, bin) == null)
    assert(Megatron.parsePair(idx, bin ++ Array[Byte](0)) == null)
    assert(Megatron.parsePair(idx.dropRight(1), bin) == null)
    val badDoc = idx.clone()
    badDoc(idx.length - 8) = 9 // doc_idx beyond nSeqs
    assert(Megatron.parsePair(badDoc, bin) == null)
    assert(Megatron.parsePair(null, bin) == null)
    assert(Megatron.parsePair(idx, null) == null)
  }

  test("shard write + readIndexed is the identity on token streams") {
    val ss = spark
    import ss.implicits._
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        transform(sequence(lit(0), col("doc_id") % 5),
          i => (col("doc_id") * 7 + i) % 60000).as("toks"))
    val expected = df.select(col("doc_id"), col("toks"))
      .as[(Long, Seq[Long])].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-mmidx")
      .toString + "/ds"
    Megatron.writeIndexed(df, "doc_id", "toks", 4, dir, "uint16")
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(names.count(_.endsWith(".bin")) == 4)
    assert(names.count(_.endsWith(".idx")) == 4)
    val back = Megatron.readIndexed(spark, dir)
      .select(col("file"), col("seq"), col("tokens"))
      .as[(String, Long, Seq[Long])].collect()
    assert(back.length == expected.size)
    // every read-back stream appears among the expected ones, in the
    // deterministic hash order within its shard
    val seen = back.map(_._3).toSet
    expected.values.foreach(t => assert(seen.contains(t)))
    back.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (0L until rows.length).toSeq)
    }
  }

  test("streamed idx+bin export is byte-deterministic across runs") {
    val ss = spark
    import ss.implicits._
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 80)
      .select(col("doc_id"),
        transform(sequence(lit(0), col("doc_id") % 7),
          i => (col("doc_id") * 13 + i) % 60000).as("toks"))
    val dirs = (0 until 2).map { _ =>
      val d = java.nio.file.Files.createTempDirectory("graft-mmdet")
        .toString + "/ds"
      Megatron.writeIndexed(df, "doc_id", "toks", 3, d, "uint16")
      d
    }
    for (s <- 0 until 3; ext <- Seq(".bin", ".idx")) {
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        dirs(0), f"shard-$s%05d$ext"))
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        dirs(1), f"shard-$s%05d$ext"))
      assert(java.util.Arrays.equals(a, b), s"shard $s$ext differs")
    }
  }

  test("out-of-range tokens fail the write, never wrap silently") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, Seq(1L, 70000L))).toDF("doc_id", "toks")
    val dir = java.nio.file.Files.createTempDirectory("graft-mmrange")
      .toString + "/ds"
    val e = intercept[Exception] {
      Megatron.writeIndexed(df, "doc_id", "toks", 1, dir, "uint16")
    }
    assert(e.getMessage != null)
    def rootMsg(t: Throwable): String =
      if (t.getCause == null) String.valueOf(t.getMessage)
      else rootMsg(t.getCause)
    assert(rootMsg(e).contains("out of uint16 range"))
  }

  test("unknown dtype and non-array columns refuse at plan time") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, Seq(1L))).toDF("doc_id", "toks")
    intercept[IllegalArgumentException] {
      Megatron.writeIndexed(df, "doc_id", "toks", 1, "/tmp/never", "float32")
    }
    val bad = Seq((1L, "text")).toDF("doc_id", "toks")
    intercept[IllegalArgumentException] {
      Megatron.writeIndexed(bad, "doc_id", "toks", 1, "/tmp/never")
    }
  }

  test("BPE tokens → vocab ids → indexed shards → read-back end-to-end") {
    val ss = spark
    import ss.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 60).select(col("doc_id"), col("text"))
    val merges = Bpe.train(docs, "text", numMerges = 30)
    val tokenized = docs.select(col("doc_id"),
      Bpe.encode(col("text"), merges).as("toks"))
    val vocab = Megatron.buildVocab(tokenized, "toks")
    val vmap = vocab.as[(String, Int)].collect().toMap
    // dense ranks from 0, sorted order
    assert(vmap.values.toSeq.sorted == (0 until vmap.size))
    assert(vmap.keys.toSeq.sorted.zipWithIndex.forall {
      case (t, i) => vmap(t) == i })
    val withIds = Megatron.encodeIds(tokenized, "doc_id", "toks", vocab)
    val expected = tokenized.as[(Long, Seq[String])].collect().toMap
      .map { case (id, toks) => id -> toks.map(t => vmap(t).toLong) }
    val dir = java.nio.file.Files.createTempDirectory("graft-mmbpe")
      .toString + "/ds"
    Megatron.writeIndexed(withIds.select(col("doc_id"), col("token_ids")),
      "doc_id", "token_ids", 2, dir, "uint16")
    val back = Megatron.readIndexed(spark, dir)
      .select(col("tokens")).as[Seq[Long]].collect().toSet
    expected.values.foreach(t => assert(back.contains(t)))
  }

  test("null token elements and duplicate encode keys refuse loudly (r17)") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mega-null").toString
    val df = Seq((1L, Seq[java.lang.Long](5L, null, 9L)))
      .toDF("doc_id", "tokens")
    val e = intercept[org.apache.spark.SparkException] {
      Megatron.writeIndexed(df, "doc_id", "tokens", 1, dir, "uint16")
    }
    assert(e.getMessage != null)
    // encodeIds: duplicate keys would merge token streams — refuse
    val vocab = Seq(("a", 0), ("b", 1)).toDF("token", "id")
    val dup = Seq((1L, Seq("a", "b")), (1L, Seq("b")))
      .toDF("doc_id", "tokens")
    val e2 = intercept[IllegalArgumentException] {
      Megatron.encodeIds(dup, "doc_id", "tokens", vocab)
    }
    assert(e2.getMessage.contains("not unique"))
  }

  test("encodeIds: empty arrays and OOV tokens") {
    val ss = spark
    import ss.implicits._
    val vocab = Seq(("aa", 0), ("bb", 1)).toDF("token", "id")
    val df = Seq(
      (1L, Seq("bb", "aa", "bb")),
      (2L, Seq.empty[String]),
      (3L, Seq("aa", "zz"))).toDF("doc_id", "toks")
    val out = Megatron.encodeIds(df, "doc_id", "toks", vocab)
      .select(col("doc_id"), col("token_ids"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L) == Seq(1, 0, 1))
    assert(out(2L) == Seq.empty[Int])
    assert(out(3L) == Seq(0, 2)) // zz → OOV id = max+1
  }
}
