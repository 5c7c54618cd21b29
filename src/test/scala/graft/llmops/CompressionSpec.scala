package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The compression front door: sniff + decode dispatch across the codec
  * family, the document-pipeline integration (sniffMime labels,
  * decompress-then-extract, single-level recursion guard), the
  * DecompressBytes expression, and codec JSONL shard round-trips.
  */
class CompressionSpec extends SparkTestBase {
  import spark.implicits._

  private val text = ("compressed corpora are the norm: wikipedia dumps " +
    "ship bz2, the pile shipped xz, dolma ships zstd. ") * 40

  test("sniffCodec recognizes every codec magic and rejects others") {
    for (c <- Compression.Codecs) {
      val enc = Compression.encode(text.getBytes, c)
      assert(Compression.sniffCodec(enc) === Some(c), c)
      assert(java.util.Arrays.equals(Compression.decodeAuto(enc), text.getBytes), c)
    }
    assert(Compression.sniffCodec("plain old text here".getBytes).isEmpty)
    assert(Compression.sniffCodec(Array[Byte](1, 2, 3)).isEmpty)
    assert(Compression.decodeAuto("plain old text here".getBytes) == null)
  }

  test("sniffMime labels compressed containers; extractText unwraps them") {
    for (c <- Compression.Codecs) {
      val enc = Compression.encode(text.getBytes, c)
      val mime = Compression.codecMime(c)
      assert(DocumentText.sniffMime(enc) === Some(mime), c)
      val out = DocumentText.extractText(enc, mime)
      assert(out.exists(_.contains("wikipedia dumps")), s"$c extract")
      // and the auto path sniffs + unwraps in one step
      val auto = DocumentText.extractText(enc, "auto")
      assert(auto.exists(_.contains("wikipedia dumps")), s"$c auto")
    }
  }

  test("extractText unwraps one level only (no recursive decompress)") {
    val inner = Compression.encode(text.getBytes, "bzip2")
    val outer = Compression.encode(inner, "zstd")
    assert(DocumentText.extractText(outer, "application/zstd").isEmpty)
  }

  test("compressed HTML payload extracts through the html arm") {
    val html = "<html><head><title>T</title></head><body><p>Crawl body text" +
      " survives the gzip wrap.</p></body></html>"
    val enc = Compression.encode(html.getBytes, "gzip")
    val out = DocumentText.extractText(enc, "auto")
    assert(out.exists(_.contains("survives the gzip wrap")))
  }

  test("DecompressBytes expression decompresses in the scan projection") {
    val rows = Compression.Codecs.map { c =>
      (c, Compression.encode(s"payload via $c".getBytes, c))
    } :+ (("junk", "not compressed".getBytes))
    val df = rows.toDF("codec", "content")
    val B = org.apache.spark.sql.graft.ColumnBridge
    val out = df.select(col("codec"),
        B.column(graft.expressions.DecompressBytes(
          B.expressionEager(col("content")))).as("plain"))
      .withColumn("text", col("plain").cast("string"))
      .collect()
      .map(r => r.getString(0) -> Option(r.getAs[String]("text"))).toMap
    for (c <- Compression.Codecs)
      assert(out(c) === Some(s"payload via $c"), c)
    assert(out("junk").isEmpty)
  }

  test("streaming shard ingest: files landing after the first batch arrive") {
    val docsA = (0L until 60L).map(i => (i, s"early $i")).toDF("doc_id", "text")
    val docsB = (100L until 140L).map(i => (i, s"late $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shards_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("shards_ckpt").toString
    TrainExport.writeShardsJsonlCodec(docsA, "doc_id", 2, dir, "zstd")
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    def runOnce(): Long = {
      val q = TrainExport.readJsonlShardsStream(spark, dir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(batch.count()); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      seen.get()
    }
    assert(runOnce() === 60L)
    // a producer lands more shards (different codec, same directory)
    TrainExport.writeShardsJsonlCodec(docsB, "doc_id", 2,
      java.nio.file.Files.createTempDirectory("tmpb").toString, "bzip2")
    // move them in under new names (overwrite-mode writers reuse names)
    val extra = new java.io.File(dir)
    TrainExport.writeShardsJsonlCodec(docsB, "doc_id", 2, dir + "_b", "bzip2")
    new java.io.File(dir + "_b").listFiles()
      .filterNot(_.getName.startsWith("."))
      .foreach(f => java.nio.file.Files.move(f.toPath,
        new java.io.File(extra, "late-" + f.getName).toPath))
    assert(runOnce() === 100L, "the second pass picks up only the new files")
  }

  test("codec JSONL shards: failed export leaves the previous export intact") {
    val dir = java.nio.file.Files.createTempDirectory("shards_staged").toString
    val good = (0L until 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    TrainExport.writeShardsJsonlCodec(good, "doc_id", 2, dir, "zstd")
    assert(TrainExport.readJsonlShards(spark, dir).count() === 50L)
    // an export whose job fails mid-write (poisoned row) must not destroy
    // the existing export — the write is staged and only swapped on success
    val boom = org.apache.spark.sql.functions.udf { (i: Long) =>
      if (i == 13L) throw new RuntimeException("poison") else s"doc $i"
    }
    val bad = (0L until 50L).toDF("doc_id")
      .withColumn("text", boom(col("doc_id")))
    intercept[Exception] {
      TrainExport.writeShardsJsonlCodec(bad, "doc_id", 2, dir, "zstd")
    }
    assert(TrainExport.readJsonlShards(spark, dir).count() === 50L,
      "old export must survive a failed overwrite")
    // no staging residue alongside the target
    val parent = new java.io.File(dir).getParentFile
    val base = new java.io.File(dir).getName
    assert(!parent.listFiles().exists(_.getName.startsWith(base + ".__staging")),
      "failed export must sweep its staging dir")
    // an orphan from a JVM-killed run (catch block never ran) is swept by
    // the next export rather than accumulating forever
    val orphan = new java.io.File(parent, base + ".__staging-deadbeef")
    orphan.mkdirs()
    new java.io.FileOutputStream(new java.io.File(orphan, "shard-00000.jsonl.zst"))
      .close()
    TrainExport.writeShardsJsonlCodec(good, "doc_id", 2, dir, "zstd")
    assert(!orphan.exists(), "next export must sweep prior-run orphans")
    assert(TrainExport.readJsonlShards(spark, dir).count() === 50L)
  }

  test("codec JSONL shards roundtrip through write + read") {
    val docs = (0L until 200L).map(i => (i, s"document body $i")).toDF("doc_id", "text")
    for (c <- Seq("bzip2", "zstd", "xz")) {
      val dir = java.nio.file.Files.createTempDirectory(s"shards_$c").toString
      TrainExport.writeShardsJsonlCodec(docs, "doc_id", 4, dir, c)
      val files = new java.io.File(dir).listFiles().map(_.getName)
        .filterNot(_.startsWith(".")).sorted // hadoop .crc sidecars
      assert(files.length === 4, s"$c files: ${files.mkString(",")}")
      assert(files.forall(_.endsWith(".jsonl" + Compression.extension(c))))
      val back = TrainExport.readJsonlShards(spark, dir)
      assert(back.count() === 200L, c)
      val parsed = back.select(from_json(col("line"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType)))).as("j"))
        .select("j.doc_id", "j.text")
      val ids = parsed.select("doc_id").as[Long].collect().sorted
      assert(ids === (0L until 200L).toArray, c)
    }
  }
}
