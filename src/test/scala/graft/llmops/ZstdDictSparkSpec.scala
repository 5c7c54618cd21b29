package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The Spark surface of dictionary zstd: the scan-projection expression
  * and the shard reader's shared-dictionary retry. Fixture = a CLI
  * `zstd -19 -D` shard over three JSONL records.
  */
class ZstdDictSparkSpec extends SparkTestBase {
  import spark.implicits._

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getMimeDecoder.decode(s)

  private val DictB64: String =
    """N6Qw7IS/9ysqEBhZ0wEAAAAAAAAAP8/zPM+zSQolhKRYb9Ja0biujScRIXt3w4dWtXcBQwAA
      |GDBUeFAvHQ4AAARAxshExtJRkKeEsSRjyBgCAAAAAAAAAAAAAAAAAAAA5FydAgAAAAAAAAAA
      |AAAAAAAAAQAAAAQAAAAIAAAAaXRoIGF0IHdpdGggdG9rZW5zIGRvY3VtZW50cyBtb2RlbHMg
      |dGhlIHRyYWluaW5nIHRleHQgYW5kIGRhdGEgc2NhbGUgY3VyYXRlZCBkYXRhIGFuZCBkb2N1
      |bWVudHMKc2FtcGxlIDI3OiB0cmFpbmluZyBkb2N1bWVudHMgZG9jdW1lbnRzIGluZ2VzdHMg
      |ZGF0YSBkYXRhIGRvY3VtZW50cyBhdCBhbmQgd2l0aCBkb2N1bWVudHMgd2l0aCBhdCBhdCBj
      |dXJhdGVkIGxha2UgaW5nZXN0cyBzY2FsZSBpbmdlc3RzIHRleHQgYXQgZGF0YSB0cmFpbmlu
      |ZyBzY2FsZSBmb3IgdG9rZW5zIGZvciBkYXRhIHRva2VucyBhdCBjdXJhdGVkIG1vZGVscyBj
      |dXJhdGVkIHRyYWluaW5nIHRoZSBmb3IgdGV4dCB3aXRoIHRoZSBhdCBhdCBmb3IgdGV4dCBk
      |b2N1bWVudHMgbGFrZSB0b2tlbnMgd2l0aCB0b2tlbnMgZm9yIGluZ2VzdHMgdHJhaW5pbmcg
      |YXQgYW5kIGxha2UgZGF0YSBjdXJhdGVkIG1vZGVscyBkb2N1bWVudHMgc2NhbGUgdHJhaW5p
      |bmcgbW9kZWxzIHNjYWxlIHRoZSBtb2RlbHMgbGFrZSB0aGUgYW5kIHRleHQgd2l0aCBkYXRh
      |IGluZ2VzdHMgdHJhaW5pbmcgd2l0aCB0aGUgY3VyYXRlZCBhdCBsYWtlIHRva2VucyB3aXRo
      |IGN1cmF0ZWQgY3VyYXRlZCBkb2N1bWVudHMgYXQgZm9yIGRvY3VtZW50cyB0ZXh0IGxha2Ug
      |Zm9yIGRvY3VtZW50cyBmb3Igd2l0aCBsYWtlIHRleHQgbW9kZWxzIGF0IGluZ2VzdHMgdGV4
      |dCB0b2tlbnMgY3VyYXRlZCB0aGUgdG9rZW5zIHRoZSBpbmdlc3RzIGxha2UgaW5nZXN0cyBz
      |Y2FsZSBkb2N1bWVudHMgYW5kIHdpdGggbW9kZWxzIHNjYWxlIGluZ2VzdHMgd2l0aCBmb3Ig
      |YW5kIHRleHQgY3VyYXRlZCB0ZXh0IGRhdGEgZm9yIHRva2VucyB3aXRoIGF0IGFuZCBsYWtl
      |IGF0IGluZ2VzdHMgY3VyYXRlZCBpbmdlc3RzIHRoZSB0aGUgdGV4dCBkb2N1bWVudHMgYQ==""".stripMargin

  private val ShardB64: String =
    """KLUv/SeEv/cro+UBAKPBBXwGxbjjMyjso2gUKGTMRkGDWoBwFEWZD/wFqneGR40d4LB1tiRI
      |PV2TsCAx/zjnzNo5P/MPGA7YDxjdVXc=""".stripMargin

  private val lines = Seq(
    """{"doc_id":1,"text":"the data lake ingests documents"}""",
    """{"doc_id":2,"text":"curated text for training at scale"}""",
    """{"doc_id":3,"text":"tokens and documents and text"}""")

  test("zstdDictCol decodes dictionary frames in the scan projection") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dictcol")
    Seq((1L, b64(ShardB64)), (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "content").write.mode("overwrite")
      .parquet(dir.toString) // parquet-backed: local relations fold away
    val src = spark.read.parquet(dir.toString)
      .withColumn("plain",
        Compression.zstdDictCol(col("content"), b64(DictB64)).cast("string"))
    val rows = src.orderBy("id").collect()
    assert(rows(0).getString(2) === lines.mkString("", "\n", "\n"))
    assert(rows(1).isNullAt(2))
    // scan-projection local: the kernel adds no exchange
    val plan = src.filter(col("plain").isNotNull)
      .select(col("id"), length(col("plain")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
    assert(plan.contains("graft_zstd_dict"), plan.take(1500))
  }

  test("readJsonlShards retries zstd shards against the shared dictionary") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dict-shards")
    java.nio.file.Files.write(dir.resolve("shard-00000.jsonl.zst"),
      b64(ShardB64))
    // a plain zstd shard beside it decodes on the first attempt
    java.nio.file.Files.write(dir.resolve("shard-00001.jsonl.zst"),
      Compression.encode("""{"doc_id":4,"text":"plain frame"}""".getBytes
        ++ "\n".getBytes, "zstd"))
    val withDict = TrainExport.readJsonlShards(spark, dir.toString,
      zstdDict = Some(b64(DictB64)))
      .select("line").as[String].collect().sorted
    assert(withDict.length === 4)
    assert(withDict.toSet === (lines :+
      """{"doc_id":4,"text":"plain frame"}""").toSet)
    // without the dictionary the dict shard drops, the plain one stays
    val without = TrainExport.readJsonlShards(spark, dir.toString)
      .select("line").as[String].collect()
    assert(without.toSeq === Seq("""{"doc_id":4,"text":"plain frame"}"""))
  }

  test("extractText unwraps an HTTP-labeled brotli payload (explicit mime)") {
    val body = "brotli labeled body with enough words to count. " * 4
    val enc = Brotli.encode(body.getBytes("UTF-8"))
    val out = DocumentText.extractText(enc, "application/x-brotli")
    assert(out.exists(_.contains("enough words to count")))
    // a mangled stream under the explicit label degrades to None
    assert(DocumentText.extractText(
      java.util.Arrays.copyOf(enc, enc.length - 2),
      "application/x-brotli").isEmpty)
  }
}
