package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Content-defined chunking: coverage/determinism invariants, the CDC
  * boundary-stability property (the reason it beats fixed blocking),
  * size bounds, and the corpus dedup report.
  */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private def data(n: Int, seed: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill[Byte](n)((r.nextInt(64) + 32).toByte)
  }

  test("chunks cover the input contiguously and deterministically") {
    val d = data(300000, 1)
    val cs = Cdc.chunks(d)
    assert(cs.nonEmpty)
    assert(cs.head.offset == 0L)
    assert(cs.map(_.size.toLong).sum == d.length)
    cs.sliding(2).foreach {
      case Array(a, b) => assert(a.offset + a.size == b.offset)
      case _ => ()
    }
    val again = Cdc.chunks(d)
    assert(cs.toSeq == again.toSeq, "stable across runs")
    assert(Cdc.chunks(Array.emptyByteArray).isEmpty)
  }

  test("size bounds: every chunk within [min, max] except possibly the last") {
    val cs = Cdc.chunks(data(500000, 2), minSize = 1024, avgSize = 4096,
      maxSize = 16384)
    cs.dropRight(1).foreach { c =>
      assert(c.size >= 1024 && c.size <= 16384, c)
    }
    assert(cs.last.size <= 16384)
    // sizes actually spread around the target (not all maxed out)
    val avg = cs.dropRight(1).map(_.size.toLong).sum.toDouble /
      math.max(1, cs.length - 1)
    assert(avg > 1500 && avg < 16000, s"avg $avg")
  }

  test("boundary stability: a front insertion leaves most chunks shared") {
    val d = data(400000, 3)
    val shifted = "inserted-prefix-bytes!".getBytes ++ d
    val h1 = Cdc.chunks(d).map(_.hash).toSet
    val h2 = Cdc.chunks(shifted).map(_.hash).toSet
    val shared = h1.intersect(h2).size.toDouble / h1.size
    assert(shared > 0.8, s"only ${(shared * 100).round}% chunks survive the shift")
  }

  test("chunkDedupStats: planted duplicates show up in the ratio") {
    val base = data(200000, 4)
    val rows = Seq(
      (1L, base),
      (2L, base.clone()), // exact duplicate blob
      (3L, data(200000, 5))) // unrelated
    val stats = Cdc.chunkDedupStats(rows.toDF("doc_id", "content"),
      "doc_id", "content").collect()(0)
    val total = stats.getAs[Long]("total_bytes")
    val unique = stats.getAs[Long]("unique_bytes")
    assert(total == 600000L)
    // the duplicate blob dedups fully: unique ≈ 2/3 of total
    assert(unique <= 400000L + 1000, s"unique=$unique")
    assert(stats.getAs[Double]("dedup_ratio") > 1.45)
  }

  test("chunkStoreScreen: re-crawled near-identical blobs drop incrementally") {
    val store = java.nio.file.Files.createTempDirectory("cdc-store").toString + "/s"
    val base = data(300000, 7)
    val first = Seq((1L, base)).toDF("doc_id", "content")
    val kept1 = Cdc.chunkStoreScreen(first, "doc_id", "content", store)
    assert(kept1.count() == 1, "empty store keeps everything")
    // near-identical re-delivery: small edit in the middle
    val edited = base.clone()
    System.arraycopy("tiny edit".getBytes, 0, edited, 150000, 9)
    val fresh = data(300000, 8)
    val second = Seq((2L, edited), (3L, fresh)).toDF("doc_id", "content")
    val kept2 = Cdc.chunkStoreScreen(second, "doc_id", "content", store)
      .select("doc_id").as[Long].collect().sorted
    assert(kept2.toSeq == Seq(3L),
      "the re-crawl drops against the store, the fresh blob survives")
    // replay idempotency: the fresh blob re-delivered now drops too
    val third = Seq((4L, fresh.clone())).toDF("doc_id", "content")
    assert(Cdc.chunkStoreScreen(third, "doc_id", "content", store).count() == 0)
  }

  test("null/invalid parameters refuse loudly") {
    intercept[IllegalArgumentException](Cdc.chunks(data(10, 6), 0, 8, 16))
    intercept[IllegalArgumentException](Cdc.chunks(data(10, 6), 4, 12, 16))
    assert(graft.expressions.CdcChunks.compute(null) == null)
    assert(graft.expressions.CdcChunks.compute(Array.emptyByteArray)
      .numElements() == 0)
  }
}
