package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Byte-level BPE: training determinism (tie-breaks, pair counting),
  * single-pass merge-apply semantics, native encode kernel, and the
  * packSequences tokens mode. The oracle-side equivalence (chained SQL
  * replication) is gated by q108/q109.
  */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  test("applyMerge: left-to-right non-overlapping single pass") {
    // "aaa": two (a,a) pairs but only ONE fuses — (aa)(a)
    assert(Bpe.applyMerge(Array("61", "61", "61"), "61", "61").toSeq ===
      Seq("6161", "61"))
    // "aaaa": (aa)(aa)
    assert(Bpe.applyMerge(Array("61", "61", "61", "61"), "61", "61").toSeq ===
      Seq("6161", "6161"))
    // identity instance when nothing merges (callers rely on eq)
    val toks = Array("61", "62")
    assert(Bpe.applyMerge(toks, "63", "64") eq toks)
  }

  test("byteTokens: uppercase hex of UTF-8 bytes, multi-byte chars split") {
    assert(Bpe.byteTokens("ab").toSeq === Seq("61", "62"))
    assert(Bpe.byteTokens("é").toSeq === Seq("C3", "A9")) // é = 2 bytes
  }

  test("train: greedy max-pair with (freq desc, left, right) tie-break") {
    // corpus: "ab" x3, "cd" x3, "ce" x1 — (a,b) and (c,d) tie at 3;
    // left hex '61' < '63' so (a,b) wins rank 0
    val df = (Seq.fill(3)("ab") ++ Seq.fill(3)("cd") ++ Seq("ce"))
      .zipWithIndex.map(_.swap).toDF("id", "text")
    val m = Bpe.train(df, "text", numMerges = 2)
    assert(m.map(x => (x.rank, x.left, x.right, x.freq)) === Seq(
      (0, "61", "62", 3L), (1, "63", "64", 3L)))
  }

  test("train: word frequency weights pair counts; merges stop when exhausted") {
    // "aa aa aa b" — (a,a) counted once per word occurrence = 3
    val df = Seq((1L, "aa aa aa b")).toDF("id", "text")
    val m = Bpe.train(df, "text", numMerges = 10)
    assert(m.head === BpeMerge(0, "61", "61", 3L))
    // after (aa), no adjacent pairs remain anywhere -> training stops early
    assert(m.length === 1)
  }

  test("train: merged tokens join later pairs (chain builds whole words)") {
    val df = Seq((1L, "the the the the")).toDF("id", "text")
    val m = Bpe.train(df, "text", numMerges = 2)
    // (t,h) and (h,e) both count 4: the (left, right) tie-break picks
    // (68,65) = (h,e) first; then (t,he) completes the word
    assert(m.map(x => (x.left, x.right)) === Seq(("68", "65"), ("74", "6865")))
  }

  test("encode: rank-order application, memo-safe, whitespace and NULL edges") {
    val df = Seq((1L, "the theta"), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val merges = Seq(BpeMerge(0, "74", "68", 0L), BpeMerge(1, "7468", "65", 0L))
    val got = df.select(col("id"), Bpe.encode(col("text"), merges).alias("t"))
      .orderBy("id").collect()
    // "the" -> [the]; "theta" -> [the, t, a]
    assert(got(0).getSeq[String](1) === Seq("746865", "746865", "74", "61"))
    assert(got(1).getSeq[String](1) === Seq.empty)
    assert(got(2).isNullAt(1))
  }

  test("encode equals naive rank-order reference on the documents fixture") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet").limit(120)
    val merges = Bpe.train(d, "text", numMerges = 16)
    val pairs = merges.map(m => (m.left, m.right))
    def naive(text: String): Seq[String] =
      text.split("[ \t\r\n]+").filter(_.nonEmpty).toSeq.flatMap { w =>
        var t = Bpe.byteTokens(w)
        pairs.foreach { case (l, r) => t = Bpe.applyMerge(t, l, r) }
        t.toSeq
      }
    val got = d.select(col("doc_id"), col("text"),
        Bpe.encode(col("text"), merges).alias("toks")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](2) === naive(r.getString(1)),
        s"doc ${r.getLong(0)} diverged from the naive reference")
    }
  }

  test("tokenCount and packSequencesByTokens: exact budget binning") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet").limit(200)
    val merges = Bpe.train(d, "text", numMerges = 8)
    val packed = TrainExport.packSequencesByTokens(
      d, "doc_id", "text", merges, nShards = 4, tokenBudget = 500L)
    // bin is floor(start_offset / budget) per shard in pos order
    val rows = packed.select("shard", "pos", "token_count", "bin")
      .orderBy("shard", "pos").collect()
    var shard = -1
    var cum = 0L
    rows.foreach { r =>
      if (r.getInt(0) != shard) { shard = r.getInt(0); cum = 0L }
      assert(r.getLong(3) === cum / 500L)
      cum += r.getLong(2)
    }
    // and the count column is the real encode length
    val one = d.limit(5).select(col("doc_id"),
      Bpe.tokenCount(col("text"), merges).alias("tc"),
      size(Bpe.encode(col("text"), merges)).cast("long").alias("sz")).collect()
    one.foreach(r => assert(r.getLong(1) === r.getLong(2)))
  }

  test("model persistence: save/load round-trips and a loaded model packs identically") {
    val root = java.nio.file.Files.createTempDirectory("graft-bpe-model").toString
    val d = spark.read.parquet(s"$sf0001/documents.parquet").limit(150)
    val trained = Bpe.train(d, "text", numMerges = 12)
    Bpe.saveModel(spark, trained, s"$root/model")
    val loaded = Bpe.loadModel(spark, s"$root/model")
    assert(loaded === trained)
    // the loaded model drives encode and token-exact packing bit-for-bit
    val viaTrained = d.select(col("doc_id"),
      Bpe.encode(col("text"), trained).alias("t")).orderBy("doc_id").collect()
    val viaLoaded = d.select(col("doc_id"),
      Bpe.encode(col("text"), loaded).alias("t")).orderBy("doc_id").collect()
    viaTrained.zip(viaLoaded).foreach { case (a, b) =>
      assert(a.getSeq[String](1) === b.getSeq[String](1))
    }
    val packedA = TrainExport.packSequencesByTokens(
        d, "doc_id", "text", trained, nShards = 2, tokenBudget = 400L)
      .orderBy("shard", "pos").collect()
    val packedB = TrainExport.packSequencesByTokens(
        d, "doc_id", "text", loaded, nShards = 2, tokenBudget = 400L)
      .orderBy("shard", "pos").collect()
    assert(packedA.map(_.toString).toSeq === packedB.map(_.toString).toSeq)
    // overwrite is idempotent; a rank-corrupted table refuses
    Bpe.saveModel(spark, trained, s"$root/model")
    assert(Bpe.loadModel(spark, s"$root/model") === trained)
    Bpe.saveModel(spark, trained.drop(1), s"$root/corrupt")
    assertThrows[IllegalArgumentException] {
      Bpe.loadModel(spark, s"$root/corrupt")
    }
  }

  test("chunkByTokens: stride/overlap invariants and exact reconstruction") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet").limit(60)
    val merges = Bpe.train(d, "text", numMerges = 8)
    val chunkT = 24
    val ov = 8
    val stride = chunkT - ov
    val chunks = Bpe.chunkByTokens(d, "doc_id", "text", merges, chunkT, ov)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val full = d.select(col("doc_id"),
        Bpe.encode(col("text"), merges).alias("t"))
      .as[(Long, Seq[String])].collect().toMap
    chunks.foreach { case (id, cs) =>
      val toks = full(id)
      // dense chunk indices from 0
      assert(cs.map(_._2).toSeq === cs.indices.map(_.toLong).toSeq, s"doc $id")
      // every chunk is the exact slice of the full stream
      cs.foreach { case (_, i, n, joined) =>
        val expect = toks.slice(i.toInt * stride, i.toInt * stride + chunkT)
        assert(joined === expect.mkString("|"), s"doc $id chunk $i")
        assert(n === expect.length.toLong)
      }
      // all but the last chunk are full; the tail is covered exactly
      cs.init.foreach { case (_, i, n, _) =>
        assert(n === chunkT.toLong, s"doc $id chunk $i under-filled")
      }
      val (_, lastI, lastN, _) = cs.last
      assert(lastI * stride + lastN === toks.length.toLong ||
        (cs.length == 1 && lastN == math.min(chunkT, toks.length)),
        s"doc $id tail not covered")
      // stride reconstruction: dropping each chunk's first `ov` tokens
      // (except chunk 0) rebuilds the stream exactly
      val rebuilt = cs.zipWithIndex.flatMap { case ((_, _, _, joined), k) =>
        val ts = joined.split("\\|").toSeq
        if (k == 0) ts else ts.drop(ov)
      }
      // overlapping tail chunks can re-cover tokens; compare as prefix
      assert(rebuilt.take(toks.length) === toks, s"doc $id reconstruction")
    }
    // short-doc edge: fewer tokens than the overlap still yields chunk 0
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val tc = Bpe.chunkByTokens(tiny, "doc_id", "text", merges, chunkT, ov)
      .as[(Long, Long, Long, String)].collect()
    assert(tc.length === 1 && tc.head._2 === 0L)
  }

  test("trainLimit bounds the collected type table deterministically") {
    val df = Seq((1L, "aa aa bb bb bb cc")).toDF("id", "text")
    // limit 1 keeps only "bb" (highest count); merges come from it alone
    val m = Bpe.train(df, "text", numMerges = 1, trainLimit = 1)
    assert(m === Seq(BpeMerge(0, "62", "62", 3L)))
  }
}
