package graft.streaming

import graft.SparkTestBase

import java.nio.file.Files

/** Continuous near-dup-controlled corpus ingestion: within-batch dups and
  * against-corpus dups drop, novel docs append, and the corpus table is
  * the only state (restart-safe).
  */
class CorpusIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the river bank"
  private val edited = "the quick brown fox jumps over the lazy cat near the river bank"
  private val other = "an entirely different corpus document about spark physical plans"
  private val novel = "completely unrelated fresh content goes here today with extra words"

  test("ingestBatch: within-batch and against-corpus near-dups drop, rest append") {
    val root = Files.createTempDirectory("graft-ingest").toString
    val corpus = s"$root/corpus"

    // batch 1 seeds the corpus; doc 11 is a near-copy of 10 -> dropped
    val n1 = CorpusIngest.ingestBatch(spark,
      Seq((10L, base), (11L, edited), (12L, other)).toDF("doc_id", "text"),
      corpus, "text", "doc_id",
      numHashes = 32, bands = 32, threshold = 0.5)
    assert(n1 === 2)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(10L, 12L))

    // batch 2: 20 is a near-copy of corpus doc 10 -> dropped; 21 is new
    val n2 = CorpusIngest.ingestBatch(spark,
      Seq((20L, edited), (21L, novel)).toDF("doc_id", "text"),
      corpus, "text", "doc_id",
      numHashes = 32, bands = 32, threshold = 0.5)
    assert(n2 === 1)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(10L, 12L, 21L))

    // batch 3: everything a near-dup -> nothing appended
    val n3 = CorpusIngest.ingestBatch(spark,
      Seq((30L, base), (31L, novel)).toDF("doc_id", "text"),
      corpus, "text", "doc_id",
      numHashes = 32, bands = 32, threshold = 0.5)
    assert(n3 === 0)
    assert(spark.read.parquet(corpus).count() === 3)
  }

  test("signature-store path: same decisions as recompute, store in lockstep") {
    val root = Files.createTempDirectory("graft-ingest-sig").toString
    val corpus = s"$root/corpus"
    val sig = s"$root/sig"
    val sp = Some(sig)

    val n1 = CorpusIngest.ingestBatch(spark,
      Seq((10L, base), (11L, edited), (12L, other)).toDF("doc_id", "text"),
      corpus, "text", "doc_id",
      numHashes = 32, bands = 32, threshold = 0.5, signaturePath = sp)
    assert(n1 === 2)
    val n2 = CorpusIngest.ingestBatch(spark,
      Seq((20L, edited), (21L, novel)).toDF("doc_id", "text"),
      corpus, "text", "doc_id",
      numHashes = 32, bands = 32, threshold = 0.5, signaturePath = sp)
    assert(n2 === 1)
    val n3 = CorpusIngest.ingestBatch(spark,
      Seq((30L, base), (31L, novel)).toDF("doc_id", "text"),
      corpus, "text", "doc_id",
      numHashes = 32, bands = 32, threshold = 0.5, signaturePath = sp)
    assert(n3 === 0)
    // identical outcomes to the recompute path above
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(10L, 12L, 21L))
    // store carries exactly the surviving docs' band rows (32 bands each)
    val sigRows = spark.read.parquet(sig)
    assert(sigRows.select("doc_id").distinct().as[Long]
      .collect().sorted.toSeq === Seq(10L, 12L, 21L))
    assert(sigRows.count() === 3 * 32)
  }

  test("locked ingest: serialized batches work, a held lease fails fast") {
    val root = Files.createTempDirectory("graft-ingest-lock").toString
    val corpus = s"$root/corpus"
    val store = new graft.operators.InMemoryLockStore
    val ls = Some(store: graft.operators.LockStore)

    val n1 = CorpusIngest.ingestBatch(spark,
      Seq((1L, base), (2L, other)).toDF("doc_id", "text"),
      corpus, "text", "doc_id",
      numHashes = 32, bands = 32, threshold = 0.5, lockStore = ls)
    assert(n1 === 2)
    val n2 = CorpusIngest.ingestBatch(spark,
      Seq((3L, edited), (4L, novel)).toDF("doc_id", "text"),
      corpus, "text", "doc_id",
      numHashes = 32, bands = 32, threshold = 0.5, lockStore = ls)
    assert(n2 === 1)

    // a concurrent ingest holding the lease blocks this one loudly
    val held = graft.operators.StoreLease.acquire(
      store, corpus + "__ingest_lock", 60_000L)
    try {
      intercept[graft.operators.MergeUpsert.ConcurrentWriteException] {
        CorpusIngest.ingestBatch(spark,
          Seq((5L, base)).toDF("doc_id", "text"),
          corpus, "text", "doc_id", lockStore = ls)
      }
    } finally held.release()
  }

  test("compactStores: fewer files, identical rows, identical screen results") {
    val root = Files.createTempDirectory("graft-ingest-compact").toString
    val corpus = s"$root/corpus"
    val sig = s"$root/sig"
    val sp = Some(sig)

    // three appends → small-file accumulation in both stores
    CorpusIngest.ingestBatch(spark,
      Seq((10L, base), (12L, other)).toDF("doc_id", "text"),
      corpus, "text", "doc_id",
      numHashes = 32, bands = 32, threshold = 0.5, signaturePath = sp)
    CorpusIngest.ingestBatch(spark,
      Seq((21L, novel)).toDF("doc_id", "text"),
      corpus, "text", "doc_id",
      numHashes = 32, bands = 32, threshold = 0.5, signaturePath = sp)
    CorpusIngest.ingestBatch(spark,
      Seq((33L, "yet another brand new document with plenty of distinct words inside"))
        .toDF("doc_id", "text"),
      corpus, "text", "doc_id",
      numHashes = 32, bands = 32, threshold = 0.5, signaturePath = sp)

    def parquetFiles(dir: String): Int =
      new java.io.File(dir).listFiles((_, n) => n.endsWith(".parquet")).length
    def screen(): Seq[Long] = {
      // a probe batch with one near-dup of the corpus and one novel doc —
      // the screen decision must not change across compaction
      val probe = Seq((90L, edited), (91L, "probe text that matches nothing in the corpus at all right"))
        .toDF("doc_id", "text")
      graft.llmops.DedupOps.minhashDedupAgainstSignatures(
        probe, "text", "doc_id",
        spark.read.parquet(sig)
          .select($"doc_id".alias("__ckey"), $"band", $"band_hash"),
        spark.read.parquet(corpus)
          .select($"doc_id".alias("__ckey"), $"text".alias("__ctxt")),
        3, 32, 32, 0.5).select("doc_id").as[Long].collect().sorted.toSeq
    }

    val filesBefore = (parquetFiles(corpus), parquetFiles(sig))
    assert(filesBefore._1 >= 3 && filesBefore._2 >= 3,
      "appends must have accumulated small files for the test to mean anything")
    val corpusBefore = spark.read.parquet(corpus).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val sigBefore = spark.read.parquet(sig).count()
    val screenBefore = screen()
    assert(screenBefore === Seq(91L), "near-dup probe drops, novel survives")

    CorpusIngest.compactStores(spark, corpus, sp)

    assert(parquetFiles(corpus) < filesBefore._1, "corpus files shrink")
    assert(parquetFiles(sig) < filesBefore._2, "signature files shrink")
    assert(spark.read.parquet(corpus).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      === corpusBefore, "compaction preserves corpus rows")
    assert(spark.read.parquet(sig).count() === sigBefore)
    assert(screen() === screenBefore, "screen results identical after compaction")

    // and ingestion keeps working on the compacted stores
    val n = CorpusIngest.ingestBatch(spark,
      Seq((40L, base)).toDF("doc_id", "text"), // near-dup of corpus doc 10
      corpus, "text", "doc_id",
      numHashes = 32, bands = 32, threshold = 0.5, signaturePath = sp)
    assert(n === 0)
  }

  test("compactStores under the ingest lock: held lease blocks, released lease works") {
    val root = Files.createTempDirectory("graft-ingest-lkc").toString
    val corpus = s"$root/corpus"
    val store = new graft.operators.InMemoryLockStore
    CorpusIngest.ingestBatch(spark,
      Seq((1L, base), (2L, other)).toDF("doc_id", "text"),
      corpus, "text", "doc_id",
      numHashes = 32, bands = 32, threshold = 0.5)
    val held = graft.operators.StoreLease.acquire(
      store, corpus + "__ingest_lock", 60_000L)
    try {
      intercept[graft.operators.MergeUpsert.ConcurrentWriteException] {
        CorpusIngest.compactStores(spark, corpus, lockStore = Some(store))
      }
    } finally held.release()
    CorpusIngest.compactStores(spark, corpus, lockStore = Some(store))
    assert(spark.read.parquet(corpus).count() === 2)
  }

  test("ingestStream compaction wiring: every-n-batches pass keeps results") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-ingest-sc").toString
    val corpus = s"$root/corpus"
    val sig = s"$root/sig"

    val mem = MemoryStream[(Long, String)]
    val q = CorpusIngest.ingestStream(spark,
      mem.toDF().toDF("doc_id", "text"), corpus, "text", "doc_id",
      s"$root/ckpt", numHashes = 32, bands = 32, threshold = 0.5,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      signaturePath = Some(sig), compactEveryBatches = Some(2))
    mem.addData((1L, base), (2L, other))
    q.processAllAvailable()
    mem.addData((3L, edited), (4L, novel)) // batch 2 → compaction fires
    q.processAllAvailable()
    mem.addData((5L, base), (6L, "fresh words nobody wrote before in any batch"))
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 4L, 6L))
    // signature store stayed in lockstep through the compaction
    assert(spark.read.parquet(sig).select("doc_id").distinct().as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 4L, 6L))
  }

  test("quality gate in the stream: judge screen == batch path, restart-safe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import graft.llmops.{FakeJudge, FakeJudgeClient, LlmScore}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-ingest-q").toString

    // judge score = ((11 + len(text)) % 101) / 10: base 7.4, other 7.5,
    // novel 7.8, lowq 2.0 — cut at 5.0 drops only lowq
    val lowq = "tiny spam"
    val tpl = "Rate 0-10:\n{text}"
    val cut = 5.0
    assert(FakeJudge.score(tpl.replace("{text}", lowq)) < cut)
    assert(FakeJudge.score(tpl.replace("{text}", base)) >= cut)
    val gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => LlmScore.scoreColumn(df, "text", new FakeJudgeClient, tpl,
        batchSize = 8).filter(col("llm_score") >= cut)

    def corpusState(path: String): Set[(Long, Double)] =
      spark.read.parquet(path).select("doc_id", "llm_score")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

    // ---- streaming path
    FakeJudge.reset()
    val corpusS = s"$root/corpus_stream"
    val mem = MemoryStream[(Long, String)]
    val q = CorpusIngest.ingestStream(spark,
      mem.toDF().toDF("doc_id", "text"), corpusS, "text", "doc_id",
      s"$root/ckpt1", numHashes = 32, bands = 32, threshold = 0.5,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      qualityGate = Some(gate))
    mem.addData((1L, base), (2L, other), (5L, lowq))
    q.processAllAvailable()
    mem.addData((3L, edited), (4L, novel)) // 3 is a near-dup of corpus doc 1
    q.processAllAvailable()
    q.stop()
    // kept: 1, 2 (batch 1, lowq gate-dropped), 4 (batch 2, 3 dup-dropped)
    assert(corpusState(corpusS).map(_._1) === Set(1L, 2L, 4L))
    // the judge ran on dedup SURVIVORS only: 3 texts in batch 1, 1 in
    // batch 2 — the near-dup (doc 3) never cost a client call
    val streamedCalls = FakeJudge.batchSizes.toArray(Array.empty[Integer])
      .map(_.toInt).sum
    assert(streamedCalls === 4,
      s"judge must see only dedup survivors, saw $streamedCalls texts")

    // ---- identical batches through the batch path → identical corpus
    FakeJudge.reset()
    val corpusB = s"$root/corpus_batch"
    CorpusIngest.ingestBatch(spark,
      Seq((1L, base), (2L, other), (5L, lowq)).toDF("doc_id", "text"),
      corpusB, "text", "doc_id", numHashes = 32, bands = 32,
      threshold = 0.5, qualityGate = Some(gate))
    CorpusIngest.ingestBatch(spark,
      Seq((3L, edited), (4L, novel)).toDF("doc_id", "text"),
      corpusB, "text", "doc_id", numHashes = 32, bands = 32,
      threshold = 0.5, qualityGate = Some(gate))
    assert(corpusState(corpusB) === corpusState(corpusS),
      "streaming and batch paths must produce identical scores and keeps")

    // ---- replay safety: a fresh checkpoint re-feeding the SAME data into
    // the same corpus (the crash-replay shape) appends nothing twice —
    // every previously appended doc screens out as its own exact dup
    // BEFORE the gate, so only the gate-rejected doc is re-judged
    FakeJudge.reset()
    val mem2 = MemoryStream[(Long, String)]
    val q2 = CorpusIngest.ingestStream(spark,
      mem2.toDF().toDF("doc_id", "text"), corpusS, "text", "doc_id",
      s"$root/ckpt2", numHashes = 32, bands = 32, threshold = 0.5,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      qualityGate = Some(gate))
    mem2.addData((1L, base), (2L, other), (5L, lowq))
    q2.processAllAvailable()
    mem2.addData((3L, edited), (4L, novel))
    q2.processAllAvailable()
    q2.stop()
    assert(corpusState(corpusS).map(_._1) === Set(1L, 2L, 4L),
      "replay must not duplicate rows")
    val replayCalls = FakeJudge.batchSizes.toArray(Array.empty[Integer])
      .map(_.toInt).sum
    assert(replayCalls === 1,
      s"replay re-judges only the gate-rejected doc, saw $replayCalls")
  }

  test("ingestStream: foreachBatch composition over MemoryStream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-ingest-s").toString
    val corpus = s"$root/corpus"

    val mem = MemoryStream[(Long, String)]
    // ProcessingTime keeps the query alive across addData rounds
    // (AvailableNow would stop after draining the first batch)
    val q = CorpusIngest.ingestStream(spark,
      mem.toDF().toDF("doc_id", "text"), corpus, "text", "doc_id",
      s"$root/ckpt", numHashes = 32, bands = 32, threshold = 0.5,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    mem.addData((1L, base), (2L, other))
    q.processAllAvailable()
    mem.addData((3L, edited), (4L, novel)) // 3 near-dups corpus doc 1
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 4L))
  }

  // ---- image ingestion (dHash screen) ----

  /** 36×32 constant-per-4×4-cell grayscale PNG: controllable dHash. */
  private def cellPng(g: (Int, Int) => Int): Array[Byte] =
    graft.llmops.ImageWriter.pngFromPixels(36, 32,
      Array.tabulate(32, 36 * 3) { (y, i) =>
        g(i / 3 / 4, y / 4).toByte
      }, 3)

  private val imgA: Array[Byte] = cellPng((i, _) => i * 10)
  private val imgANear: Array[Byte] = cellPng((i, j) =>
    if (i == 4 && j == 2) 200 else i * 10) // Hamming 1 from imgA
  private val imgB: Array[Byte] = cellPng((i, _) => 80 - i * 10) // far
  private val imgC: Array[Byte] = cellPng((i, j) =>
    if ((i + j) % 2 == 0) 30 else 170) // checkerboard, far from both

  test("ingestImageBatch: dHash screen within batch and against store") {
    val root = Files.createTempDirectory("graft-ingest-img").toString
    val corpus = s"$root/corpus"
    val sigs = s"$root/sigs"

    // batch 1: near-pair (10, 11) keeps the lower key; junk appends
    // (not an image ≠ duplicate) but carries no signature
    val n1 = CorpusIngest.ingestImageBatch(spark,
      Seq((10L, imgA), (11L, imgANear), (12L, "junk".getBytes("UTF-8")))
        .toDF("doc_id", "content"),
      corpus, "content", "doc_id", signaturePath = Some(sigs))
    assert(n1 === 2)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(10L, 12L))
    assert(spark.read.parquet(sigs).count() === 1, "junk has no signature")

    // batch 2: 20 near-dups the STORE (imgANear ~ imgA), 21 is new
    val n2 = CorpusIngest.ingestImageBatch(spark,
      Seq((20L, imgANear), (21L, imgB)).toDF("doc_id", "content"),
      corpus, "content", "doc_id", signaturePath = Some(sigs))
    assert(n2 === 1)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(10L, 12L, 21L))

    // replay of batch 2 (crash recovery): decodable rows self-dedup
    val n2b = CorpusIngest.ingestImageBatch(spark,
      Seq((20L, imgANear), (21L, imgB)).toDF("doc_id", "content"),
      corpus, "content", "doc_id", signaturePath = Some(sigs))
    assert(n2b === 0, "replayed decodable batch appends nothing")

    // content-fallback path (no signature store) decides identically
    val corpus2 = s"$root/corpus2"
    CorpusIngest.ingestImageBatch(spark,
      Seq((10L, imgA), (11L, imgANear)).toDF("doc_id", "content"),
      corpus2, "content", "doc_id")
    val n = CorpusIngest.ingestImageBatch(spark,
      Seq((20L, imgANear), (21L, imgB)).toDF("doc_id", "content"),
      corpus2, "content", "doc_id")
    assert(n === 1)
  }

  test("ingestAudioBatch: envelope-hash screen, gain-invariant dup drops") {
    val root = Files.createTempDirectory("graft-ingest-au").toString
    val corpus = s"$root/corpus"
    val sigs = s"$root/sigs"
    def clip(f: Int => Int): Array[Byte] =
      graft.llmops.MediaWriter.wavFromSamples(1, 8000,
        Array.tabulate(260)(n => f(n / 4).toShort))
    val rising = clip(k => (k + 1) * 10)
    val risingLoud = clip(k => (k + 1) * 30) // 3x gain: Hamming 0
    val falling = clip(k => (66 - k) * 10)

    val n1 = CorpusIngest.ingestAudioBatch(spark,
      Seq((1L, rising), (2L, risingLoud)).toDF("doc_id", "content"),
      corpus, "content", "doc_id", signaturePath = Some(sigs))
    assert(n1 === 1, "gain-doubled clone drops within the batch")
    val n2 = CorpusIngest.ingestAudioBatch(spark,
      Seq((3L, risingLoud), (4L, falling),
        (5L, "junk".getBytes("UTF-8"))).toDF("doc_id", "content"),
      corpus, "content", "doc_id", signaturePath = Some(sigs))
    assert(n2 === 2, "store drop for the clone; falling + junk append")
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 4L, 5L))
    assert(spark.read.parquet(sigs).count() === 2, "junk has no signature")
  }

  test("ingestAudioBatch accepts MP3 by sniff: cross-container dup drops") {
    val root = Files.createTempDirectory("graft-ingest-mp3").toString
    val corpus = s"$root/corpus"
    val sigs = s"$root/sigs"
    // strong-contour PCM (adjacent envelope cells >= 4x apart) so the
    // WAV original and its MP3 encode land on the same envelope bits
    def pcm(seed: Int): Array[Short] = {
      val nf = 74880
      Array.tabulate(nf) { n =>
        val cell = (((n + 1).toLong * 65 - 1) / nf).toInt
        val amp = 2 << (2 * ((cell * 7 + seed) % 3))
        (amp * ((((seed + 7) * n) % 2048) - 1024)).toShort
      }
    }
    val wavA = graft.llmops.MediaWriter.wavFromSamples(1, 44100, pcm(9))
    val mp3A = graft.llmops.Mp3Writer.mp3FromSamples(1, 44100, pcm(9))
    val mp3B = graft.llmops.Mp3Writer.mp3FromSamples(1, 44100, pcm(55))

    val n1 = CorpusIngest.ingestAudioBatch(spark,
      Seq((1L, wavA)).toDF("doc_id", "content"),
      corpus, "content", "doc_id", signaturePath = Some(sigs))
    assert(n1 === 1)
    val n2 = CorpusIngest.ingestAudioBatch(spark,
      Seq((2L, mp3A), (3L, mp3B)).toDF("doc_id", "content"),
      corpus, "content", "doc_id", signaturePath = Some(sigs))
    assert(n2 === 1, "MP3 re-encode of the stored WAV drops; fresh MP3 appends")
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L))
  }

  test("ingestAudioBatch accepts Ogg Vorbis: cross-container dup drops") {
    val root = Files.createTempDirectory("graft-ingest-ogg").toString
    val corpus = s"$root/corpus"
    val sigs = s"$root/sigs"
    // the q156 ladder contour: adjacent envelope cells >= 4x apart, so
    // the lossy Vorbis re-encode keeps every envelope bit
    def pcm(seed: Int): Array[Int] = {
      val nf = 6500
      Array.tabulate(nf) { n =>
        val cell = (((n + 1).toLong * 65 - 1) / nf).toInt
        val amp = 2 << (2 * ((cell * 7 + seed) % 3))
        amp * ((((seed + 7) * n) % 2040) - 1020)
      }
    }
    val wavA = graft.llmops.MediaWriter.wavFromSamples(1, 8000,
      pcm(9).map(_.toShort))
    val oggA = graft.llmops.VorbisWriter.ogg(1, 8000, pcm(9))
    val oggB = graft.llmops.VorbisWriter.ogg(1, 8000, pcm(55))

    val n1 = CorpusIngest.ingestAudioBatch(spark,
      Seq((1L, wavA)).toDF("doc_id", "content"),
      corpus, "content", "doc_id", signaturePath = Some(sigs))
    assert(n1 === 1)
    val n2 = CorpusIngest.ingestAudioBatch(spark,
      Seq((2L, oggA), (3L, oggB)).toDF("doc_id", "content"),
      corpus, "content", "doc_id", signaturePath = Some(sigs))
    assert(n2 === 1, "Ogg re-encode of the stored WAV drops; fresh Ogg appends")
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L))
  }

  test("ingestVideoBatch accepts multi-page TIFF scans: page-level dup drops") {
    val root = Files.createTempDirectory("graft-ingest-scan").toString
    val corpus = s"$root/corpus"
    val sigs = s"$root/sigs"
    def g(seed: Int)(x: Int, y: Int): Int =
      ((5 + seed % 7) * (x / 8) + (13 + seed % 11) * (y / 8) + seed) % 256
    val scanA = graft.llmops.ImageWriter.tiffMultipage(
      Seq((24, 16, g(1) _), (24, 16, g(8) _)))
    // the same two pages re-encoded LZW + big-endian: a re-scan
    val scanARescan = graft.llmops.ImageWriter.tiffMultipage(
      Seq((24, 16, g(1) _), (24, 16, g(8) _)), lzw = true,
      littleEndian = false)
    // inverted gradients: the monotone g() patterns all share one dHash
    // (every right cell brighter), so distinct content must flip slope
    val scanB = graft.llmops.ImageWriter.tiffMultipage(
      Seq((24, 16, (x: Int, y: Int) => 255 - g(40)(x, y)),
        (24, 16, (x: Int, y: Int) => 255 - g(55)(x, y))))
    val n1 = CorpusIngest.ingestVideoBatch(spark,
      Seq((1L, scanA)).toDF("doc_id", "content"),
      corpus, "content", "doc_id", signaturePath = Some(sigs))
    assert(n1 === 1)
    val n2 = CorpusIngest.ingestVideoBatch(spark,
      Seq((2L, scanARescan), (3L, scanB)).toDF("doc_id", "content"),
      corpus, "content", "doc_id", signaturePath = Some(sigs))
    assert(n2 === 1, "re-encoded scan drops against the store; fresh appends")
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 3L))
  }

  test("ingestImageStream: quality gate sees only dedup survivors") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-ingest-imgs").toString
    val corpus = s"$root/corpus"
    val sigs = s"$root/sigs"

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    // gate records every key it sees, drops the checkerboard (40)
    val gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => {
        df.select("doc_id").as[Long](implicitly).collect().foreach(seen.add)
        df.filter(org.apache.spark.sql.functions.col("doc_id") =!= 40L)
      }

    val mem = MemoryStream[(Long, Array[Byte])]
    val q = CorpusIngest.ingestImageStream(spark,
      mem.toDF().toDF("doc_id", "content"), corpus, "content", "doc_id",
      s"$root/ckpt", signaturePath = Some(sigs),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      qualityGate = Some(gate))
    mem.addData((30L, imgA), (31L, imgB))
    q.processAllAvailable()
    mem.addData((40L, imgC), (41L, imgANear)) // 41 near-dups store imgA
    q.processAllAvailable()
    q.stop()

    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(30L, 31L))
    // the gate never saw 41 (dedup-dropped before the gate) but saw 40
    assert(!seen.contains(41L), "gate must run on dedup survivors only")
    assert(seen.contains(40L))
  }

  test("ingestCodeBatch: comment variants drop within batch and against corpus") {
    val root = Files.createTempDirectory("graft-code-ingest").toString
    val corpus = s"$root/corpus"
    val b1 = Seq(
      (1L, "a.py", "# first comment\nx = 1\ny = 2\n"),
      (2L, "b.py", "# different comment\nx = 1\ny = 2\n"), // canon dup of 1
      (3L, "c.py", "x = 99\n"))
      .toDF("id", "path", "content")
    val n1 = CorpusIngest.ingestCodeBatch(spark, b1, corpus,
      "id", "path", "content")
    assert(n1 == 2L) // 2 drops within batch
    val b2 = Seq(
      (10L, "d.py", "### yet another\nx = 1\ny = 2\n"), // dup of corpus
      (11L, "e.js", "// js comment\nlet q = 5;\n"))
      .toDF("id", "path", "content")
    val n2 = CorpusIngest.ingestCodeBatch(spark, b2, corpus,
      "id", "path", "content")
    assert(n2 == 1L)
    val ids = spark.read.parquet(corpus).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L, 11L))
  }

  test("ingestCodeBatch: signature store decisions match recompute, store in lockstep") {
    val root = Files.createTempDirectory("graft-code-sig").toString
    val corpus = s"$root/corpus"
    val sig = s"$root/sig"
    val b1 = Seq((1L, "a.py", "x = 1  # c\n"), (2L, "b.c", "int k;\n"))
      .toDF("id", "path", "content")
    assert(CorpusIngest.ingestCodeBatch(spark, b1, corpus, "id", "path",
      "content", signaturePath = Some(sig)) == 2L)
    // store holds one (key, cfp) per admitted file
    assert(spark.read.parquet(sig).count() == 2L)
    val b2 = Seq(
      (3L, "a2.py", "x = 1  # other comment\n"), // canon dup via store
      (4L, "fresh.py", "z = 42\n"))
      .toDF("id", "path", "content")
    assert(CorpusIngest.ingestCodeBatch(spark, b2, corpus, "id", "path",
      "content", signaturePath = Some(sig)) == 1L)
    assert(spark.read.parquet(sig).count() == 3L)
    assert(spark.read.parquet(corpus).count() == 3L)
  }

  test("ingestCodeBatch: permissive gate refuses unlicensed and GPL files") {
    val root = Files.createTempDirectory("graft-code-lic").toString
    val corpus = s"$root/corpus"
    val b = Seq(
      (1L, "mit.py", "# SPDX-License-Identifier: MIT\nx = 1\n"),
      (2L, "gpl.py", "# SPDX-License-Identifier: GPL-3.0\ny = 2\n"),
      (3L, "none.py", "z = 3\n"))
      .toDF("id", "path", "content")
    assert(CorpusIngest.ingestCodeBatch(spark, b, corpus, "id", "path",
      "content", requirePermissive = true) == 1L)
    assert(spark.read.parquet(corpus).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L))
  }
}
