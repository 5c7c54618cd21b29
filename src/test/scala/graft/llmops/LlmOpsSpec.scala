package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LlmOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("exact dedup keeps one row per normalized text") {
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "different")
    ).toDF("doc_id", "text")
    val got = DedupOps.exactDedup(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 3L)) // 2 is a case/space variant of 1
  }

  test("LSH banding refuses bands that do not tile the signature") {
    // bands > numHashes hashes an EMPTY slice per band — one constant key,
    // O(n²) candidate join; a non-dividing count silently drops hashes
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      DedupOps.minhashNearDups(docs, "text", "doc_id",
        numHashes = 32, bands = 64)
    }
    intercept[IllegalArgumentException] {
      DedupOps.minhashNearDups(docs, "text", "doc_id",
        numHashes = 32, bands = 10)
    }
    intercept[IllegalArgumentException] {
      DedupOps.minhashBandRows(docs, "text", "doc_id", "k",
        wordShingleN = 3, numHashes = 16, bands = 0)
    }
  }

  test("minhash near-dups find planted duplicates, skip unrelated") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"),
      (3L, "completely unrelated text about spark catalyst optimizer internals")
    ).toDF("doc_id", "text")
    val pairs = DedupOps.minhashNearDups(df, "text", "doc_id", threshold = 0.5)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("checkpointDir knob: durable snapshots, identical results") {
    // batch fault-tolerance knob (Mat.snapshot): with a checkpoint dir the
    // reused intermediates live as parquet snapshots (recoverable after
    // executor loss), and results are bit-identical to the
    // localCheckpoint default
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"),
      (3L, "completely unrelated text about spark catalyst optimizer internals")
    ).toDF("doc_id", "text")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val durable = DedupOps.minhashNearDups(df, "text", "doc_id",
        threshold = 0.5, checkpointDir = Some(ckpt))
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    val default = DedupOps.minhashNearDups(df, "text", "doc_id",
        threshold = 0.5)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    assert(durable === default)
    val snaps = new java.io.File(ckpt).listFiles().map(_.getName)
    assert(snaps.exists(_.startsWith("graft-snap-bands-")),
      "band rows snapshotted to reliable storage")
    assert(snaps.exists(_.startsWith("graft-snap-candsh-")),
      "candidate shingles snapshotted to reliable storage")
    // against-corpus batch screen honors the same knob
    val corpus = Seq((10L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("cid", "ctext")
    val survivors = DedupOps.minhashDedupAgainstCorpus(
        df, "text", "doc_id", corpus, "cid", "ctext",
        checkpointDir = Some(ckpt))
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === Set(3L), "near-dups of the corpus doc screened out")
    assert(new java.io.File(ckpt).listFiles().map(_.getName)
      .exists(_.startsWith("graft-snap-pairs-")))
  }

  test("simhash near-dups: identical text at distance 0") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different words entirely here now")
    ).toDF("doc_id", "text")
    val got = DedupOps.simhashNearDups(df, "text", "doc_id", maxDist = 3)
      .select("key_a", "key_b", "hamming").collect()
    assert(got.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
  }

  test("brute-force cosine: identical vector ranks first") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.9f, 0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(df, "vec_id", "embedding",
        df.filter($"vec_id" === 1), "vec_id", "embedding", k = 2)
      .orderBy("rank").select("neighbor_key").as[Long].collect()
    assert(got.head === 2L) // exact duplicate is nearest
  }

  test("IVF top-k: identical vector ranks first via centroid probing") {
    val vecs = (0 until 200).map { i =>
      val base = Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat)
      (i.toLong, base)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" === 7)
    val got = Similarity.ivfTopK(df, "vec_id", "embedding", q, "vec_id", "embedding",
        k = 3, nCentroids = 8, nProbe = 3)
      .orderBy("rank").collect()
    assert(got.nonEmpty)
    // sin-wave vectors: i and i+9 are near-identical (period ~2π/0.7≈8.98)
    assert(got.head.getDouble(2) > 0.9)
  }

  test("embedding near-dups find planted duplicate vectors") {
    val base = (0 until 100).map { i =>
      (i.toLong, Array.tabulate(16)(d => math.sin(i * 2.17 + d * 1.3).toFloat))
    }
    val planted = base.map { case (id, v) => (id + 1000, v) } // exact copies
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDups(df, "vec_id", "embedding", minCosine = 0.999)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    // every planted copy should be found (identical vectors share all buckets)
    val found = (0 until 100).count(i => pairs.contains((i.toLong, i + 1000L)))
    assert(found === 100)
  }

  test("text analysis: counts, language id, fingerprint portability") {
    val df = Seq(
      (1L, "the cat sat of the mat"),
      (2L, "el gato es un animal que vive en la casa"),
      (3L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val got = df.select(
      $"doc_id",
      TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.langId($"text").as("lang"),
      TextAnalysis.fingerprint($"text").as("fp")).collect()
    assert(got(0).getInt(1) === 6)
    assert(got(0).getString(2) === "en")
    assert(got(1).getString(2) === "es")
    assert(got(2).getString(2) === "und")
    // md5 fingerprint matches an externally computed value (portability)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("the cat sat of the mat".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(0).getString(3) === expected)
  }

  test("dedupAgainstCorpus drops rows whose fingerprint exists in the reference") {
    val ref = Seq((1L, "seen before"), (2L, "also seen")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "Seen  Before"), // normalization variant of ref text -> dropped
      (11L, "brand new text"),
      (12L, "also seen")) // exact ref text -> dropped
      .toDF("doc_id", "text")
    val got = DedupOps.dedupAgainstCorpus(fresh, "text", ref, "text")
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(11L))
  }

  test("quantizeInt8: codes in range, reconstruction error bounded, recall holds") {
    // deterministic synthetic embeddings, dim 16
    val vecs = (0 until 120).map { i =>
      (i.toLong, Array.tabulate(16)(d =>
        math.sin(i * 31 + d * 7).toFloat * (1 + (i % 5))))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(col("embedding"))
    val out = df.select(col("vec_id"), q.alias("q"),
        Similarity.dequantizeInt8(q).alias("deq"), col("embedding"))
      .collect()
    out.foreach { r =>
      val scale = r.getStruct(1).getDouble(0)
      val codes = r.getStruct(1).getSeq[Int](1)
      val deq = r.getSeq[Double](2)
      val orig = r.getSeq[Float](3)
      assert(codes.forall(c => c >= -127 && c <= 127), s"code range ${r.getLong(0)}")
      orig.zip(deq).foreach { case (o, d) =>
        assert(math.abs(o - d) <= scale / 2 + 1e-12,
          s"reconstruction error over scale/2 for vec ${r.getLong(0)}")
      }
    }
    // top-10 neighbors of vector 0 computed on dequantized codes overlap
    // the exact top-10 on the originals (int8 keeps ranking fidelity)
    def top10(vecCol: org.apache.spark.sql.Column, frame: org.apache.spark.sql.DataFrame) = {
      val probe = frame.filter(col("vec_id") === 0L)
        .select(col("vec_id").alias("qk"), vecCol.alias("qv"))
      frame.filter(col("vec_id") =!= 0L).crossJoin(probe)
        .withColumn("cos", Similarity.cosineHof(col("qv"), vecCol))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10).select("vec_id").as[Long].collect().toSet
    }
    val exact = top10(col("embedding"), df)
    val deqDf = df.select(col("vec_id"),
      Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding")))
        .alias("embedding"))
    val approx = top10(col("embedding"), deqDf)
    assert((exact & approx).size >= 8, s"recall@10 too low: $exact vs $approx")
  }

  test("dedupLinesAcrossCorpus: first doc keeps the line, later docs lose it") {
    val docs = Seq((1L, "alpha\nbeta"), (2L, "beta\ngamma"), (3L, "alpha\nbeta"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dedupLinesAcrossCorpus(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq(
      (1L, "alpha\nbeta"), // first occurrence of both lines
      (2L, "gamma"), // beta claimed by doc 1
      (3L, ""))) // both lines claimed; doc kept with empty text
  }

  test("dedupParagraphsAcrossCorpus: keep-first blocks, ws-insensitive match") {
    val docs = Seq(
      (1L, "intro one\n\nshared  boilerplate\n\noutro"),
      // same boilerplate re-wrapped (newline + double space): still dedups,
      // and doc 1's ORIGINAL bytes survive
      (2L, "other\n\nshared\nboilerplate"),
      (3L, "intro one\n\nfresh")) // "intro one" claimed by doc 1
      .toDF("doc_id", "text")
    val got = TextAnalysis.dedupParagraphsAcrossCorpus(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq(
      (1L, "intro one\n\nshared  boilerplate\n\noutro"),
      (2L, "other"),
      (3L, "fresh")))
  }

  test("dedupParagraphsAcrossCorpus: whitespace-only blocks always survive") {
    val docs = Seq(
      (1L, "a\n\n \n\nb"), // middle block is formatting, not content
      (2L, "c\n\n \n\nd")) // ...and must not be claimed by doc 1's blank
      .toDF("doc_id", "text")
    val got = TextAnalysis.dedupParagraphsAcrossCorpus(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq(
      (1L, "a\n\n \n\nb"),
      (2L, "c\n\n \n\nd")))
  }

  test("curationSignals equals the four standalone signal operators") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today.\n" +
        "the quick brown fox jumps over the lazy dog again today."),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa."),
      (3L, "spam spam spam spam spam spam spam spam spam spam spam spam."),
      (4L, "short { line\nenable javascript now\nlorem ipsum dolor sit."))
      .toDF("doc_id", "text")
    val lmSrc = docs.filter($"doc_id" <= 2).select($"text")
    val tri = TextAnalysis.charNgramCounts(lmSrc, "text", 3)
    val bi = TextAnalysis.charNgramCounts(lmSrc, "text", 2)
    val fused = TextAnalysis.curationSignals(docs, "doc_id", "text", tri, bi)

    val gq = TextAnalysis.gopherQualityFeatures(docs, "doc_id", "text")
    val rep = TextAnalysis.gopherRepetitionSignals(docs, "doc_id", "text")
    val c4 = TextAnalysis.c4CleanLines(docs, "text")
      .select($"doc_id", $"c4_text", $"n_kept_lines", $"doc_keep")
    val lm = TextAnalysis.lmQualityScore(docs, "doc_id", "text", tri, bi)
    val joined = gq.join(rep, Seq("doc_id"), "left")
      .join(c4, Seq("doc_id"), "left").join(lm, Seq("doc_id"), "left")

    val cols = Seq("doc_id", "n_words", "mean_word_len",
      "frac_unique_words", "top_word_frac", "passes_quality", "top_ngram",
      "top_ngram_char_frac", "dup_ngram_char_frac", "c4_text",
      "n_kept_lines", "doc_keep", "n_grams", "lm_score")
    val f = fused.select(cols.map(col): _*).orderBy("doc_id").collect()
    val j = joined.select(cols.map(col): _*).orderBy("doc_id").collect()
    assert(f.toSeq === j.toSeq)
  }

  test("mixtureSample: epoch replication plus hash-gated fractional copy") {
    val df = (1L to 40L).map(i =>
      (i, if (i <= 20) "heavy" else "light")).toDF("doc_id", "source")
    val got = Sampling.mixtureSample(df, "source", "doc_id",
        Map("heavy" -> 2.5, "light" -> 0.0))
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    // light source dropped entirely
    assert(got.forall(_._1 <= 20))
    // every heavy key gets epochs 0 and 1
    (1L to 20L).foreach { k =>
      assert(got.contains((k, 0)) && got.contains((k, 1)), s"key $k")
    }
    // epoch 2 holds exactly the SALTED-gate(0.5) subset of heavy keys —
    // salted so composing with hashSample on the same key stays
    // independent (an unsalted gate would pass every hashSample survivor)
    val extra = got.filter(_._2 == 2).map(_._1).toSet
    val gated = df.filter($"source" === "heavy")
      .filter(pmod(Similarity.portable60(
          concat($"doc_id".cast("string"), lit(":mixture"))),
        lit(1000000L)) < 500000L)
      .select("doc_id").as[Long].collect().toSet
    assert(extra === gated)
    assert(extra.nonEmpty && extra.size < 20) // the gate actually splits
  }

  test("temperatureWeights: p ∝ n^alpha, largest source pinned to max") {
    val df = ((1L to 80L).map(i => (i, "big")) ++
      (81L to 100L).map(i => (i, "small"))).toDF("doc_id", "source")
    val w1 = Sampling.temperatureWeights(df, "source", alpha = 1.0)
    assert(w1 == Map("big" -> 1.0, "small" -> 1.0)) // natural proportions
    val w = Sampling.temperatureWeights(df, "source", alpha = 0.5)
    assert(w("big") == 1.0)
    assert(math.abs(w("small") - math.sqrt(80.0 / 20.0)) < 1e-12) // 2.0
    // effective sampling mass ratio is (n_b/n_s)^alpha = sqrt(4) = 2
    assert(math.abs(80 * w("big") / (20 * w("small")) - 2.0) < 1e-12)
    val scaled = Sampling.temperatureWeights(df, "source", 0.5,
      maxWeight = 3.0)
    assert(scaled("big") == 3.0 && math.abs(scaled("small") - 6.0) < 1e-12)
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(df, "source", 0.0)
    }
    // maxEpochs caps the tiny-source blow-up: a 2-row source in a 10k
    // corpus at alpha 0.1 asks for (2/10000)^-0.9 ≈ 2128 epochs — the
    // cap keeps mixtureSample's per-row sequence explode bounded
    val skewed = ((1L to 10000L).map(i => (i, "huge")) ++
      Seq((10001L, "tiny"), (10002L, "tiny"))).toDF("doc_id", "source")
    val capped = Sampling.temperatureWeights(skewed, "source", alpha = 0.1)
    assert(capped("tiny") === 100.0, s"cap must bind: ${capped("tiny")}")
    val raised = Sampling.temperatureWeights(skewed, "source", alpha = 0.1,
      maxEpochs = 5000.0)
    assert(raised("tiny") > 2000.0 && raised("tiny") < 2300.0)
    // NULL source: counted as its own group AND matched by mixtureSample
    // (null-safe <=>), so unlabeled rows get their temperature weight
    // instead of silently falling through to defaultWeight
    val withNull = ((1L to 80L).map(i => (i, "big")) ++
      (81L to 100L).map(i => (i, null.asInstanceOf[String])))
      .toDF("doc_id", "source")
    val wN = Sampling.temperatureWeights(withNull, "source", 0.5)
    assert(math.abs(wN(null) - 2.0) < 1e-12)
    val mixed = Sampling.mixtureSample(withNull, "source", "doc_id", wN)
      .groupBy("source").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("∅") -> r.getLong(1)).toMap
    assert(mixed("big") === 80L)
    assert(mixed("∅") >= 30L && mixed("∅") <= 50L,
      s"null source must get ~2 epochs of 20 rows, got ${mixed("∅")}")
  }

  test("temperatureMixture replicates the long tail, not the head") {
    val df = ((1L to 80L).map(i => (i, "big")) ++
      (81L to 100L).map(i => (i, "small"))).toDF("doc_id", "source")
    val out = Sampling.temperatureMixture(df, "source", "doc_id", 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("big") == 80L) // weight exactly 1 → one epoch
    // small: weight 2.0 → every key twice (fraction 0 → no gated copy)
    assert(out("small") == 40L)
  }

  test("lmQualityScore: hand-computed add-1 trigram conditionals") {
    val corpus = Seq(Tuple1("abab")).toDF("text")
    val tri = TextAnalysis.charNgramCounts(corpus, "text", 3) // aba:1 bab:1
    val bi = TextAnalysis.charNgramCounts(corpus, "text", 2) // ab:2 ba:1
    val docs = Seq((1L, "abab"), (2L, "xyz"), (3L, "zz")).toDF("doc_id", "text")
    val got = TextAnalysis.lmQualityScore(docs, "doc_id", "text", tri, bi,
        vocab = 128, k = 1.0)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect1 = BigDecimal((math.log(2.0 / 130) + math.log(2.0 / 129)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect2 = BigDecimal(math.log(1.0 / 128))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 3 has no trigram -> absent
    assert(got.toSeq === Seq((1L, 2L, expect1), (2L, 1L, expect2)))
  }

  test("unbounded LM gram tables refuse with guidance, never OOM") {
    // 4M+1 synthetic gram rows: the early-stopping count gate fires
    // before any collect/broadcast materialization
    val docs = Seq((1L, "abab")).toDF("doc_id", "text")
    val huge = spark.range(TextAnalysis.MaxLmTableEntries + 1)
      .selectExpr("concat('g', id) AS gram", "1 AS cnt")
      .select(col("gram"), col("cnt").cast("long").as("cnt"))
    val tiny = TextAnalysis.charNgramCounts(docs.select(col("text")),
      "text", 2)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.lmQualityScore(docs, "doc_id", "text", huge, tiny)
    }
    assert(e.getMessage.contains("prune it first"))
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.curationSignals(docs, "doc_id", "text",
        lmTri = huge, lmBi = tiny)
    }
    assert(e2.getMessage.contains("prune it first"))
  }

  test("minhashDedupAgainstCorpus: near-dups of the corpus drop, the rest survive") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "an entirely different corpus document about spark physical plans"))
      .toDF("cid", "text")
    val fresh = Seq(
      // verbatim corpus copy -> identical signature, certain candidate, J=1
      (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
      // one-word edit: trigram Jaccard well over 0.5 -> dropped
      (11L, "the quick brown fox jumps over the lazy cat near the river bank"),
      // shares vocabulary but few trigrams -> survives at 0.5
      (12L, "the lazy dog sleeps while the quick fox watches the river"),
      (13L, "completely unrelated fresh content goes here today"),
      (14L, "too short")) // < 3 tokens... (2 tokens) no signature -> survives
      .toDF("doc_id", "text")
    val got = DedupOps.minhashDedupAgainstCorpus(
        fresh, "text", "doc_id", corpus, "cid", "text",
        wordShingleN = 3, numHashes = 32, bands = 32, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(12L, 13L, 14L))
  }

  test("chunkTextOverlap: stride = size - overlap, tail kept, short doc = 1 chunk") {
    val df = Seq((1L, "abcdefghij"), (2L, "xy")).toDF("doc_id", "text")
    val got = Multimodal.chunkTextOverlap(df, "text", chunkSize = 6, overlap = 2)
      .select("doc_id", "chunk_index", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // doc 1 (len 10): starts at 0 and 4 -> "abcdef", "efghij"
    assert(got.filter(_._1 == 1L).sortBy(_._2).map(t => (t._2, t._3)).toSeq ===
      Seq((0, "abcdef"), (1, "efghij")))
    assert(got.filter(_._1 == 2L).map(t => (t._2, t._3)).toSeq === Seq((0, "xy")))
    // consecutive chunks share exactly `overlap` characters
    val c1 = got.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(c1(0).takeRight(2) === c1(1).take(2))
  }

  test("chunkText splits with index and drops empty chunks") {
    val df = Seq((1L, "a" * 250), (2L, "b" * 100)).toDF("doc_id", "text")
    val got = Multimodal.chunkText(df, "text", 100)
      .select("doc_id", "chunk_index", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2).length))
    assert(got.filter(_._1 == 1L).map(t => (t._2, t._3)).sorted.toSeq ===
      Seq((0, 100), (1, 100), (2, 50)))
    assert(got.filter(_._1 == 2L).map(t => (t._2, t._3)).toSeq === Seq((0, 100)))
  }

  test("PII scrub replaces emails, IPs, phones with typed tokens in order") {
    import org.apache.spark.sql.functions._
    val got = Seq(
      "mail a.b+c@ex-ample.org now",
      "host 192.168.001.7 up",
      "call +51 (99) 888-7766 pls",
      "none of the above 123")
      .toDF("t").select(TextAnalysis.scrubPii(col("t"))).as[String].collect()
    assert(got(0) === "mail <EMAIL> now")
    assert(got(1) === "host <IP> up")
    assert(got(2) === "call <PHONE> pls")
    assert(got(3) === "none of the above 123")
  }

  test("gopher repetition signals: looped text flagged, varied text low") {
    val docs = Seq(
      (1L, "spam ham spam ham spam ham spam ham"), // "spam ham" bigram loops
      (2L, "one two three four five six seven eight"), // all grams unique
      (3L, "x")) // fewer than 2 words: absent
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRepetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L))
    // doc 1: "spam ham" occurs 4x of 7 bigrams; every 5-gram repeats
    assert(got(0)._2 === "spam ham")
    assert(got(0)._3 === BigDecimal(4.0 * 8 / 35)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // every 5-gram repeats and the occurrences OVERLAP: the raw
    // count*length sum is 88 chars against a 35-char document (2.51) —
    // the cap keeps the reported coverage fraction at its ≤1 ceiling
    assert(got(0)._4 === 1.0)
    // doc 2: top bigram count 1, no duplicate 5-grams at all
    assert(got(1)._2 === "five six") // all counts 1 -> lexicographic tiebreak
    assert(got(1)._4 === 0.0)
  }

  test("bm25: multi-term match outranks single-term, rare term outranks common") {
    val docs = Seq(
      (1L, "spark merge spark other words here"), // both terms, spark twice
      (2L, "spark alone in this document text"),
      (3L, "merge alone in this document text"),
      (4L, "spark spark spark spark spark spark"), // tf saturation
      (5L, "nothing relevant at all here now"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopDocs(docs, "doc_id", "text",
        Seq("spark", "merge"), k = 4)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
    // doc 1 hits both terms -> top; doc 5 never appears
    assert(got.head._1 === 1L)
    assert(got.head._3 === 2L)
    assert(!got.map(_._1).contains(5L))
    // saturation: six spark occurrences don't six-x the score of one
    val d4 = got.find(_._1 == 4L).get._2
    val d2 = got.find(_._1 == 2L).get._2
    assert(d4 > d2 && d4 < d2 * 3)
    // ranks are dense and deterministic
    assert(got.map(_._4).toSeq === Seq(1, 2, 3, 4))
  }

  test("unicodeNorm composes combining marks; fingerprints then collide") {
    val rows = Seq(("cafe\u0301 latte", "caf\u00e9 latte")).toDF("dec", "comp")
    val r = rows.select(
      TextAnalysis.unicodeNorm(col("dec")).alias("n"),
      (TextAnalysis.fingerprint(TextAnalysis.unicodeNorm(col("dec"))) ===
        TextAnalysis.fingerprint(col("comp"))).alias("m"),
      TextAnalysis.unicodeNorm(col("comp"), "NFD").alias("d"))
      .collect().head
    assert(r.getString(0) === "caf\u00e9 latte")
    assert(r.getBoolean(1))
    assert(r.getString(2) === "cafe\u0301 latte")
  }

  test("url features: parse, normalize, blocklist") {
    val rows = Seq(
      (1L, "HTTPS://WWW.Example.COM:443/Path/x?utm_source=a&q=1&utm_medium=b#frag"),
      (2L, "http://bad.host.org:8080/p?utm_campaign=z"),
      (3L, "http://plain.net"),
      (4L, "https://sub.deep.example.co:443/a%20b?x=1&y=2"))
      .toDF("id", "url")
    val got = TextAnalysis.urlFeatures(rows, "url",
        blockedHosts = Seq("bad.host.org", "example.com"))
      .select("id", "scheme", "host", "domain", "url_norm", "is_blocked")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getBoolean(5)))
    assert(got(0) === ((1L, "https", "www.example.com", "example.com",
      "https://www.example.com/Path/x?q=1", true))) // domain blocklist hit
    assert(got(1) === ((2L, "http", "bad.host.org", "host.org",
      "http://bad.host.org:8080/p", true))) // non-default port kept, utm-only query dropped
    assert(got(2) === ((3L, "http", "plain.net", "plain.net",
      "http://plain.net", false)))
    assert(got(3) === ((4L, "https", "sub.deep.example.co", "example.co",
      "https://sub.deep.example.co/a%20b?x=1&y=2", false)))
  }

  test("tfidf top terms: corpus-wide terms score zero, rare terms rank first") {
    val docs = Seq(
      (1L, "apple apple banana shared"),
      (2L, "banana cherry shared"),
      (3L, "cherry date shared"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert(got(0) === ((1L, "apple", 2L, r4(2 * math.log(3.0)), 1)))
    assert(got(1) === ((1L, "banana", 1L, r4(math.log(1.5)), 2)))
    // "shared" appears in every doc -> ln(1) = 0, never outranks rare terms;
    // banana/cherry tie in doc 2 (tf=1, df=2 each) -> term-asc tiebreak
    assert(got.filter(_._1 == 2L).map(_._2).toSeq === Seq("banana", "cherry"))
    // ties (cherry/date in doc 3, both tf=1 df... cherry df=2, date df=1) -> date first
    assert(got.filter(_._1 == 3L).map(_._2).toSeq === Seq("date", "cherry"))
  }

  test("dedupLines keeps first occurrence of each line, order preserved") {
    import org.apache.spark.sql.functions._
    val got = Seq("b\na\nb\nc\na").toDF("t")
      .select(TextAnalysis.dedupLines(col("t"))).as[String].collect().head
    assert(got === "b\na\nc")
  }

  test("streaming exact dedup drops in-watermark re-occurrences, bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val src = mem.toDF().toDF("id", "text", "ts")
    val out = DedupOps.streamingExactDedup(src, "text", "ts", "10 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Int) = java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$s")
    mem.addData((1L, "same  doc", t0), (2L, "Same doc", ts(1)), (3L, "other", ts(2)))
    q.processAllAvailable()
    val ids = spark.sql("SELECT id FROM sdedup").as[Long].collect().sorted
    q.stop()
    // id 2 normalizes to the same fingerprint as id 1 → dropped
    assert(ids.toSeq === Seq(1L, 3L))
  }

  test("duplicate clusters: transitive chains collapse to the min key") {
    // chain 1-2, 2-3 (3 never paired with 1 directly) + island 10-11
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("key_a", "key_b")
    val got = DedupOps.duplicateClusters(pairs)
      .orderBy("key").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))

    // dedupByClusters keeps the min key per cluster + untouched rows
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (10L, "b"), (11L, "b"),
      (99L, "solo")).toDF("doc_id", "v")
    val kept = DedupOps.dedupByClusters(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 10L, 99L))
  }

  test("duplicate clusters converge on a long chain (diameter > 2)") {
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("key_a", "key_b")
    val got = DedupOps.duplicateClusters(chain).collect()
    assert(got.length === 9)
    assert(got.forall(_.getLong(1) === 1L), "all chain members label to min=1")
  }

  test("duplicate clusters with a reliable checkpoint dir: same labels, files land") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("key_a", "key_b")
    val got = DedupOps.duplicateClusters(chain, checkpointDir = Some(dir))
      .orderBy("key").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 9)
    assert(got.forall(_._2 === 1L))
    // reliable checkpoints actually materialized in the requested dir
    def anyFile(p: java.nio.file.Path): Boolean = {
      val s = java.nio.file.Files.walk(p)
      try s.anyMatch(f => java.nio.file.Files.isRegularFile(f))
      finally s.close()
    }
    assert(anyFile(java.nio.file.Paths.get(dir)),
      "checkpoint dir stayed empty — rounds still used localCheckpoint")
    // superseded rounds are swept as they are replaced: after convergence
    // only the final round's snapshot (backing the returned frame) remains.
    // The 8-node chain needs several propagation rounds, so an unswept run
    // would hold >1 round-* dir here.
    val runDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft-cc-"))
    assert(runDirs.length === 1)
    val rounds = runDirs.head.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("round-"))
    assert(rounds.length === 1,
      s"expected exactly one surviving round snapshot, got " +
        s"${rounds.map(_.getName).sorted.mkString(", ")}")
  }

  test("label propagation exits early on convergence, not at maxIters") {
    // a 6-clique converges in one propagation round (+1 to observe no
    // change); the surviving snapshot's round-NNNNN name is the total
    // round count, so a fixed-20-round loop would leave round-00020
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_ee").toString
    val clique = (for { a <- 1L to 6L; b <- (a + 1) to 6L } yield (a, b))
      .toDF("key_a", "key_b")
    val got = DedupOps.duplicateClusters(clique, maxIters = 20,
      checkpointDir = Some(dir)).collect()
    assert(got.length === 6)
    assert(got.forall(_.getLong(1) === 1L))
    val last = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft-cc-"))
      .head.listFiles().filter(_.getName.startsWith("round-"))
      .map(_.getName).max
    assert(last <= "round-00003",
      s"clique should converge in ~2 rounds, final snapshot was $last")
  }

  test("fast twins match portable twins pair-for-pair on exact duplicates") {
    // the bench-only q34_fast/q43_fast run the same pipelines with
    // non-portable production hashes; on a corpus of planted EXACT
    // duplicates both hash modes must produce the identical pair set
    // (hamming 0 / full fingerprint overlap regardless of hash function)
    val docs = (1L to 40L).map { i =>
      val base = s"document number ${i % 20} with stable words " +
        s"alpha beta gamma delta epsilon zeta eta theta ${i % 20}"
      (i, base)
    }.toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("key_a", "key_b").as[(Long, Long)].collect().toSet
    val simPortable = pairSet(DedupOps.simhashNearDups(
      docs, "text", "doc_id", maxDist = 0, portable = true))
    val simFast = pairSet(DedupOps.simhashNearDups(
      docs, "text", "doc_id", maxDist = 0, portable = false))
    assert(simPortable.nonEmpty)
    assert(simFast === simPortable)
    val winPortable = pairSet(DedupOps.winnowNearDups(
      docs, "text", "doc_id", minSharedFrac = 1.0, portable = true))
    val winFast = pairSet(DedupOps.winnowNearDups(
      docs, "text", "doc_id", minSharedFrac = 1.0, portable = false))
    assert(winPortable.nonEmpty)
    assert(winFast === winPortable)
  }

  test("gopher quality features: repetition and diversity caught, clean text passes") {
    val spam = "aa aa aa bb" // 4 words, top-word 0.75, unique 0.5, mean 2.0
    val clean = (1 to 50).map(i => s"word${i}xyz").mkString(" ") // 50 distinct 7-9 char words
    val df = Seq((1L, spam), (2L, clean)).toDF("doc_id", "text")
    val got = TextAnalysis.gopherQualityFeatures(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) === 4L)
    assert(got(0).getDouble(2) === 2.0)            // mean_word_len
    assert(got(0).getDouble(3) === 0.5)            // frac_unique_words
    assert(got(0).getDouble(4) === 0.75)           // top_word_frac
    assert(!got(0).getBoolean(5), "repetitive short text must fail")
    assert(got(1).getLong(1) === 50L)
    assert(got(1).getDouble(3) === 1.0)
    assert(got(1).getBoolean(5), "diverse text inside all bounds must pass")
  }

  test("decontamination flags only docs sharing an n-gram with the benchmark") {
    val benchText = "the quick brown fox jumps over the lazy dog tonight"
    // doc 1 contains an 8-gram of the benchmark; doc 2 shares words but no 8-gram
    val contaminated = s"prefix words $benchText suffix words"
    val innocent = "quick brown cat naps over a lazy dog tonight and tomorrow"
    val docs = Seq((1L, contaminated), (2L, innocent)).toDF("doc_id", "text")
    val bench = Seq(Tuple1(benchText)).toDF("text")
    val got = DedupOps.contaminatedDocs(docs, "doc_id", "text", bench, "text", n = 8)
      .orderBy("key").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L), "only doc 1 is contaminated")
    // benchText has 10 words → 3 distinct 8-grams, all inside doc 1
    assert(got(0).getLong(1) === 3L)
  }

  test("c4 cleaning: line rules rewrite, doc rules flag") {
    val text = "good sentence stays right here.\n" + // kept
      "too short.\n" +                               // < 3 words
      "no terminal punctuation at all\n" +           // bad ending
      "please enable javascript to continue.\n" +    // keyword
      "ends with a question, kept?\n" +              // kept ('?')
      "lorem ipsum makes the doc drop."              // kept line, doc flagged
    val df = Seq((1L, text), (2L, "clean { with brace.")).toDF("doc_id", "text")
    val got = TextAnalysis.c4CleanLines(df, "text").orderBy("doc_id").collect()
    assert(got(0).getAs[String]("c4_text") ===
      "good sentence stays right here.\nends with a question, kept?\n" +
        "lorem ipsum makes the doc drop.")
    assert(got(0).getAs[Int]("n_kept_lines") === 3)
    assert(!got(0).getAs[Boolean]("doc_keep"), "lorem ipsum flags the doc")
    assert(!got(1).getAs[Boolean]("doc_keep"), "curly brace flags the doc")
  }

  test("hash sampling is deterministic, keyed, and roughly proportional") {
    val df = (1L to 2000L).toDF("id")
    val s1 = Sampling.hashSample(df, "id", 0.25).as[Long].collect().sorted
    val s2 = Sampling.hashSample(df, "id", 0.25).as[Long].collect().sorted
    assert(s1.toSeq === s2.toSeq, "same key set every run")
    assert(s1.length > 2000 * 0.15 && s1.length < 2000 * 0.35)
    // monotone: a larger fraction strictly contains a smaller one
    val s3 = Sampling.hashSample(df, "id", 0.50).as[Long].collect().toSet
    assert(s1.forall(s3.contains), "fraction gates must nest")
  }

  test("stratified hash sampling applies per-stratum fractions") {
    val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
    val got = Sampling.stratifiedHashSample(df, "stratum", "id",
      Map("a" -> 1.0, "b" -> 0.0))
    assert(got.filter($"stratum" === "b").count() === 0)
    assert(got.filter($"stratum" === "a").count() === 500)
  }

  test("weightedSample: per-row keep probability, clamped, deterministic") {
    val df = (1L to 2000L).map(i =>
      (i, if (i <= 500) 0.0 else if (i <= 1000) 1.0
          else if (i <= 1500) 0.25 else 7.5)) // >1 clamps to certain keep
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w")
    assert(got.filter($"id" <= 500).count() === 0, "weight 0 drops all")
    assert(got.filter($"id" > 500 && $"id" <= 1000).count() === 500,
      "weight 1 keeps all")
    assert(got.filter($"id" > 1500).count() === 500, "weight > 1 clamps to 1")
    val quarter = got.filter($"id" > 1000 && $"id" <= 1500).count()
    assert(quarter > 500 * 0.15 && quarter < 500 * 0.35,
      s"weight 0.25 keeps ~a quarter, got $quarter")
    // deterministic: same result on re-evaluation
    assert(got.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Sampling.weightedSample(df, "id", "w").select("id")
        .collect().map(_.getLong(0)).sorted.toSeq)
    // negative weights behave as 0, never throw
    val neg = Seq((1L, -0.5)).toDF("id", "w")
    assert(Sampling.weightedSample(neg, "id", "w").count() === 0)
  }

  test("weightedSample decorrelates from hashSample on the same key") {
    // unsalted gates share one hash: chaining a 0.5-rate sample with a
    // 0.5-weight retention would keep min(.5,.5)=50% instead of 25%.
    // the ':weighted' salt makes the decisions independent: ~25%
    val df = (1L to 4000L).map(i => (i, 0.5)).toDF("id", "w")
    val chained =
      Sampling.weightedSample(Sampling.hashSample(df, "id", 0.5), "id", "w")
        .count()
    assert(chained > 4000 * 0.18 && chained < 4000 * 0.32,
      s"expected ~25% of 4000 after independent 0.5 x 0.5 gates, got $chained")
  }

  test("leakageSafeSplit: clusters co-locate, bands stay, salts decorrelate") {
    // two clusters — {1,2,3} (chain) and {10,11} — plus singletons
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("key_a", "key_b")
    val got = Sampling.leakageSafeSplit(docs, "id", pairs,
      Seq(("train", 0.5), ("val", 0.25), ("test", 0.25)))
    assert(got.count() === 40)
    // cluster members share rep AND split
    val byId = got.select($"id", $"cluster_rep", $"split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(Seq(1L, 2L, 3L).map(byId(_)._1).distinct === Seq(1L))
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).distinct.size === 1,
      "near-dup cluster must land in one split")
    assert(Seq(10L, 11L).map(byId).distinct.size === 1)
    assert(byId(20L)._1 === 20L, "singletons represent themselves")
    // every band non-empty at this size, all three names used
    assert(got.select("split").distinct().count() === 3)
    // deterministic on re-evaluation
    assert(Sampling.leakageSafeSplit(docs, "id", pairs,
        Seq(("train", 0.5), ("val", 0.25), ("test", 0.25)))
      .select($"id", $"split").as[(Long, String)].collect().toSet ===
      got.select($"id", $"split").as[(Long, String)].collect().toSet)
    // the ':split' salt decorrelates from hashSample on the same keys:
    // half-rate sample of the train band keeps ~50% of it, not 0%/100%
    val train = got.filter($"split" === "train")
    val sampled = Sampling.hashSample(train, "id", 0.5).count().toDouble
    assert(sampled > 0 && sampled < train.count(),
      "sampling within a split must not be all-or-nothing")
    // weights must sum to 1 and be positive
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit(docs, "id", pairs, Seq(("train", 0.5)))
    }
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit(docs, "id", pairs,
        Seq(("a", 1.5), ("b", -0.5)))
    }
  }

  test("dedupParagraphsAgainstCorpus: store owns blocks, batch keeps first") {
    val corpus = Seq((1L, "shared block\n\ncorpus only")).toDF("doc_id", "text")
    val batch = Seq(
      // "shared  block" rewrapped: still cut (whitespace-insensitive)
      (10L, "shared  block\n\nfresh text"),
      (11L, "fresh text\n\n\n\nmore"), // fresh claimed by 10; empty kept
      (12L, "more")) // claimed by 11
      .toDF("doc_id", "text")
    val got = TextAnalysis.dedupParagraphsAgainstCorpus(
        batch, "doc_id", "text", corpus, "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got === Seq(
      (10L, "fresh text"),
      (11L, "\n\nmore"), // first block cut, empty block survives
      (12L, "")))
    // fingerprint-store path decides identically
    val viaStore = TextAnalysis.dedupParagraphsAgainstFingerprints(
        batch, "doc_id", "text",
        TextAnalysis.paragraphFingerprints(corpus, "text"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(viaStore === got)
  }

  test("decontaminate filter form: contaminated rows anti-joined away, content intact") {
    val words = (1 to 40).map(i => s"w$i")
    val clean = (1 to 40).map(i => s"c$i")
    val corpus = Seq(
      (1L, words.mkString(" ")), // carries the benchmark passage → drop
      (2L, clean.mkString(" ")), // disjoint vocabulary → keep
      // 12 consecutive benchmark words (one short of a 13-gram) → keep
      (3L, (words.slice(5, 17) ++ Seq("zzz") ++ clean.take(10)).mkString(" ")),
      (4L, "too short to matter"), // keep
      (5L, null.asInstanceOf[String]) // keep: nothing to share
    ).toDF("doc_id", "text")
    // benchmark = words 6..26 of the passage (21 words → 9 thirteen-grams)
    val bench = Seq(words.slice(5, 26).mkString(" ")).toDF("btext")
    val kept = DedupOps.decontaminate(corpus, "doc_id", "text",
        bench, "btext", n = 13)
      .orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(kept.map(_._1) === Seq(2L, 3L, 4L, 5L))
    // survivors keep their original bytes
    assert(kept.head._2 === clean.mkString(" "))
    // n is honored: at n = 12 doc 3's 12-word benchmark run now drops it
    val at12 = DedupOps.decontaminate(corpus, "doc_id", "text",
        bench, "btext", n = 12)
      .select("doc_id").as[Long].collect().toSet
    assert(!at12.contains(3L) && !at12.contains(1L))
    assert(at12.contains(2L))
  }

  test("redactPii: staged email/IP/phone redaction with audit counts") {
    val docs = Seq(
      (1L, "mail alice.b+work@sub.example.org or bob@x.io today"),
      (2L, "server 192.168.1.100 and 10.0.0.1 are up"),
      (3L, "call +51 999-123-456 or (01) 234-5678-901"),
      (4L, "user123@h.co from 8.8.8.8 dialed +14155550123"),
      (5L, "clean text with the number 42 and v1.2 nothing else"),
      (6L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 === 2L) // two emails
    assert(byId(1L)._5 === "mail <EMAIL> or <EMAIL> today")
    assert(byId(2L)._3 === 2L) // two IPs, no phones conjured from them
    assert(byId(2L)._4 === 0L)
    assert(byId(2L)._5 === "server <IP> and <IP> are up")
    assert(byId(3L)._4 === 2L) // two phone-shaped runs
    // "(01) " has TWO separators between 1 and 2 — the run restarts at 2
    assert(byId(3L)._5 === "call <PHONE> or (01) <PHONE>")
    // staged order: the email is consumed FIRST, so its digits are
    // never counted as a phone; the IP never reads as a phone either
    assert(byId(4L)._2 === 1L && byId(4L)._3 === 1L && byId(4L)._4 === 1L)
    assert(byId(4L)._5 === "<EMAIL> from <IP> dialed <PHONE>")
    // short digit runs and version strings survive untouched
    assert(byId(5L)._5 === docs.filter($"doc_id" === 5L)
      .select("text").as[String].head())
    assert(byId(6L)._5 === "")
  }

  test("corpusDiff: added/removed/changed by normalized fingerprint") {
    val oldSnap = Seq(
      (1L, "kept exactly"), (2L, "will change"), (3L, "will vanish"),
      (4L, "Formatting  Only")).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "kept exactly"), (2L, "has changed"), (5L, "brand new"),
      (4L, "formatting only")) // case/space variant: NOT a change
      .toDF("doc_id", "text")
    val got = TextAnalysis.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
  }

  test("encodingQuality: replacement/C1/mojibake counts and the ok flag") {
    val docs = Seq(
      (1L, "perfectly clean ascii text that is long enough to pass"),
      (2L, "café naïve résumé"), // real accents: clean
      (3L, "damaged cafÃ© and â€™quotedâ€™"), // mojibake
      (4L, "ctrl\u0085here and \u0090there"), // C1 controls
      (5L, "gave up \uFFFD\uFFFD on these bytes"),
      (6L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.encodingQuality(docs, "doc_id", "text")
      .select($"doc_id", $"n_replacement", $"n_c1_controls", $"n_mojibake",
        $"enc_ok")
      .as[(Long, Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === (1L, 0L, 0L, 0L, true))
    assert(got(2L) === (2L, 0L, 0L, 0L, true), "real accents are not damage")
    assert(got(3L)._4 === 3L) // Ã© + two â€™ prefixes
    assert(!got(3L)._5)
    assert(got(4L)._3 === 2L && !got(4L)._5)
    assert(got(5L)._2 === 2L && !got(5L)._5)
    assert(got(6L)._5 === true, "empty doc is ok, not a division by zero")
  }

  test("corpusProfile: volume, emptiness, and dup-rate in one row") {
    val df = Seq(
      (1L, "one two three four five six seven eight nine ten eleven"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (3L, "short doc"),
      (4L, " ")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.corpusProfile(df, "text").head()
    assert(r.getAs[Long]("docs") === 4)
    assert(r.getAs[Long]("empty_docs") === 1)
    assert(r.getAs[Long]("short_docs") === 2) // "short doc" + the blank
    assert(r.getAs[Long]("distinct_docs") === 3) // docs 1 and 2 collapse
    assert(r.getAs[Double]("dup_rate") === 0.25)
    assert(r.getAs[Long]("total_chars") ===
      df.collect().map(_.getString(1).length).sum)
  }

  test("ngram counts: occurrence counts with total ordering") {
    val df = Seq("a b a b c", "a b").toDF("text")
    val got = TextAnalysis.ngramCounts(df, "text", 2, 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
    val uni = TextAnalysis.ngramCounts(df, "text", 1, 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(uni.toSeq === Seq(("a", 3L), ("b", 3L)))
  }

  test("multimodal stub pipeline preserves schema and partitioning shape") {
    val df = Seq(
      (1L, "image", Array[Byte](1, 2, 3), null.asInstanceOf[String], "/a", Map("k" -> "v"))
    ).toDF("asset_id", "modality", "content", "mime_type", "source_path", "meta")
    val out = Multimodal.extractImageFeatures(df, dim = 4)
    val row = out.collect().head
    assert(out.columns.takeRight(4).toSeq === Seq("width", "height", "channels", "feature"))
    assert(row.getAs[Seq[Float]]("feature").size === 4)
  }
}
