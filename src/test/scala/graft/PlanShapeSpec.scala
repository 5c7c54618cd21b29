package graft

import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape assertions: the 100 TB contract is not just correct results
  * but the *right* physical plan — filters reaching the parquet scan,
  * small dims broadcast, codegen'd projections, no accidental cartesian
  * products.
  */
class PlanShapeSpec extends SparkTestBase {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.collect() // finalize the AQE plan so codegen stages are visible
    df.queryExecution.executedPlan.toString
  }

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q02 filter/projection pushed to parquet scan") {
    val plan = executedPlan("q02_filter_project")
    assert(plan.contains("PushedFilters:") &&
      plan.contains("l_quantity"), s"expected pushed filters in:\n$plan")
    // pruned read schema: only the 5 referenced columns, not all 11
    assert(plan.contains("l_extendedprice") && !plan.contains("l_partkey"),
      "projection should prune unreferenced columns")
  }

  test("q03 multi-join broadcasts the small dimensions") {
    val plan = executedPlan("q03_join_agg")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q01 aggregation is whole-stage codegen'd with partial aggregation") {
    val plan = executedPlan("q01_pricing_summary")
    assert(plan.contains("*(")) // whole-stage-codegen stages print as *(n)
    // map-side combine: a partial_ aggregate before the exchange
    assert(plan.contains("partial_"), s"expected partial aggregation in:\n$plan")
  }

  test("q06 keep-latest is a single shuffle window, no extra exchange") {
    val df = SparkEntry.queries("q06_keep_latest")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    // one hash exchange for the window partitioning + one range for orderBy
    assert(exchanges <= 3, s"too many exchanges ($exchanges) in:\n$plan")
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"))
  }

  test("q48 document extraction stays in Tungsten: no RDD scan node") {
    val df = SparkEntry.queries("q48_doc_extract")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"),
      s"DocExtractText should run in the scan projection, not an RDD map:\n$plan")
    assert(plan.contains("graft_doc_extract") || plan.contains("DocExtractText"),
      s"expected the native extraction expression in:\n$plan")
  }

  test("q43 winnow pipeline reuses its shuffles: one corpus scan, not four") {
    val df = SparkEntry.queries("q43_winnow_neardup")(spark, sf0001)
    df.collect() // finalize AQE so reuse nodes are visible
    // true node counts need a tree walk: the plan STRING re-prints the
    // referenced subtree under every ReusedExchange, inflating any textual
    // scan count
    var scans = 0
    var reused = 0
    def go(n: SparkPlan): Unit = n match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        go(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        go(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        reused += 1 // leaf: references an exchange computed elsewhere
      case other =>
        if (other.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
          scans += 1
        other.children.foreach(go)
    }
    go(df.queryExecution.executedPlan)
    // frequency pass + nfp aggregate + both self-join sides all derive from
    // the exploded fingerprint frame; exchange reuse must collapse them
    // onto one physical corpus scan — which is why no explicit persist is
    // needed (or wanted: a cache barrier measured strictly slower)
    assert(reused >= 1, "expected ReusedExchange nodes in the winnow plan")
    // 2 = the q43 harness's own unionByName (corpus ∪ re-keyed corpus)
    // scanning its input twice; the dedup pipeline itself adds none on top
    assert(scans <= 2,
      s"winnow pipeline physically scans the corpus $scans times")
  }

  test("q33 minhash near-dup join is not a cartesian product") {
    val df = SparkEntry.queries("q33_minhash_neardup")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "LSH candidate join must be an equi-join on band keys")
  }

  test("native signatures are scan-projection-local: no aggregate exchange") {
    import org.apache.spark.sql.functions._
    import graft.llmops.{DedupOps, Similarity}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // simhash / minhash / lsh-bucket computation must add ZERO exchanges —
    // they are per-row expressions inside the scan projection (the explode
    // + wide-buffer groupBy forms they replaced each cost a full shuffle)
    val sim = docs.select(col("doc_id"),
      DedupOps.simhash64Native(col("text")).alias("s"))
    val simPlan = sim.queryExecution.executedPlan.toString
    assert(!simPlan.contains("Exchange") && !simPlan.contains("HashAggregate"),
      s"simhash must be shuffle-free:\n$simPlan")

    val sig = docs.select(col("doc_id"),
      DedupOps.minhashSigNative(col("text"), 3, 16).alias("sig"))
    val sigPlan = sig.queryExecution.executedPlan.toString
    assert(!sigPlan.contains("Exchange") && !sigPlan.contains("HashAggregate"),
      s"minhash signature must be shuffle-free:\n$sigPlan")

    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val bk = emb.select(col("vec_id"),
      Similarity.lshBucketsNative(col("embedding"), 12, 4).alias("b"))
    val bkPlan = bk.queryExecution.executedPlan.toString
    assert(!bkPlan.contains("Exchange") && !bkPlan.contains("HashAggregate"),
      s"lsh buckets must be shuffle-free:\n$bkPlan")
  }

  test("q45 embedding near-dup has no ranking window in the plan") {
    val df = SparkEntry.queries("q45_embedding_neardup")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"threshold dedup must not pay a per-query ranking window:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q75 bm25: broadcast stats/df joins, TakeOrdered top-k, no cartesian") {
    val plan = executedPlan("q75_bm25")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), // 1-row stats cross join
      s"df/stats must ride broadcast joins:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must be TakeOrderedAndProject, not a full sort:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q80 lm quality: LM tables broadcast, no cartesian") {
    val plan = executedPlan("q80_lm_quality")
    assert(plan.contains("BroadcastHashJoin"),
      s"bounded LM count tables must broadcast against the doc grams:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q79 incremental near-dup: equi-joins on band keys, anti-join survivors") {
    val plan = executedPlan("q79_neardup_against")
    assert(!plan.contains("CartesianProduct"),
      s"candidate generation must be an equi-join on (band, band_hash):\n$plan")
    assert(plan.contains("LeftAnti"),
      s"survivors must come from an anti-join on confirmed dup keys:\n$plan")
  }

  test("q76 incremental dedup: anti-join, reference digests broadcast") {
    val plan = executedPlan("q76_dedup_against")
    assert(plan.contains("LeftAnti"), s"expected an anti-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"small reference digest set must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q71 tfidf: partial aggregation before both shuffles, no cartesian") {
    val plan = executedPlan("q71_tfidf")
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"tf counting must map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q65 group quantiles: percentile aggregates with map-side partials") {
    val plan = executedPlan("q65_group_quantiles")
    assert(plan.contains("partial_percentile") || plan.contains("partial_"),
      s"percentile must partial-aggregate before the exchange:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q88 exact-substring dedup: one-shuffle window cutStarts, native kernels") {
    val plan = executedPlan("q88_substring_dedup")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"dup detection must stay equi-keyed on the gram hash:\n$plan")
    // cutStarts is materialized via localCheckpoint (freed by the
    // ContextCleaner once unreferenced, unlike a CacheManager persist);
    // the returned plan must read those blocks, not recompute the
    // per-position gram pass
    assert(plan.contains("ExistingRDD") ||
      plan.contains("InMemoryTableScan"),
      s"cutStarts must be read from materialized blocks:\n$plan")
    assert(plan.contains("graft_cut_spans") || plan.contains("CutSpans"),
      s"the cut must run in the native kernel:\n$plan")
    // r18 shape of the checkpointed stage: the gram table crosses exactly
    // ONE exchange (the __h window — row_number > 1 IS "non-first
    // occurrence of a duplicated gram") before the per-doc aggregate;
    // the old groupBy+join shape shuffled it twice and needed a persist
    import org.apache.spark.sql.functions.col
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val grams = graft.llmops.DedupOps
      .substringGrams(src, "text", "doc_id", 40, portable = true)
    val cuts = graft.llmops.DedupOps.substringCutStarts(grams)
    cuts.collect()
    val cplan = cuts.queryExecution.executedPlan.toString
    assert(cplan.contains("graft_md5_position_hashes"),
      s"portable grams must run the native one-pass md5 kernel:\n$cplan")
    // AQE's toString prints Final + Initial sections; count only the final
    val cfinal = cplan.split("== Initial Plan ==").head
    val gramExchanges = "Exchange hashpartitioning\\(__h".r
      .findAllIn(cfinal).size
    assert(gramExchanges === 1,
      s"gram table must cross exactly one __h exchange, got $gramExchanges:\n$cplan")
    assert(!cplan.contains("SortMergeJoin") && !cplan.contains("BroadcastHashJoin"),
      s"window form needs no join back to the gram table:\n$cplan")
    assert(!cplan.contains("CartesianProduct") &&
      !cplan.contains("BroadcastNestedLoopJoin"),
      s"cut-start derivation must stay equi-keyed:\n$cplan")
  }

  test("q96 fused curation signals: one corpus scan, corpus never shuffled") {
    val plan = executedPlan("q96_curation_signals")
    val finalPart = plan.split("== Initial Plan ==").head
    // run separately, the four signal operators scan the corpus 4+ times
    // and shuffle it three; fused, the corpus parquet is read ONCE and
    // corpus rows reach the output without any hash exchange. The LM
    // tables train in their own eager jobs at plan-construction time and
    // ride the task binary inside the CharTrigramLm kernel, so the query
    // plan itself contains NO lm-side scans or joins at all
    val scans = "FileScan parquet".r.findAllIn(finalPart).size
    assert(scans === 1,
      s"expected exactly 1 corpus scan, got $scans:\n$plan")
    assert(finalPart.contains("graft_char_trigram_lm"),
      s"lm score must be the native kernel in the scan projection:\n$plan")
    assert(!finalPart.contains("Exchange hashpartitioning(doc_id"),
      s"corpus rows must not be hash-shuffled:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      s"signals must be per-row expressions, not windows/joins:\n$plan")
  }

  test("q99/q103 banded fingerprint joins: equi-join on chunks, no cartesian") {
    for (name <- Seq("q99_image_neardup", "q103_audio_neardup",
        "q112_image_neardup_mixed", "q118_spectral_neardup")) {
      val plan = executedPlan(name)
      // the pigeonhole self-join must be an equi-join on the chunk key —
      // a cartesian or BNLJ here means all-pairs at corpus scale
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name must stay bucketed, never all-pairs:\n$plan")
      // decode happens once: the eagerly checkpointed chunk table feeds
      // both sides (localCheckpoint materializes to ExistingRDD — chosen
      // over persist so per-micro-batch callers don't pin CacheManager
      // entries forever)
      assert(plan.contains("Scan ExistingRDD"),
        s"$name must join the materialized chunk table, not re-decode:\n$plan")
      assert(!plan.contains("graft_png_dhash") &&
        !plan.contains("graft_jpeg_dhash") &&
        !plan.contains("graft_wav_envelope_hash") &&
        !plan.contains("graft_wav_spectral_hash"),
        s"$name fingerprint decode must happen before the checkpoint:\n$plan")
    }
  }

  test("q101/q105 incremental screens: anti-join survivors, no cartesian") {
    for (name <- Seq("q101_image_dedup_against",
        "q105_paragraph_dedup_against", "q119_video_dedup_against")) {
      val plan = executedPlan(name)
      assert(plan.contains("LeftAnti"),
        s"$name survivors must be an anti-join:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$name must not cross batch × corpus:\n$plan")
    }
  }

  test("q104/q106 are projection + narrow-join shaped: no window, no cartesian") {
    val p104 = executedPlan("q104_encoding_quality")
    assert(!p104.contains("Window") && !p104.contains("CartesianProduct") &&
      !p104.contains("Exchange hashpartitioning"),
      s"encoding screen must be a pure per-row projection:\n$p104")
    val p106 = executedPlan("q106_corpus_diff")
    assert(p106.contains("FullOuter") && !p106.contains("CartesianProduct"),
      s"corpus diff must be one full-outer equi-join:\n$p106")
  }

  test("q129 decontamination filter: bench grams broadcast, anti-join, no cartesian") {
    val plan = executedPlan("q129_decontaminate_filter")
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark gram set must broadcast (eval sets are tiny vs the corpus):\n$plan")
    assert(plan.contains("LeftAnti"),
      s"the shipped set must be an anti-join on contaminated keys:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q128/q12 window aggregation: map-side partials, no extra exchange") {
    for (name <- Seq("q12_hourly_events", "q128_sliding_events")) {
      val plan = executedPlan(name)
      assert(plan.contains("partial_"),
        s"$name must partially aggregate before the shuffle:\n$plan")
      val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(hashEx <= 2, // one for the agg (AQE may print it twice)
        s"$name should shuffle once on (window, keys), saw $hashEx:\n$plan")
      assert(!plan.contains("CartesianProduct"))
    }
  }

  test("q130 pii redaction is a pure per-row projection: no shuffle before orderBy") {
    val plan = executedPlan("q130_pii_redact")
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Window") && !plan.contains("CartesianProduct"),
      s"redaction must ride the scan partitioning:\n$plan")
  }

  test("q125 mixed-container video near-dup: equi-join on frame hash, no cartesian") {
    val plan = executedPlan("q125_video_neardup_mixed")
    assert(!plan.contains("CartesianProduct"),
      s"candidate generation must stay an equi-join:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"the stop-frame screen anti-join must be in the plan:\n$plan")
  }

  test("q87 llm judge adds no shuffle: score columns ride the scan partitioning") {
    val df = SparkEntry.queries("q87_llm_judge")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the batched-client operator appends columns via mapPartitions; the
    // only exchange allowed is the final orderBy's range partitioning
    // (AQE prints the plan twice, so count kinds, not occurrences)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"scoreColumn must not reshuffle rows:\n$plan")
    assert(plan.contains("Exchange rangepartitioning"),
      s"expected only the final orderBy exchange:\n$plan")
  }

  test("url canonicalization + blocklist screen are scan-projection-local") {
    import org.apache.spark.sql.functions._
    import graft.llmops.UrlCuration
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("url", concat(lit("https://h"), col("doc_id"), lit(".example.com/p?b=2&a=1")))
    // canonical key + host + domain + the blocklist verdict are all
    // per-row native kernels; the blocklist itself rides the task binary
    // (no join), so the whole URL-curation pass adds ZERO exchanges
    val screened = UrlCuration.blocklistScreen(
      docs.select(col("doc_id"),
        UrlCuration.urlNormalize(col("url")).as("curl"),
        UrlCuration.urlDomain(col("url")).as("domain"),
        col("url")),
      "url", Set("blockedsite.com"))
    val plan = screened.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("HashAggregate") &&
      !plan.contains("Join"),
      s"url curation must be one scan projection:\n$plan")
  }

  test("curateCrawl: one broadcast join, one keep-latest shuffle, no cartesian") {
    import org.apache.spark.sql.functions._
    val arch = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    import spark.implicits._
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /x/"))
      .toDF("host", "robots_txt")
    val plan = graft.llmops.Warc.curateCrawl(arch, "doc_id", "content",
      robots = Some(robots), blockedDomains = Set("bad.com"))
      .queryExecution.executedPlan.toString
    // the robots table joins broadcast; the CORPUS shuffles exactly once
    // (the keep-latest window on the canonical key). A second exchange is
    // permitted only on the SIDE robots table: its per-host dedup
    // aggregation (a duplicated host must never duplicate corpus rows)
    // partitions bounded side-input rows, not the corpus
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Cartesian"),
      plan.take(2000))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 2, s"expected at most two shuffles:\n${plan.take(3000)}")
    val corpusShuffles =
      "Exchange hashpartitioning\\(url_key".r.findAllIn(plan).size
    assert(corpusShuffles <= 1,
      s"corpus must shuffle once (keep-latest only):\n${plan.take(3000)}")
    assert("Exchange hashpartitioning\\(__host".r.findAllIn(plan).size
      == shuffles - corpusShuffles,
      s"extra exchanges must be the side-table host dedup:\n${plan.take(3000)}")
  }

  test("named-codec decode (brotli) is scan-projection local: no shuffle") {
    import org.apache.spark.sql.functions._
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    val df = src.withColumn("plain",
        graft.llmops.Compression.decodeCol(col("content"), "br")
          .cast("string"))
      .select(col("doc_id"), length(col("plain")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(plan.contains("graft_decode"), plan.take(2000))
  }

  test("decompress + parse pipelines stay in the scan projection: no shuffle") {
    import org.apache.spark.sql.functions._
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    // decompress → string → screen: a pure per-row kernel chain must add
    // no exchange and stay inside one WholeStageCodegen span with the scan
    val df = src.withColumn("plain",
        graft.llmops.Compression.decompressCol(col("content")).cast("string"))
      .filter(col("plain").isNotNull)
      .select(col("doc_id"), length(col("plain")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    // "*(1)" prefixes = one whole-stage-codegen span over filter+project
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"),
      plan.take(2000))
    assert(plan.contains("graft_decompress"), plan.take(2000))
  }

  test("code-corpus screens are pure scan projections: no shuffle") {
    import org.apache.spark.sql.functions._
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        concat(lit("f"), col("doc_id")).as("path"), col("text"))
    // language + license + quality + secret screen chained: one codegen
    // span on top of the scan, zero exchanges
    val df = graft.llmops.Secrets.screen(
      graft.llmops.CodeCorpus.qualitySignals(
        src.withColumn("lang", graft.llmops.CodeCorpus.language(
            col("path"), col("text")))
          .withColumn("license",
            graft.llmops.CodeCorpus.license(col("text"))),
        "text"),
      "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(plan.contains("*(1) Project"), plan.take(2000))
  }

  test("repo packing is exactly one hash exchange (the per-repo groupBy)") {
    import org.apache.spark.sql.functions._
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(concat(lit("r"), pmod(col("doc_id"), lit(10))).as("repo"),
        concat(lit("src/f"), col("doc_id"), lit(".py")).as("path"),
        col("text").as("content"))
    val df = graft.llmops.RepoContext.pack(src, "repo", "path", "content",
      maxChars = 10000L)
    df.collect()
    // the AQE plan string repeats the tree under "== Initial Plan ==";
    // count only the final section
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected exactly 1 hash exchange, got $hashEx:\n" +
      plan.take(2000))
  }

  test("fim transform adds no exchange over the scan") {
    import org.apache.spark.sql.functions._
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val df = graft.llmops.Fim.transform(src, "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }
}
