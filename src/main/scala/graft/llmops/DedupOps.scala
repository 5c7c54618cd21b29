package graft.llmops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for LLM corpus curation, from exact to fuzzy.
  *
  * Scale design: every variant is blocking-based — candidates are generated
  * by equality on a computed key (hash, LSH band, SimHash chunk), so the
  * only shuffles are hash-partitioned groupBys/joins on those keys and the
  * engine never goes O(n²) in the corpus size. This is the standard
  * MinHash/LSH construction (Broder 1997; Leskovec-Rajaraman-Ullman ch. 3).
  */
object DedupOps {

  /** Exact dedup on normalized text: keeps the row with the smallest
    * `keyCol` per fingerprint (deterministic winner).
    */
  def exactDedup(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    // NULL text gives a NULL fingerprint, and window partitioning groups
    // every NULL TOGETHER — distinct failed-extraction rows would
    // collapse to one arbitrary survivor. NULL-text rows are duplicates
    // of nothing (the same posture dedupAgainstCorpus gets from NULL
    // never equaling NULL): exempt them from the keep-first window.
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(keyCol))
    df.withColumn("__rn",
        when(col(textCol).isNull, lit(1)).otherwise(row_number().over(w)))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Incremental-corpus dedup: drop documents whose normalized fingerprint
    * already exists in a reference corpus (data previously trained on, an
    * earlier crawl snapshot) — the cross-snapshot counterpart of
    * [[exactDedup]]. An anti-join on the md5 fingerprint: both sides
    * shuffle on a 32-char key at worst; when the reference digest set is
    * small (the usual case when `ref` is a pre-computed fingerprint table)
    * AQE broadcasts it and the new corpus never shuffles at all.
    */
  def dedupAgainstCorpus(df: DataFrame, textCol: String,
      ref: DataFrame, refTextCol: String): DataFrame = {
    val refFps = ref
      .select(TextAnalysis.fingerprint(col(refTextCol)).alias("__fp"))
      .distinct()
    df.join(refFps,
      TextAnalysis.fingerprint(col(textCol)) === col("__fp"), "left_anti")
  }

  /** LSH band rows for a document set: one narrow (keyAlias, band,
    * band_hash) row per band per doc, computed in the scan projection by
    * the native signature kernel. This IS the signature-store schema — a
    * growing corpus persists this table alongside its text so incremental
    * near-dup ([[minhashDedupAgainstCorpus]],
    * [[graft.streaming.CorpusIngest]]) costs O(batch) per batch instead of
    * re-signing the corpus. Docs with fewer than `wordShingleN` tokens
    * have no signature and emit no rows.
    */
  def minhashBandRows(df: DataFrame, textCol: String, keyCol: String,
      keyAlias: String, wordShingleN: Int, numHashes: Int,
      bands: Int): DataFrame = {
    // bands must tile the signature exactly: bands > numHashes makes every
    // band_hash the hash of an EMPTY slice — one constant key, so the
    // candidate join degenerates into the O(n²) cross product the banding
    // exists to prevent; a non-dividing count silently ignores trailing
    // hashes (changed recall with no warning)
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) with " +
        "rowsPerBand >= 1 — the LSH banding is only meaningful when the " +
        "bands tile the signature exactly")
    val rowsPerBand = numHashes / bands
    val sigged = df
      .select(col(keyCol).alias(keyAlias),
        minhashSigNative(col(textCol), wordShingleN, numHashes).alias("sig"))
      .filter(size(col("sig")) > 0)
    val bandStructs = (0 until bands).map { b =>
      val bandCols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => element_at(col("sig"), i + 1).cast("string"))
      struct(lit(b).alias("band"),
        xxhash64(concat_ws("_", bandCols: _*)).alias("band_hash"))
    }
    sigged
      .select(col(keyAlias), explode(array(bandStructs: _*)).alias("b"))
      .select(col(keyAlias), col("b.band"), col("b.band_hash"))
  }

  /** Incremental NEAR-dup against an existing corpus: drop rows of
    * `newDocs` whose true word-shingle Jaccard against ANY corpus document
    * reaches `threshold`; candidates come from MinHash+LSH banding, so
    * nothing is ever compared all-pairs.
    *
    * This is the continuous-ingestion shape of [[minhashNearDups]]: a
    * growing corpus is deduplicated batch by batch, and the corpus side
    * reduces to NARROW band rows (key, band, band_hash — at production
    * scale a precomputed signature store maintained alongside the corpus,
    * recomputed here because the API takes raw text). The new batch never
    * shuffles corpus text: the candidate join carries band keys only, and
    * corpus shingle arrays are materialized solely for candidate keys.
    * Documents with fewer than `wordShingleN` tokens have no signature and
    * always survive (nothing to collide on).
    *
    * Exactness: verification computes true Jaccard on every banded
    * candidate, so precision is exact; recall is LSH-probabilistic for
    * pairs barely over threshold but total for identical/near-identical
    * text (equal signatures always share every band).
    *
    * @return surviving rows of `newDocs`, schema unchanged
    */
  def minhashDedupAgainstCorpus(
      newDocs: DataFrame,
      textCol: String,
      keyCol: String,
      corpus: DataFrame,
      corpusKeyCol: String,
      corpusTextCol: String,
      wordShingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.6,
      /** Durable-snapshot dir for reused intermediates ([[Mat.snapshot]]);
        * None = localCheckpoint, the micro-batch default.
        */
      checkpointDir: Option[String] = None
  ): DataFrame =
    minhashDedupAgainstSignatures(newDocs, textCol, keyCol,
      minhashBandRows(corpus, corpusTextCol, corpusKeyCol, "__ckey",
        wordShingleN, numHashes, bands),
      corpus.select(col(corpusKeyCol).alias("__ckey"),
        col(corpusTextCol).alias("__ctxt")),
      wordShingleN, numHashes, bands, threshold, checkpointDir)

  /** [[minhashDedupAgainstCorpus]] with the corpus side supplied as a
    * PRECOMPUTED signature store — `corpusBands` in the
    * [[minhashBandRows]] schema aliased to `__ckey`, and `corpusText` as
    * (`__ckey`, `__ctxt`) for candidate verification. This is the
    * steady-state ingestion path: per batch, corpus text is touched only
    * for verification candidates and corpus signatures are never
    * recomputed — O(batch) work against a 100 TB corpus.
    */
  def minhashDedupAgainstSignatures(
      newDocs: DataFrame,
      textCol: String,
      keyCol: String,
      corpusBands: DataFrame,
      corpusText: DataFrame,
      wordShingleN: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    // candidate pairs: narrow band keys on both sides; one shuffle each.
    // Consumed three times below (pair join + two key projections);
    // default localCheckpoint, not persist — CorpusIngest calls this per
    // streaming micro-batch and persist would pin CacheManager blocks
    // until an unpersist the caller never sees; checkpointDir upgrades to
    // a durable snapshot for long batch backfills
    val pairs = Mat.snapshot(
      minhashBandRows(newDocs, textCol, keyCol, "__nkey",
          wordShingleN, numHashes, bands)
        .join(corpusBands, Seq("band", "band_hash"))
        .select(col("__nkey"), col("__ckey"))
        .dropDuplicates("__nkey", "__ckey"),
      checkpointDir, "pairs")

    // exact verification: join on candidate keys FIRST, project the
    // shingle transform after — the HOF array must be built for candidate
    // rows only, never as a projection over the full corpus scan
    val newSh = newDocs
      .select(col(keyCol).alias("__nkey"), col(textCol).alias("__ntxt"))
      .join(pairs.select("__nkey").distinct(), "__nkey")
      .select(col("__nkey"),
        wordShingles(col("__ntxt"), wordShingleN).alias("__nsh"))
    val corpusSh = corpusText
      .join(pairs.select("__ckey").distinct(), "__ckey")
      .select(col("__ckey"),
        wordShingles(col("__ctxt"), wordShingleN).alias("__csh"))
    val dupKeys = pairs.join(newSh, "__nkey").join(corpusSh, "__ckey")
      .filter(
        size(array_intersect(col("__nsh"), col("__csh"))).cast("double") /
          greatest(size(array_union(col("__nsh"), col("__csh"))), lit(1))
          >= threshold)
      .select(col("__nkey")).distinct()

    newDocs.join(dupKeys, col(keyCol) === col("__nkey"), "left_anti")
  }

  /** Benchmark decontamination: documents sharing any word n-gram with the
    * benchmark/eval set — the step that keeps test questions out of
    * training corpora (the 13-gram overlap check of GPT-3 appendix C /
    * The Pile; n is a parameter because modern runs use 8–13).
    *
    * Plan shape: benchmark n-grams are distinct'd and BROADCAST (eval sets
    * are tiny next to a training corpus — thousands of docs vs billions),
    * so the corpus side is one scan + native [[graft.expressions.WordNGrams]]
    * projection + broadcast semi-ish join + per-doc count. No shuffle of
    * corpus text, no shuffle at all on the corpus side until the final
    * per-key aggregate of matched grams only.
    *
    * @return (key, n_shared_grams) for contaminated documents only
    */
  def contaminatedDocs(
      docs: DataFrame,
      keyCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 8
  ): DataFrame = {
    def grams(c: Column): Column =
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.WordNGrams(
          org.apache.spark.sql.graft.ColumnBridge.expressionEager(c),
          n, distinct = true))
    val benchGrams = bench
      .select(explode(grams(col(benchTextCol))).alias("gram"))
      .distinct()
    docs
      .select(col(keyCol).alias("key"), explode(grams(col(textCol))).alias("gram"))
      .join(broadcast(benchGrams), "gram")
      // grams are distinct per doc and the broadcast side is distinct, so
      // count(*) == distinct shared grams
      .groupBy(col("key"))
      .agg(count(lit(1)).alias("n_shared_grams"))
  }

  /** The filter form of [[contaminatedDocs]]: corpus rows with no
    * benchmark n-gram overlap — what actually ships to training. Same
    * plan plus one anti-join on the contaminated key set; corpus
    * content is never shuffled.
    */
  def decontaminate(
      docs: DataFrame,
      keyCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 8
  ): DataFrame = {
    val bad = contaminatedDocs(docs, keyCol, textCol, bench, benchTextCol, n)
      .select(col("key").alias("__badkey"))
    docs.join(bad, docs(keyCol) === col("__badkey"), "left_anti")
  }

  /** Bloom-filter form of [[decontaminate]] — the SCALE path when the
    * benchmark union is too big to broadcast as an exact set: a GPT-3
    * style eval suite union runs to 10⁸⁺ distinct n-grams (gigabytes as
    * exact strings), but a Bloom filter at `fpp` holds them in a few
    * hundred MB riding the task binary. Error is ONE-SIDED in the safe
    * direction for decontamination: every exactly-contaminated document
    * is removed (no false keeps — the property that matters for eval
    * integrity), while a false positive only over-removes ~fpp of the
    * clean corpus. Spark's BloomFilter is deterministic (fixed seeds),
    * so reruns drop the same rows. One scan of the benchmark to build,
    * one scan of the corpus to screen — corpus content never shuffles.
    */
  def decontaminateBloom(
      docs: DataFrame,
      keyCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 8,
      expectedGrams: Long = 10000000L,
      fpp: Double = 0.001
  ): DataFrame = {
    def grams(c: Column): Column =
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.WordNGrams(
          org.apache.spark.sql.graft.ColumnBridge.expressionEager(c),
          n, distinct = true))
    val bloom = bench
      .select(explode(grams(col(benchTextCol))).alias("gram"))
      .stat.bloomFilter("gram", expectedGrams, fpp)
    val bloomB = docs.sparkSession.sparkContext.broadcast(bloom)
    val hit = udf { gs: scala.collection.Seq[String] =>
      gs != null && gs.exists(bloomB.value.mightContainString)
    }
    docs.filter(!hit(grams(col(textCol))))
  }

  /** Streaming exact dedup: drops re-occurrences of the same normalized
    * text fingerprint within the event-time watermark window —
    * `dropDuplicatesWithinWatermark` keeps state bounded (a plain
    * dropDuplicates on a stream grows state forever). Duplicates farther
    * apart than the delay fall through to the batch-side
    * [[exactDedup]] / MERGE, the same late-data split as the reference's
    * incremental contract.
    */
  def streamingExactDedup(
      stream: DataFrame,
      textCol: String,
      eventTimeCol: String,
      watermarkDelay: String
  ): DataFrame =
    stream
      .withWatermark(eventTimeCol, watermarkDelay)
      // NULL text must not collapse into one dedup group: salt the NULL
      // fingerprint with the event time so each such row stays distinct
      .withColumn("__fp", coalesce(TextAnalysis.fingerprint(col(textCol)),
        concat(lit("__null__:"), col(eventTimeCol).cast("string"))))
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Connected components over near-duplicate pairs: every key is labeled
    * with the MINIMUM key reachable through the pair graph — the duplicate
    * "cluster id" a curation pipeline keeps one document per.
    *
    * Pair emission (minhash/simhash/winnow/embedding) is only half of
    * dedup: transitively-linked duplicates (A~B, B~C, A≁C by threshold)
    * must still collapse to one survivor, so clustering is the step that
    * turns candidate pairs into a keep/drop decision.
    *
    * Algorithm: iterative min-label propagation — each round every node
    * takes the min of its own label and its neighbors' labels; converges in
    * O(diameter) rounds (duplicate clusters are near-cliques, so 2-3 rounds
    * in practice; `maxIters` bounds pathological chains). Each round is one
    * hash-partitioned join + partial-aggregated groupBy on the key — no
    * driver-side graph, scales to any pair count. Label frames are
    * checkpointed per round to truncate the growing lineage (the standard
    * iterative-algorithm requirement).
    *
    * Checkpoint durability: by default rounds use `localCheckpoint`
    * (executor-resident blocks — fastest, but an executor loss
    * mid-iteration fails the job). Pass `checkpointDir` for reliable
    * snapshots instead: each round's labels are written as parquet under a
    * private `graft-cc-<uuid>` run directory — the same durability and
    * lineage truncation as RDD `checkpoint()` (fault-tolerant storage, the
    * next round plans from a fresh scan), but with file-level ownership,
    * so each superseded round is deleted the moment its successor lands
    * rather than accumulating for the life of the session. After
    * convergence exactly one round's files remain: they back the returned
    * lazy frame, and the run directory is the caller's to delete once the
    * result has been consumed or persisted elsewhere.
    *
    * @param pairs (key_a, key_b) rows, any direction, duplicates allowed
    * @param checkpointDir reliable snapshot directory (HDFS-visible at
    *                      real scale); None = localCheckpoint
    * @return (key, cluster_id) for every key that appears in some pair
    */
  def duplicateClusters(pairs: DataFrame, maxIters: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    val runDir = checkpointDir.map(d => new org.apache.hadoop.fs.Path(
      d, s"graft-cc-${java.util.UUID.randomUUID()}"))
    val hfs = runDir.map(_.getFileSystem(spark.sparkContext.hadoopConfiguration))
    var round = 0
    var prevSnapshot: Option[org.apache.hadoop.fs.Path] = None
    def truncate(df: DataFrame): DataFrame = runDir match {
      case Some(dir) =>
        // round N's write is the last reader of round N-1's files, so the
        // superseded snapshot is safe to drop as soon as this write returns
        val cur = new org.apache.hadoop.fs.Path(dir, f"round-$round%05d")
        round += 1
        df.write.mode("overwrite").parquet(cur.toString)
        prevSnapshot.foreach(p => hfs.foreach(_.delete(p, true)))
        prevSnapshot = Some(cur)
        spark.read.parquet(cur.toString)
      case None => df.localCheckpoint()
    }
    // r18: edges are seeded with one SELF-LOOP per key. The min-label
    // step then folds "min over neighbors" and "keep own label" into ONE
    // join + ONE aggregate — the old shape needed a second (left) join of
    // the labels against the neighbor mins every iteration, i.e. one more
    // exchange of the full label table per round (guide §2.4). The change
    // flag still rides the same aggregate: the self-loop row carries the
    // key's own label, so `min(all) < own` ⇔ some true neighbor improves.
    // ONE exchange builds the cached edge table: the four-way union
    // (both directions + a self-loop per endpoint) repartitions on the
    // iteration join key and dedups IN PLACE — hash partitioning on dst
    // colocates every (src, dst) pair, so the distinct aggregate needs
    // no exchange of its own (vs the former distinct → self-loop
    // distinct → repartition chain, three exchanges for the same rows),
    // and every round's join then reuses the cached partitioning.
    val edges = pairs.select(col("key_a").alias("src"), col("key_b").alias("dst"))
      .unionByName(pairs.select(col("key_b").alias("src"), col("key_a").alias("dst")))
      .unionByName(pairs.select(col("key_a").alias("src"), col("key_a").alias("dst")))
      .unionByName(pairs.select(col("key_b").alias("src"), col("key_b").alias("dst")))
      .repartition(col("dst"))
      .dropDuplicates("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // init = min(dst ∪ {src}) per src — identical to least(min(dst), src)
    var labels = truncate(edges.groupBy(col("src"))
      .agg(min(col("dst")).alias("label"))
      .withColumnRenamed("src", "key"))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val next0 = edges
        .join(labels.withColumnRenamed("key", "dst"), "dst")
        .groupBy(col("src").alias("key"))
        .agg(min(col("label")).alias("label"),
          min(when(col("dst") === col("src"), col("label"))).alias("__own"))
      val next = truncate(next0.select(col("key"), col("label"),
        (col("label") < col("__own")).alias("__changed")))
      converged = next.filter(col("__changed")).isEmpty
      labels = next.drop("__changed")
      i += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"duplicateClusters hit maxIters=$maxIters before convergence — " +
          "labels may still split one true cluster (chains longer than " +
          "maxIters hops); raise maxIters for deeply-chained duplicates")
    edges.unpersist()
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Keep one survivor per duplicate cluster: the row whose key equals the
    * cluster id (the minimum key); rows not in any pair survive untouched.
    */
  def dedupByClusters(df: DataFrame, keyCol: String, pairs: DataFrame): DataFrame = {
    val clusters = duplicateClusters(pairs)
    df.join(clusters.withColumnRenamed("key", keyCol), Seq(keyCol), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col(keyCol))
      .drop("cluster_id")
  }

  /** Character shingles (k-grams) of the normalized text, distinct —
    * native codegen'd kernel ([[graft.expressions.CharNGrams]]).
    */
  def shingles(text: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CharNGrams(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(text), k))

  /** Interpreted HOF form of [[shingles]] — spec-level reference. */
  def shinglesHof(text: Column, k: Int): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(length(norm) - k, lit(0))),
          i => norm.substr(i + 1, lit(k))),
        s => length(s) === k))
  }

  /** Word shingles (n-grams of tokens), distinct — native codegen'd kernel
    * ([[graft.expressions.WordNGrams]]); the HOF transform/slice
    * composition it replaces runs interpreted per row.
    */
  def wordShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WordNGrams(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(text), n,
        distinct = true))

  /** Interpreted HOF form of [[wordShingles]] — spec-level reference. */
  def wordShinglesHof(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
        s => size(split(s, " ")) === n))
  }

  /** MinHash signature of a shingle array: for each of `numHashes` seeded
    * hash functions, the minimum xxhash64 over the shingles. Pure built-in
    * higher-order functions — codegen'd, no UDF, no ML-vector conversion.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleArr, s => xxhash64(s, i))))

  /** LSH banding: split the signature into `bands` bands and hash each band;
    * docs sharing any (band index, band hash) are candidates.
    * rows-per-band = numHashes / bands.
    */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.alias("band"),
        xxhash64(concat_ws("_",
          transform(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)),
            v => v.cast("string")))).alias("band_hash")))

  /** Near-duplicate pairs via MinHash + LSH: returns (left key, right key,
    * estimated jaccard) for candidate pairs whose true shingle-set Jaccard
    * ≥ `threshold`.
    *
    * Plan shape at scale: one projection (shingles+signature+bands), one
    * explode, one shuffle on band_hash (groupBy), candidate self-join on
    * narrow keys, then exact verification on the candidate set only.
    */
  /** MinHash signature as one native codegen'd pass over the text
    * ([[graft.expressions.MinHashSig]]) — bit-identical to
    * `min(xxhash64(shingle, seed))` over exploded word shingles, but
    * per-document-local: zero shuffles and no interpreted HOF shingle
    * transform on the corpus scan.
    */
  def minhashSigNative(text: Column, wordShingleN: Int, numHashes: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.MinHashSig(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(text),
        wordShingleN, numHashes))

  def minhashNearDups(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      shingleLen: Int = 5,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.6,
      wordShingleN: Option[Int] = None,
      /** Reliable-snapshot dir for the reused intermediates (see
        * [[Mat.snapshot]]); None = localCheckpoint (fastest, but an
        * executor loss mid-job is unrecoverable — fine for short or
        * micro-batch runs, pass a dir for long batch jobs on
        * preemptible executors).
        */
      checkpointDir: Option[String] = None
  ): DataFrame = {
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) with " +
        "rowsPerBand >= 1 — an empty band slice hashes to ONE constant " +
        "key and the candidate self-join goes O(n²)")
    val rowsPerBand = numHashes / bands
    // Word n-grams (wordShingleN) give ~5× fewer shingles than char k-grams
    // on prose and have a native single-pass signature kernel — prefer them
    // at scale; char shingles remain for short/no-whitespace text.
    val sigged = wordShingleN match {
      case Some(n) =>
        // native fast path: signature computed inside the scan projection
        // (no explode, no aggregation exchange); empty array ⇔ <n tokens
        df.select(col(keyCol).alias("key"),
            minhashSigNative(col(textCol), n, numHashes).alias("sig"))
          .filter(size(col("sig")) > 0)
      case None =>
        // char-shingle path: explode + codegen'd min-aggregate (the nested
        // HOF form runs interpreted — 10-50× slower); partial aggregation
        // combines map-side so the shuffle carries one row per doc
        val hashAggs = (0 until numHashes).map(i =>
          min(xxhash64(col("s"), lit(i))).alias(s"h$i"))
        df.select(col(keyCol).alias("key"),
            shingles(col(textCol), shingleLen).alias("sh"))
          .filter(size(col("sh")) > 0)
          .select(col("key"), explode(col("sh")).alias("s"))
          .groupBy(col("key"))
          .agg(hashAggs.head, hashAggs.tail: _*)
          .select(col("key"),
            array((0 until numHashes).map(i => col(s"h$i")): _*).alias("sig"))
    }

    // Band rows carry ONLY (key, band, band_hash) — the candidate self-join
    // shuffles narrow keys, not the shingle arrays (which would be 8× the
    // payload). Shingle sets are joined back for candidate pairs only.
    val bandStructs = (0 until bands).map { b =>
      val bandCols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => element_at(col("sig"), i + 1).cast("string"))
      struct(lit(b).alias("band"),
        xxhash64(concat_ws("_", bandCols: _*)).alias("band_hash"))
    }
    // materialized once: both sides of the candidate self-join scan this —
    // without it the signature computation and source scan run twice.
    // Default localCheckpoint (not persist: CorpusIngest calls this per
    // streaming micro-batch and persist would pin CacheManager blocks
    // until an unpersist the caller never sees); checkpointDir upgrades
    // to a durable snapshot for preemption-prone batch runs
    val bandRows = Mat.snapshot(sigged
      .select(col("key"), explode(array(bandStructs: _*)).alias("b"))
      .select(col("key"), col("b.band"), col("b.band_hash")),
      checkpointDir, "bands")

    val pairs = bandRows.alias("l")
      .join(bandRows.alias("r"),
        col("l.band") === col("r.band") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.key") < col("r.key"))
      .select(col("l.key").alias("key_a"), col("r.key").alias("key_b"))
      .dropDuplicates("key_a", "key_b")

    // Exact-Jaccard verification on candidates only: the shingle arrays are
    // materialized just for keys that appear in some candidate pair (join
    // first, project the HOF shingle transform after), then persisted since
    // both pair sides probe them.
    val shingleOf: Column => Column = wordShingleN match {
      case Some(n) => wordShingles(_, n)
      case None    => shingles(_, shingleLen)
    }
    val pairKeys = pairs
      .select(explode(array(col("key_a"), col("key_b"))).alias("key"))
      .distinct()
    val candSh = Mat.snapshot(
      df.select(col(keyCol).alias("key"), col(textCol).alias("__txt"))
        .join(pairKeys, "key")
        .select(col("key"), shingleOf(col("__txt")).alias("sh")),
      checkpointDir, "candsh")

    val shA = candSh.select(col("key").alias("key_a"), col("sh").alias("sh_a"))
    val shB = candSh.select(col("key").alias("key_b"), col("sh").alias("sh_b"))
    pairs.join(shA, "key_a").join(shB, "key_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("key_a", "key_b", "jaccard")
  }

  /** Exact pairwise n-gram Jaccard within a blocking column (e.g. a source
    * bucket or LSH prefix) — the verification kernel, usable standalone
    * when a cheap blocking key already exists.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      blockCol: String,
      n: Int = 3
  ): DataFrame = {
    val prepped = df.select(
      col(keyCol).alias("key"),
      col(blockCol).alias("block"),
      wordShingles(col(textCol), n).alias("ng"))
    val l = prepped.alias("l")
    val r = prepped.alias("r")
    l.join(r, col("l.block") === col("r.block") && col("l.key") < col("r.key"))
      .select(
        col("l.key").alias("key_a"),
        col("r.key").alias("key_b"),
        (size(array_intersect(col("l.ng"), col("r.ng"))).cast("double") /
          greatest(size(array_union(col("l.ng"), col("r.ng"))), lit(1)))
          .alias("jaccard"))
  }

  /** Winnowing fingerprints (native Catalyst expression with codegen —
    * [[graft.expressions.WinnowFingerprint]]): any shared substring of
    * length ≥ k+w−1 produces at least one shared fingerprint.
    */
  def winnowFingerprints(text: Column, k: Int = 7, w: Int = 4,
      portable: Boolean = false): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WinnowFingerprint(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(text), k, w,
        portable))

  /** Near-dup candidates via winnowing: docs whose shared-fingerprint
    * count is ≥ `minSharedFrac` of the smaller fingerprint set (containment
    * overlap — absolute counts are meaningless when a corpus shares a
    * small vocabulary). Plan shape: explode → equi-self-join on the
    * fingerprint (narrow long keys) → pair count → fraction filter —
    * blocking-based like the other variants, with MOSS's substring-match
    * guarantee instead of Jaccard probability.
    */
  def winnowNearDups(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      k: Int = 7,
      w: Int = 4,
      minSharedFrac: Double = 0.5,
      maxDocFreq: Int = 100,
      portable: Boolean = false
  ): DataFrame = {
    // No explicit persist: every consumer of `fps` (frequency pass, nfp
    // aggregate, both self-join sides) hashes on the same fp/key columns,
    // and Spark's ReusedExchange dedups the identical shuffle subtrees —
    // the corpus scan + winnow kernel run once, not four times (asserted
    // in PlanShapeSpec). An explicit cache barrier measured strictly
    // slower: it blocks whole-stage fusion around the explode and buys
    // nothing the exchange reuse doesn't already provide.
    val fps = df.select(col(keyCol).alias("key"),
        explode(winnowFingerprints(col(textCol), k, w, portable)).alias("fp"))
      .dropDuplicates("key", "fp")
    // Stop-fingerprint removal: a fingerprint present in m docs generates
    // m² candidate pairs — common-vocabulary k-grams would make the join
    // quadratic in corpus size. Dropping fps with document frequency >
    // maxDocFreq bounds any fp's contribution at maxDocFreq² while true
    // near-dups still share their *rare* fingerprints. Overlap fractions
    // are computed in the same rare-fp subspace for consistency.
    val fpFreq = fps.groupBy("fp").agg(count(lit(1)).alias("df"))
    val rare = fps.join(fpFreq.filter(col("df") <= maxDocFreq).select("fp"), "fp")
    val counts = rare.groupBy("key").agg(count(lit(1)).alias("nfp"))
    val shared = rare.alias("l").join(rare.alias("r"),
        col("l.fp") === col("r.fp") && col("l.key") < col("r.key"))
      .groupBy(col("l.key").alias("key_a"), col("r.key").alias("key_b"))
      .agg(count(lit(1)).alias("shared_fingerprints"))
    shared
      .join(counts.select(col("key").alias("key_a"), col("nfp").alias("nfp_a")), "key_a")
      .join(counts.select(col("key").alias("key_b"), col("nfp").alias("nfp_b")), "key_b")
      .withColumn("overlap",
        col("shared_fingerprints").cast("double") / least(col("nfp_a"), col("nfp_b")))
      .filter(col("overlap") >= minSharedFrac)
      .select("key_a", "key_b", "shared_fingerprints", "overlap")
  }

  /** 64-bit SimHash over tokens: bit b of the result is 1 iff the sum over
    * tokens of ±1 (sign of bit b of xxhash64(token)) is positive.
    * Built-ins only: aggregate over a 64-slot count array.
    */
  def simhash64(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    // dynamic shift amounts need the SQL shiftright/shiftleft (the Scala
    // functions API only takes Int literals) — call_function resolves them
    val counts = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, b) => a + when(
            call_function("shiftright", h, b.cast("int")).bitwiseAND(lit(1L)) === 1, lit(1L)
          ).otherwise(lit(-1L)))
      })
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, b) => when(c > 0,
          call_function("shiftleft", lit(1L), b.cast("int"))).otherwise(lit(0L))),
      lit(0L),
      (acc, v) => acc.bitwiseOR(v))
  }

  /** 64-bit SimHash as a native codegen'd expression
    * ([[graft.expressions.SimHash64]]): one pass over the text inside the
    * scan projection — no token explode, no aggregation exchange (the
    * former explode + 64-sum-buffer groupBy was 41% of the whole benchmark).
    * `portable = true` swaps the token hash for the 60-bit md5 prefix so an
    * external SQL oracle recomputes identical signatures.
    */
  def simhash64Native(text: Column, portable: Boolean = false): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.SimHash64(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(text), portable))

  /** SimHash near-dup candidates: block on 16-bit chunks (any document pair
    * within Hamming distance 3 of a 64-bit simhash shares at least one of
    * the four 16-bit chunks — pigeonhole), then verify exact Hamming ≤ maxDist.
    * With `portable = true` the output is exactly reproducible by a SQL
    * engine with md5: blocking recall is total (pigeonhole), so the result
    * set is {pairs with hamming(simhash_a, simhash_b) ≤ maxDist} — no
    * LSH luck involved.
    */
  def simhashNearDups(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      maxDist: Int = 3,
      portable: Boolean = false
  ): DataFrame =
    hammingNearDups(
      df.select(col(keyCol).alias("key"),
        simhash64Native(col(textCol), portable).alias("hash")),
      maxDist)

  /** The 16-bit chunk rows of a 64-bit fingerprint — the blocking key
    * shared by every Hamming family here.
    */
  private def hashChunks(hash: Column): Column =
    explode(array((0 until 4).map { i =>
      struct(lit(i).alias("idx"),
        shiftright(hash, i * 16).bitwiseAND(lit(0xFFFFL)).alias("bits"))
    }: _*))

  /** Banded Hamming near-dup pairs over ANY 64-bit fingerprint — the one
    * engine behind [[simhashNearDups]] (text),
    * [[Multimodal.imageNearDups]] (dHash) and
    * [[Multimodal.audioNearDups]] (envelope hash): each hash splits into
    * 4 disjoint 16-bit chunks, candidate pairs must agree on at least
    * one chunk (pigeonhole: a pair within Hamming ≤ 3 cannot have
    * touched all 4 — total recall at the default), then the exact
    * distance verifies with `bit_count(xor)`. The join touches only
    * (key, 8-byte hash) rows and each bucket holds the rows sharing a
    * 16-bit chunk value — bucketed, never all-pairs.
    *
    * @param signatures (key, hash) rows; computing the hash is the
    *                   caller's (modality-specific) business
    * @return (key_a, key_b, hamming), key_a < key_b, one row per pair
    */
  def hammingNearDups(signatures: DataFrame, maxDist: Int = 3): DataFrame = {
    val chunked = signatures
      .select(col("key"), col("hash"))
      .withColumn("chunk", hashChunks(col("hash")))
      // both sides of the candidate self-join read this — materialize the
      // (4 rows/key, 24 bytes each) chunk table instead of recomputing
      // upstream fingerprints (which may decode images/audio) twice.
      // localCheckpoint, not persist: streaming ingest calls this per
      // micro-batch, and persist would pin blocks in the CacheManager
      // until an unpersist the caller never sees — checkpoint blocks are
      // freed by the ContextCleaner once the returned frame is GC'd
      .localCheckpoint(true)
    val l = chunked.alias("l")
    val r = chunked.alias("r")
    l.join(r,
        col("l.chunk.idx") === col("r.chunk.idx") &&
          col("l.chunk.bits") === col("r.chunk.bits") &&
          col("l.key") < col("r.key"))
      .select(col("l.key").alias("key_a"), col("r.key").alias("key_b"),
        bit_count(col("l.hash").bitwiseXOR(col("r.hash"))).alias("hamming"))
      .dropDuplicates("key_a", "key_b")
      .filter(col("hamming") <= maxDist)
  }

  /** Keys of `batchSigs` within `maxDist` of ANY `corpusSigs` hash — the
    * incremental-ingestion half of [[hammingNearDups]]; same blocking,
    * batch side persisted so the consumer's anti-join cannot recompute
    * upstream fingerprints.
    *
    * @return single-column (key) frame of batch near-dup keys
    */
  def hammingDupKeys(batchSigs: DataFrame, corpusSigs: DataFrame,
      maxDist: Int = 3): DataFrame = {
    val batch = batchSigs
      .select(col("key").alias("__bkey"), col("hash").alias("__bhash"))
      .withColumn("chunk", hashChunks(col("__bhash")))
      // localCheckpoint for the same per-micro-batch lifecycle reason as
      // [[hammingNearDups]] — no CacheManager pin across ingest batches
      .localCheckpoint(true)
    val corpus = corpusSigs
      .select(col("key").alias("__ckey"), col("hash").alias("__chash"))
      .withColumn("chunk", hashChunks(col("__chash")))
    batch.join(corpus, Seq("chunk"))
      .filter(bit_count(col("__bhash").bitwiseXOR(col("__chash"))) <= maxDist)
      .select(col("__bkey").alias("key")).distinct()
  }

  /** Exact-substring deduplication (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — their suffix-array
    * tool's semantics re-expressed as dataflow): every duplicated
    * substring of length ≥ `minLen` keeps its globally-first occurrence
    * (smallest `(keyCol, position)`) and is CUT from every other
    * occurrence — including repeats within one document. Unlike
    * document-level near-dup, this removes the boilerplate/quote/template
    * text that survives document dedup because its carriers differ.
    *
    * Dataflow instead of a suffix array: fingerprint every position's
    * `minLen`-gram (md5 — the oracle-portable tax, same trade as
    * [[winnowNearDups]]'s portable mode), keep fingerprints seen more
    * than once, pick each fingerprint's first occurrence with one
    * `min(struct(key, pos))` partial aggregate, and cut all other
    * occurrences with the native single-pass
    * [[graft.expressions.CutSpans]] kernel (overlapping spans union
    * before cutting — consecutive duplicated positions cut as one run,
    * exactly the suffix-array tool's byte-range semantics).
    *
    * Scale shape: rows = corpus character count — large but narrow
    * (key, pos, 16-byte hash), and every shuffle is an equi-key
    * groupBy/join with map-side partial aggregation; nothing is O(n²).
    * A 100 TB corpus fingerprints ~100 T positions, the same order of
    * work the suffix-array construction pays, but here it is
    * embarrassingly parallel and spill-safe. `minLen` 40-50 chars ≈ the
    * paper's 50-token threshold at BPE granularity.
    */
  def exactSubstringDedup(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      minLen: Int = 40,
      outCol: String = "dedup_text",
      /** true: md5 over the L chars at every position — O(n·len) hash
        * work, replayable by an external SQL oracle. false: the native
        * O(n) rolling-hash kernel [[graft.expressions.PositionHashes]] —
        * same dataflow and results (modulo ~n²/2⁶⁴ hash collisions),
        * ~len× less hash work; the production mode.
        */
      portable: Boolean = true): DataFrame = {
    require(minLen > 0, "minLen must be positive")
    // r18: no gram cache — the window-based cutStarts consumes the gram
    // table exactly once (the old groupBy-then-join shape scanned it
    // twice, which is what the persist existed for)
    val grams = substringGrams(df, textCol, keyCol, minLen, portable)
    // cutStarts is materialized eagerly — one row per document, though the
    // __starts array grows with duplicated positions per doc (boilerplate-
    // heavy corpora can approach corpus character count).
    // localCheckpoint, not persist: persist would pin the blocks in the
    // CacheManager until an unpersist the caller never sees; checkpoint
    // blocks are freed by the ContextCleaner once the returned DataFrame
    // is garbage-collected, so repeated calls in one session don't
    // accumulate storage
    val cutStarts = substringCutStarts(grams).localCheckpoint(true)
    val empty = lit(Array.empty[Long])
    df.join(cutStarts, col(keyCol) === col("__k"), "left")
      .withColumn(outCol,
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.expressions.CutSpans(
            org.apache.spark.sql.graft.ColumnBridge.expressionEager(
              col(textCol)),
            org.apache.spark.sql.graft.ColumnBridge.expressionEager(
              coalesce(col("__starts"), empty)),
            minLen)))
      .drop("__k", "__starts")
  }

  /** Stage 1 of [[exactSubstringDedup]]: every position's L-gram
    * fingerprint as (__k, __pos, __h); docs shorter than L contribute
    * nothing (and cannot contain a duplicated L-span). Consumed exactly
    * once, by [[substringCutStarts]]'s window. Both modes run a native
    * one-kernel-call-per-document pass; the portable mode's __h is the
    * raw 16-byte md5 digest — the same collision set as the oracle's
    * `md5()` hex (unhex is a bijection), at half the hex form's width
    * through the downstream exchange and sort (guide §2.3).
    */
  private[graft] def substringGrams(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      minLen: Int,
      portable: Boolean): DataFrame = {
    val shaped = df.filter(length(col(textCol)) >= minLen)
    if (portable)
      shaped.select(col(keyCol).alias("__k"),
          posexplode(org.apache.spark.sql.graft.ColumnBridge.column(
            graft.expressions.Md5PositionHashes(
              org.apache.spark.sql.graft.ColumnBridge.expressionEager(
                col(textCol)), minLen))).as(Seq("__posi", "__h")))
        .select(col("__k"), col("__posi").cast("long").alias("__pos"),
          col("__h"))
    else
      shaped.select(col(keyCol).alias("__k"),
          posexplode(org.apache.spark.sql.graft.ColumnBridge.column(
            graft.expressions.PositionHashes(
              org.apache.spark.sql.graft.ColumnBridge.expressionEager(
                col(textCol)), minLen))).as(Seq("__posi", "__h")))
        .select(col("__k"), col("__posi").cast("long").alias("__pos"),
          col("__h"))
  }

  /** Stage 2 of [[exactSubstringDedup]]: per-doc sorted cut-start
    * positions — every non-first occurrence of any duplicated gram.
    * One window over the hash does it: with occurrences of a fingerprint
    * ordered by (key, pos), `row_number > 1` IS "not the global first
    * occurrence of a duplicated gram" (a unique gram's only row is
    * row_number 1 and drops out by the same filter). r18: this replaces
    * the groupBy-count-min + join-back shape — the gram table crossed an
    * exchange twice there (once into the aggregate, once into the join)
    * plus a persist to avoid recomputing the hash pass; the window form
    * shuffles it once and caches nothing (guide §2.4).
    */
  private[graft] def substringCutStarts(grams: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("__h")).orderBy(col("__k"), col("__pos"))
    grams
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1)
      .groupBy(col("__k"))
      .agg(sort_array(collect_set(col("__pos"))).alias("__starts"))
  }
}
