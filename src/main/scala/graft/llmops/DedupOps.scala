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
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Character shingles (k-grams) of the normalized text, distinct. */
  def shingles(text: Column, k: Int): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(length(norm) - k, lit(0))),
          i => norm.substr(i + 1, lit(k))),
        s => length(s) === k))
  }

  /** Word shingles (n-grams of tokens), distinct. */
  def wordShingles(text: Column, n: Int): Column = {
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
  def minhashNearDups(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      shingleLen: Int = 5,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.6,
      wordShingleN: Option[Int] = None
  ): DataFrame = {
    // Word n-grams (wordShingleN) give ~5× fewer shingles than char k-grams
    // on prose — minhash cost is O(shingles × numHashes) per doc, so prefer
    // them at scale; char shingles remain for short/no-whitespace text.
    val shingleExpr = wordShingleN match {
      case Some(n) => wordShingles(col(textCol), n)
      case None    => shingles(col(textCol), shingleLen)
    }
    val rowsPerBand = numHashes / bands
    // persisted: referenced by the band self-join AND both verification
    // joins — without it the shingle projection is recomputed 3-4×
    // (bounded at ~2× the text size; LRU-evicted when memory is tight)
    val prepped = df.select(
        col(keyCol).alias("key"),
        shingleExpr.alias("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Signature via explode + codegen'd min-aggregate: higher-order
    // functions (transform/aggregate) run interpreted, so the nested
    // HOF form is 10-50× slower per row; explode + groupBy(min) stays in
    // whole-stage codegen and partial aggregation combines map-side, so
    // the shuffle carries one row per doc, not per shingle.
    val hashAggs = (0 until numHashes).map(i =>
      min(xxhash64(col("s"), lit(i))).alias(s"h$i"))
    val sigCols = prepped
      .select(col("key"), explode(col("sh")).alias("s"))
      .groupBy(col("key"))
      .agg(hashAggs.head, hashAggs.tail: _*)

    // Band rows carry ONLY (key, band, band_hash) — the candidate self-join
    // shuffles narrow keys, not the shingle arrays (which would be 8× the
    // payload). Shingle sets are joined back for candidate pairs only.
    val bandStructs = (0 until bands).map { b =>
      val bandCols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"h$i").cast("string"))
      struct(lit(b).alias("band"),
        xxhash64(concat_ws("_", bandCols: _*)).alias("band_hash"))
    }
    // persisted: both sides of the candidate self-join scan this — without
    // it the whole explode+aggregate signature computation runs twice
    val bandRows = sigCols
      .select(col("key"), explode(array(bandStructs: _*)).alias("b"))
      .select(col("key"), col("b.band"), col("b.band_hash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val pairs = bandRows.alias("l")
      .join(bandRows.alias("r"),
        col("l.band") === col("r.band") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.key") < col("r.key"))
      .select(col("l.key").alias("key_a"), col("r.key").alias("key_b"))
      .dropDuplicates("key_a", "key_b")

    val shA = prepped.select(col("key").alias("key_a"), col("sh").alias("sh_a"))
    val shB = prepped.select(col("key").alias("key_b"), col("sh").alias("sh_b"))
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
  def winnowFingerprints(text: Column, k: Int = 7, w: Int = 4): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WinnowFingerprint(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(text), k, w))

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
      maxDocFreq: Int = 100
  ): DataFrame = {
    val fps = df.select(col(keyCol).alias("key"),
        explode(winnowFingerprints(col(textCol), k, w)).alias("fp"))
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

  /** SimHash near-dup candidates: block on 16-bit chunks (any document pair
    * within Hamming distance 3 of a 64-bit simhash shares at least one of
    * the four 16-bit chunks — pigeonhole), then verify exact Hamming ≤ maxDist.
    */
  def simhashNearDups(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      maxDist: Int = 3
  ): DataFrame = {
    val chunkStructs = (0 until 4).map { i =>
      struct(lit(i).alias("idx"),
        shiftright(col("sim"), i * 16).bitwiseAND(lit(0xFFFFL)).alias("bits"))
    }
    // codegen'd simhash: explode tokens, hash once, 64 static-shift sign
    // sums in one partial-aggregating groupBy (the HOF simhash64 form is
    // interpreted — fine as a scalar expression, too slow for a corpus scan)
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1, lit(1L))
        .otherwise(lit(-1L))).alias(s"c$b"))
    val simCol = (0 until 64).map(b =>
      when(col(s"c$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, c) => a.bitwiseOR(c))
    val withSim = df
      .select(col(keyCol).alias("key"),
        explode(TextAnalysis.tokens(col(textCol))).alias("t"))
      .select(col("key"), xxhash64(col("t")).alias("h"))
      .groupBy(col("key"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("key"), simCol.alias("sim"))
      .withColumn("chunk", explode(array(chunkStructs: _*)))
      // both sides of the candidate self-join read this — persist the
      // (tiny: 4 rows/doc) chunk table instead of recomputing simhashes
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = withSim.alias("l")
    val r = withSim.alias("r")
    l.join(r,
        col("l.chunk.idx") === col("r.chunk.idx") &&
          col("l.chunk.bits") === col("r.chunk.bits") &&
          col("l.key") < col("r.key"))
      .select(col("l.key").alias("key_a"), col("r.key").alias("key_b"),
        bit_count(col("l.sim").bitwiseXOR(col("r.sim"))).alias("hamming"))
      .dropDuplicates("key_a", "key_b")
      .filter(col("hamming") <= maxDist)
  }
}
