package graft.llmops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * The semantics mirror the reference's vector-search hooks
  * (aje_libs/bd/helpers/pinecone_helper.py:59-316 — cosine top-k query and
  * batched upsert), re-expressed self-contained:
  *   - [[bruteForceTopK]] — exact cosine top-k, the correctness baseline;
  *   - [[lshTopK]] — random-hyperplane LSH bucketing, the 100 TB path:
  *     candidates come only from matching buckets, so the join is
  *     hash-partitioned on narrow bucket keys instead of a full cross join.
  *
  * All math is built-ins (`zip_with`/`aggregate` in double precision) —
  * codegen'd, engine-portable, no UDF.
  */
object Similarity {

  /** Dot product of two array columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via the native codegen'd expression
    * ([[graft.expressions.CosineSim]]) — bit-identical to [[cosineHof]]
    * (ascending-index double folds) but stays inside whole-stage codegen;
    * the interpreted HOF form costs 10-50× more per candidate pair.
    */
  def cosine(a: Column, b: Column): Column = {
    val c = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CosineSim(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(a),
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(b)))
    // a zero-norm vector yields 0/0 = NaN, and Spark orders NaN ABOVE
    // every number: unguarded, a zero embedding ranks as everyone's #1
    // neighbor and passes every >= tau near-dup screen (collapsing its
    // whole semdedup cell). Surface NULL instead — filters drop it,
    // rankings put it last.
    when(!isnan(c), c)
  }

  /** Interpreted higher-order-function form of [[cosine]], kept as the
    * spec-level reference the native expression is verified against
    * (same NaN-to-NULL guard so the two stay interchangeable).
    */
  def cosineHof(a: Column, b: Column): Column = {
    val c = dot(a, b) / (norm(a) * norm(b))
    when(!isnan(c), c)
  }

  /** Exact top-k cosine neighbors of each query vector against the corpus.
    *
    * @param queries  (queryKey, queryVec) — expected small (the probe set);
    *                 it is broadcast so the corpus is scanned exactly once,
    *                 embarrassingly parallel over corpus partitions.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      corpusKey: String,
      corpusVec: String,
      queries: DataFrame,
      queryKey: String,
      queryVec: String,
      k: Int,
      /** false = a stored vector queried by its own id returns itself at
        * rank 1 (the vector-store/Pinecone query contract); true (the
        * near-dup default) drops self-matches.
        */
      excludeSelf: Boolean = true
  ): DataFrame = {
    val q = broadcast(queries.select(
      col(queryKey).alias("query_key"), col(queryVec).alias("qv")))
    val c = corpus.select(col(corpusKey).alias("neighbor_key"), col(corpusVec).alias("cv"))
    // null-safe inequality: `=!=` is NULL for a NULL query id, which
    // silently dropped every corpus row for that query
    val joined =
      if (excludeSelf) c.join(q, !(col("query_key") <=> col("neighbor_key")))
      else c.crossJoin(q)
    val scored = joined
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_key"))
      .orderBy(col("cosine").desc, col("neighbor_key"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_key", "neighbor_key", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * multiply-mod-2^31 rounds interleaved with xor-shifts, mapped to ±1.
    * Stateless — both sides of any join compute identical planes with no
    * fitted model to ship — and pure integer arithmetic, so any SQL engine
    * (and the DuckDB oracle) reproduces the identical plane set with plain
    * `%`/`xor`/`>>` math; intermediate products stay < 2^62, inside engines
    * that error on BIGINT overflow. The xor-shifts are load-bearing: a
    * purely linear congruential chain is linear in (p, d) and its lattice
    * structure produced ~20× the same-bucket collisions of random signs on
    * real embeddings; this mixer measures at random-sign quality.
    */
  private[graft] def planeSign(p: Int, d: Column): Column = {
    val x = lit(p.toLong * 1000003L) + d.cast("long")
    val h1 = pmod(x * lit(2654435761L) + lit(1013904223L), lit(2147483647L))
    val h1x = h1.bitwiseXOR(shiftright(h1, 13))
    val h2 = pmod(h1x * lit(1103515245L) + lit(12345L), lit(2147483647L))
    val h2x = h2.bitwiseXOR(shiftright(h2, 7))
    val h3 = pmod(h2x * lit(48271L), lit(2147483647L))
    when(shiftright(h3, 15).bitwiseAND(lit(1L)) === 0, lit(1.0)).otherwise(lit(-1.0))
  }

  /** Sign-random-projection bucket id from `numPlanes` hyperplanes:
    * bit p = sign(v · r_p). Vectors in the same bucket are near-neighbor
    * candidates (Charikar 2002 SimHash for cosine).
    */
  def lshBucket(vec: Column, numPlanes: Int): Column =
    (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x.cast("double") * planeSign(p, d)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** IVF (inverted-file) approximate top-k — the other standard ANN scale
    * path: partition the corpus by nearest centroid, probe only the
    * `nProbe` centroids closest to each query.
    *
    * Centroids are a deterministic hash-sample of the corpus itself (a
    * k-means iteration can refine them later; sampling already gives the
    * recall/cost trade-off). Assignment is a broadcast join against the
    * (tiny) centroid set — the corpus is scanned once, shuffled once on
    * centroid id, and each query touches nProbe/nCentroids of the data.
    */
  /** Engine-portable 60-bit hash of a column's string form: the value of
    * `conv(substr(md5(x),1,15),16,10)` — identical in DuckDB as
    * `('0x' || substr(md5(x),1,15))::BIGINT`. Used where a sampling /
    * bucketing decision must be reproducible by an external SQL oracle.
    */
  def portable60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** JVM twin of [[portable60]] for driver-side / test use — MUST stay
    * bit-identical to the Column form (first 15 hex chars of md5, base 16).
    */
  def portable60Of(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"${b & 0xFF}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  // ---- embedded centroid tables (native kernel fast path) -----------------

  /** Centroid tables up to this many rows are collected to the driver and
    * embedded in the native PQ/coarse kernels ([[graft.expressions
    * .PqKernels]]) as plan constants — encode and coarse assignment then
    * run as per-row-local projections with ZERO joins and exchanges,
    * instead of crossJoin × explode × interpreted-HOF × two aggregation
    * exchanges. 4096 × 64 doubles ≈ 2 MB of task binary, comfortably
    * under broadcast-sized; bigger or irregular codebooks keep the
    * dataflow path (same results, spec-pinned equivalence).
    */
  private val MaxEmbeddedCentroids = 4096

  /** Collect a centroid table as (idOffset, vectors-ordered-by-id);
    * None when the native kernels cannot embed it faithfully: more than
    * [[MaxEmbeddedCentroids]] rows, null ids/vectors/elements,
    * non-consecutive ids (codes index ADC tables positionally), or
    * ragged dimensions.
    */
  private[graft] def collectCentroidTable(cb: DataFrame, idCol: String,
      vecCol: String): Option[(Int, IndexedSeq[IndexedSeq[Double]])] = {
    val rows = cb
      .select(col(idCol).cast("int").alias("__id"),
        col(vecCol).cast("array<double>").alias("__v"))
      .orderBy(col("__id"))
      .limit(MaxEmbeddedCentroids + 1)
      .collect()
    if (rows.isEmpty || rows.length > MaxEmbeddedCentroids) return None
    if (rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) return None
    val ids = rows.map(_.getInt(0))
    val off = ids.head
    if (!ids.zipWithIndex.forall { case (id, i) => id == off + i }) return None
    val vecs = rows.map(_.getAs[scala.collection.Seq[Any]](1))
    if (vecs.exists(v => v == null || v.exists(_ == null))) return None
    val dims = vecs.map(_.length).distinct
    if (dims.length > 1) return None
    Some((off, vecs.map(_.map(_.asInstanceOf[Double]).toIndexedSeq).toIndexedSeq))
  }

  private def pqCodesNative(vec: Column,
      tab: IndexedSeq[IndexedSeq[Double]], numSubspaces: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.PqCodesExpr(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(vec),
        tab, numSubspaces))

  private def pqSubDistTableNative(vec: Column,
      tab: IndexedSeq[IndexedSeq[Double]], numSubspaces: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.PqSubDistTableExpr(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(vec),
        tab, numSubspaces))

  private def coarseScoresNative(vec: Column,
      tab: IndexedSeq[IndexedSeq[Double]], zipLengths: Boolean): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CoarseScoresExpr(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(vec),
        tab, zipLengths))

  private def coarseAssignNative(vec: Column,
      tab: IndexedSeq[IndexedSeq[Double]], zipLengths: Boolean): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CoarseAssignExpr(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(vec),
        tab, zipLengths))

  /** Cell-count guidance for IVF layouts: cells ≈ √n balances per-probe
    * scan cost (n/cells rows) against the coarse assignment cost (cells
    * distance evaluations per row) — the standard rule (FAISS trains
    * `sqrt(n)`-to-`4·sqrt(n)` cells). The demo-scale gate queries pin
    * nCentroids=16 for oracle replay; REAL corpora should pass this.
    * Clamped to [16, 65536] — below 16 probing stops pruning, above 64k
    * the coarse table stops broadcasting comfortably.
    */
  def ivfCentroidsFor(corpusSize: Long): Int =
    math.max(16L, math.min(65536L, math.round(math.sqrt(
      math.max(0L, corpusSize).toDouble)))).toInt

  def ivfTopK(
      corpus: DataFrame,
      corpusKey: String,
      corpusVec: String,
      queries: DataFrame,
      queryKey: String,
      queryVec: String,
      k: Int,
      /** Demo-scale default; at real corpus sizes pass
        * [[ivfCentroidsFor]](n).
        */
      nCentroids: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    // Deterministic hash-sample of the corpus as centroids. md5-portable
    // hash (one per corpus row, sampling pass only) + row_number centroid
    // ids so an external engine reproduces the exact same centroid set —
    // monotonically_increasing_id would depend on physical partitioning.
    val sampled = corpus
      .select(col(corpusKey).alias("ck"), col(corpusVec).alias("cent_vec"))
      .withColumn("__r", pmod(portable60(col("ck")), lit(1000000L)))
      .orderBy(col("__r"), col("ck"))
      .limit(nCentroids)
    // constant-VALUED but non-foldable partition key: a literal would be
    // constant-folded out of the partition spec and re-trigger WindowExec's
    // no-partition warning; pmod(__r, 1) is 0 for every row yet survives
    // optimization. Same single-partition window over ≤ nCentroids rows.
    val wc = Window.partitionBy(pmod(col("__r"), lit(1))).orderBy(col("__r"), col("ck"))
    val cents = sampled
      .withColumn("cent_id", row_number().over(wc))
      .select(col("cent_id"), col("cent_vec"), norm(col("cent_vec")).alias("cent_norm"))
    // exploded centroid components for the codegen'd assignment join
    val centExp = broadcast(cents
      .select(col("cent_id"), col("cent_norm"),
        posexplode(col("cent_vec")).as(Seq("d", "cx"))))

    // Nearest-centroid assignment. With an embeddable centroid table the
    // whole argmin/argtop runs as ONE per-row kernel in the scan
    // projection (no explode, no join, no aggregation exchange); the
    // posexplode + broadcast-join + partial-agg dataflow remains for
    // big/irregular centroid sets. argmax of cos(v, c) = argmax of
    // dot(v, c)/|c| (|v| is constant per row), so the row vector's norm
    // is never needed for assignment. Join-idiom null semantics (null
    // elements skip like SQL SUM) are preserved by zipLengths = false.
    val centTab = collectCentroidTable(
      cents.select(col("cent_id"), col("cent_vec")), "cent_id", "cent_vec")
    def assign(src: DataFrame, keyAs: String, vecCol: String, keep: Int): DataFrame = {
      val scored = centTab match {
        case Some((off, tab)) =>
          if (keep == 1)
            return src.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
              .select(col(keyAs),
                (coarseAssignNative(col(vecCol), tab, zipLengths = false) +
                  lit(off)).alias("cent_id"))
          else
            src.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
              .select(col(keyAs),
                posexplode(coarseScoresNative(col(vecCol), tab,
                  zipLengths = false)).as(Seq("__j", "score")))
              .select(col(keyAs), (col("__j") + lit(off)).alias("cent_id"),
                col("score"))
        case None =>
          val dots = src
            .select(col(keyAs), posexplode(col(vecCol)).as(Seq("d", "x")))
            .join(centExp, "d")
            .groupBy(col(keyAs), col("cent_id"), col("cent_norm"))
            .agg(sum(col("x").cast("double") * col("cx").cast("double"))
              .alias("dot"))
          // zero-norm guard (parity with ivfPqTopK/semDedup): an all-zero
          // sampled centroid gives 0/0 = NaN, and Spark-vs-SQL NaN ordering
          // divergence would break the exact-replay contract; score it flat
          dots.withColumn("score",
            when(col("cent_norm") === 0, lit(0.0))
              .otherwise(-col("dot") / col("cent_norm")))
      }
      if (keep == 1)
        scored.groupBy(col(keyAs))
          .agg(min_by(col("cent_id"), struct(col("score"), col("cent_id")))
            .alias("cent_id"))
      else {
        val w = Window.partitionBy(col(keyAs)).orderBy(col("score"), col("cent_id"))
        scored.withColumn("__cr", row_number().over(w))
          .filter(col("__cr") <= keep)
          .select(col(keyAs), col("cent_id"))
      }
    }

    val corpusAssigned = assign(
        corpus.select(col(corpusKey).alias("neighbor_key"), col(corpusVec).alias("cv")),
        "neighbor_key", "cv", 1)
      .join(corpus.select(col(corpusKey).alias("neighbor_key"),
        col(corpusVec).alias("cv")), "neighbor_key")
    val queryAssigned = assign(
        queries.select(col(queryKey).alias("query_key"), col(queryVec).alias("qv")),
        "query_key", "qv", nProbe)
      .join(queries.select(col(queryKey).alias("query_key"),
        col(queryVec).alias("qv")), "query_key")

    // probe side broadcasts (see ivfPqTopK): a hash join on the
    // nCentroids-key cent_id domain would give each cell one task and
    // make a hot cell the straggler; broadcasting the query→cell list
    // leaves corpus rows spread across their existing partitions
    val cand = corpusAssigned.join(broadcast(queryAssigned), Seq("cent_id"))
      .filter(!(col("query_key") <=> col("neighbor_key")))
      .dropDuplicates("query_key", "neighbor_key")
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_key"))
      .orderBy(col("cosine").desc, col("neighbor_key"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_key", "neighbor_key", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed candidates
    * verified at `minCosine` — the embedding-space member of the dedup
    * family (exact/minhash/simhash/winnow cover the text space).
    */
  /** Sign-random-projection bucket ids per table as one native codegen'd
    * pass over the vector ([[graft.expressions.LshBuckets]]). Bucketing is
    * per-row-local — computing it inside the scan projection needs zero
    * shuffles, vs. the posexplode → wide-buffer groupBy → join-back
    * composition (three exchanges) it replaces. Plane signs are the same
    * LCG arithmetic as [[planeSign]], reproducible in plain SQL.
    */
  def lshBucketsNative(vec: Column, numPlanes: Int, numTables: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.LshBuckets(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(vec),
        numPlanes, numTables))

  /** Bucket rows for a frame: (key, table, bucket, vec) — one row per
    * (vector, table), vector carried alongside so candidate joins need no
    * separate vector re-join.
    */
  private[graft] def lshBucketRows(
      df: DataFrame, keyAs: String, vecCol: String, vecAs: String,
      numPlanes: Int, numTables: Int): DataFrame =
    df.select(col(keyAs), col(vecCol).alias(vecAs),
      posexplode(lshBucketsNative(col(vecCol), numPlanes, numTables))
        .as(Seq("table", "bucket")))
      .select(col(keyAs), col("table"), col("bucket"), col(vecAs))

  /** Embedding near-dup pairs: same-bucket candidates verified at
    * `minCosine` directly — no top-k ranking window (a threshold filter
    * needs no per-query sort; the former route through
    * `lshTopK(k = MaxValue)` paid a row_number shuffle it ignored).
    * The bucket rows are persisted: both sides of the candidate self-join
    * scan them, and they are narrow (key, table, bucket, vec).
    */
  def embeddingNearDups(
      corpus: DataFrame,
      keyCol: String,
      vecCol: String,
      minCosine: Double = 0.95,
      numPlanes: Int = 12,
      numTables: Int = 4
  ): DataFrame = {
    // localCheckpoint, not persist: callers can never unpersist the frame
    // backing the returned result, so on repeated/micro-batch use persist
    // would pin CacheManager blocks forever; checkpoint blocks free with
    // the RDD
    val b = lshBucketRows(
        corpus.select(col(keyCol).alias("key"), col(vecCol).alias("v")),
        "key", "v", "v", numPlanes, numTables)
      .localCheckpoint(true)
    val l = b.select(col("key").alias("key_a"), col("v").alias("va"),
      col("table").alias("l_t"), col("bucket").alias("l_b"))
    val r = b.select(col("key").alias("key_b"), col("v").alias("vb"),
      col("table").alias("r_t"), col("bucket").alias("r_b"))
    l.join(r,
        col("l_t") === col("r_t") && col("l_b") === col("r_b") &&
          col("key_a") < col("key_b"))
      .dropDuplicates("key_a", "key_b")
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= minCosine)
      .select("key_a", "key_b", "cosine")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): semantic near-duplicate
    * removal scoped by k-means cells. Every embedding is assigned to its
    * nearest centroid; pairwise cosine is computed only WITHIN a cell —
    * the SemDeDup trick that turns O(n²) semantic dedup into
    * O(Σ|cell|²) — pairs at or above `tau` form duplicate components
    * (distributed min-label propagation,
    * [[DedupOps.duplicateClusters]]), and the minimum key survives per
    * component.
    *
    * `centroids`: (id, cent_vec) rows — pass
    * [[pqTrain]]`(numSubspaces = 1)`'s Lloyd-trained codebook for the
    * paper's construction (spec-gated: trained centroids are float
    * iterations in shuffle order, so they are not oracle-replayable);
    * the default deterministic hash-sample IS replayable, which is what
    * the gate query uses. `nClusters` defaults to 0 = auto: one count
    * of the corpus, then [[ivfCentroidsFor]]'s √n rule — at 10⁹ rows
    * that is ~31623 cells, keeping Σ|cell|² ≈ n^1.5 instead of the
    * quadratic blow-up a small literal would give. Gate queries pin an
    * explicit count for oracle replay.
    *
    * Scale shape: assignment is the exploded-dot broadcast join (no
    * per-row HOF loop), the candidate join is an equi-join on `cent_id`
    * — bucketed, never all-pairs — and only (key, cent_id) plus the
    * pair list ever shuffle.
    *
    * @return (key, cent_id, kept) for every corpus row — `kept = false`
    *         exactly for non-representative members of a duplicate
    *         component
    */
  def semDedup(
      corpus: DataFrame,
      keyCol: String,
      vecCol: String,
      tau: Double = 0.95,
      nClusters: Int = 0,
      centroids: Option[DataFrame] = None
  ): DataFrame = {
    val src = corpus.select(col(keyCol).alias("key"),
      col(vecCol).cast("array<double>").alias("v"))
    // 0 = auto: √n cells (one planning count; skipped when the caller
    // supplies trained centroids, whose own row count wins)
    val cells =
      if (nClusters > 0 || centroids.isDefined) nClusters
      else ivfCentroidsFor(src.count())
    val cents = centroids match {
      case Some(cb) => cb.select(
        col(cb.columns(0)).cast("int").alias("cent_id"),
        col(cb.columns(1)).cast("array<double>").alias("cent_vec"))
      case None =>
        // deterministic hash-sample, the ivfTopK idiom: md5-portable
        // order + row_number ids so an external engine replays the set
        val sampled = src
          .withColumn("__r", pmod(portable60(col("key")), lit(1000000L)))
          .orderBy(col("__r"), col("key"))
          .limit(cells)
        val wc = Window.partitionBy(pmod(col("__r"), lit(1)))
          .orderBy(col("__r"), col("key"))
        sampled.withColumn("cent_id", row_number().over(wc))
          .select(col("cent_id"), col("v").alias("cent_vec"))
    }
    // embeddable centroid table → assignment is ONE per-row argmin kernel
    // in the scan projection (no posexplode, no broadcast join, no two
    // aggregation exchanges, and no join back for the vector); the
    // dataflow form remains for big/irregular centroid sets. Join-idiom
    // null semantics (null elements skip like SQL SUM) via
    // zipLengths = false.
    val centTab = collectCentroidTable(
      cents.select(col("cent_id"), col("cent_vec")), "cent_id", "cent_vec")
    val (assigned, withV) = centTab match {
      case Some((off, tab)) =>
        val a = src.filter(col("v").isNotNull && size(col("v")) > 0)
          .select(col("key"), col("v"),
            (coarseAssignNative(col("v"), tab, zipLengths = false) +
              lit(off)).alias("cent_id"))
        (a.select(col("key"), col("cent_id")), a)
      case None =>
        val centExp = broadcast(cents
          .select(col("cent_id"), norm(col("cent_vec")).alias("cent_norm"),
            posexplode(col("cent_vec")).as(Seq("d", "cx"))))
        val a = src
          .select(col("key"), posexplode(col("v")).as(Seq("d", "x")))
          .join(centExp, "d")
          .groupBy(col("key"), col("cent_id"), col("cent_norm"))
          .agg(sum(col("x") * col("cx")).alias("dot"))
          .withColumn("score", when(col("cent_norm") === 0, lit(0.0))
            .otherwise(-col("dot") / col("cent_norm")))
          .groupBy(col("key"))
          .agg(min_by(col("cent_id"), struct(col("score"), col("cent_id")))
            .alias("cent_id"))
        (a, src.join(a, "key"))
    }
    val a = withV.select(col("cent_id"), col("key").alias("key_a"),
      col("v").alias("va"))
    val b = withV.select(col("cent_id"), col("key").alias("key_b"),
      col("v").alias("vb"))
    val pairs = a.join(b, Seq("cent_id"))
      .filter(col("key_a") < col("key_b"))
      .filter(cosine(col("va"), col("vb")) >= tau)
      .select(col("key_a"), col("key_b"))
    val comps = DedupOps.duplicateClusters(pairs)
    val flagged = assigned.join(comps, Seq("key"), "left")
      .select(col("key"), col("cent_id"),
        (col("cluster_id").isNull || col("cluster_id") === col("key"))
          .alias("kept"))
    // rows whose embedding is NULL or empty never assign a cell
    // (posexplode emits nothing) — but the contract returns EVERY corpus
    // row, and an unembeddable document cannot be proven a duplicate, so
    // it survives with no cell rather than silently vanishing from the
    // output (a kept-join caller would otherwise delete it)
    val unembeddable = src
      .filter(col("v").isNull || size(col("v")) === 0)
      .select(col("key"), lit(null).cast("int").alias("cent_id"),
        lit(true).alias("kept"))
    flagged.unionByName(unembeddable)
  }

  /** Approximate top-k: candidates restricted to equal LSH buckets (optionally
    * multi-probe over `numTables` independent plane sets), exact cosine +
    * rank inside the candidate set.
    */
  def lshTopK(
      corpus: DataFrame,
      corpusKey: String,
      corpusVec: String,
      queries: DataFrame,
      queryKey: String,
      queryVec: String,
      k: Int,
      numPlanes: Int = 12,
      numTables: Int = 4,
      /** See [[bruteForceTopK]]: false keeps self-matches (store query
        * contract), true (default) drops them (near-dup contract).
        */
      excludeSelf: Boolean = true
  ): DataFrame = {
    val c = lshBucketRows(
      corpus.select(col(corpusKey).alias("neighbor_key"), col(corpusVec).alias("cv")),
      "neighbor_key", "cv", "cv", numPlanes, numTables)
    val q = lshBucketRows(
      queries.select(col(queryKey).alias("query_key"), col(queryVec).alias("qv")),
      "query_key", "qv", "qv", numPlanes, numTables)
    val cA = c.select(col("neighbor_key"), col("cv"),
      col("table").alias("c_t"), col("bucket").alias("c_b"))
    val qA = q.select(col("query_key"), col("qv"),
      col("table").alias("q_t"), col("bucket").alias("q_b"))
    // null-safe: `=!=` silently emptied NULL-id queries
    val selfGuard =
      if (excludeSelf) !(col("query_key") <=> col("neighbor_key"))
      else lit(true)
    val cand = cA.join(qA,
        col("c_t") === col("q_t") && col("c_b") === col("q_b") && selfGuard)
      .dropDuplicates("query_key", "neighbor_key")
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_key"))
      .orderBy(col("cosine").desc, col("neighbor_key"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_key", "neighbor_key", "cosine", "rank")
  }

  // ---- int8 quantization ---------------------------------------------------

  /** Symmetric per-vector int8 quantization: scale = max|v| / 127,
    * code_i = floor(v_i / scale + 0.5) — floor(x + 0.5) instead of a
    * round() builtin because engines disagree on .5 ties (HALF_UP vs
    * away-from-zero) and this form is bit-identical everywhere. A 4x
    * footprint cut for embedding tables (the difference between a 100 TB
    * and a 25 TB ANN corpus), with recall measured, not assumed — see
    * QuantizationSpec.
    *
    * @return struct(scale: double, codes: array<int>); zero vectors get
    *         scale 0 and all-zero codes
    */
  def quantizeInt8(v: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.QuantizeInt8Expr(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(v)))

  /** Interpreted HOF twin of [[quantizeInt8]] — spec-level reference the
    * native kernel is verified against. Note the embedded `scale`
    * aggregate re-evaluates inside the codes `transform` lambda once per
    * ELEMENT, which is why the kernel replaced it on the hot path.
    */
  private[graft] def quantizeInt8Hof(v: Column): Column = {
    val scale = aggregate(v, lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0
    struct(
      scale.alias("scale"),
      when(scale === 0.0, transform(v, _ => lit(0)))
        .otherwise(transform(v,
          x => floor(x.cast("double") / scale + 0.5).cast("int")))
        .alias("codes"))
  }

  /** Inverse of [[quantizeInt8]]: code_i * scale, back to double. */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"),
      c => c.cast("double") * q.getField("scale"))

  // ---- product quantization ------------------------------------------------

  /** PQ codebook: split the vector into `numSubspaces` contiguous
    * subspaces; subspace `m`'s centroid `j` is sampled row `j`'s m-th
    * subvector. The sample is the same deterministic hash-order trick as
    * [[ivfTopK]]'s centroids (portable60 + row_number), so an external
    * SQL engine reproduces the exact codebook. A k-means refinement can
    * replace the sample later without touching encode/query.
    *
    * @return (j, cent_vec) — one row per sampled vector, 0-based id;
    *         subvector slicing happens at the consumer so the codebook
    *         stays one narrow broadcastable table
    */
  private def pqSample(corpus: DataFrame, keyCol: String, vecCol: String,
      numCentroids: Int): DataFrame = {
    val sampled = corpus
      .select(col(keyCol).alias("ck"), col(vecCol).alias("cent_vec"))
      .withColumn("__r", pmod(portable60(col("ck")), lit(1000000L)))
      .orderBy(col("__r"), col("ck"))
      .limit(numCentroids)
    // see ivfTopK: constant-valued but non-foldable partition key
    val wc = Window.partitionBy(pmod(col("__r"), lit(1)))
      .orderBy(col("__r"), col("ck"))
    sampled.withColumn("j", row_number().over(wc) - 1)
      .select(col("j"), col("cent_vec"))
  }

  /** Per-(row, subspace, centroid) squared L2 distance between the row's
    * m-th subvector and sampled centroid j's. The sum runs IN INDEX ORDER
    * (`aggregate` over `zip_with`) — float addition is not associative,
    * and an exploded groupBy-sum would make distances depend on shuffle
    * order; in-order summation is what lets an external engine replay the
    * exact doubles, tie-breaks included.
    */
  private def pqSubDists(src: DataFrame, keyAs: String, vecCol: String,
      cb: DataFrame, numSubspaces: Int): DataFrame = {
    require(numSubspaces > 0, "numSubspaces must be positive")
    // vectors must split evenly: a remainder would silently drop trailing
    // dimensions from every distance (and numSubspaces > dim would rank
    // by nothing at all) — fail loudly per row instead
    val sd = when(pmod(size(col(vecCol)), lit(numSubspaces)) =!= 0,
        raise_error(concat(
          lit("PQ: vector length "), size(col(vecCol)).cast("string"),
          lit(s" is not divisible by numSubspaces=$numSubspaces")))
          .cast("int"))
      .otherwise((size(col(vecCol)) / numSubspaces).cast("int"))
    src.select(col(keyAs), col(vecCol), sd.alias("__sd"))
      .crossJoin(broadcast(cb))
      .select(col(keyAs), col("j"),
        explode(sequence(lit(0), lit(numSubspaces - 1))).alias("m"),
        col(vecCol).alias("__v"), col("cent_vec"), col("__sd"))
      .withColumn("dd", aggregate(
        zip_with(
          slice(col("__v"), col("m") * col("__sd") + 1, col("__sd")),
          slice(col("cent_vec"), col("m") * col("__sd") + 1, col("__sd")),
          (a, b) => (a.cast("double") - b.cast("double")) *
            (a.cast("double") - b.cast("double"))),
        lit(0.0), (acc, x) => acc + x))
      .select(col(keyAs), col("m"), col("j"), col("dd"))
  }

  /** Lloyd-refined (k-means) PQ codebook — the quality upgrade over
    * [[pqSample]]'s hash-sampled codebook (Jégou et al. 2011 train
    * theirs the same way; sampling is the bootstrap, not the product).
    * Runs `iters` fixed Lloyd rounds per subspace over a deterministic
    * hash-ordered training sample of at most `trainLimit` vectors:
    * assign every sub-vector to its nearest centroid (squared L2, index
    * -ordered sums, ties to the smaller id), recompute centroids as
    * cluster means, keep the old centroid for empty clusters.
    * `iters = 0` returns exactly the [[pqSample]] codebook (cast to
    * double) — the two modes share their initialization.
    *
    * Scale shape: the codebook is a driver-side literal (M·K·d doubles,
    * a few KB), so ASSIGNMENT is a pure per-row expression over the
    * sampled sub-vectors — no join, no shuffle; the only exchange per
    * round is the (m, centroid, dim) partial-agg mean, bounded by
    * M·K·d groups regardless of corpus size. `trainLimit` bounds the
    * per-round scan the way every production PQ trainer subsamples.
    *
    * Determinism: the per-round means are float sums in shuffle order,
    * so trained centroids can differ across runs in final ulps — which
    * is why trained codebooks are SPEC-gated (recall/quantization-error
    * margins in PqSpec), while the oracle-replayed gate queries keep
    * [[pqSample]]. Pass the result to [[pqTopK]]/[[ivfPqTopK]] via
    * their `codebook`/`pqCodebook` parameters.
    *
    * @return (j, cent_vec: array<double>) — same shape as [[pqSample]]
    */
  def pqTrain(
      corpus: DataFrame,
      keyCol: String,
      vecCol: String,
      numSubspaces: Int = 8,
      numCentroids: Int = 16,
      iters: Int = 8,
      trainLimit: Int = 65536
  ): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    require(trainLimit >= numCentroids,
      s"trainLimit=$trainLimit < numCentroids=$numCentroids")
    val spark = corpus.sparkSession
    val dcorpus = corpus.select(col(keyCol).alias("ck"),
      col(vecCol).cast("array<double>").alias("cent_vec"))
    // init = the hash-sampled codebook (shared bootstrap with pqSample)
    val init = pqSample(dcorpus, "ck", "cent_vec", numCentroids)
      .orderBy("j").collect()
      .map(_.getSeq[Double](1).toArray)
    require(init.nonEmpty, "pqTrain: empty corpus")
    val dim = init.head.length
    require(dim % numSubspaces == 0,
      s"PQ: vector length $dim is not divisible by numSubspaces=$numSubspaces")
    val sd = dim / numSubspaces
    val kk = init.length // may be < numCentroids on tiny corpora
    // cents(m)(j)(d): per-subspace centroid table
    var cents: Array[Array[Array[Double]]] = Array.tabulate(numSubspaces) {
      m => init.map(_.slice(m * sd, (m + 1) * sd))
    }
    if (iters > 0) {
      val subs = dcorpus
        .withColumn("__r", pmod(portable60(col("ck")), lit(1000000L)))
        .orderBy(col("__r"), col("ck"))
        .limit(trainLimit)
        .select(explode(sequence(lit(0), lit(numSubspaces - 1))).alias("m"),
          col("cent_vec").alias("__v"))
        .select(col("m"),
          slice(col("__v"), col("m") * sd + 1, lit(sd)).alias("sv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        for (_ <- 0 until iters) {
          val centsLit = typedlit(cents.map(_.map(_.toSeq).toSeq).toSeq)
          val assigned = subs
            .withColumn("__dists", transform(
              element_at(centsLit, col("m") + 1),
              cv => aggregate(zip_with(col("sv"), cv,
                  (a, b) => (a - b) * (a - b)),
                lit(0.0), (acc, x) => acc + x)))
            .withColumn("code", expr(
              s"""aggregate(sequence(0, ${kk - 1}),
                  named_struct('bj', -1, 'bd', CAST('Infinity' AS DOUBLE)),
                  (s, j) -> IF(element_at(__dists, j + 1) < s.bd,
                    named_struct('bj', j, 'bd', element_at(__dists, j + 1)),
                    s),
                  s -> s.bj)"""))
          val sums = assigned
            .select(col("m"), col("code"),
              posexplode(col("sv")).as(Seq("d", "x")))
            .groupBy(col("m"), col("code"), col("d"))
            .agg(sum(col("x")).alias("sx"), count(lit(1)).alias("c"))
            .collect()
          val next = cents.map(_.map(_.clone())) // empty clusters keep old
          sums.foreach { r =>
            val (m, j, d) = (r.getInt(0), r.getInt(1), r.getInt(2))
            // code -1 = a training vector whose subvector distances were
            // all NULL (short/NaN embedding slipped past the first-row
            // dim check) — name the cause instead of an AIOOBE here
            require(j >= 0,
              "pqTrain: a sampled vector produced no best centroid — " +
                "mixed-dimension or NaN embeddings in the training " +
                "sample; clean the embedding column first")
            next(m)(j)(d) = r.getDouble(3) / r.getLong(4)
          }
          cents = next
        }
      } finally subs.unpersist()
    }
    // reassemble full-dim centroid vectors: j's vector is the
    // concatenation of its per-subspace centroids
    import scala.jdk.CollectionConverters._
    val rows = (0 until kk).map { j =>
      org.apache.spark.sql.Row(j,
        (0 until numSubspaces).flatMap(m => cents(m)(j)).toSeq)
    }.asJava
    spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cent_vec",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = false))))
  }

  /** Mean squared quantization error of a codebook over a corpus — the
    * objective Lloyd minimizes; the direct way to compare codebook
    * quality (lower = codes reconstruct vectors better = ADC ranks more
    * faithfully). One scan, broadcast codebook, in-order sums.
    */
  def pqQuantizationError(corpus: DataFrame, keyCol: String, vecCol: String,
      cb: DataFrame, numSubspaces: Int): Double =
    pqSubDists(corpus.select(col(keyCol).alias("__qk"), col(vecCol)),
        "__qk", vecCol, cb, numSubspaces)
      .groupBy(col("__qk"), col("m"))
      .agg(min(col("dd")).alias("dd"))
      .agg(avg(col("dd")))
      .head().getDouble(0)

  /** Product-quantization encode: each vector becomes `numSubspaces`
    * byte-sized codes (nearest sampled sub-centroid per subspace, squared
    * L2, ties to the smaller id). With 8 subspaces × 16 centroids a
    * 64-dim float vector compresses 64x (256 B → 8 codes) — the
    * difference between an ANN corpus that fits executor memory and one
    * that does not; [[pqTopK]] queries the codes without reconstructing.
    *
    * @return (keyCol, codes: array<int>) — codes ordered by subspace
    */
  def pqEncode(
      corpus: DataFrame,
      keyCol: String,
      vecCol: String,
      numSubspaces: Int = 8,
      numCentroids: Int = 16
  ): DataFrame =
    pqEncodeWith(corpus, keyCol, vecCol,
      pqSample(corpus, keyCol, vecCol, numCentroids), numSubspaces)

  /** PQ approximate top-k via asymmetric distance computation (ADC):
    * queries keep full precision, corpus rows are looked up through their
    * codes — approx dist(q, v) = Σ_m qtab[m][code_m(v)] where qtab is the
    * query's per-subspace distance table to the codebook (Jégou et al.
    * 2011). The scan is one broadcast of the (tiny) query tables over the
    * codes — per-neighbor cost is `numSubspaces` array lookups summed in
    * order, no vector arithmetic; composition with [[ivfTopK]]'s
    * centroid pruning (probe subset → ADC inside) is the standard
    * IVF-PQ layout at 100 TB.
    *
    * @return (query_key, neighbor_key, rank) — rank 1..k by ascending
    *         approximate distance, ties to the smaller neighbor key
    */
  def pqTopK(
      corpus: DataFrame,
      corpusKey: String,
      corpusVec: String,
      queries: DataFrame,
      queryKey: String,
      queryVec: String,
      k: Int,
      numSubspaces: Int = 8,
      numCentroids: Int = 16,
      /** Override the hash-sampled codebook — pass [[pqTrain]]'s result
        * for Lloyd-refined quality. (j, cent_vec) shape.
        */
      codebook: Option[DataFrame] = None
  ): DataFrame = {
    val cb = codebook.getOrElse(
      pqSample(corpus, corpusKey, corpusVec, numCentroids))
    // one driver collect feeds both the encode and the query tables —
    // the dataflow form built (and broadcast) the codebook twice
    val cbTab = collectCentroidTable(cb, "j", "cent_vec")
    // corpus side: codes as one array per row, ordered by subspace
    val codes = pqEncodeWith(corpus, corpusKey, corpusVec, cb, numSubspaces,
        preTab = cbTab)
      .select(col(corpusKey).alias("neighbor_key"), col("codes"))
    val qtab = pqQueryTables(queries, queryKey, queryVec, cb, numSubspaces,
      preTab = cbTab)
    // ADC: query tables broadcast over the codes; the inner sum walks
    // subspaces in order (deterministic doubles, as above)
    val scored = codes.crossJoin(broadcast(qtab))
      .filter(!(col("query_key") <=> col("neighbor_key")))
      .withColumn("adist", pqAdist(col("tab"), col("codes")))
    val w = Window.partitionBy(col("query_key"))
      .orderBy(col("adist"), col("neighbor_key"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_key", "neighbor_key", "rank")
  }

  /** Per-query PQ distance tables as array[m][j] (both levels ordered):
    * `(query_key, tab)`. Embeddable codebooks build the whole table in
    * one per-row kernel call; the two-aggregation dataflow form remains
    * for big/irregular codebooks and as the spec reference.
    */
  private[graft] def pqQueryTables(queries: DataFrame, queryKey: String,
      queryVec: String, cb: DataFrame, numSubspaces: Int,
      preTab: Option[(Int, IndexedSeq[IndexedSeq[Double]])] = None): DataFrame =
    preTab.orElse(collectCentroidTable(cb, "j", "cent_vec"))
      .filter(_._1 == 0) match {
      case Some((_, tab)) =>
        queries.select(col(queryKey).alias("query_key"),
          pqSubDistTableNative(col(queryVec), tab, numSubspaces).alias("tab"))
      case None =>
        pqQueryTablesDataflow(queries, queryKey, queryVec, cb, numSubspaces)
    }

  private[graft] def pqQueryTablesDataflow(queries: DataFrame, queryKey: String,
      queryVec: String, cb: DataFrame, numSubspaces: Int): DataFrame =
    pqSubDists(
        queries.select(col(queryKey).alias("query_key"), col(queryVec)),
        "query_key", queryVec, cb, numSubspaces)
      .groupBy(col("query_key"), col("m"))
      .agg(transform(sort_array(collect_list(struct(col("j"), col("dd")))),
        s => s.getField("dd")).alias("row"))
      .groupBy(col("query_key"))
      .agg(transform(sort_array(collect_list(struct(col("m"), col("row")))),
        s => s.getField("row")).alias("tab"))

  /** In-order ADC sum: Σ_m tab[m][codes[m]] (deterministic doubles) — the
    * native kernel ([[graft.expressions.PqAdistExpr]]); the interpreted
    * `aggregate(zip_with(element_at))` twin it replaces is spec-pinned
    * equivalent in PqSpec.
    */
  private def pqAdist(tab: Column, codes: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.PqAdistExpr(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(tab),
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(codes)))

  /** Interpreted HOF twin of [[pqAdist]], kept as the spec-level
    * reference the native kernel is verified against.
    */
  private[graft] def pqAdistHof(tab: Column, codes: Column): Column =
    aggregate(
      zip_with(tab, codes, (row, c) => element_at(row, c + 1)),
      lit(0.0), (acc, x) => acc + x)

  /** IVF-PQ approximate top-k — the standard 100 TB ANN layout: a coarse
    * inverted file prunes the corpus to the `nProbe` centroid cells
    * nearest each query, and PQ codes rank inside the probed cells via
    * ADC. Per query the work is nProbe/nCentroids of the corpus at
    * `numSubspaces` table lookups per row; the corpus itself is stored
    * once as byte codes (64x smaller than float vectors).
    *
    * Determinism contract as [[pqTopK]]: every float sum (coarse dot
    * products, centroid norms, sub-distances, ADC) runs in index order,
    * so an external SQL engine replays the exact doubles, tie-breaks
    * included. Coarse centroids and the PQ codebook share the same
    * deterministic hash-sample ([[pqSample]]).
    *
    * @return (query_key, neighbor_key, rank) — rank 1..k by ascending
    *         approximate distance within the probed cells
    */
  /** Coarse IVF scoring shared by the PQ/ADC families: per (row,
    * centroid), -dot/|c| — -cos up to the row-constant factor; in-order
    * sums (see pqSubDists for why). Zero-norm guard: a degenerate
    * all-zero sampled centroid would give ±Inf/NaN, and Spark-vs-SQL
    * NaN ordering divergence would break the exact-replay contract —
    * score it flat instead. `src` must carry the vector as `__v`.
    */
  private def coarseScores(src: DataFrame, keyAs: String,
      coarseCents: DataFrame): DataFrame =
    src.crossJoin(broadcast(coarseCents))
      .withColumn("dot", aggregate(
        zip_with(col("__v"), col("cent_vec"),
          (a, b) => a.cast("double") * b.cast("double")),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("cnorm", sqrt(aggregate(
        zip_with(col("cent_vec"), col("cent_vec"),
          (a, b) => a.cast("double") * b.cast("double")),
        lit(0.0), (acc, x) => acc + x)))
      .select(col(keyAs), col("j").alias("cent_id"),
        when(col("cnorm") === 0, lit(0.0))
          .otherwise(-col("dot") / col("cnorm")).alias("score"))

  def ivfPqTopK(
      corpus: DataFrame,
      corpusKey: String,
      corpusVec: String,
      queries: DataFrame,
      queryKey: String,
      queryVec: String,
      k: Int,
      /** Demo-scale default; at real corpus sizes pass
        * [[ivfCentroidsFor]](n) — cells ≈ √n balances probe cost
        * against cell size.
        */
      nCentroids: Int = 16,
      nProbe: Int = 4,
      numSubspaces: Int = 8,
      pqCentroids: Int = 16,
      /** Override the hash-sampled coarse centroids (e.g. with
        * [[pqTrain]](numSubspaces = 1) — k-means on the full vectors).
        */
      coarseCentroids: Option[DataFrame] = None,
      /** Override the hash-sampled PQ codebook with [[pqTrain]]'s. */
      pqCodebook: Option[DataFrame] = None
  ): DataFrame = {
    val coarseCents = coarseCentroids.getOrElse(
      pqSample(corpus, corpusKey, corpusVec, nCentroids))
    def coarse(src: DataFrame, keyAs: String): DataFrame =
      coarseScores(src, keyAs, coarseCents)
    // embeddable centroid table → assignment is a per-row argmin kernel in
    // the corpus scan projection (no crossJoin, no groupBy exchange); the
    // coarseScores dataflow remains for big/irregular centroid sets
    val coarseTab = collectCentroidTable(coarseCents, "j", "cent_vec")
    val corpusCell = coarseTab match {
      case Some((off, tab)) =>
        corpus.select(col(corpusKey).alias("neighbor_key"),
          (coarseAssignNative(col(corpusVec), tab, zipLengths = true) +
            lit(off)).alias("cent_id"))
      case None =>
        coarse(corpus.select(col(corpusKey).alias("neighbor_key"),
            col(corpusVec).alias("__v")), "neighbor_key")
          .groupBy(col("neighbor_key"))
          .agg(min_by(col("cent_id"), struct(col("score"), col("cent_id")))
            .alias("cent_id"))
    }
    val wProbe = Window.partitionBy(col("query_key"))
      .orderBy(col("score"), col("cent_id"))
    val queryScores = coarseTab match {
      case Some((off, tab)) =>
        queries.select(col(queryKey).alias("query_key"),
            posexplode(coarseScoresNative(col(queryVec), tab,
              zipLengths = true)).as(Seq("__j", "score")))
          .select(col("query_key"), (col("__j") + lit(off)).alias("cent_id"),
            col("score"))
      case None =>
        coarse(queries.select(col(queryKey).alias("query_key"),
          col(queryVec).alias("__v")), "query_key")
    }
    val probes = queryScores
      .withColumn("__r", row_number().over(wProbe))
      .filter(col("__r") <= nProbe)
      .select(col("query_key"), col("cent_id"))

    val cb = pqCodebook.getOrElse(
      pqSample(corpus, corpusKey, corpusVec, pqCentroids))
    val cbTab = collectCentroidTable(cb, "j", "cent_vec")
    val codes = pqEncodeWith(corpus, corpusKey, corpusVec, cb, numSubspaces,
        preTab = cbTab)
      .select(col(corpusKey).alias("neighbor_key"), col("codes"))
    val qtab = pqQueryTables(queries, queryKey, queryVec, cb, numSubspaces,
      preTab = cbTab)

    // candidates: probed cells only (each corpus row lives in exactly one
    // cell, so no pair duplicates); then ADC-rank within them. The PROBE
    // side broadcasts: cent_id's domain is only nCentroids keys, so a
    // hash join on it would funnel each cell — hot cells included — into
    // a single task; broadcasting the (small) query→cell list instead
    // keeps corpus rows in their existing partitioning, so a skewed cell
    // stays spread across however many partitions already hold it.
    // When both centroid tables embed, cell id AND codes come out of ONE
    // corpus scan projection — the corpus is never shuffled at all here
    // (both remaining joins broadcast; only the rank window exchanges)
    val corpusSide = (coarseTab, cbTab) match {
      case (Some((off, ct)), Some((0, pt))) =>
        corpus.select(col(corpusKey).alias("neighbor_key"),
          (coarseAssignNative(col(corpusVec), ct, zipLengths = true) +
            lit(off)).alias("cent_id"),
          pqCodesNative(col(corpusVec), pt, numSubspaces).alias("codes"))
      case _ => corpusCell.join(codes, "neighbor_key")
    }
    val scored = corpusSide.join(broadcast(probes), "cent_id")
      .filter(!(col("query_key") <=> col("neighbor_key")))
      .join(broadcast(qtab), "query_key")
      .withColumn("adist", pqAdist(col("tab"), col("codes")))
    val w = Window.partitionBy(col("query_key"))
      .orderBy(col("adist"), col("neighbor_key"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_key", "neighbor_key", "rank")
  }

  /** IVF-PQ with an exact-vector re-rank — the standard two-stage
    * retrieval layout: [[ivfPqTopK]] produces a `kShortlist > k` ADC
    * shortlist (cheap, over byte codes), then only those candidates are
    * joined back to their TRUE vectors and re-scored with exact cosine.
    * ADC error is bounded by quantization, so with a modest shortlist
    * (4-8× k) the exact re-rank recovers brute-force ordering at a tiny
    * fraction of its cost — the corpus is still scanned as codes; full
    * vectors are touched for nQueries × kShortlist rows only.
    *
    * Scale shape: the shortlist (and the query set) broadcast, so the
    * re-rank never shuffles the corpus — one broadcast-join pass picks
    * the candidate vectors out of the existing corpus partitioning.
    *
    * Determinism contract as [[ivfPqTopK]], extended through the re-rank:
    * exact cosine is the ascending-index double fold of
    * [[graft.expressions.CosineSim]] (dot / (√Σa² · √Σb²)), so an external
    * SQL engine replays the re-ranked order exactly, ties included.
    *
    * @return (query_key, neighbor_key, rank) — rank 1..k by DESCENDING
    *         exact cosine within the shortlist, ties to the smaller key
    */
  def ivfPqTopKRerank(
      corpus: DataFrame,
      corpusKey: String,
      corpusVec: String,
      queries: DataFrame,
      queryKey: String,
      queryVec: String,
      k: Int,
      /** ADC shortlist size; 4-8× k is the usual recall/cost knee. */
      kShortlist: Int = 32,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      numSubspaces: Int = 8,
      pqCentroids: Int = 16,
      coarseCentroids: Option[DataFrame] = None,
      pqCodebook: Option[DataFrame] = None
  ): DataFrame = {
    require(kShortlist >= k,
      s"kShortlist ($kShortlist) must be >= k ($k): the re-rank can only " +
        "reorder the shortlist, not grow it")
    val shortlist = ivfPqTopK(corpus, corpusKey, corpusVec,
        queries, queryKey, queryVec, kShortlist,
        nCentroids, nProbe, numSubspaces, pqCentroids,
        coarseCentroids, pqCodebook)
      .select(col("query_key"), col("neighbor_key"))
    // candidates back to true vectors: shortlist and queries are tiny
    // (nQueries × kShortlist), so THEY broadcast and corpus rows stay in
    // their existing partitioning — no corpus shuffle for the re-rank
    val scored = corpus
      .select(col(corpusKey).alias("neighbor_key"), col(corpusVec).alias("__nv"))
      .join(broadcast(shortlist), "neighbor_key")
      .join(broadcast(queries.select(
        col(queryKey).alias("query_key"), col(queryVec).alias("__qv"))),
        "query_key")
      .withColumn("sim", cosine(col("__qv"), col("__nv")))
    val w = Window.partitionBy(col("query_key"))
      .orderBy(col("sim").desc, col("neighbor_key"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_key", "neighbor_key", "rank")
  }

  /** IVFADC with RESIDUAL encoding — the canonical layout of Jégou et
    * al. 2011 §IV: each corpus vector is PQ-coded on its residual
    * `v − centroid(cell(v))` instead of on `v` itself. Residuals are
    * centered near zero with far smaller spread than raw vectors, so the
    * same code budget (numSubspaces × log2(pqCentroids) bits) quantizes
    * them with less error — measurably higher recall at equal nProbe
    * (asserted in PqSpec, not assumed). The query side mirrors it: for
    * each probed cell the query's residual against THAT cell's centroid
    * builds the ADC table, so tables are per (query, cell).
    *
    * Cost shape vs [[ivfPqTopK]]: identical corpus-side passes (one
    * coarse assign, one encode, one probed-cell ADC scan); the query
    * side computes nProbe tables per query instead of one — still
    * nQueries × nProbe × M·K doubles, broadcast-sized. The residual
    * codebook is hash-sampled from the residuals themselves
    * ([[pqSample]]), so an external SQL engine replays every double of
    * the pipeline exactly, tie-breaks included — same determinism
    * contract as the whole PQ family.
    *
    * @return (query_key, neighbor_key, rank) — rank 1..k by ascending
    *         approximate distance within the probed cells
    */
  def ivfAdcTopK(
      corpus: DataFrame,
      corpusKey: String,
      corpusVec: String,
      queries: DataFrame,
      queryKey: String,
      queryVec: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      numSubspaces: Int = 8,
      pqCentroids: Int = 16,
      coarseCentroids: Option[DataFrame] = None,
      /** Durable-snapshot dir for the reused corpus-side intermediates
        * ([[Mat.snapshot]]); None = localCheckpoint — fastest, but blocks
        * die with their executor, so long batch index builds on
        * preemptible executors should pass a dir.
        */
      checkpointDir: Option[String] = None
  ): DataFrame = {
    val coarseCents = coarseCentroids.getOrElse(
      pqSample(corpus, corpusKey, corpusVec, nCentroids))
    // identical coarse scoring to ivfPqTopK (see there for the zero-norm
    // guard rationale)
    def coarse(src: DataFrame, keyAs: String): DataFrame =
      coarseScores(src, keyAs, coarseCents)
    val coarseTab = collectCentroidTable(coarseCents, "j", "cent_vec")
    // materialized once (localCheckpoint, the house pattern): corpusCell
    // feeds BOTH the residual build and the final scoring join — with the
    // embedded-kernel assignment it is a cheap projection, but the
    // snapshot still saves the second corpus scan; the dataflow form
    // (posexplode + broadcast join + two aggregations) remains for
    // big/irregular centroid sets
    val corpusCell = Mat.snapshot(coarseTab match {
      case Some((off, tab)) =>
        corpus.select(col(corpusKey).alias("neighbor_key"),
          (coarseAssignNative(col(corpusVec), tab, zipLengths = true) +
            lit(off)).alias("cent_id"))
      case None =>
        coarse(corpus.select(col(corpusKey).alias("neighbor_key"),
            col(corpusVec).alias("__v")), "neighbor_key")
          .groupBy(col("neighbor_key"))
          .agg(min_by(col("cent_id"), struct(col("score"), col("cent_id")))
            .alias("cent_id"))
    }, checkpointDir, "ivfadc-cell")
    val wProbe = Window.partitionBy(col("query_key"))
      .orderBy(col("score"), col("cent_id"))
    val queryScores = coarseTab match {
      case Some((off, tab)) =>
        queries.select(col(queryKey).alias("query_key"),
            posexplode(coarseScoresNative(col(queryVec), tab,
              zipLengths = true)).as(Seq("__j", "score")))
          .select(col("query_key"), (col("__j") + lit(off)).alias("cent_id"),
            col("score"))
      case None =>
        coarse(queries.select(col(queryKey).alias("query_key"),
          col(queryVec).alias("__v")), "query_key")
    }
    val probes = queryScores
      .withColumn("__r", row_number().over(wProbe))
      .filter(col("__r") <= nProbe)
      .select(col("query_key"), col("cent_id"))

    val centById = coarseCents
      .select(col("j").alias("cent_id"), col("cent_vec").alias("__cv"))
    // corpus residuals (one cell per vector → one residual per vector) —
    // consumed by the codebook sampling AND the encode pass; one scan
    val resid = Mat.snapshot(corpus
      .select(col(corpusKey).alias("neighbor_key"), col(corpusVec).alias("__v"))
      .join(corpusCell, "neighbor_key")
      .join(broadcast(centById), "cent_id")
      .withColumn("__rv", zip_with(col("__v"), col("__cv"),
        (a, b) => a.cast("double") - b.cast("double")))
      .select(col("neighbor_key"), col("__rv")),
      checkpointDir, "ivfadc-resid")
    val cb = pqSample(resid, "neighbor_key", "__rv", pqCentroids)
    val cbTab = collectCentroidTable(cb, "j", "cent_vec")
    val codes = pqEncodeWith(resid, "neighbor_key", "__rv", cb, numSubspaces,
        preTab = cbTab)
      .select(col("neighbor_key"), col("codes"))
    // query residuals per PROBED cell; tables keyed (query, cell)
    val qresid = queries
      .select(col(queryKey).alias("query_key"), col(queryVec).alias("__qv"))
      .join(probes, "query_key")
      .join(broadcast(centById), "cent_id")
      .withColumn("__rv", zip_with(col("__qv"), col("__cv"),
        (a, b) => a.cast("double") - b.cast("double")))
      .withColumn("__qc", struct(col("query_key"), col("cent_id")))
      .select(col("__qc"), col("__rv"))
    val qtab = pqQueryTables(qresid, "__qc", "__rv", cb, numSubspaces,
        preTab = cbTab)
      .select(col("query_key.query_key").alias("query_key"),
        col("query_key.cent_id").alias("cent_id"), col("tab"))

    val scored = corpusCell.join(broadcast(probes), "cent_id")
      .filter(!(col("query_key") <=> col("neighbor_key")))
      .join(codes, "neighbor_key")
      .join(broadcast(qtab), Seq("query_key", "cent_id"))
      .withColumn("adist", pqAdist(col("tab"), col("codes")))
    val w = Window.partitionBy(col("query_key"))
      .orderBy(col("adist"), col("neighbor_key"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_key", "neighbor_key", "rank")
  }

  /** [[ivfAdcTopK]] with an exact-vector re-rank — the full production
    * retrieval stack (IVFADC shortlist over residual byte codes, true
    * cosine over just the shortlisted vectors). Same broadcast shapes as
    * [[ivfPqTopKRerank]]: the shortlist and the queries broadcast, the
    * corpus is never shuffled for the re-rank.
    *
    * @return (query_key, neighbor_key, rank) — rank 1..k by DESCENDING
    *         exact cosine within the shortlist, ties to the smaller key
    */
  def ivfAdcTopKRerank(
      corpus: DataFrame,
      corpusKey: String,
      corpusVec: String,
      queries: DataFrame,
      queryKey: String,
      queryVec: String,
      k: Int,
      kShortlist: Int = 32,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      numSubspaces: Int = 8,
      pqCentroids: Int = 16,
      coarseCentroids: Option[DataFrame] = None,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    require(kShortlist >= k,
      s"kShortlist ($kShortlist) must be >= k ($k): the re-rank can only " +
        "reorder the shortlist, not grow it")
    val shortlist = ivfAdcTopK(corpus, corpusKey, corpusVec,
        queries, queryKey, queryVec, kShortlist,
        nCentroids, nProbe, numSubspaces, pqCentroids, coarseCentroids,
        checkpointDir)
      .select(col("query_key"), col("neighbor_key"))
    val scored = corpus
      .select(col(corpusKey).alias("neighbor_key"), col(corpusVec).alias("__nv"))
      .join(broadcast(shortlist), "neighbor_key")
      .join(broadcast(queries.select(
        col(queryKey).alias("query_key"), col(queryVec).alias("__qv"))),
        "query_key")
      .withColumn("sim", cosine(col("__qv"), col("__nv")))
    val w = Window.partitionBy(col("query_key"))
      .orderBy(col("sim").desc, col("neighbor_key"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_key", "neighbor_key", "rank")
  }

  /** [[pqEncode]] against an existing codebook (shared by encode + query
    * so both sides quantize identically). With an embeddable codebook
    * ([[collectCentroidTable]]) the encode is ONE per-row kernel call —
    * no crossJoin, no subspace explode, no aggregation exchanges; the
    * dataflow form below remains for big/irregular codebooks and as the
    * spec-pinned reference.
    */
  private[graft] def pqEncodeWith(corpus: DataFrame, keyCol: String, vecCol: String,
      cb: DataFrame, numSubspaces: Int,
      preTab: Option[(Int, IndexedSeq[IndexedSeq[Double]])] = None): DataFrame =
    preTab.orElse(collectCentroidTable(cb, "j", "cent_vec"))
      .filter(_._1 == 0) match {
      case Some((_, tab)) =>
        corpus.select(col(keyCol),
          pqCodesNative(col(vecCol), tab, numSubspaces).alias("codes"))
      case None => pqEncodeWithDataflow(corpus, keyCol, vecCol, cb, numSubspaces)
    }

  /** Dataflow (crossJoin + explode + two aggregations) form of
    * [[pqEncodeWith]] — the big-codebook path and spec reference.
    */
  private[graft] def pqEncodeWithDataflow(corpus: DataFrame, keyCol: String,
      vecCol: String, cb: DataFrame, numSubspaces: Int): DataFrame =
    pqSubDists(corpus.select(col(keyCol), col(vecCol)), keyCol, vecCol,
        cb, numSubspaces)
      .groupBy(col(keyCol), col("m"))
      .agg(min_by(col("j"), struct(col("dd"), col("j"))).alias("code"))
      .groupBy(col(keyCol))
      .agg(transform(sort_array(collect_list(struct(col("m"), col("code")))),
        s => s.getField("code")).alias("codes"))
}
