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

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

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
      k: Int
  ): DataFrame = {
    val q = broadcast(queries.select(
      col(queryKey).alias("query_key"), col(queryVec).alias("qv")))
    val c = corpus.select(col(corpusKey).alias("neighbor_key"), col(corpusVec).alias("cv"))
    val scored = c.join(q, col("query_key") =!= col("neighbor_key"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_key"))
      .orderBy(col("cosine").desc, col("neighbor_key"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_key", "neighbor_key", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * a fixed hash mapped to ±1. Stateless — both sides of any join compute
    * identical planes with no fitted model to ship.
    */
  private def planeSign(p: Int, d: Column): Column =
    when(pmod(xxhash64(lit(p), d), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

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
  def ivfTopK(
      corpus: DataFrame,
      corpusKey: String,
      corpusVec: String,
      queries: DataFrame,
      queryKey: String,
      queryVec: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    val cents = broadcast(
      corpus
        .withColumn("__r", pmod(xxhash64(col(corpusKey)), lit(1000000L)))
        .orderBy(col("__r"), col(corpusKey))
        .limit(nCentroids)
        .select(monotonically_increasing_id().alias("cent_id"),
          col(corpusVec).alias("cent_vec")))

    def assign(df: DataFrame, keyAs: String, vecCol: String, vecAs: String, keep: Int) = {
      val scored = df.select(col(keyAs), col(vecCol).alias(vecAs))
        .join(cents, expr("true"))
        .withColumn("cent_dist", -cosine(col(vecAs), col("cent_vec")))
      val w = Window.partitionBy(col(keyAs)).orderBy(col("cent_dist"), col("cent_id"))
      scored.withColumn("__cr", row_number().over(w))
        .filter(col("__cr") <= keep)
        .select(col(keyAs), col(vecAs), col("cent_id"))
    }

    val corpusAssigned = assign(
      corpus.withColumnRenamed(corpusKey, "neighbor_key"), "neighbor_key", corpusVec, "cv", 1)
    val queryAssigned = assign(
      queries.withColumnRenamed(queryKey, "query_key"), "query_key", queryVec, "qv", nProbe)

    val cand = corpusAssigned.join(queryAssigned, Seq("cent_id"))
      .filter(col("query_key") =!= col("neighbor_key"))
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
  def embeddingNearDups(
      corpus: DataFrame,
      keyCol: String,
      vecCol: String,
      minCosine: Double = 0.95,
      numPlanes: Int = 12,
      numTables: Int = 4
  ): DataFrame = {
    val bucketed = lshTopK(
      corpus, keyCol, vecCol,
      corpus.select(col(keyCol), col(vecCol)), keyCol, vecCol,
      k = Int.MaxValue, numPlanes = numPlanes, numTables = numTables)
    bucketed
      .filter(col("cosine") >= minCosine && col("query_key") < col("neighbor_key"))
      .select(col("query_key").alias("key_a"),
        col("neighbor_key").alias("key_b"), col("cosine"))
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
      numTables: Int = 4
  ): DataFrame = {
    // Buckets via explode + codegen'd conditional sums (the zip_with/
    // aggregate HOF form runs interpreted — too slow for a corpus scan):
    // one (key, dim, x) explode, then numTables×numPlanes projection sums
    // with map-side partial aggregation. Distinct plane sets per table via
    // the plane-index offset t*numPlanes.
    def bucketed(df: DataFrame, keyAs: String, vecCol: String, vecAs: String) = {
      val projSums = (0 until numTables).flatMap { tb =>
        (0 until numPlanes).map { p =>
          sum(col("x").cast("double") * planeSign(tb * numPlanes + p, col("d")))
            .alias(s"proj_${tb}_$p")
        }
      }
      val withProj = df
        .select(col(keyAs), posexplode(col(vecCol)).as(Seq("d", "x")))
        .groupBy(col(keyAs))
        .agg(projSums.head, projSums.tail: _*)
      val tableStructs = (0 until numTables).map { tb =>
        val bucket = (0 until numPlanes).map { p =>
          when(col(s"proj_${tb}_$p") > 0, lit(1L << p)).otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b))
        struct(lit(tb).alias("table"), bucket.alias("bucket"))
      }
      val buckets = withProj
        .select(col(keyAs), explode(array(tableStructs: _*)).alias("bt"))
        .select(col(keyAs), col("bt.table"), col("bt.bucket"))
      // vectors re-joined only where needed (narrow bucket rows shuffle)
      buckets.join(df.select(col(keyAs), col(vecCol).alias(vecAs)), keyAs)
    }

    val c = bucketed(corpus.withColumnRenamed(corpusKey, "neighbor_key"), "neighbor_key", corpusVec, "cv")
    val q = bucketed(queries.withColumnRenamed(queryKey, "query_key"), "query_key", queryVec, "qv")
    val cA = c.select(col("neighbor_key"), col("cv"),
      col("table").alias("c_t"), col("bucket").alias("c_b"))
    val qA = q.select(col("query_key"), col("qv"),
      col("table").alias("q_t"), col("bucket").alias("q_b"))
    val cand = cA.join(qA,
        col("c_t") === col("q_t") && col("c_b") === col("q_b") &&
          col("query_key") =!= col("neighbor_key"))
      .dropDuplicates("query_key", "neighbor_key")
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_key"))
      .orderBy(col("cosine").desc, col("neighbor_key"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_key", "neighbor_key", "cosine", "rank")
  }
}
