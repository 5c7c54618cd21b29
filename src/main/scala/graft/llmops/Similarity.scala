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
    // distinct plane sets per table: offset the plane index by table*numPlanes
    def bucketed(df: DataFrame, keyAs: String, vecCol: String, vecAs: String) = {
      val tableStructs = (0 until numTables).map { t =>
        val vec = col(vecAs)
        val bucket = (0 until numPlanes).map { p =>
          val proj = aggregate(
            zip_with(vec, sequence(lit(0), size(vec) - 1),
              (x, d) => x.cast("double") * planeSign(t * numPlanes + p, d)),
            lit(0.0), (acc, v) => acc + v)
          when(proj > 0, lit(1L << p)).otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b))
        struct(lit(t).alias("table"), bucket.alias("bucket"))
      }
      df.select(col(keyAs), col(vecCol).alias(vecAs))
        .withColumn("bt", explode(array(tableStructs: _*)))
        .select(col(keyAs), col(vecAs), col("bt.table"), col("bt.bucket"))
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
