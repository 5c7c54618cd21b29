package graft.llmops

import graft.operators.MergeUpsert
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Self-contained vector store: the reference's Pinecone upsert/query
  * surface (aje_libs/bd/helpers/pinecone_helper.py:59-316 — K9 vector
  * upsert with metadata, top-k cosine query with optional metadata filter)
  * re-expressed over a parquet table + the engine's own similarity
  * operators, so the capability needs no external service.
  *
  * Embedding generation itself (bedrock_helper.py:128-170) is an external
  * model call: [[Embeddings.embedColumn]] is the real batched-client
  * operator (pluggable [[EmbeddingClient]], retry/backoff, failure
  * policy) and [[Embeddings.embedInto]] wires it to [[VectorStore.upsert]];
  * [[VectorStore.embedStub]] remains the zero-dependency deterministic
  * stand-in for environments with no endpoint at all.
  */
final class VectorStore(spark: SparkSession, path: String) {

  /** Upsert (id, embedding, metadata…) rows by id — Delta-MERGE semantics
    * (pinecone upsert overwrites on id collision, inserts otherwise).
    */
  def upsert(vectors: DataFrame, idCol: String = "vec_id"): Unit =
    MergeUpsert.upsertParquet(spark, vectors, path, Seq(idCol))

  def table(): DataFrame = spark.read.parquet(path)

  /** Top-k cosine query against the store; `filter` mirrors pinecone's
    * metadata filter and is pushed into the scan before any math.
    *
    * `includeSelf = true` is the literal Pinecone contract (querying a
    * stored vector by its own id returns it at rank 1, cosine 1.0); the
    * default keeps the engine's historical near-dup posture (self-ids
    * excluded), which downstream dedup compositions rely on.
    */
  def query(
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      filter: Option[org.apache.spark.sql.Column] = None,
      approximate: Boolean = false,
      includeSelf: Boolean = false
  ): DataFrame = {
    val corpus = filter.map(table().filter).getOrElse(table())
    if (approximate)
      Similarity.lshTopK(corpus, idCol, vecCol, queries, idCol, vecCol, k,
        excludeSelf = !includeSelf)
    else
      Similarity.bruteForceTopK(corpus, idCol, vecCol, queries, idCol, vecCol,
        k, excludeSelf = !includeSelf)
  }
}

object VectorStore {

  /** Batched embedding shape: one "client" per partition, rows processed in
    * batches — exactly how a real model endpoint would be called from
    * executors. STUB: the vector is a deterministic hash-derived
    * pseudo-embedding (no model in this environment).
    */
  def embedStub(df: DataFrame, textCol: String, dim: Int = 64): DataFrame =
    df.withColumn("embedding",
      array((0 until dim).map(i =>
        (pmod(xxhash64(col(textCol), lit(i)), lit(2000L)).cast("double") / 1000.0 - 1.0)
          .cast("float")): _*))
}
