package graft.llmops

import org.apache.spark.sql.types.{ArrayType, FloatType, StructField}
import org.apache.spark.sql.DataFrame

/** Pluggable batched client producing one embedding per input text —
  * the operator-side contract for the reference's embedding calls
  * (utils/extract_data_v2/aje_libs/common/helpers/bedrock_helper.py:128-170:
  * per-text `invoke_model` against a remote endpoint, raising on client
  * errors). Implementations wrap whatever endpoint the deployment uses;
  * the engine only needs the batch call.
  *
  * Must be Serializable: one instance is shipped to executors and reused
  * for every batch in a partition (connection amortization is the point
  * of the batching shape).
  */
trait EmbeddingClient extends Serializable {
  /** One vector per input, same order. May throw on transient endpoint
    * failure — the operator retries with backoff.
    */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

object Embeddings {

  /** What to do with a batch that still fails after `maxRetries`:
    * FailTask rethrows (the Spark task fails and is rescheduled — the
    * reference's posture: `raise error`); NullVectors emits NULL for every
    * row of the dead batch and keeps the partition going (curation
    * pipelines usually prefer a hole over a dead job).
    */
  sealed trait FailurePolicy
  case object FailTask extends FailurePolicy
  case object NullVectors extends FailurePolicy

  /** Appends `outCol` (array&lt;float&gt;) by calling `client.embedBatch` over
    * batches of `batchSize` texts per partition. NULL text rows never reach
    * the client and embed as NULL.
    *
    * Retries per batch: `maxRetries` attempts with exponential backoff
    * (`backoffMs * 2^attempt`, executor-side sleep) — transient endpoint
    * throttling is the common case (the reference wraps the same calls in
    * client-error handling and its extract jobs retry per object).
    *
    * Batching/retry/scale/lazy-eval contract: [[ClientBatch.appendBatched]]
    * (shared with [[LlmScore.generateColumn]]).
    */
  def embedColumn(
      df: DataFrame,
      textCol: String,
      client: EmbeddingClient,
      outCol: String = "embedding",
      batchSize: Int = 32,
      maxRetries: Int = 3,
      backoffMs: Long = 100L,
      onFailure: FailurePolicy = FailTask
  ): DataFrame =
    ClientBatch.appendBatched(
      df, textCol,
      Seq(StructField(outCol,
        ArrayType(FloatType, containsNull = false), nullable = true)),
      texts => client.embedBatch(texts).map(v => Seq(v.toSeq)),
      batchSize, maxRetries, backoffMs,
      deadBatchNulls = onFailure == NullVectors)

  /** Embed-then-upsert: the input side of [[VectorStore.upsert]] — text
    * rows go in, (key, embedding, …) land in the store.
    */
  def embedInto(
      store: VectorStore,
      df: DataFrame,
      keyCol: String,
      textCol: String,
      client: EmbeddingClient,
      batchSize: Int = 32,
      maxRetries: Int = 3,
      backoffMs: Long = 100L,
      onFailure: FailurePolicy = FailTask
  ): Unit = {
    val embedded = embedColumn(df, textCol, client, "embedding",
      batchSize, maxRetries, backoffMs, onFailure)
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
    store.upsert(embedded, keyCol)
  }
}
