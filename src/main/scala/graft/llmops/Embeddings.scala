package graft.llmops

import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row}

import scala.util.control.NonFatal

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
    * This operator is the engine's one sanctioned `RDD.mapPartitions` use:
    * an external-I/O call has no codegen'd form, and per-partition client
    * reuse + batch amortization is exactly what the RDD shape buys. Keep
    * pure functions out of here — they belong in native expressions.
    *
    * At 100 TB scale the knobs that matter: partition count bounds client
    * concurrency (one in-flight batch per task), `batchSize` bounds request
    * payloads, and the output column is the only thing added — no row
    * reshuffle, partitioning is preserved.
    *
    * Lazy-eval warning: like any Spark plan, a consumer that passes over
    * the data twice re-invokes the client — `orderBy` alone does (range
    * partitioning samples first). Persist (or write) the result before
    * multi-pass consumption; endpoint calls are the one operator where
    * recomputation costs real money.
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
  ): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    require(maxRetries >= 1, "maxRetries must be >= 1")
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false), nullable = true))
    val tIdx = df.schema.fieldIndex(textCol)

    val rdd = df.rdd.mapPartitions { rows =>
      new Iterator[Row] {
        private val pending = new scala.collection.mutable.Queue[Row]()

        override def hasNext: Boolean = pending.nonEmpty || rows.hasNext

        override def next(): Row = {
          if (pending.isEmpty) fillBatch()
          pending.dequeue()
        }

        private def fillBatch(): Unit = {
          val batch = new scala.collection.mutable.ArrayBuffer[Row](batchSize)
          while (batch.size < batchSize && rows.hasNext) batch += rows.next()
          // NULL texts embed as NULL without a client call
          val texts = batch.collect {
            case r if !r.isNullAt(tIdx) => r.getString(tIdx)
          }.toSeq
          val vectors: Map[String, Array[Float]] =
            if (texts.isEmpty) Map.empty
            else embedWithRetry(texts) match {
              case Some(vs) => texts.zip(vs).toMap
              case None => Map.empty // NullVectors policy: dead batch
            }
          batch.foreach { r =>
            val vec =
              if (r.isNullAt(tIdx)) null
              else vectors.get(r.getString(tIdx)).map(_.toSeq).orNull
            pending.enqueue(Row.fromSeq(r.toSeq :+ vec))
          }
        }

        private def embedWithRetry(texts: Seq[String]): Option[Seq[Array[Float]]] = {
          var attempt = 0
          while (true) {
            try {
              val vs = client.embedBatch(texts)
              require(vs.length == texts.length,
                s"client returned ${vs.length} vectors for ${texts.length} texts")
              return Some(vs)
            } catch {
              case NonFatal(e) =>
                attempt += 1
                if (attempt >= maxRetries) onFailure match {
                  case FailTask => throw e
                  case NullVectors => return None
                }
                Thread.sleep(backoffMs << (attempt - 1))
            }
          }
          None // unreachable
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

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
