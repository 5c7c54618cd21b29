package graft.llmops

import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row}

import scala.util.control.NonFatal

/** Shared core of the batched-external-client operators
  * ([[Embeddings.embedColumn]], [[LlmScore.generateColumn]]): append
  * columns produced by a remote endpoint, called in batches of
  * `batchSize` per partition with per-batch retry/backoff.
  *
  * This is the engine's one sanctioned `RDD.mapPartitions` shape: an
  * external-I/O call has no codegen'd form, and per-partition client
  * reuse + batch amortization is exactly what the RDD form buys. Keep
  * pure functions out of here — they belong in native expressions.
  *
  * At 100 TB scale the knobs that matter: partition count bounds client
  * concurrency (one in-flight batch per task), `batchSize` bounds request
  * payloads, and output columns are the only thing added — no row
  * reshuffle, partitioning is preserved.
  */
private[llmops] object ClientBatch {

  /** Append `extra` columns to `df`. `call` receives the batch's non-null
    * `inCol` strings and must return one aligned value-seq per input
    * (`extra.length` values each). NULL inputs never reach the client and
    * produce all-NULL extras. After `maxRetries` failed attempts on a
    * batch (exponential backoff `backoffMs * 2^attempt`):
    * `deadBatchNulls=true` emits NULL extras for the whole batch and
    * keeps the partition going; `false` rethrows (task fails and
    * reschedules — the reference's `raise error` posture).
    *
    * Lazy-eval warning: like any Spark plan, a consumer that passes over
    * the data twice re-invokes the client — `orderBy` alone does (range
    * partitioning samples first). Persist (or write) the result before
    * multi-pass consumption; endpoint calls are the one operator where
    * recomputation costs real money.
    */
  def appendBatched(
      df: DataFrame,
      inCol: String,
      extra: Seq[StructField],
      call: Seq[String] => Seq[Seq[Any]],
      batchSize: Int,
      maxRetries: Int,
      backoffMs: Long,
      deadBatchNulls: Boolean
  ): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    require(maxRetries >= 1, "maxRetries must be >= 1")
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields ++ extra)
    val idx = df.schema.fieldIndex(inCol)
    val nExtra = extra.length
    val nulls: Seq[Any] = Seq.fill(nExtra)(null)

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
          val inputs = batch.collect {
            case r if !r.isNullAt(idx) => r.getString(idx)
          }.toSeq
          // None = dead batch under deadBatchNulls
          val outs: Option[Iterator[Seq[Any]]] =
            if (inputs.isEmpty) Some(Iterator.empty)
            else callWithRetry(inputs).map(_.iterator)
          batch.foreach { r =>
            val extras =
              if (r.isNullAt(idx)) nulls
              else outs match {
                case Some(it) => it.next()
                case None => nulls
              }
            pending.enqueue(Row.fromSeq(r.toSeq ++ extras))
          }
        }

        private def callWithRetry(inputs: Seq[String]): Option[Seq[Seq[Any]]] = {
          var attempt = 0
          while (true) {
            try {
              val out = call(inputs)
              require(out.length == inputs.length,
                s"client returned ${out.length} results for ${inputs.length} inputs")
              return Some(out)
            } catch {
              // a result-count mismatch is a deterministic CONTRACT
              // violation (e.g. an endpoint that drops empty inputs) —
              // retrying burns paid calls on the same answer, and
              // deadBatchNulls would silently convert the bug into
              // corpus-wide NULLs; surface it immediately
              case e: IllegalArgumentException => throw e
              case NonFatal(e) =>
                attempt += 1
                if (attempt >= maxRetries) {
                  if (deadBatchNulls) return None else throw e
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
}
