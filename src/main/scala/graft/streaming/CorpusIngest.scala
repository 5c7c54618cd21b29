package graft.streaming

import graft.llmops.DedupOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Continuous corpus ingestion with near-duplicate control — the
  * streaming composition of [[DedupOps.minhashDedupAgainstCorpus]]:
  * every micro-batch is near-dup-screened within itself and against the
  * corpus accumulated so far, and only the survivors are appended.
  *
  * This is the production shape for keeping a growing training corpus
  * near-dup-free without ever reprocessing it: per batch, the corpus
  * contributes only narrow MinHash band rows (on a real deployment,
  * maintained as a signature store alongside the corpus — exactly the
  * table this recomputes from text; persisting it is an IO optimization,
  * not a protocol change), candidates join on band keys, and corpus text
  * is touched only for verification candidates. State lives entirely in
  * the corpus table — no Spark state store, so restarting the query is
  * safe and the checkpoint only tracks source offsets.
  */
object CorpusIngest {

  /** One micro-batch: drop within-batch near-dups (keep the lowest key of
    * each candidate pair — for chains this keeps the first element, the
    * standard greedy pass; cluster-exact keep-one is
    * [[DedupOps.dedupByClusters]], overkill per micro-batch), then drop
    * near-dups of the existing corpus, then append survivors.
    *
    * @return number of rows appended
    */
  def ingestBatch(
      spark: SparkSession,
      batch: DataFrame,
      corpusPath: String,
      textCol: String,
      keyCol: String,
      wordShingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.6
  ): Long = {
    // within-batch: every doc named as the greater key of a verified
    // near-dup pair is dropped
    val pairs = DedupOps.minhashNearDups(batch, textCol, keyCol,
      numHashes = numHashes, bands = bands, threshold = threshold,
      wordShingleN = Some(wordShingleN))
    val laterDups = pairs.select(col("key_b").alias("__dup")).distinct()
    val batchUnique = batch.join(laterDups,
      col(keyCol) === col("__dup"), "left_anti")

    val fs = new org.apache.hadoop.fs.Path(corpusPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val survivors =
      if (!fs.exists(new org.apache.hadoop.fs.Path(corpusPath))) batchUnique
      else DedupOps.minhashDedupAgainstCorpus(
        batchUnique, textCol, keyCol,
        spark.read.parquet(corpusPath).select(
          col(keyCol).alias("__corpus_key"), col(textCol).alias("__corpus_text")),
        "__corpus_key", "__corpus_text",
        wordShingleN, numHashes, bands, threshold)

    // materialize before the append: the survivor plan reads the corpus
    // dir this write appends to — pinning rows in the block cache keeps
    // the write action from re-scanning a directory it is growing
    val pinned = survivors
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = pinned.count()
      if (n > 0)
        pinned.write.mode(SaveMode.Append).parquet(corpusPath)
      n
    } finally {
      pinned.unpersist()
      ()
    }
  }

  /** Structured-Streaming wrapper: [[ingestBatch]] per micro-batch via
    * foreachBatch, the same Delta-style pattern as
    * [[IncrementalRunner.runStream]].
    */
  def ingestStream(
      spark: SparkSession,
      stream: DataFrame,
      corpusPath: String,
      textCol: String,
      keyCol: String,
      checkpointDir: String,
      wordShingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.6,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(spark, batch, corpusPath, textCol, keyCol,
          wordShingleN, numHashes, bands, threshold)
        ()
      }
      .start()
}
