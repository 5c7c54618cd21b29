package graft.llmops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** One learned BPE merge: at `rank`, the adjacent token pair
  * (`left`, `right`) — both uppercase-hex byte strings — fused into the
  * token `left + right`, chosen because it was the most frequent pair
  * (`freq` position-wise occurrences, weighted by word frequency) in the
  * tokenization induced by the merges of all lower ranks.
  */
final case class BpeMerge(rank: Int, left: String, right: String, freq: Long)

/** Byte-level byte-pair-encoding tokenizer (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units", and the
  * byte-level variant of GPT-2's tokenizer): the base vocabulary is the
  * 256 bytes, and training greedily fuses the most frequent adjacent
  * token pair, `numMerges` times. Token counts — not characters, not
  * whitespace words — are what a training pipeline budgets by, so this
  * is the unit behind [[TrainExport.packSequences]]'s token mode and
  * mixture sampling budgets.
  *
  * Scale shape (the part that must survive 100 TB):
  *
  *  - Pre-tokenization splits text into words on the fixed separator set
  *    `{space, \t, \r, \n}`; merges never cross word boundaries (the
  *    standard BPE contract). Training therefore needs only the WORD
  *    FREQUENCY table — one `groupBy(word).count` corpus scan with
  *    map-side partial aggregation — never the corpus itself.
  *  - The word-type table is bounded by `trainLimit` (top types by
  *    `(count desc, word)` — deterministic at the cutoff) and collected
  *    to the driver: the same bounded model-artifact pattern as
  *    [[Similarity.pqTrain]]'s codebooks and
  *    [[graft.expressions.CharTrigramLmModel]]. The merge loop is
  *    driver-side over ≤ `trainLimit` short token arrays — O(types ·
  *    merges), no Spark iteration, no per-round shuffle.
  *  - Encoding ships the merge table in the task binary inside the native
  *    [[graft.expressions.BpeEncode]] kernel — a per-row scan projection,
  *    zero shuffles, codegen-friendly.
  *
  * Determinism contract (the q108/q109 oracle relies on it):
  *
  *  - tokens are identified by their uppercase-hex UTF-8 byte strings;
  *  - pair ties break on `(freq desc, left asc, right asc)` in hex-string
  *    order — which equals unsigned byte-lexicographic order, the same
  *    comparison an external SQL engine applies;
  *  - pair occurrences count position-wise ("aaa" holds two (a,a) pairs);
  *  - a chosen merge is applied to every word type as one left-to-right
  *    non-overlapping pass ("aaa" becomes (aa)a), and encoding applies
  *    the merges in rank order with the same pass — exactly the
  *    single-pass `replace` semantics of any SQL engine, so the whole
  *    tokenizer (training included) is replayable as chained SQL.
  *
  * Reference ambition: `aje_libs/documents/helpers/document_processor.py:76-83`
  * chunks by a token-count proxy; this makes the count exact.
  */
object Bpe {

  /** The pre-tokenization separator class, shared verbatim with the SQL
    * replication (`regexp_split_to_array(text, '[ \t\r\n]+')`). A fixed
    * ASCII set — NOT `\s` — because Java and RE2 disagree on `\v`.
    */
  val WordSeparators: String = " \t\r\n"

  def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'

  /** Uppercase-hex byte tokens of one word (UTF-8 bytes). */
  def byteTokens(word: String): Array[String] = {
    val b = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](b.length)
    var i = 0
    while (i < b.length) {
      out(i) = f"${b(i) & 0xFF}%02X"
      i += 1
    }
    out
  }

  /** One left-to-right non-overlapping merge pass over a token array —
    * the apply half of the training loop and of
    * [[graft.expressions.BpeEncode]]; single-pass `replace` semantics.
    * Returns the same array instance when nothing merged (cheap identity
    * check for callers).
    */
  def applyMerge(toks: Array[String], left: String,
      right: String): Array[String] = {
    var i = 0
    var hits = 0
    while (i < toks.length - 1) {
      if (toks(i) == left && toks(i + 1) == right) { hits += 1; i += 2 }
      else i += 1
    }
    if (hits == 0) return toks
    val out = new Array[String](toks.length - hits)
    var o = 0
    i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == left && toks(i + 1) == right) {
        out(o) = left + right; o += 1; i += 2
      } else { out(o) = toks(i); o += 1; i += 1 }
    }
    out
  }

  /** Train `numMerges` merges on the corpus' word-frequency table.
    *
    * @param trainLimit bound on the collected word-type table (top types
    *                   by `(count desc, word)`); the model artifact stays
    *                   driver-sized no matter the corpus
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      trainLimit: Int = 65536): Seq[BpeMerge] = {
    require(numMerges >= 0, "numMerges must be non-negative")
    require(trainLimit > 0, "trainLimit must be positive")
    val wordRows = df
      .select(explode(split(col(textCol), "[ \t\r\n]+")).alias("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).alias("wc"))
      .orderBy(col("wc").desc, col("w"))
      .limit(trainLimit)
      .collect()
    var types: Array[(Array[String], Long)] =
      wordRows.map(r => (byteTokens(r.getString(0)), r.getLong(1)))
    val merges = Seq.newBuilder[BpeMerge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // position-wise pair counts over the current tokenization
      val counts = new java.util.HashMap[String, Long]()
      types.foreach { case (toks, wc) =>
        var i = 0
        while (i < toks.length - 1) {
          // '!' (0x21) is outside the hex alphabet AND sorts below every
          // hex digit, so composite-key string order == (left, right)
          // lexicographic pair order even when one left is a prefix of
          // another ('|' would sort ABOVE 'F' and invert those ties)
          val k = toks(i) + "!" + toks(i + 1)
          counts.merge(k, wc, java.lang.Long.sum _)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestKey: String = null
        var bestCnt = 0L
        counts.forEach { (k, c) =>
          if (c > bestCnt || (c == bestCnt && k.compareTo(bestKey) < 0)) {
            bestKey = k; bestCnt = c
          }
        }
        val sep = bestKey.indexOf('!')
        val left = bestKey.substring(0, sep)
        val right = bestKey.substring(sep + 1)
        merges += BpeMerge(rank, left, right, bestCnt)
        types = types.map { case (toks, wc) => (applyMerge(toks, left, right), wc) }
        rank += 1
      }
    }
    merges.result()
  }

  /** Token-budget document chunking — the context-window step of a
    * training/RAG export: encode with a BPE model, then split the token
    * stream into chunks of `chunkTokens` with `overlapTokens` carried
    * between neighbors (stride = chunk − overlap), so every token is in
    * at least one chunk and boundary context is never lost. Chunk 0
    * always exists for a non-empty document; the last chunk may be
    * short. Pure expression work after the encode — the token arrays
    * explode into (key, chunk) rows without a shuffle.
    *
    * @return (keyCol, chunk_idx, n_tokens, chunk_toks) with `chunk_toks`
    *         the '|'-joined hex tokens of the chunk
    */
  def chunkByTokens(df: DataFrame, keyCol: String, textCol: String,
      merges: Seq[BpeMerge], chunkTokens: Int,
      overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlapTokens
    df.select(col(keyCol), encode(col(textCol), merges).alias("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      // truncating div matches floor for the non-negative case and the
      // greatest() clamp absorbs the n <= overlap case on both engines
      .withColumn("__last", expr(
        s"greatest(0, (__n - $overlapTokens - 1) div $stride)"))
      .select(col(keyCol), col("__toks"),
        explode(sequence(lit(0), col("__last"))).alias("chunk_idx"))
      .withColumn("__chunk",
        slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)))
      .select(col(keyCol), col("chunk_idx"),
        size(col("__chunk")).cast("long").alias("n_tokens"),
        concat_ws("|", col("__chunk")).alias("chunk_toks"))
  }

  /** Persist a trained merge table as a parquet artifact — the tokenizer
    * twin of the dedup signature stores: train once, reuse across jobs
    * and ingestion restarts without touching the corpus again. The
    * artifact is merge-count sized (driver-bounded by construction); the
    * RANK ORDER is the model, so [[loadModel]] re-sorts and refuses a
    * table whose ranks are not dense from 0.
    */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[BpeMerge], path: String): Unit = {
    spark.createDataFrame(merges)
      .select(col("rank"), col("left"), col("right"), col("freq"))
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a merge table persisted by [[saveModel]], in rank order. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[BpeMerge] = {
    val merges = spark.read.parquet(path)
      .select(col("rank"), col("left"), col("right"), col("freq"))
      .collect()
      .map(r => BpeMerge(r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
      .sortBy(_.rank)
      .toSeq
    merges.zipWithIndex.foreach { case (m, i) =>
      require(m.rank == i,
        s"BPE model at $path is not a dense rank sequence (saw ${m.rank} at $i)")
    }
    merges
  }

  /** Encode column: uppercase-hex token array per row (empty for
    * whitespace-only text, NULL for NULL).
    */
  def encode(text: Column, merges: Seq[BpeMerge]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.BpeEncode(
        org.apache.spark.sql.graft.ColumnBridge.expression(text),
        new graft.expressions.BpeModel(
          merges.map(m => (m.left, m.right)).toArray)))

  /** Exact token count per row — the column [[TrainExport.packSequences]]
    * and [[Sampling]] budget by in tokens mode.
    */
  def tokenCount(text: Column, merges: Seq[BpeMerge]): Column =
    // NULL text counts NULL — ANSI-off legacy size(NULL) = -1 would
    // silently shrink every pack/budget sum it enters
    when(text.isNull, lit(null).cast("long"))
      .otherwise(size(encode(text, merges)).cast("long"))
}
