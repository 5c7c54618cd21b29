package graft

import graft.config.ColumnMetadata
import graft.llmops.{DedupOps, TextAnalysis}
import graft.operators.{Dedup, MergeUpsert}
import graft.stage.TransformationEngine
import org.apache.spark.sql.DataFrame

/** Fluent façade over the engine's operators:
  *
  * {{{
  * import graft.syntax._
  * raw.applyTransforms(columns)
  *    .keepLatest(Seq("id"), Seq("updated_at"))
  *    .mergeInto(existing, Seq("id"))
  * docs.dedupExact("text", "doc_id")
  * }}}
  */
package object syntax {

  implicit final class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    /** W1 keep-latest dedup on id/order columns. */
    def keepLatest(idCols: Seq[String], orderCols: Seq[String]): DataFrame =
      Dedup.keepLatest(df, idCols, orderCols)

    /** Apply the fn_transform_* DSL for the given column metadata
      * (error-contained; failures become typed NULLs).
      */
    def applyTransforms(columns: Seq[ColumnMetadata]): DataFrame =
      TransformationEngine.applyTransformations(df, columns).df

    /** K5 Delta-MERGE-semantics upsert: this frame wins over `existing`. */
    def mergeInto(existing: DataFrame, idCols: Seq[String]): DataFrame =
      MergeUpsert.merge(existing, df, idCols)

    /** Exact text dedup on the normalized fingerprint. */
    def dedupExact(textCol: String, keyCol: String): DataFrame =
      DedupOps.exactDedup(df, textCol, keyCol)

    /** MinHash+LSH fuzzy near-dup pairs. */
    def nearDupsMinhash(textCol: String, keyCol: String,
        threshold: Double = 0.6): DataFrame =
      DedupOps.minhashNearDups(df, textCol, keyCol, threshold = threshold,
        wordShingleN = Some(3), numHashes = 16, bands = 4)

    /** Winnowing (MOSS) near-dup pairs. */
    def nearDupsWinnow(textCol: String, keyCol: String,
        minSharedFrac: Double = 0.5): DataFrame =
      DedupOps.winnowNearDups(df, textCol, keyCol, minSharedFrac = minSharedFrac)

    /** Text-quality feature columns (token/char/stopword/punct stats). */
    def withTextQuality(textCol: String): DataFrame =
      TextAnalysis.qualityFeatures(df, textCol)

    /** Language-ID per row key (codegen'd corpus scan). */
    def withLangId(keyCol: String, textCol: String): DataFrame =
      df.join(TextAnalysis.langIdByKey(df, keyCol, textCol), keyCol)

    /** Collapse transitive near-dup pairs to one survivor per cluster
      * (the minimum key); rows absent from `pairs` survive untouched.
      */
    def dedupByClusters(keyCol: String, pairs: DataFrame): DataFrame =
      DedupOps.dedupByClusters(df, keyCol, pairs)

    /** Deterministic engine-portable hash sample (same rows every run and
      * every engine; fractions nest).
      */
    def hashSample(keyCol: String, fraction: Double): DataFrame =
      graft.llmops.Sampling.hashSample(df, keyCol, fraction)

    /** Scrub emails/IPs/phones to typed tokens (RE2-portable patterns). */
    def scrubPii(textCol: String): DataFrame =
      df.withColumn(textCol,
        TextAnalysis.scrubPii(org.apache.spark.sql.functions.col(textCol)))

    /** Unicode-normalize a text column in place (NFC default) — run before
      * any hash-keyed dedup so encodings don't split duplicate clusters.
      */
    def unicodeNorm(textCol: String, form: String = "NFC"): DataFrame =
      df.withColumn(textCol,
        TextAnalysis.unicodeNorm(org.apache.spark.sql.functions.col(textCol), form))

    /** URL parse/normalize/blocklist features (scheme, host, domain,
      * url_norm, is_blocked).
      */
    def withUrlFeatures(urlCol: String, blockedHosts: Seq[String] = Nil): DataFrame =
      TextAnalysis.urlFeatures(df, urlCol, blockedHosts)

    /** Gopher repetition signals per key (top-bigram + duplicate-5-gram
      * char coverage).
      */
    def gopherRepetition(keyCol: String, textCol: String): DataFrame =
      TextAnalysis.gopherRepetitionSignals(df, keyCol, textCol)

    /** BM25 top-k documents for a bag-of-terms probe. */
    def bm25(idCol: String, textCol: String, terms: Seq[String], k: Int = 10): DataFrame =
      TextAnalysis.bm25TopDocs(df, idCol, textCol, terms, k)

    /** Deterministic shard assignment + gzipped JSONL export. */
    def exportShardsJsonl(keyCol: String, nShards: Int, path: String): Unit =
      graft.llmops.TrainExport.writeShardsJsonl(df, keyCol, nShards, path)
  }
}
