package graft.llmops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic, engine-portable sampling for corpus curation.
  *
  * `df.sample()` is seed-dependent per partitioning and not reproducible
  * across engines or re-runs with different file splits; hash-gating on a
  * stable key is: a row is kept iff
  * `md5-hash60(key) % 1_000_000 < fraction · 1_000_000`, so the same rows
  * are selected by Spark, the DuckDB oracle, and any future engine, and the
  * decision is a pure per-row filter — pushdown-friendly, zero shuffles,
  * trivially composable with incremental loads (a row's fate never changes
  * as the corpus grows).
  */
object Sampling {

  private val Buckets = 1000000L

  /** Keep-predicate for a fraction in [0, 1]. */
  def hashGate(key: Column, fraction: Double): Column =
    pmod(Similarity.portable60(key), lit(Buckets)) <
      lit((fraction * Buckets).toLong)

  /** Deterministic fraction of rows, keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashGate(col(keyCol), fraction))

  /** Training-mixture sampling: replicate each source to its epoch weight
    * — the "N epochs of source A, 0.5 of B" mixing every LLM data recipe
    * specifies. A weight w yields floor(w) full copies of every row plus
    * one more for the deterministic hash-gated fraction (w − floor(w)) of
    * keys; output carries an `epoch` column (0-based copy index) so
    * downstream shard shuffling can key on (row, epoch).
    *
    * Same portability contract as [[hashSample]]: the copy set is a pure
    * function of (key, weight) — identical across engines, re-runs, and
    * corpus growth. One generator projection, no shuffle, no rand().
    * Weights ≤ 0 drop the source entirely.
    */
  def mixtureSample(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0
  ): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (s, v)) => when(col(sourceCol) === s, lit(v)).otherwise(acc)
    }
    df.withColumn("__w", w)
      .filter(col("__w") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0), ceil(col("__w")).cast("int") - 1)))
      .filter(col("epoch") < floor(col("__w")).cast("int") ||
        (col("epoch") === floor(col("__w")).cast("int") &&
          pmod(Similarity.portable60(col(keyCol)), lit(Buckets)) <
            ((col("__w") - floor(col("__w"))) * Buckets).cast("long")))
      .drop("__w")
  }

  /** Per-row weighted sampling: keep each row with probability
    * `weightCol` (clamped to [0, 1]), decided by the same deterministic
    * hash gate as [[hashSample]] — the quality-curriculum primitive
    * ("keep documents proportionally to their quality score", CCNet's
    * head-heavy sampling, judge-score-weighted retention). The weight is
    * any per-row column: a [[TextAnalysis.lmQualityScore]]-derived
    * probability, an [[LlmScore.scoreColumn]] score mapped to [0,1], a
    * recency decay. Pure per-row filter: zero shuffles, engine-portable,
    * stable under corpus growth.
    *
    * The gate hash is salted (`key || ":weighted"`) so composing this with
    * [[hashSample]] / [[mixtureSample]] on the SAME key column makes
    * independent decisions: chained keep probability is f·w, not the fully
    * correlated min(f, w) that an unsalted shared hash would give.
    * External replay: `md5(key || ':weighted')`.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String): DataFrame =
    df.filter(
      pmod(Similarity.portable60(
          concat(col(keyCol).cast("string"), lit(":weighted"))),
        lit(Buckets)) <
        (least(greatest(col(weightCol).cast("double"), lit(0.0)), lit(1.0)) *
          Buckets).cast("long"))

  /** Per-stratum deterministic fractions (corpus balancing): strata absent
    * from the map fall back to `defaultFraction`.
    */
  def stratifiedHashSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0
  ): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(f)).otherwise(acc)
    }
    df.filter(
      pmod(Similarity.portable60(col(keyCol)), lit(Buckets)) <
        (frac * Buckets).cast("long"))
  }
}
