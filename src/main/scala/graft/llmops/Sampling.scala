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
    *
    * The fractional gate is salted (`key || ":mixture"`, same rationale
    * as [[weightedSample]]): composing with [[hashSample]] on the SAME
    * key makes independent decisions — unsalted, hashSample(0.5) piped
    * into weight 1.5 would pass every survivor (effective weight 2.0,
    * fully correlated gates). External replay:
    * `md5(key || ':mixture')`.
    */
  def mixtureSample(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0
  ): DataFrame = {
    // null-safe match (<=>): temperatureWeights legitimately produces a
    // NULL source key (unlabeled rows) — plain === never matches it, so
    // those rows silently fell through to defaultWeight while still
    // having deflated every other source's computed weight
    val w = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (s, v)) =>
        when(col(sourceCol) <=> lit(s), lit(v)).otherwise(acc)
    }
    df.withColumn("__w", w)
      .filter(col("__w") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0), ceil(col("__w")).cast("int") - 1)))
      .filter(col("epoch") < floor(col("__w")).cast("int") ||
        (col("epoch") === floor(col("__w")).cast("int") &&
          pmod(Similarity.portable60(
              concat(col(keyCol).cast("string"), lit(":mixture"))),
            lit(Buckets)) <
            ((col("__w") - floor(col("__w"))) * Buckets).cast("long")))
      .drop("__w")
  }

  /** Temperature-sampling weights (the multilingual/multi-source recipe:
    * sampling probability ∝ n_s^alpha, alpha ∈ (0, 1] — alpha 1 keeps
    * natural proportions, smaller alpha re-balances toward uniform so
    * long-tail sources aren't drowned): per-source epoch weights
    * `maxWeight · (n_s / n_max)^(alpha − 1)` for [[mixtureSample]] —
    * the largest source gets exactly `maxWeight`, smaller sources get
    * proportionally MORE epochs. One count aggregate; the source
    * dimension is a bounded driver artifact (require-gated), the corpus
    * itself never leaves the executors.
    */
  def temperatureWeights(df: DataFrame, sourceCol: String, alpha: Double,
      maxWeight: Double = 1.0,
      /** Hard ceiling on any source's epoch weight: (n_s/n_max)^(α−1)
        * grows as n_max/n_s for tiny sources (a 100-row source in a 1e9
        * corpus at α=0.1 would ask for ~3.4M epochs and
        * [[mixtureSample]]'s per-row `sequence` would materialize every
        * copy). 100 epochs is already far beyond any published recipe;
        * raise it consciously if a corpus truly needs more.
        */
      maxEpochs: Double = 100.0): Map[String, Double] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(maxWeight > 0, "maxWeight must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.size <= 10000,
      s"${counts.size} sources exceed the 10k driver budget")
    if (counts.isEmpty) Map.empty
    else {
      val nMax = counts.values.max.toDouble
      counts.map { case (s, n) =>
        s -> math.min(maxEpochs, maxWeight * math.pow(n / nMax, alpha - 1.0))
      }
    }
  }

  /** [[mixtureSample]] at temperature `alpha`: weights derived from the
    * observed source sizes via [[temperatureWeights]].
    */
  def temperatureMixture(df: DataFrame, sourceCol: String, keyCol: String,
      alpha: Double, maxWeight: Double = 1.0): DataFrame =
    mixtureSample(df, sourceCol, keyCol,
      temperatureWeights(df, sourceCol, alpha, maxWeight))

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

  /** Leakage-safe train/val/test assignment: the split decision is made
    * per near-duplicate CLUSTER, not per document, so a held-out document
    * can never have a near-copy in train — the contamination mode that
    * quietly inflates eval numbers when splits are drawn per-row (the
    * reason C4/Pile-era dedup papers dedup ACROSS splits, not just within
    * train). Every member of a connected near-dup component shares its
    * cluster representative (the component's minimum key, via
    * [[DedupOps.duplicateClusters]]); the representative — not the member
    * key — feeds the deterministic hash gate, so the whole cluster lands
    * in one band. Documents in no pair represent themselves.
    *
    * Bands are cumulative integer thresholds over the same 1e6 hash
    * buckets as [[hashSample]], salted (`rep || ":split"`) so composing
    * with a rate sampler on the same keys stays independent; the final
    * band absorbs threshold rounding. Engine-portable, and stable as
    * UNRELATED corpus grows: a cluster's split changes only when its own
    * membership does — new edges merging two clusters (exactly when it
    * must move: the merged cluster leaks unless co-located), but ALSO a
    * new member with a smaller key, which changes the min-key
    * representative and can re-band the existing members. Longitudinal
    * eval sets that must never migrate should pin their own split column
    * at creation time rather than re-derive it per run.
    *
    * Scale shape: label propagation is O(diameter) narrow rounds
    * ([[DedupOps.duplicateClusters]]'s checkpointed loop); everything
    * after is one left join (cluster table is |paired docs|, typically a
    * small fraction of the corpus) plus a per-row projection.
    *
    * @param pairs (key_a, key_b) near-dup edges from any near-dup
    *              operator ([[DedupOps.minhashNearDups]],
    *              [[DedupOps.simhashNearDups]],
    *              [[Multimodal.imageNearDups]], ...)
    * @param fractions ordered (name, weight) bands, weights sum to 1
    * @return df plus (cluster_rep, split)
    */
  def leakageSafeSplit(
      df: DataFrame,
      keyCol: String,
      pairs: DataFrame,
      fractions: Seq[(String, Double)] =
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)),
      checkpointDir: Option[String] = None
  ): DataFrame = {
    require(fractions.nonEmpty, "at least one split band required")
    require(fractions.forall(_._2 > 0), s"band weights must be > 0: $fractions")
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"band weights must sum to 1, got $total")
    val clusters = DedupOps.duplicateClusters(pairs,
      checkpointDir = checkpointDir)
    // NULL-key unpaired rows have no identity to hash: they all land in
    // the LAST band (the otherwise-arm, "test" by convention) — filter
    // them out beforehand if that skews the eval set
    val rep = coalesce(col("cluster_id"), col(keyCol))
    val h = pmod(Similarity.portable60(
      concat(rep.cast("string"), lit(":split"))), lit(Buckets))
    // cumulative upper thresholds; the last band is the otherwise-arm so
    // rounding can never leave a bucket unassigned
    val cuts = fractions.map(_._2).scanLeft(0L) { (acc, w) =>
      acc + math.round(w * Buckets)
    }.tail.init
    val split = fractions.init.zip(cuts).foldRight(
      lit(fractions.last._1): Column) {
      case (((name, _), cut), acc) => when(h < lit(cut), lit(name)).otherwise(acc)
    }
    // pin the cluster table's partitioning on its key: the table is
    // small (|paired docs|) so the extra shuffle is negligible, and the
    // join's upstream plan stops depending on label-propagation's
    // incidental partition layout (deterministic bench profile)
    df.join(clusters.repartition(col("key"))
        .withColumnRenamed("key", keyCol), Seq(keyCol), "left")
      .withColumn("cluster_rep", rep)
      .withColumn("split", split)
      .drop("cluster_id")
  }

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
    // salted gate (`key || ":strata"`) — the same independence doctrine
    // as weightedSample/mixtureSample: unsalted, composing with
    // hashSample on the same key was fully correlated (keep probability
    // min(f1,f2), not f1·f2). External replay: md5(key || ':strata').
    df.filter(
      pmod(Similarity.portable60(
        concat(col(keyCol).cast("string"), lit(":strata"))), lit(Buckets)) <
        (frac * Buckets).cast("long"))
  }
}
