package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) transformation — the code-pretraining data
  * augmentation that teaches infilling: split each document into
  * (prefix, middle, suffix) and re-serialize with sentinel tokens in PSM
  * or SPM order. Reference hook: training-export transforms,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Everything is a pure `Column` projection. Cut points come from the
  * repo's portable md5-prefix convention (`conv(substr(md5(..),1,15))` ≡
  * DuckDB `('0x'||substr(md5(..),1,15))::BIGINT`), so the transform is
  * deterministic per key AND externally replayable — no RNG state, no
  * driver involvement, scales on row count alone.
  */
object Fim {

  val PrefixTok = "<fim_prefix>"
  val MiddleTok = "<fim_middle>"
  val SuffixTok = "<fim_suffix>"

  /** Deterministic cut in [0, len] from the portable 60-bit md5 prefix
    * of `key:salt`.
    */
  def hashCut(key: Column, len: Column, salt: Int): Column =
    pmod(conv(substring(md5(concat(key.cast("string"), lit(":" + salt))),
      1, 15), 16, 10).cast("long"), len.cast("long") + 1L)

  /** PSM render: `<fim_prefix>P<fim_suffix>S<fim_middle>M` (the training
    * target M comes last, so loss masking is a suffix rule). SPM swaps
    * the first two segments.
    */
  def render(content: Column, cut1: Column, cut2: Column,
      spm: Boolean = false): Column = {
    val c1 = least(cut1, cut2).cast("int")
    val c2 = greatest(cut1, cut2).cast("int")
    val len = length(content)
    val prefix = content.substr(lit(1), c1)
    val middle = content.substr(c1 + 1, c2 - c1)
    val suffix = content.substr(c2 + 1, len - c2)
    if (spm)
      concat(lit(SuffixTok), suffix, lit(PrefixTok), prefix,
        lit(MiddleTok), middle)
    else
      concat(lit(PrefixTok), prefix, lit(SuffixTok), suffix,
        lit(MiddleTok), middle)
  }

  /** Appends `fim` (the re-serialized document) plus the `cut1`/`cut2`
    * actually used, keyed deterministically — rerunning the pipeline
    * reproduces byte-identical training data.
    */
  def transform(df: DataFrame, keyCol: String, contentCol: String,
      spm: Boolean = false): DataFrame = {
    val len = length(col(contentCol))
    val a = hashCut(col(keyCol), len, 1)
    val b = hashCut(col(keyCol), len, 2)
    df.withColumn("cut1", least(a, b))
      .withColumn("cut2", greatest(a, b))
      .withColumn("fim",
        render(col(contentCol), col("cut1"), col("cut2"), spm))
  }
}
