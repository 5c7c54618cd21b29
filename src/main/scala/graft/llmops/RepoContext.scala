package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repository-level context packing — the long-context pretraining prep
  * that turns per-file rows into one document per repository (StarCoder-
  * style), so the model sees cross-file structure. Reference hook:
  * grouped document assembly in the ingestion layer,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Scale shape: exactly ONE shuffle (the per-repo groupBy). Ordering and
  * the char-budget cutoff happen inside the aggregated array (array_sort
  * + a fold), not in a second window pass — a repo's files must be
  * co-located to concatenate anyway, so this is the minimal plan.
  */
object RepoContext {

  /** The per-file rendering convention: a filename header line, then the
    * content, newline-terminated.
    */
  def render(path: Column, content: Column): Column =
    concat(lit("<file> "), path, lit("\n"), coalesce(content, lit("")),
      lit("\n"))

  /** README-first ordering priority (0 = README, 1 = everything else);
    * within a priority class, path ascending.
    */
  def prio(path: Column): Column = {
    val name = element_at(split(path, "/"), -1)
    when(lower(name).startsWith("readme"), 0).otherwise(1)
  }

  /** One row per repo: `repo_text` (README-first, path-ordered rendered
    * files), `n_files` kept and `total_chars`, cut off at the FIRST file
    * that would push the document past `maxChars` (prefix semantics —
    * cumulative length is monotone, so this equals a window
    * `cum <= maxChars` filter, which is how the oracle replays it).
    */
  def pack(df: DataFrame, repoCol: String, pathCol: String,
      contentCol: String, maxChars: Long = Long.MaxValue): DataFrame = {
    val sorted = array_sort(collect_list(struct(
      prio(col(pathCol)).as("prio"), col(pathCol).as("path"),
      render(col(pathCol), col(contentCol)).as("rendered"))))
    val zero = struct(lit(0L).as("len"), lit("").as("txt"),
      lit(0L).as("n"), lit(false).as("stopped"))
    def fold(arr: Column): Column = aggregate(arr, zero, (acc, f) => {
      val r = f.getField("rendered")
      val fits = !acc.getField("stopped") &&
        (acc.getField("len") + length(r).cast("long") <= lit(maxChars))
      when(fits, struct(
        (acc.getField("len") + length(r).cast("long")).as("len"),
        concat(acc.getField("txt"), r).as("txt"),
        (acc.getField("n") + 1L).as("n"),
        lit(false).as("stopped")))
      .otherwise(struct(acc.getField("len").as("len"),
        acc.getField("txt").as("txt"), acc.getField("n").as("n"),
        lit(true).as("stopped")))
    })
    df.groupBy(col(repoCol))
      .agg(fold(sorted).as("acc"))
      .select(col(repoCol), col("acc.txt").as("repo_text"),
        col("acc.n").as("n_files"), col("acc.len").as("total_chars"))
  }
}
