package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-pair (DPO/RLHF reward-model) export — turning scored
  * response sets into `(prompt, chosen, rejected)` training pairs, the
  * step between an LLM-judge/quality-score pass ([[LlmScore]], q87/q116)
  * and a preference-tuning run. Reference hook: curated-corpus export,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Scale shape: ONE hash shuffle on the prompt key, then a plain
  * aggregate — chosen/rejected are `max`/`min` over `struct(score,
  * response)` (lexicographic), so map-side partial aggregation applies
  * and ties break DETERMINISTICALLY on the response string instead of
  * arrival order (`max_by` would be run-dependent under ties, which
  * silently changes the training set between runs). Single-response
  * prompts and all-tied groups (chosen == rejected) drop — DPO is
  * undefined there.
  */
object Preference {

  /** Reduce `(prompt, response, score)` rows to one preference pair per
    * prompt: `(prompt, chosen, chosen_score, rejected, rejected_score,
    * n_responses)`. Prompts whose best and worst coincide are dropped.
    */
  def pairFromScores(df: DataFrame, promptCol: String, responseCol: String,
      scoreCol: String): DataFrame =
    df.groupBy(col(promptCol))
      .agg(
        max(struct(col(scoreCol).as("s"), col(responseCol).as("r"))).as("c"),
        min(struct(col(scoreCol).as("s"), col(responseCol).as("r"))).as("j"),
        count(lit(1)).as("n_responses"))
      .filter(col("c") =!= col("j"))
      .select(col(promptCol),
        col("c.r").as("chosen"), col("c.s").as("chosen_score"),
        col("j.r").as("rejected"), col("j.s").as("rejected_score"),
        col("n_responses"))

  /** Margin filter: keep pairs whose score gap is at least `minMargin`
    * — near-tied pairs teach a preference model noise.
    */
  def withMargin(pairs: DataFrame, minMargin: Double): DataFrame =
    pairs.filter(col("chosen_score") - col("rejected_score") >= minMargin)

  /** Render both branches through the shared ChatML template
    * ([[ChatSft.render]]): `chosen_text` / `rejected_text` are the
    * user-prompt + assistant-response conversations a DPO trainer
    * tokenizes directly.
    */
  def rendered(pairs: DataFrame, promptCol: String = "prompt"): DataFrame = {
    def conv(response: org.apache.spark.sql.Column) = array(
      struct(lit("user").as("role"), col(promptCol).as("content")),
      struct(lit("assistant").as("role"), response.as("content")))
    pairs
      .withColumn("chosen_text", ChatSft.render(conv(col("chosen"))))
      .withColumn("rejected_text", ChatSft.render(conv(col("rejected"))))
  }
}
