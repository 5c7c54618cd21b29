package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SFT (supervised fine-tuning) conversation export — the data-prep
  * layer between a curated corpus and an instruction-tuning run:
  * chat-template rendering, TOKEN-SPAN loss masks (train on assistant
  * turns, mask the rest), and packing. Reference hook: curated-corpus
  * export for downstream consumers,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Conversations are `array<struct<role string, content string>>`
  * columns; the rendered form is the ChatML-style template
  * `<|im_start|>ROLE\nCONTENT\n<|im_end|>\n` per turn. The loss mask
  * ships as per-turn token SPANS (`tok_start`/`tok_end`/`trainable`),
  * not per-token arrays — spans are O(turns) per row no matter the
  * sequence length, survive re-tokenization shifts reviewably, and
  * expand to flat masks at the trainer boundary ([[maskArray]]) only
  * when something actually wants width-n vectors.
  *
  * Everything here is a per-row projection over the turns array
  * (prefix sums via `aggregate` over `slice` — quadratic in the turn
  * count, which is tens, never in tokens) — zero shuffles, arbitrarily
  * partitionable, the 100-TB shape. Token counts use the whitespace
  * tokenizer (the engine-portable proxy the pack/sample family
  * budgets by; swap [[Bpe.tokenCount]] in via `packSftByTokens` when a
  * trained merge table exists).
  */
object ChatSft {

  private val SegOpen = "<|im_start|>"
  private val SegClose = "\n<|im_end|>\n"

  /** Whitespace token count of one content string (0 for blank). */
  private def contentTokens(c: Column): Column =
    size(filter(split(c, "[ \t\r\n]+"), x => length(x) > 0)).cast("long")

  /** Tokens contributed by one rendered turn: content tokens + 2 (the
    * `<|im_start|>role` glue token and the `<|im_end|>` token — the
    * template places newlines so markers never glue to content words).
    */
  private def segTokens(t: Column): Column =
    contentTokens(t.getField("content")) + lit(2L)

  /** Rendered template text for a turns column. */
  def render(turns: Column): Column =
    array_join(transform(turns, t =>
      concat(lit(SegOpen), t.getField("role"), lit("\n"),
        t.getField("content"), lit(SegClose))), "")

  /** Per-turn token spans:
    * `array<struct<turn_idx, role, tok_start, tok_end, trainable>>`.
    * Offsets are prefix sums of the per-turn token counts; `trainable`
    * marks `trainableRole` turns (the only spans a loss touches).
    */
  def spans(turns: Column, trainableRole: String = "assistant"): Column = {
    def prefix(i: Column): Column =
      aggregate(slice(turns, lit(1), i), lit(0L), (acc, t) => acc + segTokens(t))
    transform(turns, (t, i) => struct(
      i.cast("int").as("turn_idx"),
      t.getField("role").as("role"),
      prefix(i).as("tok_start"),
      (prefix(i) + segTokens(t)).as("tok_end"),
      (t.getField("role") === lit(trainableRole)).as("trainable")))
  }

  /** Total token count of the rendered conversation. */
  def tokenCount(turns: Column): Column =
    aggregate(turns, lit(0L), (acc, t) => acc + segTokens(t))

  /** Expand spans to a flat per-token mask (`array<boolean>`, length =
    * total tokens) — the trainer-boundary form. O(tokens × turns) per
    * row; prefer shipping spans and expanding at load time.
    */
  def maskArray(spansCol: Column): Column = {
    val total = coalesce(element_at(spansCol, -1).getField("tok_end"), lit(0L))
    // sequence(0, -1) would produce a DESCENDING ramp, not empty
    when(total === 0, array().cast("array<boolean>"))
      .otherwise(transform(sequence(lit(0L), total - 1), tok =>
        exists(spansCol, s =>
          s.getField("trainable") &&
          tok >= s.getField("tok_start") && tok < s.getField("tok_end"))))
  }

  /** ShareGPT-shape chat-log ingestion: the community SFT corpora
    * convention (`{"conversations": [{"from": "human", "value": …},
    * {"from": "gpt", …}]}` per line) parsed into the turns schema.
    * Role normalization: human/user → `user`, gpt/assistant/bot/chatgpt
    * → `assistant`, system → `system`, anything else passes through
    * lowercased (dropping unknown roles silently would corrupt span
    * masks). Malformed JSON → NULL turns (filter upstream).
    */
  def fromShareGpt(json: Column): Column = {
    val schema = "struct<conversations: array<struct<from: string, value: string>>>"
    val parsed = from_json(json, org.apache.spark.sql.types.DataType
      .fromDDL(schema).asInstanceOf[org.apache.spark.sql.types.StructType])
    transform(parsed.getField("conversations"), t => {
      val f = lower(t.getField("from"))
      struct(
        when(f.isin("human", "user"), "user")
          .when(f.isin("gpt", "assistant", "bot", "chatgpt"), "assistant")
          .when(f === "system", "system")
          .otherwise(f).as("role"),
        t.getField("value").as("content"))
    })
  }

  /** One-call SFT export frame: `text` (rendered), `spans`,
    * `token_count`, plus the deterministic shard/pos/bin layout of
    * [[TrainExport.packSequences]] — ready for any of the shard sinks
    * (JSONL/tar/TFRecord).
    */
  def packSft(df: DataFrame, keyCol: String, turnsCol: String,
      nShards: Int, tokenBudget: Long,
      trainableRole: String = "assistant"): DataFrame = {
    val prepared = df
      .withColumn("text", render(col(turnsCol)))
      .withColumn("spans", spans(col(turnsCol), trainableRole))
      .withColumn("token_count", tokenCount(col(turnsCol)))
    TrainExport.packSequences(prepared, keyCol, "token_count", nShards,
      tokenBudget)
  }

  /** SFT conversations straight to TFRecord shards: one Example per
    * conversation with `text` (bytes), `token_count` (int64), the span
    * structure flattened into parallel lists (`span_starts`/`span_ends`
    * /`span_trainable` int64s + `span_roles` bytes — Example has no
    * nested structs; parallel lists are the TF convention), sharded by
    * the deterministic hash layout.
    */
  def writeSftTfRecord(df: DataFrame, keyCol: String, turnsCol: String,
      nShards: Int, path: String, gzip: Boolean = false,
      trainableRole: String = "assistant"): Unit = {
    val sp = spans(col(turnsCol), trainableRole)
    val frame = df.select(
      col(keyCol),
      render(col(turnsCol)).as("text"),
      tokenCount(col(turnsCol)).as("token_count"),
      transform(sp, s => s.getField("tok_start")).as("span_starts"),
      transform(sp, s => s.getField("tok_end")).as("span_ends"),
      transform(sp, s => s.getField("trainable").cast("long"))
        .as("span_trainable"),
      transform(sp, s => s.getField("role")).as("span_roles"))
    TfRecord.writeShards(frame, keyCol, nShards, path, gzip)
  }
}
