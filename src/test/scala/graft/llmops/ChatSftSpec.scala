package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ChatSftSpec extends SparkTestBase {

  private def convDf = {
    val ss = spark
    import ss.implicits._
    Seq(
      (1L, Seq(("system", "Be terse."), ("user", "What is 2+2?"),
        ("assistant", "4"))),
      (2L, Seq(("user", "List three colors please"),
        ("assistant", "red green blue"), ("user", "thanks"),
        ("assistant", "sure"))),
      (3L, Seq(("user", ""))))
      .toDF("conv_id", "raw")
      .withColumn("turns", expr(
        "transform(raw, t -> named_struct('role', t._1, 'content', t._2))"))
      .drop("raw")
  }

  test("render emits the ChatML template in turn order") {
    val r = convDf.filter(col("conv_id") === 1)
      .select(ChatSft.render(col("turns"))).head.getString(0)
    assert(r ==
      "<|im_start|>system\nBe terse.\n<|im_end|>\n" +
      "<|im_start|>user\nWhat is 2+2?\n<|im_end|>\n" +
      "<|im_start|>assistant\n4\n<|im_end|>\n")
  }

  test("spans carry whitespace-token prefix sums and trainable flags") {
    val rows = convDf.filter(col("conv_id") === 1)
      .select(explode(ChatSft.spans(col("turns"))).as("s"))
      .select("s.turn_idx", "s.role", "s.tok_start", "s.tok_end",
        "s.trainable")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    // "Be terse." = 2 tokens → seg 4; "What is 2+2?" = 3 → seg 5; "4" → 3
    assert(rows == Seq(
      (0, "system", 0L, 4L, false),
      (1, "user", 4L, 9L, false),
      (2, "assistant", 9L, 12L, true)))
  }

  test("empty content yields the 2-token marker-only span") {
    val rows = convDf.filter(col("conv_id") === 3)
      .select(explode(ChatSft.spans(col("turns"))).as("s"))
      .select("s.tok_start", "s.tok_end").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((0L, 2L)))
    val n = convDf.filter(col("conv_id") === 3)
      .select(ChatSft.tokenCount(col("turns"))).head.getLong(0)
    assert(n == 2L)
  }

  test("maskArray expands spans to the per-token trainer mask") {
    val mask = convDf.filter(col("conv_id") === 1)
      .select(ChatSft.maskArray(ChatSft.spans(col("turns"))))
      .head.getSeq[Boolean](0)
    assert(mask.length == 12)
    assert(mask.take(9).forall(!_) && mask.drop(9).forall(identity))
    val empty = spark.sql(
      "SELECT cast(array() as array<struct<role string, content string>>) AS t")
      .select(ChatSft.maskArray(ChatSft.spans(col("t"))))
      .head.getSeq[Boolean](0)
    assert(empty.isEmpty)
  }

  test("multi-assistant conversations mark every assistant span") {
    val rows = convDf.filter(col("conv_id") === 2)
      .select(explode(ChatSft.spans(col("turns"))).as("s"))
      .select("s.role", "s.trainable").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq
    assert(rows == Seq(("user", false), ("assistant", true),
      ("user", false), ("assistant", true)))
  }

  test("packSft produces shard/pos/bin plus rendered text and spans") {
    val out = ChatSft.packSft(convDf, "conv_id", "turns", nShards = 2,
      tokenBudget = 10L)
    val cols = out.columns.toSet
    assert(Set("text", "spans", "token_count", "shard", "pos", "bin")
      .subsetOf(cols))
    val byId = out.select("conv_id", "token_count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byId == Map(1L -> 12L, 2L -> 17L, 3L -> 2L))
    // span math agrees with the whitespace count of the rendered text
    out.select(col("token_count"),
      size(filter(split(col("text"), "[ \t\r\n]+"), x => length(x) > 0))
        .cast("long").as("ws")).collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("fromShareGpt normalizes roles and survives malformed lines") {
    val ss = spark
    import ss.implicits._
    val lines = Seq(
      """{"conversations":[{"from":"human","value":"hi there"},
         {"from":"gpt","value":"hello"},{"from":"SYSTEM","value":"s"},
         {"from":"observer","value":"o"}]}""".replaceAll("\n\\s*", ""),
      """not json at all""")
    val df = lines.toDF("line")
      .withColumn("turns", ChatSft.fromShareGpt(col("line")))
    val parsed = df.filter(col("turns").isNotNull)
      .select(explode(col("turns")).as("t"))
      .select("t.role", "t.content").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(parsed == Seq(("user", "hi there"), ("assistant", "hello"),
      ("system", "s"), ("observer", "o")))
    assert(df.filter(col("turns").isNull).count() == 1)
    // parsed turns feed the span machinery directly
    val n = df.filter(col("turns").isNotNull)
      .select(ChatSft.tokenCount(col("turns"))).head.getLong(0)
    assert(n == (2 + 2) + (1 + 2) + (1 + 2) + (1 + 2))
  }

  test("writeSftTfRecord round-trips text and span features") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sfttf")
      .toString + "/sh"
    ChatSft.writeSftTfRecord(convDf, "conv_id", "turns", nShards = 2,
      path = dir)
    val back = TfRecord.readExamples(spark, dir)
      .select(
        element_at(col("int64_feats"), "conv_id").getItem(0).as("id"),
        decode(element_at(col("bytes_feats"), "text").getItem(0), "UTF-8")
          .as("text"),
        element_at(col("int64_feats"), "span_starts").as("starts"),
        element_at(col("int64_feats"), "span_ends").as("ends"),
        element_at(col("int64_feats"), "span_trainable").as("train"))
      .as[(Long, String, Seq[Long], Seq[Long], Seq[Long])]
      .collect().sortBy(_._1)
    assert(back.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val c1 = back(0)
    assert(c1._2.startsWith("<|im_start|>system\nBe terse."))
    assert(c1._3 == Seq(0L, 4L, 9L) && c1._4 == Seq(4L, 9L, 12L))
    assert(c1._5 == Seq(0L, 0L, 1L))
    assert(back(2)._3 == Seq(0L) && back(2)._4 == Seq(2L))
  }

  test("spans align with the rendered text's own whitespace tokens") {
    // token i of split(render) falls inside exactly the span that owns it
    val row: Row = convDf.filter(col("conv_id") === 2)
      .select(ChatSft.render(col("turns")).as("text"),
        ChatSft.spans(col("turns")).as("sp")).head
    val toks = row.getString(0).split("[ \t\r\n]+").filter(_.nonEmpty)
    val sp = row.getSeq[Row](1)
    assert(toks.length == sp.last.getLong(3))
    sp.foreach { s =>
      val role = s.getString(1)
      val start = s.getLong(2).toInt
      assert(toks(start) == s"<|im_start|>$role")
      assert(toks(s.getLong(3).toInt - 1) == "<|im_end|>")
    }
  }
}
