package graft.llmops

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Deterministic fake judge: score = (prompt.length % 101) / 10.0 in the
  * SCORE/RATIONALE reply format. Static state records calls/failures —
  * executors share the test JVM in local mode, so executor-side behavior
  * is observable (same pattern as [[FakeEndpoint]]).
  */
object FakeJudge {
  val batchSizes = new ConcurrentLinkedQueue[Int]()
  val failuresLeft = new AtomicInteger(0)

  def reset(failures: Int = 0): Unit = {
    batchSizes.clear()
    failuresLeft.set(failures)
  }

  def score(prompt: String): Double = (prompt.length % 101) / 10.0

  def reply(prompt: String): TextGenResult = TextGenResult(
    s"SCORE: ${score(prompt)}\nRATIONALE: len=${prompt.length}",
    inputTokens = prompt.length / 4, outputTokens = 12,
    stopReason = "end_turn")
}

class FakeJudgeClient extends TextGenClient {
  override def generateBatch(prompts: Seq[String]): Seq[TextGenResult] = {
    if (FakeJudge.failuresLeft.getAndDecrement() > 0)
      throw new RuntimeException("simulated judge throttle")
    FakeJudge.batchSizes.add(prompts.length)
    prompts.map(FakeJudge.reply)
  }
}

/** A judge whose batches containing the poison text always fail. */
class PoisonJudgeClient(poison: String) extends TextGenClient {
  override def generateBatch(prompts: Seq[String]): Seq[TextGenResult] = {
    if (prompts.exists(_.contains(poison)))
      throw new RuntimeException("poison batch")
    prompts.map(FakeJudge.reply)
  }
}

/** A judge that echoes a canned reply regardless of prompt — for parse
  * coverage through the full operator.
  */
class CannedJudgeClient(replyText: String) extends TextGenClient {
  override def generateBatch(prompts: Seq[String]): Seq[TextGenResult] =
    prompts.map(_ => TextGenResult(replyText, 1, 1, "end_turn"))
}

class LlmScoreSpec extends SparkTestBase {
  import spark.implicits._

  private val Template = "Rate 0-10:\n{text}"

  test("generateColumn appends the normalized generation struct") {
    FakeJudge.reset()
    val df = Seq((1L, "summarize this"), (2L, null))
      .toDF("id", "prompt").repartition(1)
    val got = LlmScore.generateColumn(df, "prompt", new FakeJudgeClient)
      .select("id", "generation.text", "generation.input_tokens",
        "generation.output_tokens", "generation.stop_reason")
      .collect().sortBy(_.getLong(0))
    assert(got(0).getString(1).startsWith("SCORE: "))
    assert(got(0).getLong(2) === "summarize this".length / 4)
    assert(got(0).getLong(3) === 12L)
    assert(got(0).getString(4) === "end_turn")
    // NULL prompt → NULL struct, no client call for it
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
  }

  test("scoreColumn: template substitution, batching, score + rationale") {
    FakeJudge.reset()
    val df = (1 to 10).map(i => (i.toLong, "d" * i)).toDF("id", "text")
      .repartition(1)
    val got = LlmScore.scoreColumn(df, "text", new FakeJudgeClient,
        Template, batchSize = 4)
      .select("id", "llm_score", "llm_rationale").collect().sortBy(_.getLong(0))
    got.foreach { r =>
      val promptLen = Template.length - "{text}".length + r.getLong(0).toInt
      assert(r.getDouble(1) === (promptLen % 101) / 10.0)
      assert(r.getString(2) === s"len=$promptLen")
    }
    // 10 rows in one partition at batchSize 4 → batches of 4, 4, 2
    val sizes = FakeJudge.batchSizes.toArray.toSeq.asInstanceOf[Seq[Int]].sorted
    assert(sizes === Seq(2, 4, 4))
  }

  test("scoreColumn requires the {text} placeholder") {
    val df = Seq((1L, "x")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      LlmScore.scoreColumn(df, "text", new FakeJudgeClient, "no placeholder")
    }
  }

  test("parseScore is lenient to reply drift") {
    // canonical format
    assert(LlmScore.parseScore("SCORE: 7.5\nRATIONALE: solid prose")
      === (Some(7.5), "solid prose"))
    // lowercase, '=' separator, rationale missing → whole reply
    assert(LlmScore.parseScore("score = 3")._1 === Some(3.0))
    // prose with the number after the marker
    assert(LlmScore.parseScore("I'd give this a score of 8 because…")._1
      === Some(8.0))
    // no marker: first number anywhere
    assert(LlmScore.parseScore("Maybe a 6, hard to say")._1 === Some(6.0))
    // negative and decimal
    assert(LlmScore.parseScore("SCORE: -1.25")._1 === Some(-1.25))
    // nothing numeric → None, raw reply as rationale
    val (s, r) = LlmScore.parseScore("I cannot rate this")
    assert(s.isEmpty && r === "I cannot rate this")
  }

  test("an unparseable reply scores NULL through the full operator") {
    val df = Seq((1L, "doc")).toDF("id", "text").repartition(1)
    val got = LlmScore.scoreColumn(df, "text",
        new CannedJudgeClient("refusing to grade"), Template)
      .select("llm_score", "llm_rationale").collect().head
    assert(got.isNullAt(0))
    assert(got.getString(1) === "refusing to grade")
  }

  test("transient failures retry with backoff until the batch succeeds") {
    FakeJudge.reset(failures = 2)
    val df = Seq((1L, "x"), (2L, "yy")).toDF("id", "text").repartition(1)
    val got = LlmScore.scoreColumn(df, "text", new FakeJudgeClient,
        Template, batchSize = 10, maxRetries = 3, backoffMs = 1L)
      .select("llm_score").collect()
    assert(got.forall(!_.isNullAt(0)))
    assert(FakeJudge.failuresLeft.get() <= 0)
  }

  test("a batch that exhausts retries fails the task under FailTask") {
    FakeJudge.reset(failures = 100)
    val df = Seq((1L, "x")).toDF("id", "text").repartition(1)
    val ex = intercept[Exception] {
      LlmScore.scoreColumn(df, "text", new FakeJudgeClient, Template,
        maxRetries = 2, backoffMs = 1L).collect()
    }
    assert(ex.getMessage.contains("throttle") ||
      Option(ex.getCause).exists(_.getMessage.contains("throttle")))
  }

  test("NullOutputs: the dead batch scores NULL, other batches survive") {
    FakeJudge.reset()
    // batchSize 2 over one partition: batches (a,poison), (c,d) — first dies
    val df = Seq((1L, "a"), (2L, "poison"), (3L, "c"), (4L, "d"))
      .toDF("id", "text").repartition(1)
    val got = LlmScore.scoreColumn(df, "text",
        new PoisonJudgeClient("poison"), Template,
        batchSize = 2, maxRetries = 2, backoffMs = 1L,
        onFailure = LlmScore.NullOutputs)
      .select("id", "llm_score").collect().sortBy(_.getLong(0))
    assert(got(0).isNullAt(1), "row sharing the poison batch gets NULL")
    assert(got(1).isNullAt(1), "poison row gets NULL")
    assert(!got(2).isNullAt(1))
    assert(!got(3).isNullAt(1))
  }

  test("scoreColumnDistinct: one client call per unique text, same results") {
    FakeJudge.reset()
    // 9 rows, 3 unique texts (plus a NULL)
    val df = ((1 to 9).map(i => (i.toLong, s"text-${i % 3}")) :+ (10L, null))
      .toDF("id", "text").repartition(1)
    val got = LlmScore.scoreColumnDistinct(df, "text", new FakeJudgeClient,
        Template, batchSize = 10)
      .select("id", "text", "llm_score").collect().sortBy(_.getLong(0))
    // exactly the 3 unique texts reached the client
    val calls = FakeJudge.batchSizes.toArray.toSeq.asInstanceOf[Seq[Int]]
    assert(calls.sum === 3, s"expected 3 judged texts, got $calls")
    // identical scores to the per-row operator, including the NULL row
    got.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2))
      else {
        val promptLen = Template.length - "{text}".length + r.getString(1).length
        assert(r.getDouble(2) === (promptLen % 101) / 10.0, r.getString(1))
      }
    }
  }

  test("filterByJudge keeps rows at or above the cut and drops NULL scores") {
    FakeJudge.reset()
    // prompt len = 11 + text len; judge score = (len % 101) / 10
    val df = Seq((1L, "d" * 9), (2L, "d" * 60), (3L, null))
      .toDF("id", "text").repartition(1)
    val kept = LlmScore.filterByJudge(df, "text", new FakeJudgeClient,
        Template, minScore = 5.0)
      .select("id").as[Long].collect().sorted
    // id 1 → len 20 → 2.0 (dropped); id 2 → len 71 → 7.1 (kept);
    // null text → NULL score (dropped)
    assert(kept.toSeq === Seq(2L))
    // helper columns are dropped from the output
    val cols = LlmScore.filterByJudge(df, "text", new FakeJudgeClient,
      Template, minScore = 0.0).columns.toSeq
    assert(cols === Seq("id", "text"))
  }
}
