package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkTestBase {

  private def scored = {
    val ss = spark
    import ss.implicits._
    Seq(
      ("p1", "weak answer", 1.0),
      ("p1", "good answer", 5.0),
      ("p1", "mid answer", 3.0),
      ("p2", "only answer", 4.0),          // single response → dropped
      ("p3", "tie a", 2.0), ("p3", "tie b", 2.0), // all tied scores
      ("p4", "same", 1.0), ("p4", "same", 1.0))   // identical → dropped
      .toDF("prompt", "response", "score")
  }

  test("best and worst pair up; singles and degenerate groups drop") {
    val pairs = Preference.pairFromScores(scored, "prompt", "response",
      "score").collect().map(r => (r.getString(0), r.getString(1),
      r.getDouble(2), r.getString(3), r.getDouble(4), r.getLong(5)))
      .sortBy(_._1)
    assert(pairs.map(_._1).toSeq == Seq("p1", "p3"))
    val p1 = pairs(0)
    assert(p1 == ("p1", "good answer", 5.0, "weak answer", 1.0, 3L))
    // tied scores break deterministically on the response string
    val p3 = pairs(1)
    assert(p3 == ("p3", "tie b", 2.0, "tie a", 2.0, 2L))
  }

  test("margin filter removes near-ties") {
    val pairs = Preference.pairFromScores(scored, "prompt", "response",
      "score")
    assert(Preference.withMargin(pairs, 1.0).count() == 1) // p3 gap = 0
    assert(Preference.withMargin(pairs, 5.0).count() == 0)
  }

  test("rendered pairs carry both ChatML branches") {
    val r = Preference.rendered(
      Preference.pairFromScores(scored, "prompt", "response", "score")
        .filter(col("prompt") === "p1"), "prompt").head
    val chosen = r.getAs[String]("chosen_text")
    val rejected = r.getAs[String]("rejected_text")
    assert(chosen ==
      "<|im_start|>user\np1\n<|im_end|>\n" +
      "<|im_start|>assistant\ngood answer\n<|im_end|>\n")
    assert(rejected.contains("weak answer") && !rejected.contains("good"))
  }

  test("aggregation is a single shuffle with partial aggregation") {
    val plan = Preference.pairFromScores(scored, "prompt", "response",
      "score").queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan) // map-side combine present
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }
}
