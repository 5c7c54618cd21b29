package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("points match every containing interval, inclusive bounds, keyed") {
    val points = Seq((1, 5L), (1, 10L), (1, 64L), (2, 5L)).toDF("k", "p")
    val ivs = Seq(
      (1, 0L, 10L, "a"),   // contains 5 and 10 (inclusive end)
      (1, 10L, 70L, "b"),  // contains 10 and 64 — spans a bin boundary
      (2, 6L, 9L, "c")     // contains nothing of key 2's points
    ).toDF("k", "s", "e", "tag")

    val got = RangeJoin.pointInInterval(points, "p", ivs, "s", "e",
        keys = Seq("k"), binWidth = 16)
      .select("k", "p", "tag").orderBy("k", "p", "tag").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (1, 5L, "a"), (1, 10L, "a"), (1, 10L, "b"), (1, 64L, "b")))
  }

  test("each (point, interval) pair appears exactly once despite multi-bin intervals") {
    val points = Seq((1, 50L)).toDF("k", "p")
    // interval spans 8 bins at binWidth 16; the pair must still match once
    val ivs = Seq((1, 0L, 127L, "wide")).toDF("k", "s", "e", "tag")
    val got = RangeJoin.pointInInterval(points, "p", ivs, "s", "e",
      keys = Seq("k"), binWidth = 16)
    assert(got.count() === 1)
  }

  test("plan is an equi-join on the bin key, never BroadcastNestedLoop") {
    val points = (1 to 500).map(i => (i % 7, i.toLong)).toDF("k", "p")
    val ivs = (1 to 200).map(i => (i % 7, i * 3L, i * 3L + 40L)).toDF("k", "s", "e")
    val df = RangeJoin.pointInInterval(points, "p", ivs, "s", "e",
      keys = Seq("k"), binWidth = 64)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join must stay hash-partitionable:\n$plan")
  }
}
