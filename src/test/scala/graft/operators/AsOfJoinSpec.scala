package graft.operators

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("backward as-of: latest right row at or before each left row per key") {
    val trades = Seq(
      (1, 10L, 100.0), (1, 25L, 101.0), (1, 5L, 99.0),
      (2, 50L, 200.0)).toDF("k", "ts", "px")
    val quotes = Seq(
      (1, 10L, 9.9), (1, 20L, 10.1), (2, 60L, 20.0)).toDF("k", "ts", "bid")

    val got = AsOfJoin.backward(trades, quotes, Seq("k"), "ts", Map("bid" -> "last_bid"))
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getDouble(3)))

    assert(got.toSeq === Seq(
      (1, 5L, null),      // no quote at or before ts=5
      (1, 10L, 9.9),      // tie: quote at exactly ts=10 counts (>= semantics)
      (1, 25L, 10.1),     // latest of the two prior quotes
      (2, 50L, null)))    // key 2's only quote is later
  }

  test("null values in the matched right row carry as null (struct-atomic)") {
    // quotes: ts=10 has bid=5.0/ask=1.0; ts=20 (the match for trades ≥20)
    // has bid=NULL/ask=2.0 — a per-column carry would resurrect bid=5.0
    // from ts=10; ASOF semantics require the matched row verbatim
    val trades = Seq((1, 25L, 100.0)).toDF("k", "ts", "px")
    val quotes = Seq(
      (1, 10L, Option(5.0), Option(1.0)),
      (1, 20L, None: Option[Double], Option(2.0))
    ).toDF("k", "ts", "bid", "ask")

    val got = AsOfJoin.backward(trades, quotes, Seq("k"), "ts",
        Map("bid" -> "last_bid", "ask" -> "last_ask"))
      .collect().head
    assert(got.isNullAt(got.fieldIndex("last_bid")),
      "null in the matched row must not be replaced by an older row's value")
    assert(got.getDouble(got.fieldIndex("last_ask")) === 2.0)
  }

  test("all carried columns come from the same matched right row") {
    val trades = Seq((1, 30L, 1.0)).toDF("k", "ts", "px")
    val quotes = Seq(
      (1, 10L, Option(11.0), None: Option[Double]),
      (1, 20L, None: Option[Double], Option(22.0))
    ).toDF("k", "ts", "a", "b")
    val got = AsOfJoin.backward(trades, quotes, Seq("k"), "ts",
        Map("a" -> "ca", "b" -> "cb")).collect().head
    // matched row is ts=20: a=null, b=22 — NOT (a=11 from ts=10, b=22)
    assert(got.isNullAt(got.fieldIndex("ca")))
    assert(got.getDouble(got.fieldIndex("cb")) === 22.0)
  }

  test("forward as-of: earliest right row at or after each left row per key") {
    val trades = Seq(
      (1, 10L, 100.0), (1, 25L, 101.0), (1, 5L, 99.0),
      (2, 50L, 200.0)).toDF("k", "ts", "px")
    val quotes = Seq(
      (1, 10L, 9.9), (1, 20L, 10.1), (2, 40L, 20.0)).toDF("k", "ts", "bid")

    val got = AsOfJoin.forward(trades, quotes, Seq("k"), "ts", Map("bid" -> "next_bid"))
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getDouble(3)))

    assert(got.toSeq === Seq(
      (1, 5L, 9.9),       // earliest at or after 5 is ts=10
      (1, 10L, 9.9),      // tie: quote at exactly ts=10 counts (<= semantics)
      (1, 25L, null),     // nothing after ts=25 for key 1
      (2, 50L, null)))    // key 2's only quote is earlier
  }

  test("nearest as-of: closest either side, equidistant resolves backward") {
    val probes = Seq(
      (1, 15L), // backward 10 (d=5) vs forward 30 (d=15) → 10
      (1, 28L), // backward 10 (d=18) vs forward 30 (d=2) → 30
      (1, 20L), // equidistant 10/30 (d=10) → backward 10
      (2, 7L)   // only forward exists → 100
    ).toDF("k", "ts")
    val refs = Seq((1, 10L, "a"), (1, 30L, "b"), (2, 100L, "c")).toDF("k", "ts", "tag")

    val got = AsOfJoin.nearest(probes, refs, Seq("k"), "ts", Map("tag" -> "near_tag"))
      .orderBy("k", "ts").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (1, 15L, "a"), (1, 20L, "a"), (1, 28L, "b"), (2, 7L, "c")))
  }

  test("as-of join plan is one keyed shuffle, not a range join") {
    val left = (1 to 100).map(i => (i % 5, i.toLong, i * 1.0)).toDF("k", "ts", "v")
    val right = (1 to 50).map(i => (i % 5, i * 2L, i * 0.1)).toDF("k", "ts", "q")
    val df = AsOfJoin.backward(left, right, Seq("k"), "ts", Map("q" -> "last_q"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of must not degrade to a product join:\n$plan")
  }
}
