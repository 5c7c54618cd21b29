package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FimSpec extends SparkTestBase {

  test("render: segments reassemble the document, sentinels in order") {
    val ss = spark
    import ss.implicits._
    val out = Seq(("k1", "0123456789"))
      .toDF("k", "c")
      .select(
        Fim.render(col("c"), lit(3L), lit(7L)).as("psm"),
        Fim.render(col("c"), lit(7L), lit(3L)).as("psm_swapped"),
        Fim.render(col("c"), lit(3L), lit(7L), spm = true).as("spm"))
      .collect()(0)
    assert(out.getString(0) ==
      "<fim_prefix>012<fim_suffix>789<fim_middle>3456")
    // unordered cuts normalize
    assert(out.getString(1) == out.getString(0))
    assert(out.getString(2) ==
      "<fim_suffix>789<fim_prefix>012<fim_middle>3456")
  }

  test("degenerate cuts: empty prefix/middle/suffix all well-formed") {
    val ss = spark
    import ss.implicits._
    val out = Seq(("k", "abc")).toDF("k", "c")
      .select(
        Fim.render(col("c"), lit(0L), lit(0L)).as("a"),
        Fim.render(col("c"), lit(0L), lit(3L)).as("b"),
        Fim.render(col("c"), lit(3L), lit(3L)).as("d"))
      .collect()(0)
    assert(out.getString(0) == "<fim_prefix><fim_suffix>abc<fim_middle>")
    assert(out.getString(1) == "<fim_prefix><fim_suffix><fim_middle>abc")
    assert(out.getString(2) == "<fim_prefix>abc<fim_suffix><fim_middle>")
  }

  test("transform: deterministic, cuts in range, reassembly identity") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, "def f():\n  return 42\n"), (2L, "x"), (3L, ""))
      .toDF("id", "content")
    val out = Fim.transform(df, "id", "content")
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getString(4)))
    rows.foreach { case (_, c, c1, c2, fim) =>
      assert(c1 >= 0 && c1 <= c2 && c2 <= c.length)
      // strip sentinels and reorder → original text
      val body = fim.stripPrefix("<fim_prefix>")
      val Array(p, rest) = body.split(java.util.regex.Pattern
        .quote("<fim_suffix>"), 2)
      val Array(s, m) = rest.split(java.util.regex.Pattern
        .quote("<fim_middle>"), 2)
      assert(p + m + s == c)
    }
    val again = Fim.transform(df, "id", "content").collect()
      .map(r => r.getString(4)).sorted
    assert(again.sameElements(rows.map(_._5).sorted))
  }
}
