package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NotebooksSpec extends SparkTestBase {

  private val nb = Notebooks.formatNotebook(Seq(
    "markdown" -> "# Title\nsome prose",
    "code" -> "x = 1\nprint(x)",
    "code" -> "y = 2"))

  test("writer twin roundtrips through cells(): order, types, text") {
    val ss = spark
    import ss.implicits._
    val out = Notebooks.cells(Seq((7L, nb)).toDF("id", "nb"), "id", "nb")
      .orderBy("cell_idx").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.length == 3)
    assert(out(0) == ((0L, "markdown", "# Title\nsome prose")))
    assert(out(1) == ((1L, "code", "x = 1\nprint(x)")))
    assert(out(2) == ((2L, "code", "y = 2")))
  }

  test("string-form source (non-canonical but common) also parses") {
    val ss = spark
    import ss.implicits._
    val j =
      """{"nbformat":4,"cells":[{"cell_type":"code","source":"a = 1"}]}"""
    val out = Notebooks.cells(Seq((1L, j)).toDF("id", "nb"), "id", "nb")
      .collect()
    assert(out.length == 1 && out(0).getString(3) == "a = 1")
  }

  test("script() joins code cells only, in notebook order") {
    val ss = spark
    import ss.implicits._
    val out = Notebooks.script(Seq((7L, nb)).toDF("id", "nb"), "id", "nb")
      .collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "x = 1\nprint(x)\n\ny = 2")
  }

  test("language resolves language_info first, kernelspec fallback") {
    val ss = spark
    import ss.implicits._
    val noInfo =
      """{"nbformat":4,"metadata":{"kernelspec":{"name":"ir","language":"R"}},"cells":[]}"""
    val out = Seq((1L, nb), (2L, noInfo), (3L, "not json"))
      .toDF("id", "nb")
      .select(col("id"), Notebooks.language(col("nb")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "python")
    assert(out(2L) == "R")
    assert(out(3L) == null)
  }

  test("malformed JSON and missing cells yield zero rows, not errors") {
    val ss = spark
    import ss.implicits._
    val out = Notebooks.cells(
      Seq((1L, "{broken"), (2L, """{"nbformat":4}"""),
        (3L, null: String)).toDF("id", "nb"), "id", "nb").collect()
    assert(out.isEmpty)
  }

  test("escapes survive: quotes, tabs, unicode in cell text") {
    val ss = spark
    import ss.implicits._
    val text = "s = \"q\\\"uote\"\n\tprint('é')"
    val j = Notebooks.formatNotebook(Seq("code" -> text))
    val out = Notebooks.cells(Seq((1L, j)).toDF("id", "nb"), "id", "nb")
      .collect()
    assert(out(0).getString(3) == text)
  }
}
