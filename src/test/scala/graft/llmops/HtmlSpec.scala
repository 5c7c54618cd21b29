package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Main-content extraction: writer-twin round trips, the individual
  * boilerplate rules (container subtrees, link density, word count), and
  * the no-throw posture on malformed markup.
  */
class HtmlSpec extends SparkTestBase {
  import spark.implicits._

  test("writer-twin round trip: main paragraphs survive, boilerplate does not") {
    val paras = Seq(
      "The first real paragraph of the article with plenty of words.",
      "A second paragraph that also carries actual content & an ampersand.")
    val html = new String(Html.writePage(paras, "My <Title>"), "UTF-8")
    val got = Html.mainContent(html)
    assert(got === paras.mkString("\n"))
    // flat strip (the old path) WOULD have leaked boilerplate — prove the
    // difference is real
    val flat = DocumentText.htmlToText(html)
    assert(flat.contains("Home") && flat.contains("Example Site"))
    assert(!got.contains("Home") && !got.contains("Example Site"))
    assert(!got.contains("newsletter") && !got.contains("Advertisement"))
  }

  test("nav/header/footer/aside/head subtrees drop even with nesting") {
    val html = "<html><head><title>T</title></head><body>" +
      "<nav><div><p>Deeply <b>nested</b> menu text here</p></div></nav>" +
      "<p>Real content paragraph with enough words here.</p>" +
      "<footer><div><p>Footer text inside a nested div block</p></div></footer>" +
      "</body></html>"
    assert(Html.mainContent(html) ===
      "Real content paragraph with enough words here.")
  }

  test("link density rule: link farms drop, prose with a few links survives") {
    val farm = "<div><a href=\"/1\">Read this awesome story now</a> " +
      "<a href=\"/2\">And also this other one too</a></div>"
    val prose = "<p>A sentence that merely <a href=\"/x\">mentions a link</a> " +
      "inside much longer surrounding prose text.</p>"
    val got = Html.mainContent(s"<body>$farm$prose</body>")
    assert(!got.contains("awesome"))
    assert(got.contains("mentions a link"))
  }

  test("card link farms (<a> wrapping block content) still count as links") {
    // HTML5-legal anchor around a div — the dominant modern link-farm
    // markup; the density rule must survive the block boundary inside <a>
    val cards = "<a href=\"/s1\"><div>Ten more stories you should definitely read right now</div></a>" +
      "<a href=\"/s2\"><div>Another teaser card with plenty of words inside it</div></a>"
    val prose = "<p>The actual article body sits here with real sentences to keep.</p>"
    val got = Html.mainContent(s"<body>$cards$prose</body>")
    assert(!got.contains("teaser") && !got.contains("Ten more stories"))
    assert(got === "The actual article body sits here with real sentences to keep.")
  }

  test("self-closing <a/> anchors do not poison following prose") {
    val html = "<p>See <a id=\"fn1\"/> this long informative paragraph of genuine article prose.</p>"
    val got = Html.mainContent(html)
    assert(got.contains("genuine article prose"))
  }

  test("word-count rule: one-word crumbs drop at the default threshold") {
    val html = "<p>Ok</p><p>This paragraph has plenty of words to keep.</p>"
    assert(Html.mainContent(html) ===
      "This paragraph has plenty of words to keep.")
    // but a lower threshold keeps them
    assert(Html.mainContent(html, minWords = 1).startsWith("Ok\n"))
  }

  test("malformed markup degrades to text, never throws") {
    Seq("<p>unclosed", "<<<>>>", "<a<b<c", "&#xZZ; &unknown; text",
      "<nav>never closed <p>rest of page",
      "<script>while(1) { '</div>' }", "").foreach { bad =>
      Html.mainContent(bad) // no throw is the contract
    }
    // unclosed nav swallows the rest: fail-safe toward dropping boilerplate
    assert(Html.mainContent("<nav>menu <p>text") === "")
  }

  test("native expression over binary and string columns + SQL registration") {
    graft.GraftFunctions.register(spark)
    val paras = Seq("Column level extraction works with enough words.")
    val df = Seq((1L, Html.writePage(paras))).toDF("id", "content")
    val got = df.select(Html.mainContentCol(col("content")).alias("t"))
      .head().getString(0)
    assert(got === paras.head)
    val viaSql = spark.sql(
      s"SELECT graft_html_main('<body><p>short</p><p>five words of real text</p></body>') AS t")
      .head().getString(0)
    assert(viaSql === "five words of real text")
    // no RDD node: the expression runs in the scan projection
    val plan = df.select(Html.mainContentCol(col("content")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") || plan.contains("LocalTableScan"),
      s"expected projection-local execution:\n$plan")
  }
}
