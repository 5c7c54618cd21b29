package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class StackExchangeSpec extends SparkTestBase {

  import StackExchange.Post

  private val dump = StackExchange.formatPosts(Seq(
    Post(4L, 1, None, Some(7L), Some(756L), "How to convert?",
      "<p>I want to <b>convert</b> a thing.</p>", Seq("c#", "floating-point")),
    Post(7L, 2, Some(4L), None, Some(523L), null,
      "<p>Use the <code>Convert</code> class &amp; be happy.</p>", Nil),
    Post(9L, 2, Some(4L), None, Some(12L), null, "<p>Worse answer</p>", Nil)))

  test("parseAttrs: order, quoting and escape tolerance") {
    val a = StackExchange.parseAttrs(
      """<row Body='x &lt;y&gt; &amp; z' Id="3"  Score = "7" />""")
    assert(a("Id") == "3" && a("Score") == "7")
    assert(a("Body") == "x <y> & z")
    assert(StackExchange.parseAttrs("<posts>").isEmpty)
  }

  test("unescapeXml: named, decimal and hex entities") {
    assert(StackExchange.unescapeXml("&lt;a&gt;&amp;&quot;&apos;") ==
      "<a>&\"'")
    assert(StackExchange.unescapeXml("&#65;&#x42;") == "AB")
    assert(StackExchange.unescapeXml("no entities") == "no entities")
    assert(StackExchange.unescapeXml("&bogus; &#xZZ;") == "&bogus; &#xZZ;")
  }

  test("posts(): explode with html-stripped bodies and parsed tags") {
    val ss = spark
    import ss.implicits._
    val out = StackExchange.posts(
      Seq((1L, dump)).toDF("id", "xml"), "id", "xml")
      .orderBy("post_id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(1) == 4L && out(0).getInt(2) == 1)
    assert(out(0).getString(7) == "I want to convert a thing.")
    assert(out(0).getSeq[String](8) == Seq("c#", "floating-point"))
    assert(out(1).getString(7) == "Use the Convert class & be happy.")
    assert(out(1).getLong(3) == 4L) // ParentId
  }

  test("qaPairs: question meets its accepted answer only") {
    val ss = spark
    import ss.implicits._
    val posts = StackExchange.posts(
      Seq((1L, dump)).toDF("id", "xml"), "id", "xml")
    val out = StackExchange.qaPairs(posts, "id").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 4L && r.getString(2) == "How to convert?")
    assert(r.getString(4) == "Use the Convert class & be happy.")
    assert(r.getLong(5) == 523L)
  }

  test("malformed rows vanish; cross-document ids never pair") {
    val ss = spark
    import ss.implicits._
    val d1 = StackExchange.formatPosts(Seq(
      Post(1L, 1, None, Some(2L), None, "Q", "<p>q</p>", Nil)))
    val d2 = StackExchange.formatPosts(Seq(
      Post(2L, 2, Some(1L), None, Some(5L), null, "<p>other dump</p>", Nil)))
    val posts = StackExchange.posts(
      Seq((1L, d1), (2L, d2), (3L, "<row NoId='x' />"), (4L, null: String))
        .toDF("id", "xml"), "id", "xml")
    assert(posts.count() == 2)
    assert(StackExchange.qaPairs(posts, "id").count() == 0)
  }
}
