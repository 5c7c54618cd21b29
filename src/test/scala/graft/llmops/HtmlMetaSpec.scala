package graft.llmops

import graft.SparkTestBase
import graft.expressions.{HtmlMeta, UrlResolve}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class HtmlMetaSpec extends SparkTestBase {
  import spark.implicits._

  private def meta(html: String) = HtmlMeta.compute(UTF8String.fromString(html))
  private def resolve(base: String, ref: String): String = {
    val r = UrlResolve.compute(UTF8String.fromString(base),
      UTF8String.fromString(ref))
    if (r == null) null else r.toString
  }

  test("title, canonical, description, lang, robots from a writer page") {
    val page = new String(Html.writePage(Seq("body text here"),
      title = "My Title & More", canonical = "https://e.com/canon",
      description = "A <fine> page", robots = "noindex, nofollow",
      lang = "EN"), "UTF-8")
    val m = meta(page)
    assert(m.getUTF8String(0).toString === "My Title & More")
    assert(m.getUTF8String(1).toString === "https://e.com/canon")
    assert(m.getUTF8String(2).toString === "A <fine> page")
    assert(m.getUTF8String(3).toString === "en")
    assert(m.getBoolean(4) && m.getBoolean(5))
  }

  test("absent fields are NULL/false; first occurrence wins") {
    val m = meta("<html><head><title>One</title><title>Two</title>" +
      "</head><body><p>x</p></body></html>")
    assert(m.getUTF8String(0).toString === "One")
    assert(m.isNullAt(1) && m.isNullAt(2) && m.isNullAt(3))
    assert(!m.getBoolean(4) && !m.getBoolean(5))
  }

  test("attribute quoting variants and robots token discipline") {
    assert(meta("<link rel=canonical href=https://e.com/a>")
      .getUTF8String(1).toString === "https://e.com/a")
    assert(meta("<link rel='alternate canonical' href='/b'>")
      .getUTF8String(1).toString === "/b")
    // 'noindexx' is not a directive; NONE implies both
    val m1 = meta("<meta name=robots content='noindexx,follow'>")
    assert(!m1.getBoolean(4) && !m1.getBoolean(5))
    val m2 = meta("<meta name=ROBOTS content='NONE'>")
    assert(m2.getBoolean(4) && m2.getBoolean(5))
    // canonical inside a comment or script is opaque
    assert(meta("<!--<link rel=canonical href=/x>--><p>t</p>").isNullAt(1))
    assert(meta("<script>var s='<link rel=canonical href=/y>';</script><p>t</p>")
      .isNullAt(1))
  }

  test("not-markup refuses; markup without metadata does not") {
    assert(meta("just plain words, no tags") === null)
    assert(meta("<p>only a paragraph</p>") != null)
  }

  test("RFC 3986 reference resolution") {
    val base = "https://a.com/dir/page.html?q=1"
    assert(resolve(base, "https://other.org/x") === "https://other.org/x")
    assert(resolve(base, "//cdn.com/lib.js") === "https://cdn.com/lib.js")
    assert(resolve(base, "/root/x") === "https://a.com/root/x")
    assert(resolve(base, "sibling.html") === "https://a.com/dir/sibling.html")
    assert(resolve(base, "../up.html") === "https://a.com/up.html")
    assert(resolve(base, "./same.html") === "https://a.com/dir/same.html")
    assert(resolve(base, "a/../b/./c") === "https://a.com/dir/b/c")
    assert(resolve(base, "?k=2") === "https://a.com/dir/page.html?k=2")
    assert(resolve(base, "") === "https://a.com/dir/page.html?q=1")
    assert(resolve("https://a.com", "x.html") === "https://a.com/x.html")
    assert(resolve("not a url", "x.html") === null)
    assert(resolve("not a url", "https://abs.com/p") === "https://abs.com/p")
    // escaping the root clamps at the root, per the RFC algorithm
    assert(resolve("https://a.com/p", "../../up") === "https://a.com/up")
  }

  test("canonical-aware crawl keying collapses alias captures") {
    val U = UrlCuration
    val df = Seq(
      // same page captured at three URLs, all declaring one canonical
      (1L, "https://e.com/story?utm_source=tw",
        Html.writePage(Seq("body"), canonical = "/story")),
      (2L, "https://e.com/story?ref=rss&fbclid=x",
        Html.writePage(Seq("body"), canonical = "/story")),
      (3L, "https://E.COM:443/story",
        Html.writePage(Seq("body"))), // no canonical: capture URL key
      (4L, "https://e.com/other", Html.writePage(Seq("body")))
    ).toDF("id", "target_uri", "content")
    val keyed = df.withColumn("m", Html.metaCol(col("content")))
      .withColumn("url_key",
        U.canonicalUrlKey(col("target_uri"), col("m.canonical")))
    val keys = keyed.select("url_key").as[String].collect()
    assert(keys(0) === "https://e.com/story" && keys(1) === keys(0) &&
      keys(2) === keys(0))
    assert(keys(3) === "https://e.com/other")
  }
}
