package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.Feeds.FeedEntry

/** RSS/Atom feed parsing: writer-twin roundtrips, Atom link-rel
  * preference, HTML-stripped summaries, container unwrap, refusals.
  */
class FeedsSpec extends AnyFunSuite {

  test("RSS and Atom roundtrips through the writer twin") {
    val es = Seq(
      FeedEntry("First & Last", "https://e/a?x=1&y=2", "Tue, 3 Mar 2026", "sum one"),
      FeedEntry("Second <b>", "https://e/b", "2026-03-04T10:00:00Z", "sum two"))
    for (atom <- Seq(false, true)) {
      val got = Feeds.entries(Feeds.writeFeed(es, atom))
      assert(got != null && got.length == 2, s"atom=$atom")
      assert(got(0).title == "First & Last" && got(0).link == "https://e/a?x=1&y=2")
      assert(got(1).title == "Second <b>")
      assert(got(0).published == "Tue, 3 Mar 2026")
      assert(got(1).summary == "sum two")
    }
  }

  test("Atom prefers rel=alternate over self links") {
    val xml = """<feed xmlns="http://www.w3.org/2005/Atom"><entry>
      <title>T</title>
      <link rel="self" href="https://self.example/feed"/>
      <link rel="alternate" href="https://site.example/article"/>
      <updated>2026-01-01</updated><summary>s</summary>
      </entry></feed>"""
    val got = Feeds.entries(xml.getBytes)
    assert(got(0).link == "https://site.example/article")
    assert(got(0).published == "2026-01-01") // updated fallback
  }

  test("Atom type=xhtml content: nested markup is transparent, not dropped") {
    // blogger-era feeds wrap real XHTML elements inside <content> — the
    // nested <div>/<b> must not clear the field or flush a partial value
    val xml = """<feed xmlns="http://www.w3.org/2005/Atom"><entry>
      <title>T</title>
      <link rel="alternate" href="https://site.example/a"/>
      <published>2026-02-02</published>
      <content type="xhtml"><div xmlns="http://www.w3.org/1999/xhtml">
        Real <b>xhtml</b> body text.</div></content>
      </entry></feed>"""
    val got = Feeds.entries(xml.getBytes)
    assert(got != null && got.length == 1)
    assert(got(0).summary.contains("Real") &&
      got(0).summary.contains("xhtml") &&
      got(0).summary.contains("body text"), got(0).summary)
  }

  test("summaries strip embedded HTML") {
    val xml = """<rss version="2.0"><channel><item><title>T</title>
      <link>https://e/x</link>
      <description>&lt;p&gt;real &lt;b&gt;words&lt;/b&gt; here&lt;/p&gt;</description>
      </item></channel></rss>"""
    val got = Feeds.entries(xml.getBytes)
    assert(got != null && got(0).summary.contains("real"))
    assert(!got(0).summary.contains("<"))
  }

  test("FeedEntries expression unwraps compressed feeds") {
    val xml = Feeds.writeFeed(Seq(FeedEntry("T", "https://e/l", "d", "s")),
      atom = false)
    for (codec <- Seq("gzip", "zstd")) {
      val arr = graft.expressions.FeedEntries.compute(
        Compression.encode(xml, codec))
      assert(arr != null && arr.numElements() == 1, codec)
      assert(arr.getStruct(0, 4).getString(0) == "T", codec)
    }
  }

  test("refusals: non-feed XML, prose, malformed XML, null") {
    assert(Feeds.entries("<html><body>nope</body></html>".getBytes) == null)
    assert(Feeds.entries("plain prose".getBytes) == null)
    assert(Feeds.entries("<rss version=\"2.0\"><channel><item>".getBytes) == null)
    assert(Feeds.entries(null) == null)
    assert(graft.expressions.FeedEntries.compute(null) == null)
  }
}
