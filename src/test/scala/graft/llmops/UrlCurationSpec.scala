package graft.llmops

import graft.SparkTestBase
import graft.expressions.{UrlBlocked, UrlDomain, UrlHost, UrlNormalize}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class UrlCurationSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(u: String): String = {
    val r = UrlNormalize.compute(UTF8String.fromString(u))
    if (r == null) null else r.toString
  }
  private def host(u: String): String = {
    val r = UrlHost.compute(UTF8String.fromString(u))
    if (r == null) null else r.toString
  }
  private def domain(u: String): String = {
    val r = UrlDomain.compute(UTF8String.fromString(u))
    if (r == null) null else r.toString
  }

  test("resolve: RFC 3986 edges — query dot-segments, non-hier schemes") {
    def res(base: String, ref: String): String = {
      val r = graft.expressions.UrlResolve.compute(
        UTF8String.fromString(base), UTF8String.fromString(ref))
      if (r == null) null else r.toString
    }
    // remove_dot_segments applies to the PATH only: '/../' inside a
    // query must survive (redirect/return-URL params carry them)
    assert(res("http://h/p/", "x?y=a/../b") === "http://h/p/x?y=a/../b")
    assert(res("http://h/p/q", "/r/s?u=./v") === "http://h/r/s?u=./v")
    assert(res("http://h/a/b/c", "../d?x=1#f") === "http://h/a/d?x=1#f")
    // any scheme: ref is ABSOLUTE — mailto:/tel:/javascript: hrefs must
    // pass through, never merge into the base path
    assert(res("http://ex.com/dir/page", "mailto:a@b.com") === "mailto:a@b.com")
    assert(res("http://ex.com/dir/page", "javascript:void(0)") === "javascript:void(0)")
    assert(res("http://ex.com/dir/page", "tel:+15551234") === "tel:+15551234")
    // but a ':' later in a genuinely relative path is still relative
    assert(res("http://ex.com/dir/", "0:30/clip") === "http://ex.com/dir/0:30/clip")
    assert(res("http://ex.com/a/", "sub/page") === "http://ex.com/a/sub/page")
  }

  test("normalize/host: IPv6 literal hosts get port stripping") {
    assert(norm("https://[2001:db8::1]:443/x") === "https://[2001:db8::1]/x")
    assert(norm("http://[2001:db8::1]:80/x") === "http://[2001:db8::1]/x")
    assert(norm("https://[2001:db8::1]:8443/x") === "https://[2001:db8::1]:8443/x")
    assert(norm("https://[2001:db8::1]/x") === "https://[2001:db8::1]/x")
    assert(host("https://[2001:db8::1]:443/x") === "[2001:db8::1]")
    // malformed bracket forms refuse rather than mis-parse
    assert(norm("https://[2001:db8::1/x") === null)
    assert(norm("https://[2001:db8::1]8080/x") === null)
  }

  test("normalize: surviving query params sort in UTF-8 byte order") {
    // U+10000 (surrogate pair, UTF-16 units 0xD800...) sorts BEFORE
    // U+FFFD in UTF-16 but AFTER in UTF-8 bytes (0xF0 > 0xEF) — the
    // canonical key must match a bytewise-collating SQL engine
    val supp = new String(Character.toChars(0x10000))
    val got = norm(s"http://h/p?k=�&k=$supp")
    assert(got === s"http://h/p?k=�&k=$supp",
      "UTF-8 bytewise order puts the supplementary char last")
  }

  test("normalize: case, default ports, fragments, empty path") {
    assert(norm("HTTPS://WWW.Example.COM:443/Path/X#frag") ===
      "https://www.example.com/Path/X")
    assert(norm("http://Example.com:80") === "http://example.com/")
    assert(norm("http://example.com:443/x") === "http://example.com:443/x")
    assert(norm("https://example.com:8443/x") === "https://example.com:8443/x")
    assert(norm("ftp://Files.Example.com/pub") === "ftp://files.example.com/pub")
    // path case is NOT touched (paths are case-sensitive by spec)
    assert(norm("https://e.com/CaseSensitive") === "https://e.com/CaseSensitive")
  }

  test("normalize: tracking params dropped, survivors sorted, userinfo kept") {
    assert(norm("https://e.com/p?utm_source=x&b=2&a=1&gclid=abc") ===
      "https://e.com/p?a=1&b=2")
    assert(norm("https://e.com/p?UTM_Campaign=y&FBCLID=z&msclkid=q") ===
      "https://e.com/p")
    assert(norm("https://e.com/p?z=1&y&x=3") === "https://e.com/p?x=3&y&z=1")
    assert(norm("https://e.com/p?b=2&b=1") === "https://e.com/p?b=1&b=2")
    assert(norm("https://User:Pw@Host.COM/x") === "https://User:Pw@host.com/x")
    // same page, four namings, ONE canonical key
    val variants = Seq(
      "https://E.com/p?b=2&a=1",
      "HTTPS://e.COM:443/p?a=1&b=2#top",
      "https://e.com/p?utm_medium=m&b=2&a=1",
      "https://e.com/p?a=1&utm_source=s&b=2")
    assert(variants.map(norm).distinct.size === 1)
  }

  test("normalize/host/domain refuse not-a-URL text") {
    for (bad <- Seq("no scheme here", "://host/x", "http//e.com",
        "ht tp://e.com", "https://", "https:///path"))
      assert(norm(bad) === null, bad)
    assert(host("plain words") === null)
    assert(domain("plain words") === null)
  }

  test("host and registrable domain") {
    assert(host("https://User@WWW.Shop.Example.COM:8443/x") ===
      "www.shop.example.com")
    assert(domain("https://a.b.example.com/x") === "example.com")
    assert(domain("https://shop.example.co.uk/x") === "example.co.uk")
    assert(domain("https://example.com/") === "example.com")
    assert(domain("http://localhost:8080/") === "localhost")
    assert(domain("http://10.1.2.3/x") === "10.1.2.3")
    assert(domain("https://deep.a.b.c.site.org/") === "site.org")
  }

  test("blocklist: label-aligned suffix semantics, NULL on parse refusal") {
    val set = new java.util.HashSet[String]()
    Seq("example.com", "ads.tracker.net").foreach(set.add)
    assert(UrlBlocked.anySuffix("example.com", set))
    assert(UrlBlocked.anySuffix("a.b.example.com", set))
    assert(!UrlBlocked.anySuffix("notexample.com", set)) // string suffix, wrong label
    assert(!UrlBlocked.anySuffix("example.com.evil.org", set))
    assert(UrlBlocked.anySuffix("x.ads.tracker.net", set))
    assert(!UrlBlocked.anySuffix("tracker.net", set)) // parent of an entry: clean
  }

  test("screen and filter forms over a frame; malformed URLs are kept") {
    val df = Seq(
      (1L, "https://a.bad.com/x"),
      (2L, "https://good.org/y"),
      (3L, "not a url"),
      (4L, "https://BAD.com:443/z?utm_source=s")).toDF("doc_id", "url")
    val blocked = Set("bad.com")
    val screened = UrlCuration.blocklistScreen(df, "url", blocked)
      .orderBy("doc_id").collect()
    assert(screened.map(r => Option(r.getAs[Any]("url_blocked"))) ===
      Array(Some(true), Some(false), None, Some(true)))
    val kept = UrlCuration.blocklistFilter(df, "url", blocked)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L, 3L)) // malformed row 3 survives the filter
    // DataFrame-blocklist overload agrees
    val bldf = Seq("BAD.com").toDF("domain")
    assert(UrlCuration.blocklistFilter(df, "url", bldf)
      .select("doc_id").as[Long].collect().sorted === Array(2L, 3L))
  }

  test("blocklist size gate: big lists flip to the shuffled suffix join") {
    val df = Seq(
      (1L, "https://a.bad.com/x"),   // subdomain of a listed domain
      (2L, "https://good.org/y"),
      (3L, "not a url"),             // unparseable: kept on both paths
      (4L, "https://BAD.com:443/z"), // case/port variants canonicalize
      (5L, "https://alsobad.net/q"),
      (6L, "https://notbad.com.evil.io/r")).toDF("doc_id", "url")
    val list = Seq("BAD.com", "alsobad.net", "evil.io").toDF("domain")
    val collected = UrlCuration.blocklistFilter(df, "url", list)
      .select("doc_id").as[Long].collect().sorted
    // maxCollectEntries = 0 forces the join path on the same inputs
    val joined = UrlCuration.blocklistFilter(df, "url", list,
      maxCollectEntries = 0L)
      .select("doc_id").as[Long].collect().sorted
    assert(collected === Array(2L, 3L))
    assert(joined === collected)
    // the join path survives widths the collected set must refuse
    assert(UrlCuration.MaxBlocklistEntries >= 5000000,
      "collect bound must admit UT1-class lists (4-5M domains)")
    assert(UrlCuration.MaxCollectBlocklistEntries <=
      UrlCuration.MaxBlocklistEntries.toLong)
  }

  test("host suffixes explode on label boundaries; null for not-a-URL") {
    val rows = Seq(("https://a.b.C.org/x", 1), ("nope", 2))
      .toDF("url", "id")
      .select(col("id"), UrlCuration.hostSuffixes(col("url")).as("sfx"))
      .orderBy("id").collect()
    assert(rows(0).getAs[Seq[String]]("sfx") ===
      Seq("a.b.c.org", "b.c.org", "c.org", "org"))
    assert(rows(1).isNullAt(rows(1).fieldIndex("sfx")))
  }

  test("canonicalization collapses crawl revisits to one URL key") {
    val df = Seq(
      (1L, "https://E.com/page?b=2&a=1"),
      (2L, "HTTPS://e.COM:443/page?a=1&b=2#sec"),
      (3L, "https://e.com/page?utm_source=tw&a=1&b=2"),
      (4L, "https://e.com/other")).toDF("doc_id", "url")
    val canon = df.withColumn("curl", UrlCuration.urlNormalize(col("url")))
    assert(canon.select("curl").distinct().count() === 2)
  }

  test("sitemap parsing: urlset, index, text list, gzip, refusals") {
    import graft.expressions.SitemapUrls
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.finish(); bos.toByteArray
    }
    val urlset = ("""<?xml version="1.0" encoding="UTF-8"?>""" +
      """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""" +
      "<url><loc>https://e.com/a</loc><lastmod>2026-01-02</lastmod></url>" +
      "<url><loc> https://e.com/b </loc></url>" +
      "<url><lastmod>2026-01-03</lastmod></url>" + // no loc: skipped
      "</urlset>").getBytes("UTF-8")
    val got = SitemapUrls.compute(urlset)
    assert(got != null && got.numElements() === 2)
    val r0 = got.getStruct(0, 3)
    assert(r0.getUTF8String(0).toString === "url")
    assert(r0.getUTF8String(1).toString === "https://e.com/a")
    assert(r0.getUTF8String(2).toString === "2026-01-02")
    assert(got.getStruct(1, 3).isNullAt(2)) // absent lastmod
    // gzipped variant parses identically
    val gzGot = SitemapUrls.compute(gz(urlset))
    assert(gzGot != null && gzGot.numElements() === 2)
    // sitemap index
    val index = ("<sitemapindex><sitemap><loc>https://e.com/s1.xml</loc>" +
      "</sitemap><sitemap><loc>https://e.com/s2.xml.gz</loc>" +
      "<lastmod>2026-02-01</lastmod></sitemap></sitemapindex>").getBytes
    val idx = SitemapUrls.compute(index)
    assert(idx.numElements() === 2)
    assert(idx.getStruct(0, 3).getUTF8String(0).toString === "sitemap")
    // text list
    val txt = "https://e.com/x\nhttps://e.com/y\n\n".getBytes
    assert(SitemapUrls.compute(txt).numElements() === 2)
    // image-sitemap extension: the nested <image:loc> shares the LOCAL
    // name "loc" and must not overwrite the page URL
    val withImage = ("<urlset xmlns:image=\"http://www.google.com/schemas/sitemap-image/1.1\">" +
      "<url><loc>https://e.com/page</loc>" +
      "<image:image><image:loc>https://e.com/img.png</image:loc>" +
      "<image:caption>pic</image:caption></image:image></url>" +
      "</urlset>").getBytes
    val wi = SitemapUrls.compute(withImage)
    assert(wi != null && wi.numElements() === 1)
    assert(wi.getStruct(0, 3).getUTF8String(1).toString === "https://e.com/page")
    // refusals: foreign XML root, junk text line, non-sitemap bytes
    assert(SitemapUrls.compute("<html><body/></html>".getBytes) === null)
    assert(SitemapUrls.compute("https://e.com/x\nnot a url".getBytes) === null)
    assert(SitemapUrls.compute("just words".getBytes) === null)
    assert(SitemapUrls.compute("<urlset><url><loc>x".getBytes) === null)
    assert(SitemapUrls.compute(null) === null)
  }
}
