package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.WikiDump.WikiPage

/** MediaWiki dump parsing + wikitext cleaning: golden cleaning cases,
  * dump roundtrips (plain and bz2-wrapped), redirects, page-level vs
  * revision-level ids, refusal tiers.
  */
class WikiDumpSpec extends AnyFunSuite {

  private def clean(s: String): String = WikiDump.wikitextToPlain(s)

  test("wikitext golden: links, templates, quotes, headings, lists") {
    assert(clean("'''Bold''' and ''italic'' text") == "Bold and italic text")
    assert(clean("See [[Target Page]] now") == "See Target Page now")
    assert(clean("See [[Target|the label]] now") == "See the label now")
    assert(clean("[[File:Pic.png|thumb|A [[linked]] caption]]rest") == "rest")
    assert(clean("[[Category:Things]]Body") == "Body")
    assert(clean("A {{Infobox|a=1|b={{nested|x}}}} B") == "A B")
    assert(clean("== Heading ==\nBody line") == "Heading\nBody line")
    assert(clean("* item one\n# item two\n: indent") ==
      "item one\nitem two\nindent")
    assert(clean("Pre {| class=\"wikitable\"\n|-\n| cell\n|} Post") ==
      "Pre  Post".replaceAll(" +", " "))
    assert(clean("X<ref name=\"a\">cite</ref> Y<ref group=g/> Z") == "X Y Z")
    assert(clean("External [https://x.example label text] here") ==
      "External label text here")
    assert(clean("Bare [https://x.example] here") == "Bare here")
    assert(clean("A &amp; B &lt;tag&gt; &#65;&#x42;") == "A & B <tag> AB")
    assert(clean("__TOC__\nReal content") == "Real content")
    assert(clean("<!-- hidden -->shown<!-- also\nhidden -->") == "shown")
    assert(clean("a<math>\\frac{1}{2}</math>b <nowiki>[[x]]</nowiki>c") ==
      "ab c")
  }

  test("list articles with tens of thousands of links resolve fully in linear time") {
    // the old innermost-first rescan capped at 1000 iterations and was
    // O(n^2); the bracket-stack pass must clear every link
    val n = 30000
    val src = (1 to n).map(i => s"* [[Page $i|label $i]]").mkString("\n")
    val t0 = System.nanoTime()
    val out = clean(src)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(!out.contains("[[") && !out.contains("]]"))
    assert(out.linesIterator.size == n)
    assert(out.startsWith("label 1\n") && out.endsWith(s"label $n"))
    assert(ms < 5000, s"resolveWikiLinks took ${ms}ms — not linear")
    // unmatched opener stays literal
    assert(clean("dangling [[open here") == "dangling [[open here")
  }

  test("redirect detection from attribute and from #REDIRECT body") {
    assert(WikiDump.redirectTarget("#REDIRECT [[Main Page]]") == "Main Page")
    assert(WikiDump.redirectTarget("#redirect [[A|b]] {{R from move}}") == "A")
    assert(WikiDump.redirectTarget("Just text [[link]]") == null)
  }

  test("dump roundtrip: plain XML and bz2-wrapped") {
    val ps = Seq(
      WikiPage("Alpha", 0, 1L, null, "'''Alpha''' is a [[letter]]."),
      WikiPage("Beta & Co <x>", 4, 2L, null, "Body with &amp; entity"),
      WikiPage("Old Name", 0, 3L, "New Name", "#REDIRECT [[New Name]]"))
    for (codec <- Seq(None, Some("bzip2"), Some("zstd"))) {
      val dump = WikiDump.writeDump(ps, codec)
      val bytes = codec match {
        case Some(_) => Compression.decodeAuto(dump)
        case None => dump
      }
      val back = WikiDump.pages(bytes)
      assert(back != null && back.length == 3, s"codec=$codec")
      assert(back(0).title == "Alpha" && back(0).pageId == 1L)
      assert(back(1).title == "Beta & Co <x>" && back(1).ns == 4)
      assert(back(2).redirect == "New Name")
      assert(back(0).text.contains("[[letter]]"))
    }
  }

  test("page-level id wins over revision/contributor ids") {
    val xml = """<mediawiki><page><title>T</title><ns>0</ns><id>77</id>
      <revision><id>999</id><contributor><id>555</id></contributor>
      <text>body</text></revision></page></mediawiki>"""
    val ps = WikiDump.pages(xml.getBytes)
    assert(ps != null && ps.length == 1 && ps(0).pageId == 77L)
    assert(ps(0).text == "body")
  }

  test("WikiPages expression computes plain text and redirects") {
    val ps = Seq(
      WikiPage("A", 0, 1L, null, "== H ==\n'''A''' body [[x|label]]"),
      WikiPage("R", 0, 2L, null, "#REDIRECT [[A]]"))
    val dump = WikiDump.writeDump(ps, Some("bzip2"))
    val arr = graft.expressions.WikiPages.compute(dump)
    assert(arr != null && arr.numElements() == 2)
    val r0 = arr.getStruct(0, 6)
    assert(r0.getString(0) == "A" && r0.getLong(2) == 1L)
    assert(r0.getString(5) == "H\nA body label")
    val r1 = arr.getStruct(1, 6)
    assert(r1.getString(3) == "A") // redirect resolved from body
    assert(r1.getString(5) == "")
  }

  test("ingestDumps: dump batches land as a deduped article corpus") {
    val spark = graft.GraftSession.local(cores = 4, appName = "graft-test")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("wiki-corpus").toString
    def prose(tag: String) = (1 to 30).map(i => s"$tag word$i").mkString(" ")
    val d1 = WikiDump.writeDump(Seq(
      WikiPage("Alpha", 0, 1L, null, prose("alpha")),
      WikiPage("Redirect Me", 0, 2L, null, "#REDIRECT [[Alpha]]"),
      WikiPage("Talk:Noise", 1, 3L, null, prose("talk")),
      WikiPage("Beta", 0, 4L, null, prose("beta"))), Some("bzip2"))
    val n1 = WikiDump.ingestDumps(spark,
      Seq((0L, d1)).toDF("doc_id", "content"), "content",
      s"$root/corpus", signaturePath = Some(s"$root/sigs"))
    assert(n1 == 2, "redirects and non-main namespaces stay out")
    // a re-exported dump re-delivers Alpha verbatim + one new article
    val d2 = WikiDump.writeDump(Seq(
      WikiPage("Alpha", 0, 1L, null, prose("alpha")),
      WikiPage("Gamma", 0, 9L, null, prose("gamma"))), Some("zstd"))
    val n2 = WikiDump.ingestDumps(spark,
      Seq((1L, d2)).toDF("doc_id", "content"), "content",
      s"$root/corpus", signaturePath = Some(s"$root/sigs"))
    assert(n2 == 1, "the re-delivered article drops against the store")
    val titles = spark.read.parquet(s"$root/corpus")
      .select("title").as[String].collect().toSet
    assert(titles == Set("Alpha", "Beta", "Gamma"))
  }

  test("refusals: malformed XML, truncated bz2, junk, caps") {
    assert(WikiDump.pages("<mediawiki><page>".getBytes) == null)
    assert(WikiDump.pages(null) == null)
    val good = WikiDump.writeDump(Seq(WikiPage("T", 0, 1L, null, "x")), Some("bzip2"))
    assert(graft.expressions.WikiPages.compute(
      java.util.Arrays.copyOf(good, good.length - 2)) == null)
    // pages lacking title/id are skipped, not fatal
    val partial = """<mediawiki><page><ns>0</ns><id>5</id></page>
      <page><title>Ok</title><ns>0</ns><id>6</id><revision><text>t</text>
      </revision></page></mediawiki>"""
    val ps = WikiDump.pages(partial.getBytes)
    assert(ps != null && ps.length == 1 && ps(0).title == "Ok")
  }

  test("pathological tag-bomb pages refuse wholesale, never truncate") {
    // 100k+ <ref> occurrences: the tag-strip pass refuses (null), the
    // parser contract — a truncated body would silently pass curation
    val bomb = new StringBuilder()
    (0 until 120001).foreach(i => bomb.append(s"w$i <ref>c</ref> "))
    assert(WikiDump.wikitextToPlain(bomb.toString) == null)
    // one tag below any pathology stays a full parse
    assert(WikiDump.wikitextToPlain("a <ref>cite</ref> b") == "a b")
  }
}
