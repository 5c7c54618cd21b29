package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.Cdx.CdxRecord

/** CDXJ crawl-index parsing: writer-twin roundtrips (plain + gzip +
  * zstd shards), escape handling, malformed-line skipping, refusals.
  */
class CdxSpec extends AnyFunSuite {

  private val recs = Seq(
    CdxRecord("com,example)/p/1", "20260101120000", "https://example.com/p/1",
      "text/html", 200, "sha1:AAAB", "crawl-00.warc.gz", 1024L, 2048L),
    CdxRecord("com,example)/p/2", "20260101120001", "https://example.com/p/2?q=\"x\"",
      "application/pdf", 404, null, "crawl-00.warc.gz", 4096L, 100L),
    CdxRecord("org,site)/", "20260102000000", "https://site.org/",
      "text/html", 301, "sha1:CCCC", null, null, null))

  test("roundtrip through the writer twin, plain and codec-wrapped") {
    for (codec <- Seq(None, Some("gzip"), Some("zstd"))) {
      val shard = Cdx.writeIndex(recs, codec)
      val got = Cdx.records(shard)
      assert(got != null && got.length == 3, s"codec=$codec")
      assert(got(0) == recs(0))
      assert(got(1).url == "https://example.com/p/2?q=\"x\"")
      assert(got(1).digest == null)
      assert(got(2).offset == null && got(2).status == 301)
    }
  }

  test("malformed lines skip; trailing partial line tolerated") {
    val shard = new String(Cdx.writeIndex(recs, None)) +
      "garbage without json\n" +
      "com,x)/ 2026 {broken json\n" +
      "com,y)/ 20260101 {\"url\": \"https://y\"" // truncated tail
    val got = Cdx.records(shard.getBytes)
    assert(got != null && got.length == 3)
  }

  test("expression surface + refusals") {
    val arr = graft.expressions.CdxRecords.compute(Cdx.writeIndex(recs, Some("gzip")))
    assert(arr != null && arr.numElements() == 3)
    val r = arr.getStruct(0, 9)
    assert(r.getString(0) == "com,example)/p/1" && r.getInt(4) == 200)
    assert(r.getLong(7) == 1024L)
    assert(Cdx.records("no cdx here at all\nreally none\n".getBytes) == null)
    assert(Cdx.records(Array.emptyByteArray) == null)
    assert(Cdx.records(null) == null)
    assert(graft.expressions.CdxRecords.compute(null) == null)
  }

  test("flatJson: escapes, unicode, numbers, damage") {
    assert(Cdx.flatJson("""{"a": "x\ny", "u": "A", "n": 42}""") ==
      Some(Map("a" -> "x\ny", "u" -> "A", "n" -> "42")))
    assert(Cdx.flatJson("""{"a" "b"}""").isEmpty)
    assert(Cdx.flatJson("""{"a": }""").isEmpty)
    assert(Cdx.flatJson("{}") == Some(Map.empty[String, String]))
  }
}
