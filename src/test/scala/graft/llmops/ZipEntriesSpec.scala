package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** Bulk-upload zip enumeration: per-entry sniff+extract, nested
  * documents, directory skipping, refusal tiers.
  */
class ZipEntriesSpec extends AnyFunSuite {

  private def zip(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(4096)
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (n, d) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(d)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  test("mixed archive: text, html, eml, compressed text, binary") {
    val arc = zip(
      "docs/" -> Array.emptyByteArray, // directory entries skip
      "a.txt" -> "plain words".getBytes,
      "b.html" -> "<html><body><p>html body words</p></body></html>".getBytes,
      "c.eml" -> "From: x@e\r\nSubject: S\r\nDate: d\r\n\r\nmail body".getBytes,
      "d.txt.zst" -> Compression.encode("compressed member".getBytes, "zstd"),
      "e.bin" -> Array.tabulate[Byte](40)(i => (i % 9).toByte))
    val out = graft.expressions.ZipEntries.compute(arc)
    assert(out != null && out.numElements() == 5)
    val byName = (0 until 5).map { i =>
      val r = out.getStruct(i, 3)
      r.getString(0) -> (Option(if (r.isNullAt(1)) null else r.getString(1)),
        Option(if (r.isNullAt(2)) null else r.getString(2)))
    }.toMap
    assert(byName("a.txt")._1 === Some("text/plain"))
    assert(byName("a.txt")._2 === Some("plain words"))
    assert(byName("b.html")._2.exists(_.contains("html body words")))
    assert(byName("c.eml")._1 === Some("message/rfc822"))
    assert(byName("c.eml")._2 === Some("S\nmail body"))
    assert(byName("d.txt.zst")._1 === Some("application/zstd"))
    assert(byName("d.txt.zst")._2 === Some("compressed member"))
    assert(byName("e.bin")._1.isEmpty && byName("e.bin")._2.isEmpty)
  }

  test("refusals: non-zip, truncated header, empty archive, null") {
    assert(graft.expressions.ZipEntries.compute("not zip".getBytes) == null)
    val junk = new Array[Byte](40)
    junk(0) = 'P'; junk(1) = 'K'; junk(2) = 3; junk(3) = 4; junk(26) = 50
    assert(graft.expressions.ZipEntries.compute(junk) == null)
    assert(graft.expressions.ZipEntries.compute(null) == null)
    assert(graft.expressions.ZipEntries.compute(zip()) == null)
  }
}
