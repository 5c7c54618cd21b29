package graft.llmops

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class OoxmlSpec extends SparkTestBase {
  import spark.implicits._

  private def rawZip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (n, c) =>
      z.putNextEntry(new ZipEntry(n)); z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  // ---- docx ----------------------------------------------------------------

  test("docx round trip: paragraphs joined by newline, blanks dropped, markup escaped") {
    val bytes = OoxmlWriter.docx(Seq("Title & <sub>", "  ", "Body text", ""))
    // blank-only paragraphs are dropped (reference doc_helper.py:25-27)
    assert(Ooxml.docxText(bytes) === Some("Title & <sub>\nBody text"))
  }

  test("docx: tabs and breaks inside a run render as \\t and \\n") {
    val bytes = OoxmlWriter.docx(Seq("a\tb\nc"))
    assert(Ooxml.docxText(bytes) === Some("a\tb\nc"))
  }

  test("docx: table-cell paragraphs are excluded like python-docx doc.paragraphs") {
    val doc =
      """<?xml version="1.0"?><w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""" +
        "<w:p><w:r><w:t>before</w:t></w:r></w:p>" +
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell text</w:t></w:r></w:p></w:tc></w:tr></w:tbl>" +
        "<w:p><w:r><w:t>after</w:t></w:r></w:p>" +
        "</w:body></w:document>"
    val bytes = rawZip("word/document.xml" -> doc)
    assert(Ooxml.docxText(bytes) === Some("before\nafter"))
  }

  test("docx: tab-STOP definitions in pPr render no phantom tabs") {
    // real Word files almost always carry <w:pPr><w:tabs><w:tab .../>
    // </w:tabs></w:pPr> — tab-stop DEFINITIONS sharing the local name of
    // the run-level tab CHARACTER <w:tab/>; only the latter is text
    val doc =
      """<?xml version="1.0"?><w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""" +
        "<w:p><w:pPr><w:tabs><w:tab w:val=\"left\" w:pos=\"708\"/>" +
        "<w:tab w:val=\"right\" w:pos=\"9000\"/></w:tabs></w:pPr>" +
        "<w:r><w:t>a</w:t></w:r><w:r><w:tab/><w:t>b</w:t></w:r></w:p>" +
        "</w:body></w:document>"
    val bytes = rawZip("word/document.xml" -> doc)
    assert(Ooxml.docxText(bytes) === Some("a\tb"))
  }

  test("docx: DrawingML text boxes are excluded like python-docx doc.paragraphs") {
    // a text box travels as <w:drawing>…<w:txbxContent><w:p>…</w:p>
    // </w:txbxContent>…</w:drawing> INSIDE a body run; its paragraphs are
    // not body paragraphs
    val doc =
      """<?xml version="1.0"?><w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"><w:body>""" +
        "<w:p><w:r><w:t>before </w:t></w:r>" +
        "<w:r><w:drawing><w:txbxContent><w:p><w:r><w:t>boxed</w:t></w:r></w:p>" +
        "</w:txbxContent></w:drawing></w:r>" +
        "<w:r><w:t>after</w:t></w:r></w:p>" +
        "</w:body></w:document>"
    val bytes = rawZip("word/document.xml" -> doc)
    assert(Ooxml.docxText(bytes) === Some("before after"))
  }

  test("docx: garbage bytes and zip without document.xml yield None") {
    assert(Ooxml.docxText("not a zip at all".getBytes) === None)
    assert(Ooxml.docxText(rawZip("other.xml" -> "<a/>")) === None)
  }

  // ---- pptx ----------------------------------------------------------------

  test("pptx round trip: Slide-prefixed lines, shapes space-joined, slides double-newlined") {
    val bytes = OoxmlWriter.pptx(Seq(Seq("Heading", "First point"), Seq("End")))
    assert(Ooxml.pptxText(bytes) ===
      Some("Slide 1: Heading First point\n\nSlide 2: End"))
  }

  test("pptx: multi-paragraph shape joins its paragraphs with newline") {
    val bytes = OoxmlWriter.pptx(Seq(Seq("line1\nline2")))
    assert(Ooxml.pptxText(bytes) === Some("Slide 1: line1\nline2"))
  }

  test("pptx: slide files sort numerically, not lexically") {
    // slide10 after slide2 — a lexical sort would interleave them
    val slide = (t: String) =>
      """<?xml version="1.0"?><p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">""" +
        s"<p:cSld><p:spTree><p:sp><p:txBody><a:p><a:r><a:t>$t</a:t></a:r></a:p></p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    val entries = (1 to 10).map(i => s"ppt/slides/slide$i.xml" -> slide(s"s$i"))
    val bytes = rawZip(entries: _*)
    val text = Ooxml.pptxText(bytes).get
    assert(text.startsWith("Slide 1: s1"))
    assert(text.endsWith("Slide 10: s10"))
  }

  // ---- xlsx ----------------------------------------------------------------

  test("xlsx round trip: sheet header, pipe-joined rows, trailing blank per sheet") {
    val bytes = OoxmlWriter.xlsx(Seq(
      "data" -> Seq(Seq("id", "2"), Seq("text", "hello & bye")),
      "meta" -> Seq(Seq("k", "v"))))
    assert(Ooxml.xlsxText(bytes) === Some(
      "Sheet: data\nRow 1: id | 2\nRow 2: text | hello & bye\n\n" +
        "Sheet: meta\nRow 1: k | v\n"))
  }

  test("xlsx: blank cells pad to the sheet's max column; missing rows appear empty") {
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1"><v>1</v></c><c r="C1"><v>3</v></c></row>""" +
        """<row r="3"><c r="B3"><v>2.5</v></c></row>""" +
        "</sheetData></worksheet>"
    val wb =
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        """<sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val rels =
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>"""
    val bytes = rawZip("xl/workbook.xml" -> wb, "xl/_rels/workbook.xml.rels" -> rels,
      "xl/worksheets/sheet1.xml" -> sheet)
    assert(Ooxml.xlsxText(bytes) === Some(
      "Sheet: s\nRow 1: 1 |  | 3\nRow 2:  |  | \nRow 3:  | 2.5 | \n"))
  }

  test("xlsx: booleans render True/False; integral numbers have no decimal point") {
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="b"><v>1</v></c><c r="B1" t="b"><v>0</v></c><c r="C1"><v>7</v></c></row>""" +
        "</sheetData></worksheet>"
    val wb =
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        """<sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val rels =
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>"""
    val bytes = rawZip("xl/workbook.xml" -> wb, "xl/_rels/workbook.xml.rels" -> rels,
      "xl/worksheets/sheet1.xml" -> sheet)
    assert(Ooxml.xlsxText(bytes) === Some("Sheet: s\nRow 1: True | False | 7\n"))
  }

  // ---- dispatch + DataFrame operator --------------------------------------

  test("extractText dispatches OOXML mimes before the generic xml arm") {
    val docx = OoxmlWriter.docx(Seq("docx body"))
    assert(DocumentText.extractText(docx,
      "application/vnd.openxmlformats-officedocument.wordprocessingml.document")
      === Some("docx body"))
    val pptx = OoxmlWriter.pptx(Seq(Seq("deck")))
    assert(DocumentText.extractText(pptx,
      "application/vnd.openxmlformats-officedocument.presentationml.presentation")
      === Some("Slide 1: deck"))
    val xlsx = OoxmlWriter.xlsx(Seq("s" -> Seq(Seq("a"))))
    assert(DocumentText.extractText(xlsx,
      "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet")
      === Some("Sheet: s\nRow 1: a\n"))
    // pdf dispatches to the real content-stream extractor (PdfSpec covers it)
    val pdfBytes = PdfWriter.pdf(Seq(Seq("pdf body")))
    assert(DocumentText.extractText(pdfBytes, "application/pdf") === Some("pdf body"))
    // legacy OLE2 binaries stay the honest stub
    assert(DocumentText.extractText(Array[Byte](1, 2, 3), "application/msword") === None)
  }

  test("extractDocumentText is a native expression: codegen plan, no RDD scan") {
    val rows = Seq(
      (1L, OoxmlWriter.docx(Seq("alpha", "beta")),
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document"),
      (2L, "plain words".getBytes("UTF-8"), "text/plain"),
      (3L, "junk".getBytes("UTF-8"), "application/octet-stream"))
    val df = rows.toDF("id", "content", "mime")
    val out = DocumentText.extractDocumentText(df, "content", "mime")
      .orderBy("id")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"extraction left Tungsten:\n$plan")
    val got = out.select("id", "extracted_text").collect()
    assert(got.map(r => (r.getLong(0), Option(r.getString(1)))).toSeq === Seq(
      (1L, Some("alpha\nbeta")), (2L, Some("plain words")), (3L, None)))
  }

  test("ODT round trip: paragraphs, spaces, tabs, skipped subtrees") {
    val paras = Seq("first paragraph", "second & <escaped>", "third one")
    assert(Ooxml.odtText(OoxmlWriter.odt(paras)) === Some(paras.mkString("\n")))
    // hand-built content with text:s / text:tab / table / annotation
    val content =
      """<?xml version="1.0"?><office:document-content """ +
      """xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" """ +
      """xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" """ +
      """xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0">""" +
      "<office:body><office:text>" +
      """<text:p>a<text:s text:c="3"/>b<text:tab/>c</text:p>""" +
      "<table:table><table:table-row><table:table-cell>" +
      "<text:p>table text must not leak</text:p>" +
      "</table:table-cell></table:table-row></table:table>" +
      "<office:annotation><text:p>note must not leak</text:p></office:annotation>" +
      "<text:p>tail</text:p>" +
      "</office:text></office:body></office:document-content>"
    val bytes = OoxmlWriterTestAccess.zipRaw(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.text",
      "content.xml" -> content))
    assert(Ooxml.odtText(bytes) === Some("a   b\tc\ntail"))
    // an ODS through the odt arm extracts None, not garbage
    assert(Ooxml.odtText(OoxmlWriter.ods(Seq("S" -> Seq(Seq("x"))))) === None)
  }

  test("ODS round trip and xlsx-convention rendering") {
    val bytes = OoxmlWriter.ods(Seq(
      "Alpha" -> Seq(Seq("a1", "b1"), Seq("a2", "b2")),
      "Beta" -> Seq(Seq("only"))))
    assert(Ooxml.odsText(bytes) ===
      Some("Sheet: Alpha\na1\tb1\na2\tb2\nSheet: Beta\nonly"))
    assert(Ooxml.odsText(OoxmlWriter.odt(Seq("p"))) === None)
  }

  test("ODF flows through mime dispatch and content sniffing") {
    val odt = OoxmlWriter.odt(Seq("dispatch body"))
    val ods = OoxmlWriter.ods(Seq("S" -> Seq(Seq("cell"))))
    assert(DocumentText.extractText(odt,
      "application/vnd.oasis.opendocument.text") === Some("dispatch body"))
    assert(DocumentText.extractText(ods, "application/ods").isDefined)
    assert(DocumentText.sniffMime(odt) ===
      Some("application/vnd.oasis.opendocument.text"))
    assert(DocumentText.sniffMime(ods) ===
      Some("application/vnd.oasis.opendocument.spreadsheet"))
    assert(DocumentText.extractText(odt, "auto") === Some("dispatch body"))
  }
}

/** Exposes the private zip builder for hand-crafted ODF cases. */
object OoxmlWriterTestAccess {
  def zipRaw(entries: Seq[(String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }
}
