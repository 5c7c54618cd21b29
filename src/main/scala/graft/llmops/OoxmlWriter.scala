package graft.llmops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal OOXML writers: structurally valid .docx/.xlsx/.pptx archives
  * from simple content models. The round-trip partner of [[Ooxml]] — used
  * by the extraction gate query and specs to build real zip+XML documents
  * without shipping binary fixtures — and a standalone report sink (the
  * reference emits Excel artifacts from query results via openpyxl in
  * utils/extract_data_v2; this is the library-free equivalent).
  *
  * Zip entry timestamps are pinned so identical content yields identical
  * bytes (deterministic test inputs and re-runnable sinks).
  */
object OoxmlWriter {

  private val FixedTime = 1262304000000L // 2010-01-01T00:00:00Z

  def xmlEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case '\'' => sb.append("&apos;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def zip(entries: Seq[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(FixedTime)
      zout.putNextEntry(e)
      zout.write(content.getBytes(UTF_8))
      zout.closeEntry()
    }
    zout.close()
    bos.toByteArray
  }

  private val XmlDecl = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""

  private def contentTypes(overrides: Seq[(String, String)]): String = {
    val parts = overrides.map { case (part, ct) =>
      s"""<Override PartName="/$part" ContentType="$ct"/>"""
    }.mkString
    s"""$XmlDecl<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" + parts + "</Types>"
  }

  private def rootRels(target: String, relType: String): String =
    s"""$XmlDecl<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      s"""<Relationship Id="rId1" Type="$relType" Target="$target"/></Relationships>"""

  /** A .docx whose body is one `<w:p>` per paragraph (single run each;
    * embedded '\n' becomes a `<w:br/>`, '\t' a `<w:tab/>`).
    */
  def docx(paragraphs: Seq[String]): Array[Byte] = {
    val w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    val body = paragraphs.map { p =>
      val runs = p.split("\n", -1).map { line =>
        val withTabs = line.split("\t", -1).map(t => s"""<w:t xml:space="preserve">${xmlEscape(t)}</w:t>""")
          .mkString("<w:tab/>")
        withTabs
      }.mkString("<w:br/>")
      s"<w:p><w:r>$runs</w:r></w:p>"
    }.mkString
    val doc = s"""$XmlDecl<w:document xmlns:w="$w"><w:body>$body</w:body></w:document>"""
    zip(Seq(
      "[Content_Types].xml" -> contentTypes(Seq(
        "word/document.xml" -> "application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml")),
      "_rels/.rels" -> rootRels("word/document.xml",
        "http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument"),
      "word/document.xml" -> doc))
  }

  /** A .pptx with one slide per element; each slide one text shape per
    * string (one paragraph per '\n'-separated line).
    */
  def pptx(slides: Seq[Seq[String]]): Array[Byte] = {
    val a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    val p = "http://schemas.openxmlformats.org/presentationml/2006/main"
    val slideEntries = slides.zipWithIndex.map { case (shapes, i) =>
      val sps = shapes.map { text =>
        val paras = text.split("\n", -1).map(line =>
          s"""<a:p><a:r><a:t>${xmlEscape(line)}</a:t></a:r></a:p>""").mkString
        s"""<p:sp><p:txBody><a:bodyPr/>$paras</p:txBody></p:sp>"""
      }.mkString
      s"ppt/slides/slide${i + 1}.xml" ->
        s"""$XmlDecl<p:sld xmlns:a="$a" xmlns:p="$p"><p:cSld><p:spTree>$sps</p:spTree></p:cSld></p:sld>"""
    }
    val pres =
      s"""$XmlDecl<p:presentation xmlns:p="$p"><p:sldIdLst>""" +
        slides.indices.map(i => s"""<p:sldId id="${256 + i}" r:id="rId${i + 1}" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/>""").mkString +
        "</p:sldIdLst></p:presentation>"
    zip(Seq(
      "[Content_Types].xml" -> contentTypes(
        ("ppt/presentation.xml" -> "application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml") +:
          slides.indices.map(i =>
            s"ppt/slides/slide${i + 1}.xml" -> "application/vnd.openxmlformats-officedocument.presentationml.slide+xml")),
      "_rels/.rels" -> rootRels("ppt/presentation.xml",
        "http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument")) ++
      slideEntries)
  }

  /** A .xlsx from (sheetName, rows) where each cell is a string: values
    * that parse as numbers are written as numeric cells, everything else
    * through the shared-string table (exercising both read paths); empty
    * strings produce blank cells.
    */
  def xlsx(sheets: Seq[(String, Seq[Seq[String]])]): Array[Byte] = {
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val rNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

    val sharedOrder = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedIdx(s: String): Int =
      sharedOrder.getOrElseUpdate(s, sharedOrder.size)
    def isNumeric(s: String): Boolean =
      try { java.lang.Double.parseDouble(s); true }
      catch { case _: NumberFormatException => false }

    def colRef(c: Int): String = { // 1 -> A, 27 -> AA
      var n = c
      val sb = new java.lang.StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }

    val sheetXml = sheets.map { case (_, rows) =>
      val rowsXml = rows.zipWithIndex.map { case (cells, ri) =>
        val cellsXml = cells.zipWithIndex.collect {
          case (v, ci) if v.nonEmpty =>
            val ref = s"${colRef(ci + 1)}${ri + 1}"
            if (isNumeric(v)) s"""<c r="$ref"><v>$v</v></c>"""
            else s"""<c r="$ref" t="s"><v>${sharedIdx(v)}</v></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cellsXml</row>"""
      }.mkString
      s"""$XmlDecl<worksheet xmlns="$ns"><sheetData>$rowsXml</sheetData></worksheet>"""
    }

    val workbook =
      s"""$XmlDecl<workbook xmlns="$ns" xmlns:r="$rNs"><sheets>""" +
        sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString + "</sheets></workbook>"
    val wbRels =
      s"""$XmlDecl<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (sheets.indices.map { i =>
          s"""<Relationship Id="rId${i + 1}" Type="$rNs/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
        } :+
          s"""<Relationship Id="rId${sheets.size + 1}" Type="$rNs/sharedStrings" Target="sharedStrings.xml"/>""").mkString +
        "</Relationships>"
    val sst =
      s"""$XmlDecl<sst xmlns="$ns" count="${sharedOrder.size}" uniqueCount="${sharedOrder.size}">""" +
        sharedOrder.keys.map(s => s"""<si><t xml:space="preserve">${xmlEscape(s)}</t></si>""").mkString +
        "</sst>"

    zip(Seq(
      "[Content_Types].xml" -> contentTypes(
        Seq("xl/workbook.xml" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml",
          "xl/sharedStrings.xml" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml") ++
          sheets.indices.map(i =>
            s"xl/worksheets/sheet${i + 1}.xml" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml")),
      "_rels/.rels" -> rootRels("xl/workbook.xml",
        "http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument"),
      "xl/workbook.xml" -> workbook,
      "xl/_rels/workbook.xml.rels" -> wbRels,
      "xl/sharedStrings.xml" -> sst) ++
      sheetXml.zipWithIndex.map { case (xml, i) => s"xl/worksheets/sheet${i + 1}.xml" -> xml })
  }

  /** ODT writer twin: mimetype + minimal content.xml with text:p
    * paragraphs (namespaced as real ODF writers emit).
    */
  def odt(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map(p => s"<text:p>${xmlEscape(p)}</text:p>")
      .mkString
    zip(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.text",
      "content.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8"?>""" +
          """<office:document-content """ +
          """xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" """ +
          """xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">""" +
          s"<office:body><office:text>$body</office:text></office:body>" +
          "</office:document-content>")))
  }

  /** ODS writer twin: sheets of rows of string cells. */
  def ods(sheets: Seq[(String, Seq[Seq[String]])]): Array[Byte] = {
    val tables = sheets.map { case (name, rows) =>
      val rowsXml = rows.map { cells =>
        val cellsXml = cells.map(c =>
          s"<table:table-cell><text:p>${xmlEscape(c)}</text:p></table:table-cell>")
          .mkString
        s"<table:table-row>$cellsXml</table:table-row>"
      }.mkString
      s"""<table:table table:name="${xmlEscape(name)}">$rowsXml</table:table>"""
    }.mkString
    zip(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.spreadsheet",
      "content.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8"?>""" +
          """<office:document-content """ +
          """xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" """ +
          """xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" """ +
          """xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">""" +
          s"<office:body><office:spreadsheet>$tables</office:spreadsheet>" +
          "</office:body></office:document-content>")))
  }
}
