package graft.llmops

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable
import scala.util.control.NonFatal

/** JDK-only OOXML text extraction — .docx/.xlsx/.pptx are zip archives of
  * XML, so `java.util.zip` + StAX suffice; no Tika/POI is needed for the
  * text-run surface the reference exposes.
  *
  * Reference semantics (utils/extract_data_v2/aje_libs/documents/helpers/):
  *   - DOCX (doc_helper.py:14-32): body paragraphs with non-blank text,
  *     joined by "\n". Table-cell paragraphs are excluded (python-docx
  *     `doc.paragraphs` covers body-level `<w:p>` only).
  *   - PPTX (ppt_helper.py:14-37): per slide `"Slide {i}: "` + shape texts
  *     joined by a single space; slides joined by "\n\n". A shape's text is
  *     its paragraphs joined by "\n".
  *   - XLSX (document_processor.py:43-64): per sheet `"Sheet: {name}"`,
  *     then `"Row {n}: "` + cells joined by " | " (empty string for blank
  *     cells), then a blank line; all lines joined by "\n".
  *
  * Deviation from the reference, by design: parse errors return None
  * instead of raising — at corpus scale one poison document must not kill
  * the scan stage (the reference processes documents one at a time in a
  * Lambda and retries per object; a Spark task covers thousands of rows).
  */
object Ooxml {

  /** Hard cap on a single decompressed zip entry: a 100 MB part is not a
    * document, it's a zip bomb aimed at an executor's heap.
    */
  private val MaxEntryBytes = 100 * 1024 * 1024

  private def xmlFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // no DTDs / external entities: documents are untrusted corpus content
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f
  }

  /** All zip entries as name -> bytes. Documents are small relative to
    * executor memory (and capped per entry), so materializing the parts map
    * beats re-streaming the archive once per needed part.
    */
  private def zipParts(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val parts = Map.newBuilder[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val buf = new java.io.ByteArrayOutputStream(
            math.max(64, math.min(e.getSize, 1 << 16).toInt))
          val chunk = new Array[Byte](8192)
          var n = zin.read(chunk)
          var total = 0
          while (n > 0) {
            total += n
            if (total > MaxEntryBytes)
              throw new IllegalArgumentException(s"zip entry ${e.getName} exceeds $MaxEntryBytes bytes")
            buf.write(chunk, 0, n)
            n = zin.read(chunk)
          }
          parts += e.getName -> buf.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    parts.result()
  }

  private def reader(bytes: Array[Byte]): XMLStreamReader =
    xmlFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))

  // ---- DOCX ----------------------------------------------------------------

  /** Subtrees of word/document.xml that must not contribute run text:
    * `pPr`/`rPr` carry formatting properties — a `<w:tabs><w:tab …/>`
    * TAB-STOP DEFINITION inside pPr is not a tab character, yet shares
    * the local name of the run-level `<w:tab/>` (real Word files almost
    * always carry tab stops; rendering them was a phantom-'\t' bug);
    * `drawing`/`pict`/`object` embed DrawingML whose `<a:t>` text-box
    * runs python-docx's `doc.paragraphs` does NOT surface; an
    * `AlternateContent` pair would emit its text twice (choice +
    * fallback) — keeping neither matches the body-paragraph contract.
    */
  private val DocxSkipSubtrees =
    Set("pPr", "rPr", "drawing", "pict", "object", "AlternateContent")

  /** Text of word/document.xml: body-level paragraphs (`<w:p>` outside any
    * `<w:tbl>`) with non-blank text, joined by "\n". Runs concatenate their
    * `<w:t>` text; `<w:tab/>` renders as '\t', `<w:br/>`/`<w:cr/>` as '\n'
    * (python-docx's run-text rules). Formatting-property and embedded-
    * drawing subtrees are skipped ([[DocxSkipSubtrees]]).
    */
  def docxText(bytes: Array[Byte]): Option[String] =
    try {
      zipParts(bytes).get("word/document.xml").map { doc =>
        val paras = mutable.ArrayBuffer.empty[String]
        val sb = new java.lang.StringBuilder
        var tblDepth = 0
        var skip = 0
        val r = reader(doc)
        try {
          while (r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                r.getLocalName match {
                  case "tbl" => tblDepth += 1
                  case n if DocxSkipSubtrees(n) => skip += 1
                  case _ if skip > 0 =>
                  case "p" if tblDepth == 0 => sb.setLength(0)
                  case "t" if tblDepth == 0 => sb.append(r.getElementText)
                  case "tab" if tblDepth == 0 => sb.append('\t')
                  case "br" | "cr" if tblDepth == 0 => sb.append('\n')
                  case _ =>
                }
              case XMLStreamConstants.END_ELEMENT =>
                r.getLocalName match {
                  case "tbl" => tblDepth -= 1
                  case n if DocxSkipSubtrees(n) => skip = math.max(0, skip - 1)
                  case _ if skip > 0 =>
                  case "p" if tblDepth == 0 && sb.toString.trim.nonEmpty =>
                    paras += sb.toString
                  case _ =>
                }
              case _ =>
            }
          }
        } finally r.close()
        paras.mkString("\n")
      }
    } catch { case NonFatal(_) => None }

  // ---- OpenDocument (ODF) --------------------------------------------------

  /** ODT text extraction (OASIS OpenDocument Text): `content.xml`'s
    * `<text:p>`/`<text:h>` paragraphs in document order, `<text:s>`
    * (with its repeat count), `<text:tab>` and `<text:line-break>`
    * expanded; table and annotation/note subtrees skipped, mirroring
    * the docx discipline. Requires an `office:text` body — an ODS fed
    * here extracts None, not garbage.
    */
  def odtText(bytes: Array[Byte]): Option[String] =
    try {
      zipParts(bytes).get("content.xml").flatMap { doc =>
        val paras = mutable.ArrayBuffer.empty[String]
        val sb = new java.lang.StringBuilder
        var inP = false
        var skip = 0 // table / annotation / note nesting
        var sawTextBody = false
        val r = reader(doc)
        try {
          while (r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                r.getLocalName match {
                  case "text" => sawTextBody = true // office:text body
                  case "table" | "annotation" | "note" => skip += 1
                  case "p" | "h" if skip == 0 => sb.setLength(0); inP = true
                  case "s" if inP && skip == 0 =>
                    val c = Option(r.getAttributeValue(null, "c"))
                      .flatMap(_.toIntOption).getOrElse(1)
                    var i = 0
                    while (i < math.min(c, 4096)) { sb.append(' '); i += 1 }
                  case "tab" if inP && skip == 0 => sb.append('\t')
                  case "line-break" if inP && skip == 0 => sb.append('\n')
                  case _ =>
                }
              case XMLStreamConstants.CHARACTERS
                  if inP && skip == 0 =>
                sb.append(r.getText)
              case XMLStreamConstants.END_ELEMENT =>
                r.getLocalName match {
                  case "table" | "annotation" | "note" =>
                    skip = math.max(0, skip - 1)
                  case "p" | "h" if inP && skip == 0 =>
                    inP = false
                    if (sb.toString.trim.nonEmpty) paras += sb.toString
                  case _ =>
                }
              case _ =>
            }
          }
        } finally r.close()
        if (sawTextBody) Some(paras.mkString("\n")) else None
      }
    } catch { case NonFatal(_) => None }

  /** ODS text extraction (OpenDocument Spreadsheet): per
    * `<table:table>` a `"Sheet: name"` line then one line per row —
    * cell texts tab-joined with trailing empties trimmed,
    * `number-columns-repeated` honored (capped) — the xlsx rendering
    * convention, so mixed-format corpora read uniformly. Requires an
    * `office:spreadsheet` body.
    */
  def odsText(bytes: Array[Byte]): Option[String] =
    try {
      zipParts(bytes).get("content.xml").flatMap { doc =>
        val lines = mutable.ArrayBuffer.empty[String]
        val rowCells = mutable.ArrayBuffer.empty[String]
        val cellSb = new java.lang.StringBuilder
        var inCell = false
        var cellRepeat = 1
        var sawSheetBody = false
        val r = reader(doc)
        try {
          while (r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                r.getLocalName match {
                  case "spreadsheet" => sawSheetBody = true
                  case "table" =>
                    val name = Option(r.getAttributeValue(null, "name"))
                      .getOrElse(s"Sheet${lines.size + 1}")
                    lines += s"Sheet: $name"
                  case "table-row" => rowCells.clear()
                  case "table-cell" =>
                    inCell = true
                    cellSb.setLength(0)
                    cellRepeat = Option(r.getAttributeValue(null,
                      "number-columns-repeated"))
                      .flatMap(_.toIntOption).getOrElse(1)
                  case "p" if inCell && cellSb.length > 0 =>
                    cellSb.append('\n') // multi-paragraph cells
                  case _ =>
                }
              case XMLStreamConstants.CHARACTERS if inCell =>
                cellSb.append(r.getText)
              case XMLStreamConstants.END_ELEMENT =>
                r.getLocalName match {
                  case "table-cell" =>
                    inCell = false
                    val v = cellSb.toString
                    var i = 0
                    while (i < math.min(cellRepeat, 256)) {
                      rowCells += v; i += 1
                    }
                  case "table-row" =>
                    val trimmed = rowCells.reverse.dropWhile(_.isEmpty).reverse
                    if (trimmed.nonEmpty) lines += trimmed.mkString("\t")
                    rowCells.clear()
                  case _ =>
                }
              case _ =>
            }
          }
        } finally r.close()
        if (sawSheetBody) Some(lines.mkString("\n")) else None
      }
    } catch { case NonFatal(_) => None }

  // ---- PPTX ----------------------------------------------------------------

  private val SlideName = raw"ppt/slides/slide(\d+)\.xml".r

  /** Slides in numeric order; per slide the text frames (`<p:txBody>`) in
    * document order, each frame's `<a:p>` paragraphs joined by "\n", frames
    * joined by a single space behind the `"Slide {i}: "` prefix; slides
    * joined by "\n\n".
    */
  def pptxText(bytes: Array[Byte]): Option[String] =
    try {
      val parts = zipParts(bytes)
      val slides = parts.keysIterator.collect {
        case name @ SlideName(idx) => (idx.toInt, name)
      }.toSeq.sortBy(_._1)
      if (slides.isEmpty) return None
      val lines = slides.zipWithIndex.map { case ((_, name), i) =>
        val shapeTexts = mutable.ArrayBuffer.empty[String]
        val paras = mutable.ArrayBuffer.empty[String]
        val sb = new java.lang.StringBuilder
        var inBody = false
        val r = reader(parts(name))
        try {
          while (r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                r.getLocalName match {
                  case "txBody" => inBody = true; paras.clear()
                  case "p" if inBody => sb.setLength(0)
                  case "t" if inBody => sb.append(r.getElementText)
                  case "br" if inBody => sb.append('\n')
                  case _ =>
                }
              case XMLStreamConstants.END_ELEMENT =>
                r.getLocalName match {
                  case "p" if inBody => paras += sb.toString
                  case "txBody" =>
                    inBody = false
                    shapeTexts += paras.mkString("\n")
                  case _ =>
                }
              case _ =>
            }
          }
        } finally r.close()
        s"Slide ${i + 1}: ${shapeTexts.mkString(" ")}"
      }
      Some(lines.mkString("\n\n"))
    } catch { case NonFatal(_) => None }

  // ---- XLSX ----------------------------------------------------------------

  /** Sheets in workbook order (xl/workbook.xml `<sheet>` entries resolved
    * through the workbook rels); cell values from shared strings, inline
    * strings, booleans (True/False), or numbers (integral values render
    * without a decimal point, matching openpyxl's int typing). Rows run
    * 1..max(row) and columns 1..max(col) per sheet, blanks as "".
    */
  def xlsxText(bytes: Array[Byte]): Option[String] =
    try {
      val parts = zipParts(bytes)
      val workbook = parts.get("xl/workbook.xml").getOrElse(return None)

      // rId -> worksheet part path
      val rels: Map[String, String] =
        parts.get("xl/_rels/workbook.xml.rels").map { relBytes =>
          val m = Map.newBuilder[String, String]
          val r = reader(relBytes)
          try {
            while (r.hasNext) {
              if (r.next() == XMLStreamConstants.START_ELEMENT &&
                  r.getLocalName == "Relationship") {
                val id = r.getAttributeValue(null, "Id")
                val target = r.getAttributeValue(null, "Target")
                if (id != null && target != null) {
                  val path =
                    if (target.startsWith("/")) target.drop(1)
                    else "xl/" + target
                  m += id -> path
                }
              }
            }
          } finally r.close()
          m.result()
        }.getOrElse(Map.empty)

      // (sheet name, part path) in workbook order
      val sheets = {
        val out = mutable.ArrayBuffer.empty[(String, String)]
        val r = reader(workbook)
        try {
          while (r.hasNext) {
            if (r.next() == XMLStreamConstants.START_ELEMENT &&
                r.getLocalName == "sheet") {
              val name = r.getAttributeValue(null, "name")
              // r:id is namespaced; scan attributes by local name
              var rid: String = null
              var i = 0
              while (i < r.getAttributeCount) {
                if (r.getAttributeLocalName(i) == "id") rid = r.getAttributeValue(i)
                i += 1
              }
              val path = Option(rid).flatMap(rels.get)
                .getOrElse(s"xl/worksheets/sheet${out.size + 1}.xml")
              out += ((if (name == null) s"Sheet${out.size + 1}" else name, path))
            }
          }
        } finally r.close()
        out.toSeq
      }

      val shared: IndexedSeq[String] =
        parts.get("xl/sharedStrings.xml").map { ssBytes =>
          val items = mutable.ArrayBuffer.empty[String]
          val sb = new java.lang.StringBuilder
          var inSi = false
          val r = reader(ssBytes)
          try {
            while (r.hasNext) {
              r.next() match {
                case XMLStreamConstants.START_ELEMENT =>
                  r.getLocalName match {
                    case "si" => inSi = true; sb.setLength(0)
                    case "t" if inSi => sb.append(r.getElementText)
                    case _ =>
                  }
                case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
                  inSi = false
                  items += sb.toString
                case _ =>
              }
            }
          } finally r.close()
          items.toIndexedSeq
        }.getOrElse(IndexedSeq.empty)

      val lines = mutable.ArrayBuffer.empty[String]
      sheets.foreach { case (sheetName, path) =>
        lines += s"Sheet: $sheetName"
        parts.get(path).foreach { sheetBytes =>
          // rowNum -> (colNum -> rendered value)
          val rows = mutable.SortedMap.empty[Int, mutable.Map[Int, String]]
          var maxCol = 0
          var curRow = 0
          var cellCol = 0
          var cellType: String = null
          var inIs = false
          val isBuf = new java.lang.StringBuilder
          val r = reader(sheetBytes)
          try {
            while (r.hasNext) {
              r.next() match {
                case XMLStreamConstants.START_ELEMENT =>
                  r.getLocalName match {
                    case "row" =>
                      val ra = r.getAttributeValue(null, "r")
                      curRow = if (ra != null) ra.toInt else curRow + 1
                      rows.getOrElseUpdate(curRow, mutable.Map.empty)
                    case "c" =>
                      val ref = r.getAttributeValue(null, "r")
                      cellCol =
                        if (ref != null) colIndex(ref)
                        else rows(curRow).keys.maxOption.getOrElse(0) + 1
                      cellType = r.getAttributeValue(null, "t")
                      if (cellCol > maxCol) maxCol = cellCol
                    case "v" =>
                      rows(curRow)(cellCol) = renderCell(cellType, r.getElementText, shared)
                    case "is" => inIs = true; isBuf.setLength(0)
                    case "t" if inIs => isBuf.append(r.getElementText)
                    case _ =>
                  }
                case XMLStreamConstants.END_ELEMENT if r.getLocalName == "is" =>
                  inIs = false
                  rows(curRow)(cellCol) = isBuf.toString
                case _ =>
              }
            }
          } finally r.close()
          val maxRow = rows.keys.maxOption.getOrElse(0)
          var rowNum = 1
          while (rowNum <= maxRow) {
            val cells = rows.getOrElse(rowNum, mutable.Map.empty[Int, String])
            val vals = (1 to maxCol).map(c => cells.getOrElse(c, ""))
            lines += s"Row $rowNum: ${vals.mkString(" | ")}"
            rowNum += 1
          }
        }
        lines += ""
      }
      Some(lines.mkString("\n"))
    } catch { case NonFatal(_) => None }

  /** "BC42" -> column index (BC = 55), 1-based. */
  private def colIndex(ref: String): Int = {
    var i = 0
    var col = 0
    while (i < ref.length && Character.isLetter(ref.charAt(i))) {
      col = col * 26 + (Character.toUpperCase(ref.charAt(i)) - 'A' + 1)
      i += 1
    }
    col
  }

  private def renderCell(t: String, v: String, shared: IndexedSeq[String]): String =
    t match {
      case "s" =>
        val idx = v.trim.toInt
        if (idx >= 0 && idx < shared.length) shared(idx) else ""
      case "b" => if (v.trim == "1") "True" else "False"
      case "str" => v
      case _ => // numeric: integral values have no decimal point (openpyxl int)
        val trimmed = v.trim
        try java.lang.Long.parseLong(trimmed).toString
        catch {
          case _: NumberFormatException =>
            try java.lang.Double.parseDouble(trimmed).toString
            catch { case _: NumberFormatException => trimmed }
        }
    }
}
