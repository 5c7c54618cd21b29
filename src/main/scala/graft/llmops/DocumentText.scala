package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8

/** Document text extraction, mirroring the reference's per-format extractor
  * dispatch (aje_libs/documents/helpers/document_processor.py:10-83 —
  * PDF/DOC/XLS/PPT/plain handlers chosen by extension/MIME).
  *
  * Formats that need no native libraries are REAL here: plain text (BOM
  * and charset-fallback aware), HTML (state-machine tag stripping with
  * script/style elision and entity decode), Markdown (syntax stripping),
  * the OOXML family — DOCX/XLSX/PPTX are zip+XML, parsed JDK-only by
  * [[Ooxml]] — PDF via [[Pdf]]'s content-stream extractor (raw +
  * FlateDecode streams, Tj/TJ text operators), and the legacy OLE2
  * binary family — .doc/.xls/.ppt compound files, parsed from scratch by
  * [[Cfb]] + [[LegacyOffice]].
  *
  * The DataFrame operator is a native codegen'd expression
  * ([[graft.expressions.DocExtractText]]) evaluated in the scan
  * projection — rows never leave Tungsten, column pruning and
  * whole-stage codegen survive downstream.
  */
object DocumentText {

  /** Extracted text per format. Text formats come back whitespace-normalized;
    * the OOXML formats keep the reference's line structure ("\n"-joined
    * paragraphs / slide and sheet line blocks — [[Ooxml]] documents the exact
    * shapes), because those newlines ARE the extraction contract.
    *
    * The OOXML arms must precede the html/xml arm: their MIME types
    * ("application/vnd.openxmlformats-officedocument.*+xml-ish") contain the
    * substring "xml".
    */
  def extractText(bytes: Array[Byte], mimeType: String): Option[String] = {
    if (bytes == null) return None
    val mime = Option(mimeType).getOrElse("").toLowerCase
    mime match {
      // sentinel for unlabeled blobs: sniff the format from the bytes
      // (never recursive — sniffMime only returns concrete labels).
      // Deliberately NOT matched by ""/null: existing pipelines rely on
      // unlabeled rows extracting to NULL; sniffing is opt-in.
      case "auto" => extractTextAuto(bytes)
      case m if m.contains("wordprocessingml") || m.endsWith("/docx") =>
        Ooxml.docxText(bytes)
      case m if m.contains("spreadsheetml") || m.endsWith("/xlsx") =>
        Ooxml.xlsxText(bytes)
      case m if m.contains("presentationml") || m.endsWith("/pptx") =>
        Ooxml.pptxText(bytes)
      case m if m.contains("opendocument.text") || m.endsWith("/odt") =>
        Ooxml.odtText(bytes)
      case m if m.contains("opendocument.spreadsheet") || m.endsWith("/ods") =>
        Ooxml.odsText(bytes)
      case m if m.contains("msword") || m.endsWith("/doc") =>
        LegacyOffice.docText(bytes)
      case m if m.contains("ms-excel") || m.endsWith("/xls") =>
        LegacyOffice.xlsText(bytes)
      case m if m.contains("ms-powerpoint") || m.endsWith("/ppt") =>
        LegacyOffice.pptText(bytes)
      case m if m.contains("rtf") => // before text/: "text/rtf" is a markup
        Rtf.rtfText(bytes)
      case m if m.contains("pdf") =>
        Pdf.pdfText(bytes)
      case m if m.contains("html") || m.contains("xml") =>
        Some(htmlToText(decodeBytes(bytes)))
      case m if m.contains("markdown") || m == "text/md" =>
        Some(markdownToText(decodeBytes(bytes)))
      case m if m.startsWith("text/") || m.contains("json") || m.contains("csv") =>
        Some(normalize(decodeBytes(bytes)))
      case m if m == "message/rfc822" || m.endsWith("/eml") =>
        Eml.emlText(bytes)
      case m if m == "application/mbox" =>
        Eml.mboxMessages(bytes)
          .map(ms => ms.flatMap(Eml.emlText).mkString("\n\n"))
          .filter(_.nonEmpty)
      case m if Compression.NamedCodecs.map(Compression.codecMime).contains(m) =>
        // compressed container: decompress, then extract the payload by
        // ITS sniffed format — one level only (a payload that sniffs to
        // another compressed container refuses rather than recursing).
        // NamedCodecs admits brotli here: its mime can only arrive from
        // an EXPLICIT caller (HTTP headers), never from sniffing
        val codec =
          Compression.NamedCodecs.find(c => Compression.codecMime(c) == m).get
        Option(Compression.decode(bytes, codec)).flatMap { inner =>
          sniffMime(inner) match {
            case Some(im) if Compression.Codecs.map(Compression.codecMime).contains(im) =>
              None
            case Some(im) => extractText(inner, im)
            case None => None
          }
        }
      case _ => unsupported(mime)
    }
  }

  /** Formats with no extractor (archives, raw media, unknown MIME). Every
    * document family the reference's dispatch accepts — plain text, HTML,
    * Markdown, OOXML, PDF, and the legacy OLE2 family — now has a real
    * JDK-only codec above.
    */
  def unsupported(mime: String): Option[String] = None

  /** Magic-bytes format sniffing for UNLABELED blobs — crawled or
    * bulk-ingested documents rarely carry a trustworthy MIME type, so the
    * dispatch above needs a content-derived label. Detection order goes
    * strongest-magic-first:
    *
    *   - `%PDF`, `{\rtf`, OLE2/CFB (then the directory stream names
    *     distinguish .doc/.xls/.ppt), `PK\03\04` (then the first OOXML
    *     part segment distinguishes docx/xlsx/pptx; other zips report
    *     `application/zip`, which extractText treats as unsupported);
    *   - decodable text that opens with an HTML/XML declaration or tag →
    *     html/xml; otherwise printable text → `text/plain`;
    *   - anything else → None (binary with no codec).
    *
    * Poison posture as everywhere in the family: malformed containers
    * sniff to None / a weaker label, never throw.
    */
  def sniffMime(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length == 0) return None
    def startsWithSig(sig: String): Boolean = {
      val s = sig.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      bytes.length >= s.length && s.indices.forall(i => bytes(i) == s(i))
    }
    if (startsWithSig("%PDF")) Some("application/pdf")
    else if (startsWithSig("{\\rtf")) Some("application/rtf")
    else if (Cfb.isCfb(bytes)) Cfb.streams(bytes) match {
      case Some(parts) if parts.contains("WordDocument") =>
        Some("application/msword")
      case Some(parts) if parts.contains("Workbook") || parts.contains("Book") =>
        Some("application/vnd.ms-excel")
      case Some(parts) if parts.contains("PowerPoint Document") =>
        Some("application/vnd.ms-powerpoint")
      case _ => None // CFB container with no recognized document stream
    }
    else if (startsWithSig("PK")) {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        var entry = zin.getNextEntry
        var found: Option[String] = None
        while (entry != null && found.isEmpty) {
          val name = entry.getName
          if (name == "mimetype") {
            // ODF convention: the first entry names the flavor verbatim
            val buf = new java.io.ByteArrayOutputStream(64)
            val chunk = new Array[Byte](64)
            var n = zin.read(chunk)
            while (n > 0 && buf.size < 256) { buf.write(chunk, 0, n); n = zin.read(chunk) }
            val m = buf.toString("US-ASCII").trim
            if (m.startsWith("application/vnd.oasis.opendocument"))
              found = Some(m)
          } else if (name.startsWith("word/"))
            found = Some("application/vnd.openxmlformats-officedocument.wordprocessingml.document")
          else if (name.startsWith("xl/"))
            found = Some("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet")
          else if (name.startsWith("ppt/"))
            found = Some("application/vnd.openxmlformats-officedocument.presentationml.presentation")
          entry = zin.getNextEntry
        }
        found.orElse(Some("application/zip"))
      } catch {
        case scala.util.control.NonFatal(_) => Some("application/zip")
      } finally zin.close()
    }
    else if (Compression.sniffCodec(bytes).isDefined)
      Compression.sniffCodec(bytes).map(Compression.codecMime)
    else if (startsWithSig("From ") &&
      Eml.mboxMessages(bytes).exists(ms => ms.nonEmpty && Eml.sniff(ms.head)))
      Some("application/mbox")
    else if (Eml.sniff(bytes)) Some("message/rfc822")
    else {
      val head = decodeBytes(
        java.util.Arrays.copyOfRange(bytes, 0, math.min(bytes.length, 4096)))
      val trimmed = head.dropWhile(_.isWhitespace)
      val lower = trimmed.take(64).toLowerCase
      val controls = head.count(c => c < ' ' && c != '\t' && c != '\n' && c != '\r')
      if (controls * 10 > head.length) None // binary with no codec
      else if (lower.startsWith("<!doctype") || lower.startsWith("<html") ||
        lower.startsWith("<?xml")) Some("text/html")
      else Some("text/plain")
    }
  }

  /** Sniff-then-extract for unlabeled blobs: [[sniffMime]] + [[extractText]].
    */
  def extractTextAuto(bytes: Array[Byte]): Option[String] =
    sniffMime(bytes).flatMap(m => extractText(bytes, m))

  /** BOM-aware decode: a UTF-16 BOM (FF FE / FE FF) selects UTF-16 —
    * without it a UTF-16 text file "decoded" as latin-1 interleaves a NUL
    * between every character; a UTF-8 BOM is stripped; otherwise UTF-8
    * first and, if the bytes are not valid UTF-8, ISO-8859-1 (which never
    * fails) — the same lenient posture as the reference's latin-1 config
    * parsing.
    */
  def decodeBytes(bytes: Array[Byte]): String = {
    if (bytes.length >= 2) {
      val b0 = bytes(0) & 0xFF; val b1 = bytes(1) & 0xFF
      // new String with the BOM-carrying UTF-16 charset consumes the BOM
      if (b0 == 0xFF && b1 == 0xFE)
        return new String(bytes, java.nio.charset.StandardCharsets.UTF_16)
      if (b0 == 0xFE && b1 == 0xFF)
        return new String(bytes, java.nio.charset.StandardCharsets.UTF_16)
    }
    val body =
      if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
        java.util.Arrays.copyOfRange(bytes, 3, bytes.length)
      else bytes
    val dec = UTF_8.newDecoder()
    try dec.decode(java.nio.ByteBuffer.wrap(body)).toString
    catch {
      case _: java.nio.charset.CharacterCodingException =>
        new String(body, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
  }

  /** Tag-stripping state machine: elides <script>/<style> subtrees entirely,
    * drops comments and tags, decodes common entities, then normalizes
    * whitespace. Block-level correctness beyond that (tables, lists) is out
    * of scope — this is corpus curation, not rendering.
    */
  def htmlToText(html: String): String = {
    val out = new java.lang.StringBuilder(html.length)
    var i = 0
    val n = html.length
    var skipUntil: String = null // inside <script>/<style>
    while (i < n) {
      val c = html.charAt(i)
      if (skipUntil != null) {
        if (c == '<' && html.regionMatches(true, i, skipUntil, 0, skipUntil.length)) {
          i += skipUntil.length
          while (i < n && html.charAt(i) != '>') i += 1
          i += 1
          skipUntil = null
        } else i += 1
      } else if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (html.regionMatches(true, i, "<script", 0, 7)) {
          skipUntil = "</script"
          while (i < n && html.charAt(i) != '>') i += 1
          i += 1
        } else if (html.regionMatches(true, i, "<style", 0, 6)) {
          skipUntil = "</style"
          while (i < n && html.charAt(i) != '>') i += 1
          i += 1
        } else {
          while (i < n && html.charAt(i) != '>') i += 1
          i += 1
          out.append(' ') // tags separate words
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = html.substring(i + 1, semi)
          decodeEntity(ent) match {
            case Some(ch) => out.append(ch); i = semi + 1
            case None => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    normalize(out.toString)
  }

  private[graft] def decodeEntity(ent: String): Option[String] = ent match {
    case "amp" => Some("&")
    case "lt" => Some("<")
    case "gt" => Some(">")
    case "quot" => Some("\"")
    case "apos" => Some("'")
    case "nbsp" => Some(" ")
    case e if e.startsWith("#x") || e.startsWith("#X") =>
      scala.util.Try(Integer.parseInt(e.drop(2), 16)).toOption
        .filter(Character.isValidCodePoint)
        .map(cp => new String(Character.toChars(cp)))
    case e if e.startsWith("#") =>
      scala.util.Try(e.drop(1).toInt).toOption
        .filter(Character.isValidCodePoint)
        .map(cp => new String(Character.toChars(cp)))
    case _ => None
  }

  /** Markdown syntax stripping: fences/inline code markers, images → alt
    * text, links → link text, heading/list/blockquote markers, emphasis.
    */
  def markdownToText(md: String): String = {
    var s = md
    s = s.replaceAll("(?m)^```.*$", " ")              // fence lines
    s = s.replaceAll("!\\[([^\\]]*)\\]\\([^)]*\\)", "$1") // images → alt
    s = s.replaceAll("\\[([^\\]]+)\\]\\([^)]*\\)", "$1")  // links → text
    s = s.replaceAll("(?m)^#{1,6}\\s+", "")           // headings
    s = s.replaceAll("(?m)^\\s*[-*+]\\s+", "")        // bullet markers
    s = s.replaceAll("(?m)^\\s*\\d+\\.\\s+", "")      // ordered markers
    s = s.replaceAll("(?m)^>\\s?", "")                // blockquotes
    s = s.replace("`", "")
    s = s.replaceAll("[*_~]{1,3}", "")                // emphasis
    normalize(s)
  }

  def normalize(s: String): String =
    s.replaceAll("\\s+", " ").trim

  /** Extraction column over (content: binary, mime: string) — the native
    * codegen'd [[graft.expressions.DocExtractText]], so the decode runs
    * inside the scan projection (no RDD round-trip: the former
    * `df.rdd.mapPartitions` form deserialized every row and broke
    * whole-stage codegen and column pruning for everything downstream).
    */
  def extractTextCol(content: org.apache.spark.sql.Column,
      mime: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.DocExtractText(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content),
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(mime)))

  /** Batch extraction over (content: binary, mime: string) columns —
    * appends `extracted_text` (null for unsupported formats).
    */
  def extractDocumentText(df: DataFrame, contentCol: String,
      mimeCol: String): DataFrame =
    df.withColumn("extracted_text", extractTextCol(col(contentCol), col(mimeCol)))
}
