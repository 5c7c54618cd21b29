package graft.llmops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_16BE}
import java.util.zip.Inflater

/** JDK-only PDF text extraction — the last binary codec from the
  * reference's per-format dispatch (aje_libs/documents/helpers/
  * pdf_helper.py:9-57: PyPDF2 `extract_text()` page loop).
  *
  * Scope (the honest subset, covering everything [[PdfWriter]] and the
  * overwhelmingly common "text via Tj/TJ" producers emit):
  *   - content streams stored raw or FlateDecode-compressed (`Inflater`);
  *   - literal strings with the full escape table (octal, line
  *     continuations, nested balanced parens) and hex strings;
  *   - PDFDocEncoding-approximate (latin-1) and UTF-16BE (BOM-prefixed)
  *     string decoding;
  *   - show operators `Tj`, `TJ`, `'`, `"`; line structure from
  *     `Td`/`TD`/`T*`/`'`/`"` within `BT…ET` text objects.
  * Out of scope (returns whatever text the above yields, never crashes):
  *   font-CMap remapping of symbolic fonts, encrypted documents,
  *   object streams (/ObjStm), LZW/ASCII85 filters.
  *
  * Streams are located by scanning the object graph linearly
  * (`<<…>> stream … endstream`) rather than through the xref table —
  * resilient to the truncated/appended files corpus crawls actually
  * contain, which is exactly the posture a curation pipeline wants.
  * Extraction contract: one line per `Td`-advance, lines joined "\n",
  * content streams (= pages, for writer-shaped files) joined "\n".
  */
object Pdf {

  /** Extract text, or None when the bytes are not a PDF at all. A valid
    * PDF with no text operators yields Some("").
    */
  def pdfText(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 5) return None
    if (!(bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' &&
        bytes(3) == 'F' && bytes(4) == '-')) return None
    val doc = new String(bytes, ISO_8859_1) // 1:1 byte↔char, lossless
    val out = new scala.collection.mutable.ArrayBuffer[String]
    var i = 0
    while (i >= 0 && i < doc.length) {
      i = doc.indexOf("stream", i)
      if (i >= 0) {
        // token boundary: skip the tail of "endstream"
        val isEnd = i >= 3 && doc.regionMatches(i - 3, "end", 0, 3)
        val after = i + 6
        val eolOk = after < doc.length &&
          (doc.charAt(after) == '\r' || doc.charAt(after) == '\n')
        if (!isEnd && eolOk) {
          val dict = dictBefore(doc, i)
          var dataStart = after
          if (doc.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < doc.length && doc.charAt(dataStart) == '\n') dataStart += 1
          val dataEnd = streamEnd(doc, dataStart, dict)
          if (dataEnd > dataStart) {
            val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
            val data =
              if (dict.contains("/FlateDecode")) inflate(raw) else Some(raw)
            // image streams are raster bytes, not content operators — a
            // JPEG that happens to contain the letters "BT" must not
            // garbage-parse into extracted text
            val isImage = dict.contains("/Subtype") && dict.contains("/Image")
            data.filter(_ => !isImage)
              .map(b => new String(b, ISO_8859_1)).foreach { content =>
              if (content.contains("BT")) {
                val lines = contentText(content)
                if (lines.nonEmpty) out += lines.mkString("\n")
              }
            }
            i = dataEnd
          } else i = after
        } else i = after
      }
    }
    Some(out.mkString("\n"))
  }

  /** Extract embedded raster images: every `/Subtype /Image` stream
    * whose filter is `/DCTDecode` — whose payload IS a complete baseline
    * JPEG by construction, directly decodable by
    * [[graft.expressions.JpegPixels]]/[[graft.expressions.JpegDHash]] —
    * in document order. Flate/raw-sample images are skipped (their
    * pixels are meaningless without the dict's geometry; the curation
    * pipeline wants self-contained image bytes). None when the bytes
    * are not a PDF; Some(empty) for a PDF with no DCT images.
    */
  def images(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes == null || bytes.length < 5) return None
    if (!(bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' &&
        bytes(3) == 'F' && bytes(4) == '-')) return None
    val doc = new String(bytes, ISO_8859_1)
    val out = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    var i = 0
    while (i >= 0 && i < doc.length) {
      i = doc.indexOf("stream", i)
      if (i >= 0) {
        val isEnd = i >= 3 && doc.regionMatches(i - 3, "end", 0, 3)
        val after = i + 6
        val eolOk = after < doc.length &&
          (doc.charAt(after) == '\r' || doc.charAt(after) == '\n')
        if (!isEnd && eolOk) {
          val dict = dictBefore(doc, i)
          var dataStart = after
          if (doc.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < doc.length && doc.charAt(dataStart) == '\n') dataStart += 1
          val dataEnd = streamEnd(doc, dataStart, dict)
          if (dataEnd > dataStart) {
            if (dict.contains("/Subtype") && dict.contains("/Image") &&
                dict.contains("/DCTDecode"))
              out += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
            i = dataEnd
          } else i = after
        } else i = after
      }
    }
    Some(out.toSeq)
  }

  /** The balanced `<< … >>` dictionary immediately preceding the `stream`
    * keyword at `at` (empty string if the file is malformed there).
    */
  private def dictBefore(doc: String, at: Int): String = {
    var j = at - 1
    while (j >= 0 && Character.isWhitespace(doc.charAt(j))) j -= 1
    if (j < 1 || doc.charAt(j) != '>' || doc.charAt(j - 1) != '>') return ""
    var depth = 1
    var k = j - 2
    while (k > 0 && depth > 0) {
      if (doc.charAt(k) == '>' && doc.charAt(k - 1) == '>') { depth += 1; k -= 2 }
      else if (doc.charAt(k) == '<' && doc.charAt(k - 1) == '<') { depth -= 1; k -= 2 }
      else k -= 1
    }
    if (depth == 0) doc.substring(k + 2, j + 1) else ""
  }

  /** End offset of stream data: trust a direct-integer /Length when it
    * lands on an `endstream`, else scan forward for the keyword (indirect
    * /Length references and lying lengths fall back to the scan).
    */
  private[llmops] def streamEnd(doc: String, dataStart: Int, dict: String): Int = {
    val byLength =
      for {
        // (?!\d) pins the match to the FULL integer: without it, an
        // indirect "/Length 12 0 R" backtracks to the digit prefix "1"
        // (the " 2 0 R" tail defeats the indirect-ref lookahead) and the
        // bogus direct length can truncate the stream at a whitespace+
        // "endstream" coincidence inside the data.
        m <- "/Length\\s+(\\d+)(?!\\d)(?!\\s+0\\s+R)".r.findFirstMatchIn(dict)
        len <- scala.util.Try(m.group(1).toInt).toOption
        end = dataStart + len
        if end <= doc.length && doc.indexOf("endstream", end) >= 0 &&
          doc.substring(end, math.min(doc.length, end + 11)).trim.startsWith("endstream")
      } yield end
    byLength.getOrElse {
      val e = doc.indexOf("endstream", dataStart)
      if (e < 0) -1
      else { // spec puts an EOL before the keyword; strip it from the data
        var end = e
        if (end > dataStart && doc.charAt(end - 1) == '\n') end -= 1
        if (end > dataStart && doc.charAt(end - 1) == '\r') end -= 1
        end
      }
    }
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsDictionary()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return None // truncated
        out.write(buf, 0, n)
      }
      // a preset-dictionary stream (FDICT) can't be inflated without the
      // dictionary — refuse rather than hand back a partial prefix
      if (inf.needsDictionary()) return None
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Text lines from one content stream. Line discipline: `Td`/`TD`/`T*`
    * after at least one show operator flush the current line (so a leading
    * positioning `Td` adds no phantom blank line, but an empty shown
    * string between moves survives as a genuinely empty line).
    */
  private[llmops] def contentText(s: String): Seq[String] = {
    val lines = new scala.collection.mutable.ArrayBuffer[String]
    val cur = new java.lang.StringBuilder
    var shown = false
    var lastStr: String = null
    var arr: scala.collection.mutable.ArrayBuffer[String] = null

    def flush(): Unit = { lines += cur.toString; cur.setLength(0); shown = false }
    def show(t: String): Unit = if (t != null) { cur.append(t); shown = true }

    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%') { while (i < n && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1 }
      else if (c == '(') {
        val (str, next) = literalString(s, i)
        lastStr = str
        if (arr != null) arr += str
        i = next
      } else if (c == '<') {
        if (i + 1 < n && s.charAt(i + 1) == '<') i += 2 // dict: tokens pass through harmlessly
        else {
          val (str, next) = hexString(s, i)
          lastStr = str
          if (arr != null) arr += str
          i = next
        }
      } else if (c == '[') { arr = new scala.collection.mutable.ArrayBuffer[String]; i += 1 }
      else if (c == ']') { i += 1 } // keep arr until the operator consumes it
      else if (c == '\'') { if (shown) flush(); show(lastStr); lastStr = null; i += 1 }
      else if (c == '"') { if (shown) flush(); show(lastStr); lastStr = null; i += 1 }
      else if (Character.isLetter(c) || c == '*') {
        val start = i
        while (i < n && (Character.isLetter(s.charAt(i)) || s.charAt(i) == '*' ||
          Character.isDigit(s.charAt(i)))) i += 1
        s.substring(start, i) match {
          case "Tj" => show(lastStr); lastStr = null
          case "TJ" =>
            if (arr != null) { arr.foreach(show); arr = null }
          case "Td" | "TD" | "T*" => if (shown) flush()
          case "BT" | "ET" => if (shown) flush()
          case _ => () // Tf, Tm, re, W, cm, …
        }
      } else i += 1
    }
    if (shown) flush()
    lines.toSeq
  }

  /** `(…)` literal string starting at `at`: full escape table, nested
    * balanced parens, backslash-EOL continuation. Returns (decoded, next).
    */
  private def literalString(s: String, at: Int): (String, Int) = {
    val bytes = new ByteArrayOutputStream
    var depth = 1
    var i = at + 1
    val n = s.length
    while (i < n && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val e = s.charAt(i + 1)
        e match {
          case 'n' => bytes.write('\n'); i += 2
          case 'r' => bytes.write('\r'); i += 2
          case 't' => bytes.write('\t'); i += 2
          case 'b' => bytes.write('\b'); i += 2
          case 'f' => bytes.write('\f'); i += 2
          case '(' => bytes.write('('); i += 2
          case ')' => bytes.write(')'); i += 2
          case '\\' => bytes.write('\\'); i += 2
          case '\r' => i += 2; if (i < n && s.charAt(i) == '\n') i += 1 // continuation
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < n && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
              v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
            }
            bytes.write(v & 0xFF)
          case other => bytes.write(other.toInt & 0xFF); i += 2
        }
      } else if (c == '(') { depth += 1; bytes.write('('); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) bytes.write(')'); i += 1 }
      else { bytes.write(c.toInt & 0xFF); i += 1 }
    }
    (decodeString(bytes.toByteArray), i)
  }

  /** `<hex>` string starting at `at`; odd digit counts pad with 0 per spec. */
  private def hexString(s: String, at: Int): (String, Int) = {
    val bytes = new ByteArrayOutputStream
    var i = at + 1
    var hi = -1
    val n = s.length
    var done = false
    while (i < n && !done) {
      val c = s.charAt(i)
      val d = Character.digit(c, 16)
      if (c == '>') { done = true; i += 1 }
      else if (d >= 0) {
        if (hi < 0) hi = d else { bytes.write(hi * 16 + d); hi = -1 }
        i += 1
      } else i += 1 // whitespace inside hex strings is legal
    }
    if (hi >= 0) bytes.write(hi * 16)
    (decodeString(bytes.toByteArray), i)
  }

  /** PDF text-string decode: UTF-16BE when BOM-prefixed, else latin-1 as
    * the PDFDocEncoding approximation (identical over ASCII).
    */
  private def decodeString(b: Array[Byte]): String =
    if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
      new String(b, 2, b.length - 2, UTF_16BE)
    else new String(b, ISO_8859_1)
}
