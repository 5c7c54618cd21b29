package graft.llmops

/** Email ingestion — RFC 5322 messages (`.eml`) and mbox mailboxes, a
  * long-standing public-corpus shape (mailing-list archives are classic
  * pretraining and eval material). Reference hook: heterogeneous
  * document ingestion, `aje_libs/documents/helpers/document_processor
  * .py:10-83`.
  *
  * Implemented: header parse with unfolding; RFC 2047 encoded-words in
  * Subject (B and Q encodings, charset honored); Content-Transfer-
  * Encoding 7bit/8bit/binary/quoted-printable/base64; charsets via the
  * JDK (unknown charsets fall back to latin-1, never throw); MIME
  * multipart walk to any nesting (alternative prefers text/plain, else
  * the last understood alternative; mixed concatenates), HTML
  * parts routed through the html→text pipeline; mboxrd/mboxo `From `
  * splitting with `>From` unstuffing. Poison posture: a malformed
  * message degrades to its raw undecoded text, never a throw; only a
  * byte array that is not email-shaped at all refuses (None).
  */
object Eml {

  final case class Message(subject: String, from: String, date: String,
      text: String)

  /** True when bytes look like an RFC 5322 message: a header block with
    * at least two canonical mail headers before the first blank line.
    */
  def sniff(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 16) return false
    val head = new String(bytes, 0,
      math.min(bytes.length, 4096), java.nio.charset.StandardCharsets.ISO_8859_1)
    val headerBlock = head.split("\r?\n\r?\n", 2)(0)
    if (headerBlock.length == head.length && bytes.length > 4096) {
      // no blank line inside 4 KB — header blocks are rarely that large
      return false
    }
    val names = headerBlock.split("\r?\n").iterator
      .filter(l => l.nonEmpty && !l.startsWith(" ") && !l.startsWith("\t"))
      .map(_.takeWhile(_ != ':').toLowerCase.trim).toSet
    val canonical = Set("from", "to", "subject", "date", "message-id",
      "received", "return-path", "delivered-to", "mime-version", "sender")
    names.count(canonical.contains) >= 2 && names.contains("from") ||
      names.count(canonical.contains) >= 3
  }

  /** Parse one message; None when the bytes are not email-shaped. */
  def parse(bytes: Array[Byte]): Option[Message] = {
    if (!sniff(bytes)) return None
    val (headers, bodyStart) = parseHeaders(bytes, 0, bytes.length)
    val subject = decodeWords(headers.getOrElse("subject", ""))
    val from = decodeWords(headers.getOrElse("from", ""))
    val date = headers.getOrElse("date", "")
    val text = partText(bytes, bodyStart, bytes.length, headers, depth = 0)
    Some(Message(subject, from, date, text))
  }

  /** Subject + body as one text blob (the document-pipeline contract). */
  def emlText(bytes: Array[Byte]): Option[String] =
    parse(bytes).map { m =>
      val s = m.subject.trim
      if (s.isEmpty) m.text.trim else s + "\n" + m.text.trim
    }

  /** Split an mbox into raw messages: separator lines `From ` at BOL,
    * `>From` unstuffed (mboxrd). None when not mbox-shaped.
    */
  def mboxMessages(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes == null || bytes.length < 7) return None
    if (!startsWith(bytes, 0, "From ")) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0
    var msgStart = -1
    while (i < bytes.length) {
      val atBol = i == 0 || bytes(i - 1) == '\n'
      if (atBol && startsWith(bytes, i, "From ")) {
        if (msgStart >= 0) out += unstuff(bytes, msgStart, i)
        // skip the separator line
        while (i < bytes.length && bytes(i) != '\n') i += 1
        i += 1
        msgStart = i
      } else i += 1
    }
    if (msgStart >= 0 && msgStart <= bytes.length)
      out += unstuff(bytes, msgStart, bytes.length)
    Some(out.toSeq)
  }

  private def unstuff(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(until - from)
    var i = from
    while (i < until) {
      val atBol = i == from || b(i - 1) == '\n'
      if (atBol && startsWith(b, i, ">From") ) i += 1 // drop one '>'
      else { out.write(b(i)); i += 1 }
    }
    out.toByteArray
  }

  private def startsWith(b: Array[Byte], off: Int, s: String): Boolean = {
    if (off + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if (b(off + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** Headers (lowercased names, unfolded values) + body offset. */
  private def parseHeaders(b: Array[Byte], start: Int,
      end: Int): (Map[String, String], Int) = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = start
    var lastName: String = null
    var done = false
    while (!done && i < end) {
      var j = i
      while (j < end && b(j) != '\n') j += 1
      val lineEnd = if (j > i && b(j - 1) == '\r') j - 1 else j
      val line = new String(b, i, lineEnd - i,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      i = j + 1
      if (line.isEmpty) done = true
      else if ((line.startsWith(" ") || line.startsWith("\t")) && lastName != null)
        out(lastName) = out(lastName) + " " + line.trim
      else {
        val c = line.indexOf(':')
        if (c > 0) {
          val name = line.substring(0, c).trim.toLowerCase
          val v = line.substring(c + 1).trim
          if (!out.contains(name)) { out(name) = v; lastName = name }
          // duplicate header: first value wins, and its continuation
          // lines must NOT unfold into the kept first value
          else lastName = null
        } else lastName = null
      }
    }
    (out.toMap, i)
  }

  /** RFC 2047 encoded-words: `=?charset?B|Q?payload?=`. */
  private[llmops] def decodeWords(s: String): String = {
    if (!s.contains("=?")) return s
    val re = "=\\?([^?]+)\\?([bBqQ])\\?([^?]*)\\?=".r
    re.replaceAllIn(s, m => {
      val cs = charsetFor(m.group(1))
      val enc = m.group(2).toUpperCase
      val payload = m.group(3)
      val bytes =
        if (enc == "B")
          try java.util.Base64.getMimeDecoder.decode(payload)
          catch { case _: IllegalArgumentException => payload.getBytes(cs) }
        else qDecode(payload.replace('_', ' '), qp = false)
      scala.util.matching.Regex.quoteReplacement(new String(bytes, cs))
    })
  }

  private def charsetFor(name: String): java.nio.charset.Charset =
    try java.nio.charset.Charset.forName(name.trim)
    catch { case scala.util.control.NonFatal(_) =>
      java.nio.charset.StandardCharsets.ISO_8859_1 }

  /** Quoted-printable (qp = true honors soft line breaks). */
  private[llmops] def qDecode(s: String, qp: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (qp && c == '=' &&
        (s.startsWith("=\r\n", i) || s.startsWith("=\n", i))) {
        i += (if (s.startsWith("=\r\n", i)) 3 else 2) // soft break
      } else if (c == '=' && i + 2 < s.length &&
        isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { out.write(c.toInt & 0xff); i += 1 }
    }
    out.toByteArray
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  private def contentType(headers: Map[String, String]): (String, Map[String, String]) = {
    val raw = headers.getOrElse("content-type", "text/plain")
    val parts = raw.split(";").toSeq
    val mime = parts.head.trim.toLowerCase
    val params = parts.tail.flatMap { p =>
      val eq = p.indexOf('=')
      if (eq <= 0) None
      else {
        val k = p.substring(0, eq).trim.toLowerCase
        var v = p.substring(eq + 1).trim
        if (v.startsWith("\"") && v.endsWith("\"") && v.length >= 2)
          v = v.substring(1, v.length - 1)
        Some(k -> v)
      }
    }.toMap
    (mime, params)
  }

  /** Text of one MIME part (recursing into multiparts, depth-capped). */
  private def partText(b: Array[Byte], start: Int, end: Int,
      headers: Map[String, String], depth: Int): String = {
    if (depth > 8) return ""
    val (mime, params) = contentType(headers)
    if (mime.startsWith("multipart/")) {
      val boundary = params.getOrElse("boundary", "")
      if (boundary.isEmpty) return ""
      val parts = splitParts(b, start, end, boundary)
      val texts = parts.flatMap { case (ps, pe) =>
        val (ph, bodyStart) = parseHeaders(b, ps, pe)
        val t = partText(b, bodyStart, pe, ph, depth + 1)
        if (t.trim.nonEmpty) Some((contentType(ph)._1, t)) else None
      }
      if (mime == "multipart/alternative") {
        // prefer plain, else the last understood alternative
        texts.find(_._1 == "text/plain").map(_._2)
          .orElse(texts.lastOption.map(_._2)).getOrElse("")
      } else texts.map(_._2).mkString("\n")
    } else if (mime == "message/rfc822") {
      val (ih, ibody) = parseHeaders(b, start, end)
      partText(b, ibody, end, ih, depth + 1)
    } else if (mime.startsWith("text/")) {
      val cte = headers.getOrElse("content-transfer-encoding", "7bit")
        .trim.toLowerCase
      val cs = charsetFor(params.getOrElse("charset", "utf-8"))
      val rawStr = new String(b, start, end - start,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val decoded: Array[Byte] = cte match {
        case "base64" =>
          try java.util.Base64.getMimeDecoder.decode(rawStr.trim)
          catch { case _: IllegalArgumentException =>
            java.util.Arrays.copyOfRange(b, start, end) }
        case "quoted-printable" => qDecode(rawStr, qp = true)
        case _ => java.util.Arrays.copyOfRange(b, start, end)
      }
      val text = new String(decoded, cs)
      if (mime == "text/html") DocumentText.htmlToText(text) else text
    } else "" // attachments and binary parts carry no corpus text
  }

  /** Byte ranges of the parts between boundary delimiters. */
  private def splitParts(b: Array[Byte], start: Int, end: Int,
      boundary: String): Seq[(Int, Int)] = {
    val delim = "--" + boundary
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = start
    var partStart = -1
    while (i < end) {
      val atBol = i == start || b(i - 1) == '\n'
      if (atBol && startsWith(b, i, delim) &&
          isDelimTail(b, i + delim.length, end)) {
        val lineStart = i
        if (partStart >= 0) {
          var pe = lineStart
          if (pe > partStart && b(pe - 1) == '\n') pe -= 1
          if (pe > partStart && b(pe - 1) == '\r') pe -= 1
          out += ((partStart, pe))
        }
        val closing = startsWith(b, i + delim.length, "--")
        while (i < end && b(i) != '\n') i += 1
        i += 1
        partStart = if (closing) -1 else i
        if (closing) i = end
      } else i += 1
    }
    // a truncated message may end without the closing `--boundary--`:
    // the in-flight final part is still real corpus text — emitting it
    // beats silently dropping the body (the same final-item-loss class
    // as the multistream-JSONL fix)
    if (partStart >= 0 && partStart < end) out += ((partStart, end))
    out.toSeq
  }

  /** RFC 2046 delimiter line rule: after `--boundary` the line must end
    * (optionally via `--`, whitespace, CR or LF) — so a nested part whose
    * boundary merely EXTENDS the outer one (outer `----=_Part_1`, inner
    * `----=_Part_12`, a common generator pattern) is not mis-read as the
    * outer delimiter.
    */
  private def isDelimTail(b: Array[Byte], j: Int, end: Int): Boolean = {
    if (j >= end) return true
    val c = b(j)
    c == '\r' || c == '\n' || c == ' ' || c == '\t' || startsWith(b, j, "--")
  }
}
