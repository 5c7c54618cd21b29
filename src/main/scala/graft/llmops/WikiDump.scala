package graft.llmops

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** MediaWiki XML dump ingestion — encyclopedic dumps are the canonical
  * curated pretraining source and they ship as `pages-articles.xml.bz2`,
  * which the [[Bzip2]] kernel now opens natively. One dataflow:
  * `decompress → pages → wikitextToPlain → quality/dedup screens`.
  * Reference hook: heterogeneous document ingestion,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * [[pages]] walks `<page>` elements with StAX (title, namespace, page
  * id, `<redirect>` target, latest revision wikitext). [[wikitextToPlain]]
  * applies a deterministic, documented cleaning pipeline (the
  * WikiExtractor family's rule set): comments, ref/math/gallery/source
  * blocks, nested templates, nested tables, wiki links with
  * file/image/category drops and innermost-first nesting, external
  * links, residual HTML tags, bold/italic quoting, magic words,
  * headings, list markers, HTML entities, whitespace normalization.
  * Malformed XML refuses wholesale (null); pathological markup degrades
  * to dropped spans, never a throw.
  */
object WikiDump {

  final case class WikiPage(title: String, ns: Int, pageId: Long,
      redirect: String, text: String)

  /** [[graft.expressions.WikiPages]] as a Column (the DataFrame surface). */
  def pagesCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WikiPages(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Dump batches → article rows: parse + clean in the scan, keep
    * main-namespace non-redirect pages with real prose. `(title, ns,
    * page_id, plain)`, one row per article.
    */
  def articles(df: org.apache.spark.sql.DataFrame,
      contentCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(explode(pagesCol(col(contentCol))).as("p"))
      .select(col("p.title").as("title"), col("p.ns").as("ns"),
        col("p.page_id").as("page_id"), col("p.redirect").as("redirect"),
        col("p.plain").as("plain"))
      .filter(col("ns") === 0 && col("redirect").isNull &&
        length(col("plain")) > 0)
      .drop("redirect")
  }

  /** `pages-articles.xml.bz2` batches → the deduped corpus in one call:
    * [[articles]] feeds the standard ingestion protocol (keep per title,
    * MinHash near-dup screen, signature store, replay idempotency) —
    * the encyclopedic twin of `Warc.ingestCrawlBatch`. Returns rows
    * appended.
    */
  def ingestDumps(spark: org.apache.spark.sql.SparkSession,
      batch: org.apache.spark.sql.DataFrame, contentCol: String,
      corpusPath: String, signaturePath: Option[String] = None,
      lockStore: Option[graft.operators.LockStore] = None): Long =
    graft.streaming.CorpusIngest.ingestBatch(spark,
      articles(batch, contentCol), corpusPath,
      textCol = "plain", keyCol = "title",
      signaturePath = signaturePath, lockStore = lockStore)

  private final val MaxPages = 4096
  private final val MaxBytes = 64 << 20

  /** The canonical single-file artifact — `pages-articles-multistream
    * .xml.bz2`, tens of GB of CONCATENATED bzip2 streams (~100 pages
    * each) — cannot ride the 64 MB per-row fragment cap whole. This
    * file-source path splits it WITHOUT ever materializing the file in
    * one place:
    *
    *  1. [[dumpStreamOffsets]] (= [[Bz2Streams.offsets]], the shared
    *     splitter every concatenated-bz2 layout uses — pbzip2 files
    *     included) — parallel byte-range scan (default
    *     32 MB ranges, one task each; a 20 GB dump is ~640 tasks) for
    *     the 10-byte bzip2 stream magic (`BZh` + level + block magic
    *     0x314159265359, byte-aligned because every multistream member
    *     is a complete bzip2 FILE). Ranges overlap by 16 bytes so a
    *     magic straddling a boundary is still seen exactly once.
    *  2. [[readDumpFragments]] — pair consecutive offsets into slices
    *     (tiny (offset, length) rows — the corpus bytes never shuffle),
    *     then per slice: seek + read exactly those bytes, [[Bzip2]]
    *     decode, trim to the `<page>…</page>` span (drops the unclosed
    *     `<mediawiki>`/`<siteinfo>` head of the first stream and the
    *     bare trailer of the last), split at `</page>` boundaries into
    *     fragments at most `maxFragmentBytes`, and wrap each in a
    *     `<pages>` root for the [[pages]] kernel.
    *  3. [[ingestDumpFile]] — feed the fragments to [[ingestDumps]].
    *
    * A false magic inside compressed payload is possible in principle
    * (P ≈ file bytes × 2⁻⁸⁰): the affected slice pair decodes null and
    * is dropped, never mis-parsed. Streams whose decoded form exceeds
    * the 64 MB codec cap refuse the same way.
    */
  def dumpStreamOffsets(spark: org.apache.spark.sql.SparkSession,
      path: String, rangeBytes: Int = 32 << 20): org.apache.spark.sql.DataFrame =
    Bz2Streams.offsets(spark, path, rangeBytes)

  /** (content) rows — one ≤`maxFragmentBytes` `<pages>`-wrapped fragment
    * per chunk of whole pages — from a multistream dump file. See
    * [[dumpStreamOffsets]] for the dataflow.
    */
  def readDumpFragments(spark: org.apache.spark.sql.SparkSession,
      path: String, maxFragmentBytes: Int = MaxBytes,
      rangeBytes: Int = 32 << 20): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    require(maxFragmentBytes > 32, "maxFragmentBytes too small")
    Bz2Streams.readStreams(spark, path, rangeBytes)
      .select("content").as[Array[Byte]]
      .flatMap(xml => splitPageFragments(xml, maxFragmentBytes).iterator)
      .toDF("content")
  }

  /** A multistream dump FILE → the deduped corpus in one call: the
    * splitter feeds [[ingestDumps]]. Returns rows appended.
    */
  def ingestDumpFile(spark: org.apache.spark.sql.SparkSession,
      path: String, corpusPath: String,
      signaturePath: Option[String] = None,
      lockStore: Option[graft.operators.LockStore] = None,
      maxFragmentBytes: Int = MaxBytes,
      rangeBytes: Int = 32 << 20): Long =
    ingestDumps(spark, readDumpFragments(spark, path, maxFragmentBytes,
      rangeBytes), "content", corpusPath, signaturePath, lockStore)

  /** `BZh` + level + block magic ([[Bz2Streams.isStreamMagic]]). */
  private[llmops] def isBz2StreamMagic(b: Array[Byte], i: Int): Boolean =
    Bz2Streams.isStreamMagic(b, i)

  /** Trim `xml` to its `<page>…</page>` span and split at page
    * boundaries into `<pages>`-wrapped fragments of at most `cap`
    * bytes. A fragment always holds WHOLE pages; a single page larger
    * than the cap is dropped (it could never parse downstream — the
    * refusal is explicit here instead of wholesale there).
    */
  private[llmops] def splitPageFragments(xml: Array[Byte],
      cap: Int): Seq[Array[Byte]] = {
    val s = new String(xml, java.nio.charset.StandardCharsets.UTF_8)
    val open = "<page"
    val close = "</page>"
    val head = "<pages>"
    val tail = "</pages>"
    val budget = math.max(1, cap - head.length - tail.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val chunk = new java.lang.StringBuilder
    def flush(): Unit = if (chunk.length > 0) {
      out += (head + chunk + tail)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      chunk.setLength(0)
    }
    var i = s.indexOf(open)
    while (i >= 0) {
      val e = s.indexOf(close, i)
      if (e < 0) i = -1 // truncated trailing page: drop
      else {
        val pageLen = e + close.length - i
        if (chunk.length > 0 && chunk.length + pageLen > budget) flush()
        if (pageLen <= budget) chunk.append(s, i, e + close.length)
        // else: single over-cap page dropped
        i = s.indexOf(open, e + close.length)
      }
    }
    flush()
    out.toSeq
  }

  /** Parse a dump (the full file or any well-formed `<mediawiki>`/`<pages>`
    * fragment); null on malformed XML, cap overflows refuse wholesale.
    */
  def pages(xml: Array[Byte]): Array[WikiPage] = {
    if (xml == null || xml.length == 0 || xml.length > MaxBytes) return null
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    try {
      val r = f.createXMLStreamReader(new java.io.ByteArrayInputStream(xml))
      val out = new scala.collection.mutable.ArrayBuffer[WikiPage](64)
      var inPage = false
      var depth = 0 // element depth relative to <page>
      var inRevision = false
      var title: String = null
      var ns = 0
      var pageId = -1L
      var redirect: String = null
      var text: String = null
      var field: String = null
      val sb = new java.lang.StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val name = r.getLocalName
            if (!inPage) {
              if (name == "page") {
                inPage = true; depth = 0; inRevision = false
                title = null; ns = 0; pageId = -1L; redirect = null; text = null
              }
            } else {
              depth += 1
              if (depth == 1 && name == "revision") inRevision = true
              field = null
              if (depth == 1) name match {
                case "title" | "ns" | "id" => field = name; sb.setLength(0)
                case "redirect" =>
                  val t = r.getAttributeValue(null, "title")
                  if (redirect == null) redirect = t
                case _ => ()
              } else if (depth == 2 && inRevision && name == "text" &&
                text == null) {
                field = "text"; sb.setLength(0)
              }
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (field != null) {
              sb.append(r.getText)
              if (sb.length > MaxBytes) return null
            }
          case XMLStreamConstants.END_ELEMENT =>
            val name = r.getLocalName
            if (inPage) {
              if (depth == 0 && name == "page") {
                inPage = false
                if (title != null && pageId >= 0) {
                  out += WikiPage(title, ns, pageId, redirect,
                    if (text == null) "" else text)
                  if (out.length > MaxPages) return null
                }
              } else if (depth >= 1) {
                if (field != null) {
                  field match {
                    case "title" => title = sb.toString
                    case "ns" =>
                      ns = try sb.toString.trim.toInt catch {
                        case _: NumberFormatException => 0
                      }
                    case "id" => if (pageId < 0)
                      pageId = try sb.toString.trim.toLong catch {
                        case _: NumberFormatException => -1L
                      }
                    case "text" => text = sb.toString
                    case _ => ()
                  }
                  field = null
                }
                if (depth == 1 && name == "revision") inRevision = false
                depth -= 1
              }
            }
          case _ => ()
        }
      }
      r.close()
      out.toArray
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Redirect target of a `#REDIRECT [[Target]]` body; null otherwise. */
  def redirectTarget(wikitext: String): String = {
    if (wikitext == null) return null
    val t = wikitext.trim
    if (!t.toUpperCase.startsWith("#REDIRECT")) return null
    val open = t.indexOf("[[")
    val close = t.indexOf("]]", open + 2)
    if (open < 0 || close < 0) return null
    val inner = t.substring(open + 2, close)
    val bar = inner.indexOf('|')
    (if (bar >= 0) inner.substring(0, bar) else inner).trim
  }

  private val DropBlocks = Seq("ref", "math", "gallery", "timeline",
    "source", "syntaxhighlight", "score", "nowiki")

  /** Wikitext → plain text (deterministic rule pipeline, see object doc). */
  def wikitextToPlain(src: String): String = {
    if (src == null) return null
    var s = src
    // 1. comments (unterminated → drop to end)
    s = dropSpans(s, "<!--", "-->")
    // 2. drop-with-content blocks + self-closing refs; a pathological
    // page (100k+ occurrences of one tag) refuses wholesale
    for (tag <- DropBlocks) {
      s = dropTagBlocks(s, tag)
      if (s == null) return null
    }
    // 3. nested templates
    s = dropNested(s, "{{", "}}")
    // 4. tables (nested)
    s = dropNested(s, "{|", "|}")
    // 5. wiki links, innermost first
    s = resolveWikiLinks(s)
    // 6. external links
    s = resolveExternalLinks(s)
    // 7. residual tags
    s = stripTags(s)
    // 8. quotes
    s = s.replace("'''''", "").replace("'''", "").replace("''", "")
    // 9. magic words
    s = s.replaceAll("__[A-Z]+__", "")
    // 10-13. headings, list markers, entities, whitespace
    val lines = s.split("\n", -1).iterator.map { raw =>
      var line = raw.trim
      if (line.startsWith("=") && line.endsWith("=") && line.length > 1) {
        line = line.dropWhile(_ == '=').reverse.dropWhile(_ == '=').reverse.trim
      }
      var k = 0
      while (k < line.length &&
        (line(k) == '*' || line(k) == '#' || line(k) == ':' || line(k) == ';'))
        k += 1
      line = line.substring(k)
      line = decodeEntities(line)
      line.replaceAll("[ \\t\\u00a0]+", " ").trim
    }
    lines.filter(_.nonEmpty).mkString("\n")
  }

  private def dropSpans(s: String, open: String, close: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val o = s.indexOf(open, i)
      if (o < 0) { sb.append(s, i, s.length); i = s.length }
      else {
        sb.append(s, i, o)
        val c = s.indexOf(close, o + open.length)
        i = if (c < 0) s.length else c + close.length
      }
    }
    sb.toString
  }

  /** Drop `<tag ...>...</tag>` and `<tag ... />` (case-insensitive).
    * Returns null past 100 000 tag occurrences — wholesale refusal of a
    * pathological page (the repo's parser contract), never a silent
    * truncation.
    */
  private def dropTagBlocks(s: String, tag: String): String = {
    val lower = s.toLowerCase
    val openTok = "<" + tag
    val closeTok = "</" + tag
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var guard = 0
    while (i < s.length) {
      guard += 1
      if (guard > 100000) return null
      val o = lower.indexOf(openTok, i)
      val valid = o >= 0 && {
        val after = o + openTok.length
        after >= s.length || !Character.isLetterOrDigit(lower.charAt(after))
      }
      if (!valid) { sb.append(s, i, s.length); i = s.length }
      else {
        sb.append(s, i, o)
        val gt = s.indexOf('>', o)
        if (gt < 0) i = s.length
        else if (s.charAt(gt - 1) == '/') i = gt + 1 // self-closing
        else {
          val c = lower.indexOf(closeTok, gt + 1)
          if (c < 0) i = s.length
          else {
            val gt2 = s.indexOf('>', c)
            i = if (gt2 < 0) s.length else gt2 + 1
          }
        }
      }
    }
    sb.toString
  }

  private def dropNested(s: String, open: String, close: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var depth = 0
    while (i < s.length) {
      if (s.startsWith(open, i)) { depth += 1; i += open.length }
      else if (depth > 0 && s.startsWith(close, i)) { depth -= 1; i += close.length }
      else {
        if (depth == 0) sb.append(s.charAt(i))
        i += 1
      }
    }
    sb.toString
  }

  private val DropLinkPrefixes =
    Set("file", "image", "category", "media")

  /** `[[target|label]]` → label / target; file-class links dropped.
    * Single linear pass with a bracket stack — each `]]` resolves the
    * innermost open link into its parent frame, so image captions
    * containing links resolve, list-type articles with tens of
    * thousands of links stay O(n), and there is no iteration cap.
    * Unmatched `[[` frames are restored literally at the end.
    */
  private def resolveWikiLinks(s: String): String = {
    if (s.indexOf("[[") < 0) return s
    val root = new java.lang.StringBuilder(s.length)
    val stack = new scala.collection.mutable.ArrayBuffer[java.lang.StringBuilder]
    def top: java.lang.StringBuilder =
      if (stack.isEmpty) root else stack(stack.length - 1)
    var i = 0
    while (i < s.length) {
      if (s.startsWith("[[", i)) {
        stack += new java.lang.StringBuilder
        i += 2
      } else if (s.startsWith("]]", i) && stack.nonEmpty) {
        val inner = stack.remove(stack.length - 1).toString
        val colon = inner.indexOf(':')
        val prefix =
          if (colon > 0) inner.substring(0, colon).trim.toLowerCase else ""
        if (!DropLinkPrefixes.contains(prefix)) {
          val bar = inner.lastIndexOf('|')
          top.append(if (bar >= 0) inner.substring(bar + 1) else inner)
        }
        i += 2
      } else {
        top.append(s.charAt(i))
        i += 1
      }
    }
    for (f <- stack) { root.append("[["); root.append(f) }
    root.toString
  }

  private def resolveExternalLinks(s0: String): String = {
    val sb = new java.lang.StringBuilder(s0.length)
    var i = 0
    while (i < s0.length) {
      val ch = s0.charAt(i)
      if (ch == '[' && (s0.startsWith("[http://", i) ||
        s0.startsWith("[https://", i) || s0.startsWith("[ftp://", i) ||
        s0.startsWith("[//", i))) {
        val close = s0.indexOf(']', i + 1)
        if (close < 0) i += 1
        else {
          val inner = s0.substring(i + 1, close)
          val sp = inner.indexOf(' ')
          if (sp >= 0) sb.append(inner.substring(sp + 1))
          i = close + 1
        }
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

  private def stripTags(s: String): String =
    s.replaceAll("<[A-Za-z/!][^>]*>", "")

  /** Writer twin: a minimal well-formed dump for the given pages (the
    * fixture arm of the gates; `codec` wraps it with [[Compression]] —
    * `Some("bzip2")` reproduces the published `.xml.bz2` layout).
    */
  def writeDump(ps: Seq[WikiPage], codec: Option[String] = None): Array[Byte] = {
    val sb = new java.lang.StringBuilder(1024)
    sb.append("<mediawiki xmlns=\"http://www.mediawiki.org/xml/export-0.11/\">\n")
    ps.foreach(appendPageXml(sb, _))
    sb.append("</mediawiki>\n")
    val xml = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    codec match {
      case Some(c) => Compression.encode(xml, c)
      case None => xml
    }
  }

  private def appendPageXml(sb: java.lang.StringBuilder, p: WikiPage): Unit = {
    sb.append("  <page>\n")
    sb.append("    <title>").append(xmlEscape(p.title)).append("</title>\n")
    sb.append("    <ns>").append(p.ns).append("</ns>\n")
    sb.append("    <id>").append(p.pageId).append("</id>\n")
    if (p.redirect != null)
      sb.append("    <redirect title=\"").append(xmlEscape(p.redirect))
        .append("\" />\n")
    sb.append("    <revision>\n      <id>").append(p.pageId * 10)
      .append("</id>\n      <text bytes=\"").append(p.text.length)
      .append("\">").append(xmlEscape(p.text)).append("</text>\n")
    sb.append("    </revision>\n  </page>\n")
  }

  /** Writer twin of the published MULTISTREAM layout: one bzip2 stream
    * per page batch, concatenated — the first stream opens the (never
    * locally closed) `<mediawiki>` root with a `<siteinfo>` header, the
    * last stream is the bare `</mediawiki>` trailer. This is exactly
    * the shape [[dumpStreamOffsets]]/[[readDumpFragments]] split.
    */
  def writeMultistreamDump(batches: Seq[Seq[WikiPage]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def stream(text: String): Unit = out.write(Compression.encode(
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8), "bzip2"))
    batches.zipWithIndex.foreach { case (ps, i) =>
      val sb = new java.lang.StringBuilder(1024)
      if (i == 0)
        sb.append("<mediawiki xmlns=\"http://www.mediawiki.org/xml/" +
          "export-0.11/\">\n  <siteinfo>\n    <sitename>graft" +
          "</sitename>\n  </siteinfo>\n")
      ps.foreach(appendPageXml(sb, _))
      stream(sb.toString)
    }
    stream("</mediawiki>\n")
    out.toByteArray
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          val rep: String = name match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case "ndash" => "–"
            case "mdash" => "—"
            case "hellip" => "…"
            case n if n.startsWith("#x") || n.startsWith("#X") =>
              try new String(Character.toChars(
                Integer.parseInt(n.substring(2), 16)))
              catch { case _: RuntimeException => null }
            case n if n.startsWith("#") =>
              try new String(Character.toChars(Integer.parseInt(n.substring(1))))
              catch { case _: RuntimeException => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1 }
          else { sb.append(ch); i += 1 }
        } else { sb.append(ch); i += 1 }
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }
}
