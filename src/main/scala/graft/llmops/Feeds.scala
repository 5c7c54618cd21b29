package graft.llmops

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** RSS 2.0 / Atom feed parsing — the web's structured article index;
  * a crawl-curation pipeline uses feeds both as URL discovery (like
  * sitemaps) and as clean article metadata. Reference hook:
  * heterogeneous document ingestion,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * [[entries]] walks `<item>` (RSS) or `<entry>` (Atom) elements with
  * StAX: title, link (Atom prefers `rel="alternate"`, falls back to the
  * first `<link>`), published date (`pubDate` / `published` /
  * `updated`), and summary text (`description` / `summary` /
  * `content`, HTML-stripped through the html→text pipeline).
  * Malformed XML refuses wholesale (null); missing fields are empty
  * strings, never throws.
  */
object Feeds {

  final case class FeedEntry(title: String, link: String, published: String,
      summary: String)

  private final val MaxEntries = 4096
  private final val MaxBytes = 64 << 20

  /** True when bytes open (after optional BOM/whitespace/XML decl) with
    * an `<rss`, `<feed` or `<rdf:RDF` root.
    */
  def sniff(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 8) return false
    val head = new String(bytes, 0, math.min(bytes.length, 512),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val t = head.dropWhile(c => c.isWhitespace || c == '﻿')
    val afterDecl =
      if (t.startsWith("<?xml")) {
        val e = t.indexOf("?>")
        if (e < 0) return false
        t.substring(e + 2).dropWhile(_.isWhitespace)
      } else t
    val body = if (afterDecl.startsWith("<!--")) {
      val e = afterDecl.indexOf("-->")
      if (e < 0) return false
      afterDecl.substring(e + 3).dropWhile(_.isWhitespace)
    } else afterDecl
    body.startsWith("<rss") || body.startsWith("<feed") ||
      body.startsWith("<rdf:RDF")
  }

  /** Parse a feed; null when the bytes are not feed-shaped XML. */
  def entries(bytes: Array[Byte]): Array[FeedEntry] = {
    if (!sniff(bytes) || bytes.length > MaxBytes) return null
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    try {
      val r = f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
      val out = new scala.collection.mutable.ArrayBuffer[FeedEntry](16)
      var inEntry = false
      var depth = 0
      var title = ""; var link = ""; var published = ""; var summary = ""
      var altLink = ""
      var field: String = null
      val sb = new java.lang.StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val name = r.getLocalName
            if (!inEntry) {
              if (name == "item" || name == "entry") {
                inEntry = true; depth = 0
                title = ""; link = ""; published = ""; summary = ""; altLink = ""
              }
            } else {
              depth += 1
              // nested elements inside an open field (Atom
              // type="xhtml" content/summary wraps real markup) are
              // transparent: keep accumulating their character data
              // instead of dropping the whole field
              if (depth == 1) { field = null; name match {
                case "title" | "pubDate" | "published" | "updated" |
                     "description" | "summary" | "content" =>
                  field = name; sb.setLength(0)
                case "link" =>
                  val href = r.getAttributeValue(null, "href")
                  if (href != null) {
                    val rel = r.getAttributeValue(null, "rel")
                    if (rel == null || rel == "alternate") {
                      if (altLink.isEmpty) altLink = href
                    } else if (link.isEmpty && altLink.isEmpty) link = href
                  } else { field = "link"; sb.setLength(0) }
                case _ => ()
              } }
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (field != null) {
              sb.append(r.getText)
              if (sb.length > MaxBytes) return null
            }
          case XMLStreamConstants.END_ELEMENT =>
            val name = r.getLocalName
            if (inEntry) {
              if (depth == 0 && (name == "item" || name == "entry")) {
                inEntry = false
                val l = if (altLink.nonEmpty) altLink else link
                out += FeedEntry(title.trim, l.trim, published.trim,
                  summary.trim)
                if (out.length > MaxEntries) return null
              } else if (depth >= 1) {
                // save only at the FIELD element's own close (depth 1) —
                // a nested xhtml close must not flush a partial value
                if (depth == 1 && field != null) {
                  val v = sb.toString
                  field match {
                    case "title" => if (title.isEmpty) title = v
                    case "link" => if (link.isEmpty) link = v
                    case "pubDate" | "published" =>
                      if (published.isEmpty) published = v
                    case "updated" => if (published.isEmpty) published = v
                    case "description" | "summary" =>
                      if (summary.isEmpty)
                        summary = DocumentText.htmlToText(v)
                    case "content" =>
                      if (summary.isEmpty)
                        summary = DocumentText.htmlToText(v)
                    case _ => ()
                  }
                  field = null
                }
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

  /** Feed writer twin (fixture arm): RSS 2.0 or Atom. */
  def writeFeed(es: Seq[FeedEntry], atom: Boolean): Array[Byte] = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sb = new java.lang.StringBuilder(512)
    if (atom) {
      sb.append("<?xml version=\"1.0\"?>\n")
      sb.append("<feed xmlns=\"http://www.w3.org/2005/Atom\">\n")
      sb.append("  <title>fixture feed</title>\n")
      for (e <- es) {
        sb.append("  <entry>\n")
        sb.append("    <title>").append(esc(e.title)).append("</title>\n")
        sb.append("    <link rel=\"self\" href=\"https://self.example/ignored\"/>\n")
        sb.append("    <link rel=\"alternate\" href=\"").append(esc(e.link))
          .append("\"/>\n")
        sb.append("    <published>").append(esc(e.published))
          .append("</published>\n")
        sb.append("    <summary>").append(esc(e.summary)).append("</summary>\n")
        sb.append("  </entry>\n")
      }
      sb.append("</feed>\n")
    } else {
      sb.append("<?xml version=\"1.0\"?>\n<rss version=\"2.0\"><channel>\n")
      sb.append("<title>fixture channel</title>\n")
      for (e <- es) {
        sb.append("<item><title>").append(esc(e.title)).append("</title>")
        sb.append("<link>").append(esc(e.link)).append("</link>")
        sb.append("<pubDate>").append(esc(e.published)).append("</pubDate>")
        sb.append("<description>").append(esc(e.summary))
          .append("</description></item>\n")
      }
      sb.append("</channel></rss>\n")
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
