package graft.llmops

/** Main-content extraction from HTML — the boilerplate-removal step web
  * curation pipelines run BEFORE quality filtering (readability/jusText/
  * trafilatura class). [[DocumentText.htmlToText]] strips tags flat, which
  * keeps nav menus, footers and link farms in the text; training corpora
  * built that way are full of "Home About Contact © 2026" noise. This
  * extractor segments the page into text blocks and keeps only
  * content-shaped ones:
  *
  *   - subtrees of `<nav> <header> <footer> <aside>` (and `<script>
  *     <style>` + comments) are dropped wholesale — the semantic
  *     boilerplate containers;
  *   - remaining text is segmented at block-level tags (`p div li td h1-6
  *     article section blockquote br tr table ul ol main`);
  *   - a block is kept iff its link density (chars inside `<a>` / total
  *     chars) is at most `maxLinkDensity` AND it has at least `minWords`
  *     words — the jusText heuristics: link lists and one-word crumbs are
  *     boilerplate wherever they sit.
  *
  * Single pass, no DOM, poison-tolerant like every codec here: malformed
  * markup degrades to text, never throws. Kept blocks join with '\n'.
  */
object Html {

  // head: <title>/<meta> are metadata, not content (a flat strip leaks
  // the title into the first text block)
  private val SkipSubtrees = Set("nav", "header", "footer", "aside", "head")
  private val BlockTags = Set("p", "div", "li", "ul", "ol", "td", "tr",
    "table", "h1", "h2", "h3", "h4", "h5", "h6", "article", "section",
    "blockquote", "br", "main")

  def mainContent(html: String, maxLinkDensity: Double = 0.5,
      minWords: Int = 3): String = {
    if (html == null) return ""
    val out = new java.lang.StringBuilder
    val block = new java.lang.StringBuilder
    var linkChars = 0
    var blockChars = 0
    var aDepth = 0

    def flush(): Unit = {
      val text = DocumentText.normalize(block.toString)
      if (text.nonEmpty) {
        val words = text.split("\\s+").count(_.nonEmpty)
        val density =
          if (blockChars == 0) 0.0 else linkChars.toDouble / blockChars
        if (words >= minWords && density <= maxLinkDensity) {
          if (out.length > 0) out.append('\n')
          out.append(text)
        }
      }
      block.setLength(0)
      linkChars = 0
      blockChars = 0
      // aDepth deliberately survives the flush: HTML5 allows block content
      // inside <a> and card-style link farms (<a><div>story teaser</div>
      // </a>) are exactly what the density rule exists to catch — resetting
      // here would launder them into zero-density "content". The cost is
      // that a page with an unclosed <a> counts the rest as link text and
      // over-drops, which is the fail-safe direction for curation.
    }

    val n = html.length
    var i = 0
    // name of the subtree container being skipped + nesting count
    var skipTag: String = null
    var skipDepth = 0
    var rawUntil: String = null // inside <script>/<style>

    def tagNameAt(start: Int): String = {
      var e = start
      while (e < n && (html.charAt(e).isLetterOrDigit)) e += 1
      html.substring(start, e).toLowerCase
    }

    while (i < n) {
      val c = html.charAt(i)
      if (rawUntil != null) {
        if (c == '<' && html.regionMatches(true, i, rawUntil, 0, rawUntil.length)) {
          i += rawUntil.length
          while (i < n && html.charAt(i) != '>') i += 1
          i += 1
          rawUntil = null
        } else i += 1
      } else if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n &&
            (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          // declaration / processing instruction: <!DOCTYPE ...>, <?xml ...>
          while (i < n && html.charAt(i) != '>') i += 1
          i += 1
        } else if (i + 1 < n && (html.charAt(i + 1).isLetter || html.charAt(i + 1) == '/')) {
          val closing = html.charAt(i + 1) == '/'
          val name = tagNameAt(if (closing) i + 2 else i + 1)
          // advance past the tag
          while (i < n && html.charAt(i) != '>') i += 1
          val selfClosed = i > 0 && html.charAt(i - 1) == '/'
          i += 1
          if (skipTag != null) {
            // only the skip container's own open/close tags matter here
            if (name == skipTag && !selfClosed) {
              skipDepth += (if (closing) -1 else 1)
              if (skipDepth == 0) skipTag = null
            }
          } else if (!closing && (name == "script" || name == "style")) {
            rawUntil = "</" + name
          } else if (!closing && !selfClosed && SkipSubtrees(name)) {
            flush() // text before the container is its own block
            skipTag = name
            skipDepth = 1
          } else if (name == "a") {
            // <a/> (XHTML anchor targets) opens nothing
            if (closing) aDepth = math.max(0, aDepth - 1)
            else if (!selfClosed) aDepth += 1
          } else if (BlockTags(name)) {
            flush()
          } else {
            block.append(' ') // inline tags separate words
          }
        } else {
          block.append(c); i += 1 // stray '<'
        }
      } else if (skipTag != null) {
        i += 1
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          DocumentText.decodeEntity(html.substring(i + 1, semi)) match {
            case Some(ch) =>
              block.append(ch)
              blockChars += ch.length
              if (aDepth > 0) linkChars += ch.length
              i = semi + 1
            case None => block.append(c); blockChars += 1
              if (aDepth > 0) linkChars += 1
              i += 1
          }
        } else {
          block.append(c); blockChars += 1
          if (aDepth > 0) linkChars += 1
          i += 1
        }
      } else {
        block.append(c)
        if (!c.isWhitespace) {
          blockChars += 1
          if (aDepth > 0) linkChars += 1
        }
        i += 1
      }
    }
    flush()
    out.toString
  }

  /** Column form — the native [[graft.expressions.HtmlMainContent]]
    * expression over a binary or string column; scan-projection-local.
    */
  def mainContentCol(content: org.apache.spark.sql.Column,
      maxLinkDensity: Double = 0.5, minWords: Int = 3): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.HtmlMainContent(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content),
        maxLinkDensity, minWords))

  /** Head metadata ([[graft.expressions.HtmlMeta]]): struct(title,
    * canonical, description, lang, noindex, nofollow) —
    * scan-projection-local like [[mainContentCol]].
    */
  def metaCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.HtmlMeta(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Fixture twin: a realistic page around `mainParas` — head with title
    * and style, a nav link bar, the article paragraphs, a related-links
    * aside, a link-farm div (boilerplate that only the density rule can
    * catch) and a footer. [[mainContent]] of the output is exactly
    * `mainParas.mkString("\n")` (after whitespace normalization).
    */
  def writePage(mainParas: Seq[String], title: String = "Page",
      canonical: String = null, description: String = null,
      robots: String = null, lang: String = null): Array[Byte] = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html><html"
    if (lang != null) sb ++= s""" lang="$lang""""
    sb ++= "><head><title>" ++= esc(title)
    sb ++= "</title>"
    if (canonical != null)
      sb ++= s"""<link rel="canonical" href="$canonical">"""
    if (description != null)
      sb ++= s"""<meta name="description" content="${esc(description)}">"""
    if (robots != null)
      sb ++= s"""<meta name="robots" content="$robots">"""
    sb ++= "<style>body { margin: 0; }</style>"
    sb ++= "<script>var tracked = true;</script></head><body>"
    sb ++= "<header><h1>Example Site</h1></header>"
    sb ++= "<nav><ul><li><a href=\"/\">Home</a></li>"
    sb ++= "<li><a href=\"/about\">About our large team</a></li>"
    sb ++= "<li><a href=\"/contact\">Contact</a></li></ul></nav>"
    sb ++= "<article>"
    mainParas.foreach(p => sb ++= "<p>" ++= esc(p) ++= "</p>")
    sb ++= "</article>"
    sb ++= "<div class=\"related\"><a href=\"/a\">Ten more stories you should definitely read</a> "
    sb ++= "<a href=\"/b\">Subscribe to the newsletter today</a></div>"
    sb ++= "<aside>Advertisement: buy things</aside>"
    sb ++= "<footer>&#169; 2026 Example Site. All rights reserved.</footer>"
    sb ++= "</body></html>"
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
