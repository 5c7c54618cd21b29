package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML head metadata for crawl curation —
  * `graft_html_meta(content)` walks the tag stream once and returns
  *
  * `struct<title string, canonical string, description string,
  * lang string, noindex boolean, nofollow boolean>`
  *
  * the four fields a corpus pipeline keys decisions on: `canonical`
  * (`<link rel=canonical href=…>` — the SITE's own statement that many
  * URLs are one page, the strongest URL-dedup signal a crawl gets),
  * `noindex`/`nofollow` (`<meta name=robots>` directives a polite
  * corpus honors before training on a page), `lang` (the `<html lang>`
  * attribute — a prior the n-gram language-ID screen can confirm), plus
  * `title`/`description` for document metadata.
  *
  * Parse discipline: first occurrence wins for every field (the head's
  * values, per spec ordering); `<script>`/`<style>` bodies and comments
  * are opaque; attribute values may be double-, single- or un-quoted;
  * entities in title/description decode through the shared
  * [[graft.llmops.DocumentText]] tables; robots directives split on
  * commas/whitespace, case-insensitive (`NOINDEX` counts, `noindexx`
  * does not). Absent fields are NULL (absence is data, not refusal) —
  * but a document with no `<` at all is NOT HTML and refuses wholesale,
  * keeping the not-a-document convention of the codec family.
  */
case class HtmlMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = HtmlMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val html = child.dataType match {
      case BinaryType => UTF8String.fromBytes(input.asInstanceOf[Array[Byte]])
      case _ => input.asInstanceOf[UTF8String]
    }
    HtmlMeta.compute(html)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wrap = child.dataType match {
      case BinaryType => (c: String) =>
        s"org.apache.spark.unsafe.types.UTF8String.fromBytes($c)"
      case _ => (c: String) => c
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.HtmlMeta.compute(${wrap(c)});
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlMeta =
    copy(child = newChild)
}

object HtmlMeta {

  val schema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("canonical", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("noindex", BooleanType, nullable = false),
    StructField("nofollow", BooleanType, nullable = false)))

  /** Attribute map of the tag whose body spans `html[from, to)` (the
    * text between the tag name and `>`): lowercase names, raw values.
    */
  private def attrs(html: String, from: Int, to: Int): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    var i = from
    while (i < to) {
      // skip whitespace and stray slashes
      while (i < to && (html.charAt(i).isWhitespace || html.charAt(i) == '/'))
        i += 1
      val nameStart = i
      while (i < to && html.charAt(i) != '=' && html.charAt(i) != '>' &&
        !html.charAt(i).isWhitespace && html.charAt(i) != '/') i += 1
      if (i > nameStart) {
        val name = html.substring(nameStart, i).toLowerCase(java.util.Locale.ROOT)
        var j = i
        while (j < to && html.charAt(j).isWhitespace) j += 1
        if (j < to && html.charAt(j) == '=') {
          j += 1
          while (j < to && html.charAt(j).isWhitespace) j += 1
          if (j < to && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
            val q = html.charAt(j)
            val end = html.indexOf(q, j + 1)
            val stop = if (end < 0 || end > to) to else end
            m += name -> html.substring(j + 1, stop)
            i = if (stop < to) stop + 1 else to
          } else {
            val valStart = j
            while (j < to && !html.charAt(j).isWhitespace &&
              html.charAt(j) != '>') j += 1
            m += name -> html.substring(valStart, j)
            i = j
          }
        } else {
          m += name -> "" // bare attribute
        }
      } else i += 1
    }
    m.result()
  }

  private def decodeText(s: String): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          graft.llmops.DocumentText.decodeEntity(s.substring(i + 1, semi)) match {
            case Some(ch) => sb.append(ch); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    graft.llmops.DocumentText.normalize(sb.toString)
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(in: UTF8String): InternalRow = {
    if (in == null) return null
    val html = in.toString
    if (html.indexOf('<') < 0) return null // not markup at all
    var title: String = null
    var canonical: String = null
    var description: String = null
    var lang: String = null
    var noindex = false
    var nofollow = false
    val n = html.length
    var i = 0
    var rawUntil: String = null
    while (i < n) {
      val c = html.charAt(i)
      if (rawUntil != null) {
        if (c == '<' &&
            html.regionMatches(true, i, rawUntil, 0, rawUntil.length)) {
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
          while (i < n && html.charAt(i) != '>') i += 1
          i += 1
        } else if (i + 1 < n && html.charAt(i + 1).isLetter) {
          var e = i + 1
          while (e < n && html.charAt(e).isLetterOrDigit) e += 1
          val name = html.substring(i + 1, e).toLowerCase(java.util.Locale.ROOT)
          var gt = e
          while (gt < n && html.charAt(gt) != '>') gt += 1
          name match {
            case "script" | "style" =>
              rawUntil = "</" + name
            case "title" if title == null =>
              val close = html.indexOf("</title", gt + 1)
              if (close > gt) {
                title = decodeText(html.substring(gt + 1, close))
                i = close
              }
            case "link" =>
              val a = attrs(html, e, gt)
              val rel = a.getOrElse("rel", "")
                .toLowerCase(java.util.Locale.ROOT)
              if (canonical == null &&
                  rel.split("[\\s]+").contains("canonical") &&
                  a.contains("href") && a("href").nonEmpty)
                canonical = a("href")
            case "meta" =>
              val a = attrs(html, e, gt)
              val metaName = a.getOrElse("name", "")
                .toLowerCase(java.util.Locale.ROOT)
              if (metaName == "description" && description == null &&
                  a.contains("content"))
                description = decodeText(a("content"))
              else if (metaName == "robots" && a.contains("content")) {
                a("content").split("[,\\s]+").foreach { d =>
                  d.toLowerCase(java.util.Locale.ROOT) match {
                    case "noindex" => noindex = true
                    case "nofollow" => nofollow = true
                    case "none" => noindex = true; nofollow = true
                    case _ => ()
                  }
                }
              }
            case "html" if lang == null =>
              val a = attrs(html, e, gt)
              if (a.contains("lang") && a("lang").nonEmpty)
                lang = a("lang").toLowerCase(java.util.Locale.ROOT)
            case _ => ()
          }
          i = math.max(i + 1, gt + 1)
        } else i += 1
      } else i += 1
    }
    new GenericInternalRow(Array[Any](
      if (title == null) null else UTF8String.fromString(title),
      if (canonical == null) null else UTF8String.fromString(canonical),
      if (description == null) null else UTF8String.fromString(description),
      if (lang == null) null else UTF8String.fromString(lang),
      noindex, nofollow))
  }
}
