package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sitemap parsing (sitemaps.org protocol) — the crawl-discovery
  * companion of the robots.txt screen (robots files point crawlers at
  * sitemaps; a corpus builder walks them to scope a site). One
  * expression covers the three shapes the protocol defines:
  *
  *  - XML `<urlset>`: one row per `<url>` with `loc` (required —
  *    entries without it are skipped per spec), `lastmod`, `kind='url'`,
  *  - XML `<sitemapindex>`: one row per `<sitemap>` with `kind='sitemap'`
  *    (the caller feeds those locs back through fetch + parse),
  *  - plain-text lists: one absolute URL per line, `kind='url'`,
  *  - any of the above gzip-compressed (`.xml.gz` — sniffed, not named).
  *
  * Returns `array<struct<kind, loc, lastmod>>`; NULL (wholesale
  * refusal) for bytes that are none of these, XML with a foreign root,
  * or malformed XML. 50 000-entry cap per the protocol's own limit.
  */
case class SitemapUrls(child: Expression) extends UnaryExpression {

  override def dataType: DataType = SitemapUrls.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sitemap_urls"

  override protected def nullSafeEval(input: Any): Any =
    SitemapUrls.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.SitemapUrls.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SitemapUrls =
    copy(child = newChild)
}

object SitemapUrls {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true))), containsNull = false)

  private val MaxEntries = 50000
  private val MaxBytes = 64 << 20

  def compute(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 2) return null
    val raw =
      if ((bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B) {
        try {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n > 0) {
            if (out.size + n > MaxBytes) return null
            out.write(buf, 0, n)
            n = in.read(buf)
          }
          out.toByteArray
        } catch { case _: java.io.IOException => return null }
      } else bytes
    val text = new String(raw, java.nio.charset.StandardCharsets.UTF_8)
    val trimmed = text.dropWhile(c => c.isWhitespace || c == '﻿')
    if (trimmed.startsWith("<")) parseXml(trimmed)
    else if (trimmed.startsWith("http://") || trimmed.startsWith("https://"))
      parseTextList(trimmed)
    else null
  }

  private def parseTextList(text: String): ArrayData = {
    val out = Vector.newBuilder[AnyRef]
    var n = 0
    text.split("\r?\n", -1).foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty) {
        // a text sitemap is ONLY absolute URLs; any other line refuses
        if (!line.startsWith("http://") && !line.startsWith("https://"))
          return null
        if (n >= MaxEntries) return null
        out += row("url", line, null)
        n += 1
      }
    }
    if (n == 0) null else new GenericArrayData(out.result().toArray)
  }

  private def row(kind: String, loc: String, lastmod: String): AnyRef =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(kind),
      UTF8String.fromString(loc),
      if (lastmod == null) null else UTF8String.fromString(lastmod)))

  private def parseXml(text: String): ArrayData = {
    val factory = javax.xml.stream.XMLInputFactory.newInstance()
    factory.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(
      javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val out = Vector.newBuilder[AnyRef]
    var n = 0
    try {
      val r = factory.createXMLStreamReader(new java.io.StringReader(text))
      try {
        var rootKind: String = null // "url" | "sitemap"
        var loc: String = null
        var lastmod: String = null
        var inEntry = false
        // element depth RELATIVE to the open entry: loc/lastmod count
        // only at depth 1 — extension subtrees (Google image sitemaps:
        // <image:image><image:loc>…) reuse the LOCAL name "loc", and a
        // namespace-blind match let a nested image loc overwrite the
        // page URL
        var edepth = 0
        var field: String = null
        val sb = new java.lang.StringBuilder
        while (r.hasNext) {
          r.next() match {
            case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
              val name = r.getLocalName
              if (rootKind == null) {
                rootKind = name match {
                  case "urlset" => "url"
                  case "sitemapindex" => "sitemap"
                  case _ => return null // foreign XML root
                }
              } else if (!inEntry) {
                if (name == "url" || name == "sitemap") {
                  inEntry = true; edepth = 0; loc = null; lastmod = null
                }
              } else {
                edepth += 1
                if (edepth == 1 && (name == "loc" || name == "lastmod")) {
                  field = name; sb.setLength(0)
                }
              }
            case javax.xml.stream.XMLStreamConstants.CHARACTERS
                if field != null =>
              sb.append(r.getText)
            case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
              val name = r.getLocalName
              if (inEntry) {
                if (edepth == 0 && (name == "url" || name == "sitemap")) {
                  inEntry = false
                  if (loc != null && loc.nonEmpty) {
                    if (n >= MaxEntries) return null
                    out += row(rootKind, loc, lastmod)
                    n += 1
                  }
                } else if (edepth >= 1) {
                  if (edepth == 1) name match {
                    case "loc" if field == "loc" =>
                      loc = sb.toString.trim; field = null
                    case "lastmod" if field == "lastmod" =>
                      lastmod = sb.toString.trim; field = null
                    case _ => ()
                  }
                  edepth -= 1
                }
              }
            case _ => ()
          }
        }
      } finally r.close()
    } catch { case _: javax.xml.stream.XMLStreamException => return null }
    new GenericArrayData(out.result().toArray)
  }
}
