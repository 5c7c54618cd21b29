package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `WikiPages(content: binary)` — MediaWiki dump XML (optionally inside
  * any [[graft.llmops.Compression]] container, unwrapped here so a
  * `.xml.bz2` dump ingests in one expression) to one struct per page:
  *
  *   array<struct<title string, ns int, page_id long, redirect string,
  *                text string, plain string>>
  *
  * `redirect` is the `<redirect>` target (or the `#REDIRECT` link target
  * when the attribute is absent); `plain` is the cleaned wikitext via
  * [[graft.llmops.WikiDump.wikitextToPlain]] (empty for redirects — they
  * carry no prose). Malformed XML or a failed decompress refuses
  * wholesale with NULL, like every codec kernel.
  */
case class WikiPages(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WikiPages.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wiki_pages"

  override protected def nullSafeEval(input: Any): Any =
    WikiPages.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("wikiOut")
      s"""
       org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         graft.expressions.WikiPages.compute($c);
       if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): WikiPages =
    copy(child = newChild)
}

object WikiPages {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("ns", IntegerType, nullable = false),
    StructField("page_id", LongType, nullable = false),
    StructField("redirect", StringType, nullable = true),
    StructField("text", StringType, nullable = false),
    StructField("plain", StringType, nullable = false))), containsNull = false)

  def compute(content: Array[Byte]): ArrayData = {
    if (content == null) return null
    val xml =
      if (graft.llmops.Compression.sniffCodec(content).isDefined)
        graft.llmops.Compression.decodeAuto(content)
      else content
    if (xml == null) return null
    val pages = graft.llmops.WikiDump.pages(xml)
    if (pages == null) return null
    val rows = new Array[AnyRef](pages.length)
    var i = 0
    while (i < pages.length) {
      val p = pages(i)
      val redirect =
        if (p.redirect != null) p.redirect
        else graft.llmops.WikiDump.redirectTarget(p.text)
      val plain =
        if (redirect != null) ""
        else graft.llmops.WikiDump.wikitextToPlain(p.text)
      rows(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(p.title),
        p.ns,
        p.pageId,
        if (redirect == null) null else UTF8String.fromString(redirect),
        UTF8String.fromString(p.text),
        UTF8String.fromString(plain)))
      i += 1
    }
    new GenericArrayData(rows)
  }
}
