package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `FeedEntries(content: binary)` — RSS 2.0 / Atom feeds (optionally
  * inside a [[graft.llmops.Compression]] container — feeds commonly
  * ship gzipped) as one struct per article:
  *
  *   array<struct<title string, link string, published string,
  *                summary string>>
  *
  * Atom `rel="alternate"` links preferred; summaries HTML-stripped
  * ([[graft.llmops.Feeds]]). NULL for non-feed bytes or malformed XML.
  */
case class FeedEntries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = FeedEntries.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_feed_entries"

  override protected def nullSafeEval(input: Any): Any =
    FeedEntries.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("feedOut")
      s"""
       org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         graft.expressions.FeedEntries.compute($c);
       if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): FeedEntries =
    copy(child = newChild)
}

object FeedEntries {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("link", StringType, nullable = false),
    StructField("published", StringType, nullable = false),
    StructField("summary", StringType, nullable = false))), containsNull = false)

  def compute(content: Array[Byte]): ArrayData = {
    if (content == null) return null
    val bytes =
      if (graft.llmops.Compression.sniffCodec(content).isDefined) {
        val d = graft.llmops.Compression.decodeAuto(content)
        if (d == null) return null else d
      } else content
    val es = graft.llmops.Feeds.entries(bytes)
    if (es == null) return null
    val rows = new Array[AnyRef](es.length)
    var i = 0
    while (i < es.length) {
      val e = es(i)
      rows(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.title),
        UTF8String.fromString(e.link),
        UTF8String.fromString(e.published),
        UTF8String.fromString(e.summary)))
      i += 1
    }
    new GenericArrayData(rows)
  }
}
