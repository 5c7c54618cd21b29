package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Readability-style HTML main-content extraction as a native codegen'd
  * expression — `HtmlMainContent(content, maxLinkDensity, minWords)` over
  * a binary or string column; kernel in [[graft.llmops.Html.mainContent]]
  * (nav/header/footer/aside subtrees dropped, blocks kept by link density
  * and word count). Per-row-local like the other codec expressions: runs
  * in the scan projection, no RDD node, no shuffle.
  */
case class HtmlMainContent(child: Expression,
    maxLinkDensity: Double = 0.5, minWords: Int = 3)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_main"

  override protected def nullSafeEval(input: Any): Any = {
    val html = child.dataType match {
      case BinaryType => UTF8String.fromBytes(input.asInstanceOf[Array[Byte]])
      case _ => input.asInstanceOf[UTF8String]
    }
    HtmlMainContent.compute(html, maxLinkDensity, minWords)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wrap = child.dataType match {
      case BinaryType => (c: String) =>
        s"org.apache.spark.unsafe.types.UTF8String.fromBytes($c)"
      case _ => (c: String) => c
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HtmlMainContent.compute(" +
        s"${wrap(c)}, $maxLinkDensity, $minWords);")
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlMainContent =
    copy(child = newChild)
}

object HtmlMainContent {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(html: UTF8String, maxLinkDensity: Double, minWords: Int): UTF8String =
    UTF8String.fromString(
      graft.llmops.Html.mainContent(html.toString, maxLinkDensity, minWords))
}
