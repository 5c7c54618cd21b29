package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document text extraction as a native codegen'd expression:
  * `DocExtractText(content: binary, mime: string)` returns the extracted
  * text or NULL for unsupported formats.
  *
  * A pure bytes→string function has no business leaving Tungsten: the
  * former `df.rdd.mapPartitions` operator deserialized whole rows, broke
  * whole-stage codegen, and blocked column pruning for everything
  * downstream of the extraction. `doGenCode` emits a direct static call,
  * so the decode (including the zip+XML OOXML parsers) runs inside the
  * scan projection like every other graft kernel.
  *
  * Null semantics: NULL content or NULL mime → NULL (a missing MIME type
  * dispatches nowhere, same outcome as the unsupported-format stub).
  */
case class DocExtractText(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_doc_extract"

  override protected def nullSafeEval(content: Any, mime: Any): Any =
    DocExtractText.compute(content.asInstanceOf[Array[Byte]],
      mime.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compute = nullSafeCodeGen(ctx, ev, (c, m) => {
      s"""
         |${ev.value} = graft.expressions.DocExtractText.compute($c, $m);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
    compute
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DocExtractText =
    copy(left = newLeft, right = newRight)
}

object DocExtractText {
  /** Static kernel shared by interpreted eval and generated code; null for
    * unsupported/unparsable documents.
    */
  def compute(content: Array[Byte], mime: UTF8String): UTF8String =
    graft.llmops.DocumentText.extractText(
        content, if (mime == null) null else mime.toString)
      .map(UTF8String.fromString)
      .orNull
}
