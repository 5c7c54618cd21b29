package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}

/** Embedded raster images of a PDF — `PdfImages(content)` returns the
  * `/Subtype /Image` + `/Filter /DCTDecode` XObject stream payloads as
  * `array<binary>` in document order ([[graft.llmops.Pdf.images]]).
  * Each element is a complete baseline JPEG by the DCTDecode contract,
  * so PDFs feed the SAME image pipeline as AVI frames: explode, then
  * [[JpegDHash]]/[[JpegPixels]]/[[ImageHistStats]] — document and image
  * curation compose instead of duplicating.
  *
  * NULL for non-PDF bytes; a PDF with no DCT images yields an empty
  * array (a real document with no pictures is not malformed).
  */
case class PdfImages(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pdf_images"

  override protected def nullSafeEval(input: Any): Any =
    PdfImages.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.PdfImages.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PdfImages =
    copy(child = newChild)
}

object PdfImages {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): GenericArrayData =
    graft.llmops.Pdf.images(b) match {
      case Some(imgs) => new GenericArrayData(imgs.toArray[Any])
      case None => null
    }
}
