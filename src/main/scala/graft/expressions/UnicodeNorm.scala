package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression —
  * `UnicodeNorm(text, form)` with form ∈ NFC/NFD/NFKC/NFKD.
  *
  * Corpus curation needs NFC before any hash-keyed dedup: visually
  * identical strings with composed vs combining-mark encodings hash
  * differently, splitting what should be one duplicate cluster (and NFKC
  * before tokenization folds width/compatibility variants). JDK
  * `java.text.Normalizer` implements UAX #15 exactly; the common all-ASCII
  * row is detected in O(n) (`isNormalized` fast path) and returned
  * unchanged without allocating.
  */
case class UnicodeNorm(child: Expression, form: String)
    extends UnaryExpression {

  // eager: an invalid form must refuse at construction (plan time), not
  // from inside executor tasks on the first row; the resolved Form also
  // spares every row the uppercase+match re-resolution
  private val normForm = UnicodeNorm.formOf(form)

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_norm"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.compute(input.asInstanceOf[UTF8String], normForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("normForm", normForm,
      "java.text.Normalizer.Form")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.UnicodeNorm.compute($c, $formRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}

object UnicodeNorm {

  def formOf(form: String): java.text.Normalizer.Form = form.toUpperCase match {
    case "NFC" => java.text.Normalizer.Form.NFC
    case "NFD" => java.text.Normalizer.Form.NFD
    case "NFKC" => java.text.Normalizer.Form.NFKC
    case "NFKD" => java.text.Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unknown normalization form: $other (expected NFC/NFD/NFKC/NFKD)")
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, f: java.text.Normalizer.Form): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, f)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }
}
