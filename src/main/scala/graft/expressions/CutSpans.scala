package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Remove the union of fixed-length character spans from a string —
  * `CutSpans(text, starts, spanLen)` deletes every character covered by
  * any `[s, s + spanLen)` for `s` in the (ascending-sorted) `starts`
  * array. The surgical step of exact-substring deduplication
  * ([[graft.llmops.DedupOps.exactSubstringDedup]]): one O(n) pass with a
  * running cut-end watermark, no per-span string rebuilds.
  *
  * `starts` MUST be sorted ascending (the operator sorts; the kernel's
  * union merge relies on it). Positions are character indices, 0-based;
  * spans overhanging the end are clipped.
  */
case class CutSpans(left: Expression, right: Expression, spanLen: Int)
    extends BinaryExpression {

  require(spanLen > 0, "spanLen must be positive")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_cut_spans"

  override protected def nullSafeEval(text: Any, starts: Any): Any =
    CutSpans.compute(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], spanLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, st) =>
      s"${ev.value} = graft.expressions.CutSpans.compute($t, $st, $spanLen);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutSpans =
    copy(left = newLeft, right = newRight)
}

object CutSpans {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, starts: ArrayData, spanLen: Int): UTF8String = {
    val n = starts.numElements()
    if (n == 0) return text
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var j = 0
    var cutEnd = 0L // exclusive end of the union of spans opened so far
    while (i < s.length) {
      while (j < n && starts.getLong(j) <= i) {
        val e = starts.getLong(j) + spanLen
        if (e > cutEnd) cutEnd = e
        j += 1
      }
      if (i >= cutEnd) sb.append(s.charAt(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
