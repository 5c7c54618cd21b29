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
  * union merge relies on it). Positions are CODE POINT indices, 0-based —
  * the same indexing Spark's `length`/`substr` (and DuckDB's) use, so
  * positions derived from engine functions apply cleanly on text with
  * supplementary characters; spans overhanging the end are clipped.
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

  /** Static kernel shared by interpreted eval and generated code. Walks
    * CODE POINTS (not UTF-16 units): positions computed with Spark/DuckDB
    * `length`/`substr` are code-point indices, and a UTF-16 walk would
    * shift every cut after a supplementary character and could split a
    * surrogate pair.
    */
  def compute(text: UTF8String, starts: ArrayData, spanLen: Int): UTF8String = {
    val n = starts.numElements()
    if (n == 0) return text
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var u = 0 // UTF-16 offset
    var cp = 0 // code-point index
    var j = 0
    var cutEnd = 0L // exclusive end (code points) of the span union so far
    while (u < s.length) {
      while (j < n && starts.getLong(j) <= cp) {
        val e = starts.getLong(j) + spanLen
        if (e > cutEnd) cutEnd = e
        j += 1
      }
      val codePoint = s.codePointAt(u)
      if (cp >= cutEnd) sb.appendCodePoint(codePoint)
      u += Character.charCount(codePoint)
      cp += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
