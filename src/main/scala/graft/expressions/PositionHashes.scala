package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling 64-bit hash of every `len`-char gram —
  * `PositionHashes(text, len)` returns `array<long>` where element `i` is
  * the hash of `text[i, i+len)`; one O(n) pass regardless of `len`
  * (Rabin-Karp polynomial roll over UTF-16 code units, wraparound
  * arithmetic). The production-speed gram kernel for
  * [[graft.llmops.DedupOps.exactSubstringDedup]]: the portable mode pays
  * md5 over `len` chars at EVERY position (O(n·len) and a heavyweight
  * digest) so a DuckDB oracle can replay it; this is the engine-only
  * fast path, same dataflow, ~len× less hash work.
  *
  * Wraparound 64-bit collisions are ~n²/2⁶⁴ — at 10¹² positions that is
  * still ~0.03 expected collisions, and a collision only risks one
  * spurious extra cut, acceptable for corpus curation.
  */
case class PositionHashes(child: Expression, len: Int)
    extends UnaryExpression {

  require(len > 0, "len must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_position_hashes"

  override protected def nullSafeEval(input: Any): Any =
    PositionHashes.compute(input.asInstanceOf[UTF8String], len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PositionHashes.compute($c, $len);")

  override protected def withNewChildInternal(newChild: Expression): PositionHashes =
    copy(child = newChild)
}

object PositionHashes {

  private val Base = 1000003L

  /** Static kernel shared by interpreted eval and generated code. Rolls
    * over CODE POINTS so element `i` is the hash of the same i-th
    * code-point gram the portable md5 mode (Spark `substr`, code-point
    * indexed) fingerprints — the two modes must agree on supplementary
    * characters, and [[CutSpans]] applies positions as code points.
    */
  def compute(text: UTF8String, len: Int): ArrayData = {
    val s = text.toString
    // code-point array once; the roll is then O(n) in code points
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < len) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - len + 1)
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < len) {
      h = h * Base + cps(i)
      if (i < len - 1) pow *= Base
      i += 1
    }
    out(0) = h
    i = len
    while (i < n) {
      h = (h - cps(i - len) * pow) * Base + cps(i)
      out(i - len + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
