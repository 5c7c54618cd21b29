package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The CCNet char-trigram LM score as a single native expression —
  * `CharTrigramLm(text, model)` returns
  * `struct<n_grams long, lm_sum double>` where
  *
  *   lm_sum = Σ_i ln( (cnt3(s_i..s_i+2) + k) / (cnt2(s_i..s_i+1) + kV) )
  *
  * summed STRICTLY left-to-right over the document's positional char
  * trigrams (1-based SQL-substring code-point semantics, exactly
  * [[graft.llmops.TextAnalysis.charGrams]]), so the doubles replay
  * bit-for-bit in an external SQL engine folding the same gram array —
  * the determinism contract the q96 oracle relies on.
  *
  * Why an expression and not a join or a map column: the LM tables are
  * bounded by the character-trigram space, not the corpus (they stop
  * growing once the alphabet is covered), so they are a MODEL ARTIFACT —
  * collected once to the driver and shipped in the task binary as two
  * hash maps with O(1) probes. The first fused-pass draft instead
  * cross-joined them in as per-row `map<string,bigint>` columns and
  * folded with `element_at`; Catalyst's `GetMapValue` on
  * `ArrayBasedMapData` is a LINEAR key scan inside an interpreted
  * higher-order lambda, which made the LM column O(len·|table|) per
  * document — 30 s of the 68 s q96 bench regression at sf0.1. This
  * kernel is the same math at O(len) with constant-time probes, and it
  * keeps [[graft.llmops.TextAnalysis.curationSignals]]'s one-scan
  * no-shuffle plan literal: no joins at all.
  *
  * NULL text yields NULL (caller coalesces `n_grams` to 0 to match the
  * SQL `when/otherwise(array())` shape); documents under 3 chars yield
  * `(0, 0.0)`.
  */
case class CharTrigramLm(child: Expression, model: CharTrigramLmModel)
    extends UnaryExpression {

  override def dataType: DataType = CharTrigramLm.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_trigram_lm"

  override protected def nullSafeEval(input: Any): Any =
    CharTrigramLm.compute(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("lmModel", model,
      "graft.expressions.CharTrigramLmModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharTrigramLm.compute($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharTrigramLm =
    copy(child = newChild)
}

/** Add-k-smoothed trigram/bigram count tables keyed by [[UTF8String]]
  * (probes skip String conversion entirely). `kv` is `k * vocab`,
  * precomputed on the driver with the same double multiplication the SQL
  * fold interpolated, so smoothed denominators are bit-identical.
  */
final class CharTrigramLmModel(
    val tri: java.util.HashMap[UTF8String, java.lang.Long],
    val bi: java.util.HashMap[UTF8String, java.lang.Long],
    val k: Double,
    val kv: Double
) extends Serializable

object CharTrigramLm {

  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("lm_sum", DoubleType, nullable = false)))

  def model(tri: Iterable[(String, Long)], bi: Iterable[(String, Long)],
      vocab: Int, k: Double): CharTrigramLmModel = {
    def toMap(xs: Iterable[(String, Long)]) = {
      val m = new java.util.HashMap[UTF8String, java.lang.Long](
        math.max(16, xs.size * 2))
      xs.foreach { case (g, c) => m.put(UTF8String.fromString(g), c) }
      m
    }
    new CharTrigramLmModel(toMap(tri), toMap(bi), k, k * vocab)
  }

  /** Static kernel shared by interpreted eval and generated code.
    *
    * One forward walk over the UTF-8 bytes: each gram's byte range is
    * derived from the previous one (one `numBytesForFirstByte` step per
    * code point), and tri/bi probes are zero-copy `fromBytes` views over
    * the shared array — O(len) total where the obvious
    * `substringSQL(i, 3)` loop re-scans from byte 0 every call and goes
    * O(len²) per document (measured 0.6 ms/doc on 400-char docs — the
    * scan projection runs inside a single input split, so per-row CPU
    * here is serial time, not parallel slack). Code-point gram
    * boundaries are identical to `substr` semantics because both walk
    * `numBytesForFirstByte`.
    */
  def compute(text: UTF8String, m: CharTrigramLmModel): InternalRow = {
    val bytes = text.getBytes
    val total = bytes.length
    // clamped so a truncated multi-byte tail cannot walk past the array
    @inline def step(off: Int): Int =
      math.min(off + UTF8String.numBytesForFirstByte(bytes(off)), total)
    var sum = 0.0
    var grams = 0L
    if (total > 0) {
      // byte offsets: s = gram start, e1/e2 = ends of its 1st/2nd cp
      var s = 0
      var e1 = if (s < total) step(s) else total
      var e2 = if (e1 < total) step(e1) else total
      while (e2 < total) {
        val e3 = step(e2) // end of the 3rd cp = end of the trigram
        val c3 = m.tri.get(UTF8String.fromBytes(bytes, s, e3 - s))
        val c2 = m.bi.get(UTF8String.fromBytes(bytes, s, e2 - s))
        val num = (if (c3 == null) 0.0 else c3.toDouble) + m.k
        val den = (if (c2 == null) 0.0 else c2.toDouble) + m.kv
        sum += java.lang.Math.log(num / den)
        grams += 1L
        s = e1; e1 = e2; e2 = e3
      }
    }
    new GenericInternalRow(Array[Any](grams, sum))
  }
}
