package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** A unigram sentencepiece model shipped in the task binary (the
  * [[BpeModel]] pattern): `pieces` in id order as (surface, log-prob
  * score), `unkId` the UNKNOWN piece's id (-1 when the model carries
  * none). The Viterbi kernel consults a piece→id hash and the longest
  * surface length; both derive once per executor.
  */
final class SpModel(val pieces: Array[(String, Float)],
    val unkId: Int,
    val matchable: Array[Boolean] = null) extends Serializable {
  @transient lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      // first surface wins on duplicates (id order is model order);
      // control/unknown pieces (<s>, </s>, <pad>, <unk>) never match
      // literal text — their surfaces are markers, not content
      if ((matchable == null || matchable(i)) &&
          !m.containsKey(pieces(i)._1)) m.put(pieces(i)._1, i)
      i += 1
    }
    m
  }
  @transient lazy val maxPieceLen: Int =
    if (pieces.isEmpty) 1 else pieces.map(_._1.length).max
  /** Unknown-transition score: well below every real piece so the
    * fallback never beats a genuine segmentation (sentencepiece's own
    * convention is a large penalty on the unk score).
    */
  @transient lazy val unkScore: Double =
    (if (pieces.isEmpty) 0.0 else pieces.map(_._2.toDouble).min) - 10.0
}

/** Unigram-LM sentencepiece encoding as a native scan projection —
  * `SpEncode(text, model)` returns `array<int>` piece ids under the
  * standard normalizer defaults (trim, collapse whitespace runs,
  * escape whitespace to U+2581, dummy ▁ prefix) and exact Viterbi
  * segmentation: the piece sequence maximizing the sum of piece
  * scores. Positions no piece reaches take a single-character UNKNOWN
  * transition (id `unkId`), so every input segments totally. Score
  * ties keep the longer final piece (candidates scan shortest-start
  * first and replace only on strictly-greater) — deterministic.
  * Empty/whitespace-only text encodes to an empty array; NULL stays
  * NULL. No shuffle, no UDF — codegen-friendly like [[BpeEncode]].
  */
case class SpEncode(child: Expression, model: SpModel)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sp_encode"

  override protected def nullSafeEval(input: Any): Any =
    SpEncode.compute(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("spModel", model,
      "graft.expressions.SpModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SpEncode.compute($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): SpEncode =
    copy(child = newChild)
}

object SpEncode {

  /** The sentencepiece whitespace escape. */
  final val Underscore = '▁'

  /** Default-flag normalization: trim, collapse whitespace runs to one
    * ▁, prepend the dummy ▁ prefix. Empty after trim → empty string.
    */
  def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 1)
    var i = 0
    val n = s.length
    var pendingSep = true // leading ▁ before the first non-space char
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (sb.length > 0) pendingSep = true }
      else {
        if (pendingSep) { sb.append(Underscore); pendingSep = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, model: SpModel): GenericArrayData = {
    val ids = encodeIds(text.toString, model)
    val out = new Array[Any](ids.length)
    var i = 0
    while (i < ids.length) { out(i) = ids(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Exact Viterbi over the normalized string. */
  def encodeIds(raw: String, model: SpModel): Array[Int] = {
    val s = normalize(raw)
    val n = s.length
    if (n == 0) return Array.emptyIntArray
    val best = new Array[Double](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    val backStart = new Array[Int](n + 1)
    val backId = new Array[Int](n + 1)
    val maxLen = model.maxPieceLen
    var end = 1
    while (end <= n) {
      var start = math.max(0, end - maxLen)
      while (start < end) {
        if (best(start) != Double.NegativeInfinity) {
          val id = model.index.get(s.substring(start, end))
          if (id != null) {
            val sc = best(start) + model.pieces(id)._2
            if (sc > best(end)) {
              best(end) = sc; backStart(end) = start; backId(end) = id
            }
          }
        }
        start += 1
      }
      if (best(end) == Double.NegativeInfinity &&
          best(end - 1) != Double.NegativeInfinity) {
        // single-char unknown transition: total coverage guaranteed
        best(end) = best(end - 1) + model.unkScore
        backStart(end) = end - 1
        backId(end) = model.unkId
      }
      end += 1
    }
    // walk back (best(n) is finite: the unk chain always reaches n)
    val rev = new scala.collection.mutable.ArrayBuffer[Int]()
    var p = n
    while (p > 0) { rev += backId(p); p = backStart(p) }
    val out = new Array[Int](rev.length)
    var k = 0
    while (k < out.length) { out(k) = rev(out.length - 1 - k); k += 1 }
    out
  }

  /** Inverse for round trips: piece surfaces concatenated, ▁ → space,
    * the dummy prefix dropped. Unknown ids render as nothing (their
    * surface is unknowable).
    */
  def decodeIds(ids: Array[Int], model: SpModel): String = {
    val sb = new java.lang.StringBuilder()
    ids.foreach { id =>
      if (id >= 0 && id < model.pieces.length && id != model.unkId)
        sb.append(model.pieces(id)._1)
    }
    sb.toString.replace(Underscore, ' ').trim
  }
}
