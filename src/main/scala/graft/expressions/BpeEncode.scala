package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The trained merge table of a byte-level BPE tokenizer
  * ([[graft.llmops.Bpe]]), shipped in the task binary — a model
  * artifact, same pattern as [[CharTrigramLmModel]]. Merges are
  * (left, right) uppercase-hex byte-string pairs in rank order.
  */
final class BpeModel(val merges: Array[(String, String)]) extends Serializable {
  /** Pre-fused token strings, aligned with `merges`. */
  val fused: Array[String] = merges.map { case (l, r) => l + r }
}

/** Byte-level BPE encode as a native scan projection —
  * `BpeEncode(text, model)` returns the document's token stream as
  * `array<string>` of uppercase-hex byte strings: words split on the
  * fixed `{space, \t, \r, \n}` class, each word's UTF-8 bytes greedily
  * fused by applying the model's merges IN RANK ORDER, each as one
  * left-to-right non-overlapping pass (single-pass `replace` semantics —
  * the exact contract [[graft.llmops.Bpe]] trains under and the SQL
  * oracle replays). Empty/whitespace-only text encodes to an empty
  * array; NULL stays NULL.
  *
  * Per-row cost: a word-type memo (documents repeat words) and a
  * token-presence screen per word (a merge whose left or right token is
  * absent from the word costs two hash probes, not a pass) keep the
  * common case near O(bytes + merges·probes) even for vocabulary-scale
  * merge tables. No shuffle, no UDF — the tokenizer rides whole-stage
  * codegen next to the other curation signals.
  */
case class BpeEncode(child: Expression, model: BpeModel)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model,
      "graft.expressions.BpeModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BpeEncode.compute($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, model: BpeModel): GenericArrayData = {
    val s = text.toString
    val memo = new java.util.HashMap[String, Array[String]]()
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && graft.llmops.Bpe.isSep(s.charAt(i))) i += 1
      val start = i
      while (i < n && !graft.llmops.Bpe.isSep(s.charAt(i))) i += 1
      if (i > start) {
        val word = s.substring(start, i)
        var toks = memo.get(word)
        if (toks == null) {
          toks = encodeWord(word, model)
          memo.put(word, toks)
        }
        var j = 0
        while (j < toks.length) { out += UTF8String.fromString(toks(j)); j += 1 }
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Rank-order merge application over one word's byte tokens. */
  private def encodeWord(word: String, model: BpeModel): Array[String] = {
    var toks = graft.llmops.Bpe.byteTokens(word)
    if (toks.length < 2) return toks
    // presence screen: rebuilt only when a pass actually fuses something
    var present = new java.util.HashSet[String]()
    toks.foreach(present.add)
    val merges = model.merges
    var r = 0
    while (r < merges.length && toks.length > 1) {
      val (l, rt) = merges(r)
      if (present.contains(l) && present.contains(rt)) {
        val next = graft.llmops.Bpe.applyMerge(toks, l, rt)
        if (next ne toks) {
          toks = next
          present = new java.util.HashSet[String]()
          toks.foreach(present.add)
        }
      }
      r += 1
    }
    toks
  }
}
