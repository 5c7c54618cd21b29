package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A trained hashed-n-gram linear text classifier (fastText-style
  * quality filter, the CCNet/LLM-curation construction): `weights` is a
  * dense `numBuckets` array indexed by the portable 60-bit md5 hash of
  * each word unigram/bigram mod `numBuckets` (the hashing trick —
  * feature space bounded regardless of vocabulary), `bias` the
  * intercept. One weight vector serves both trainers: Naive Bayes
  * log-ratios ([[graft.llmops.TextAnalysis.trainQualityNb]], counts →
  * closed form, oracle-replayable) and logistic-regression GD
  * ([[graft.llmops.TextAnalysis.trainQualityLr]], float iterations →
  * spec-gated), because both score as `bias + Σ w[h(g)]`.
  */
final class HashedNgramModel(
    val numBuckets: Int,
    val bias: Double,
    val weights: Array[Double]
) extends Serializable {
  require(weights.length == numBuckets,
    s"weights length ${weights.length} != numBuckets $numBuckets")
}

/** Scores a document under a [[HashedNgramModel]] —
  * `HashedNgramScore(text, model)` returns
  * `struct<n_grams long, score double>` with
  *
  *   score = bias + Σ_g w[md5_60(g) mod D]
  *
  * summed STRICTLY in document order over the grams of
  * `lower(trim(text))`: every space-separated word first, then every
  * adjacent word bigram (joined with one space) — so the double fold
  * replays bit-for-bit in an external SQL engine walking the same gram
  * list ([[CharTrigramLm]]'s determinism contract). Duplicate grams
  * keep their multiplicity (multinomial features).
  *
  * Like the LM kernel, the model is a driver-collected artifact shipped
  * in the task binary — O(1) array probes per gram, no join, no map
  * column, the whole classifier stays a per-row scan projection.
  */
case class HashedNgramScore(child: Expression, model: HashedNgramModel)
    extends UnaryExpression {

  override def dataType: DataType = HashedNgramScore.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hashed_ngram_score"

  override protected def nullSafeEval(input: Any): Any =
    HashedNgramScore.compute(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("hnModel", model,
      "graft.expressions.HashedNgramModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HashedNgramScore.compute($c, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedNgramScore =
    copy(child = newChild)
}

object HashedNgramScore {

  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  /** The gram sequence of a normalized document, in scoring order:
    * non-empty words of the single-space split, then adjacent bigrams.
    * Shared by the scorer and the trainers so features can never drift
    * from the kernel.
    */
  def grams(normalized: String): Array[String] = {
    val words = normalized.split(" ", -1).filter(_.nonEmpty)
    if (words.length < 2) words
    else words ++ Array.tabulate(words.length - 1)(i =>
      words(i) + " " + words(i + 1))
  }

  /** `lower(trim(text))` with Spark's own UTF8String semantics. */
  def normalize(text: UTF8String): String =
    text.trim().toLowerCase().toString

  /** Static kernel shared by interpreted eval and generated code. The
    * gram fold starts at 0.0 and the bias is added LAST — the same
    * association as the SQL replay's `bias + list_sum(weights)`, so the
    * doubles stay bit-identical.
    */
  def compute(text: UTF8String, m: HashedNgramModel): InternalRow = {
    val gs = grams(normalize(text))
    var acc = 0.0
    var i = 0
    while (i < gs.length) {
      val b = (TextHashKernels.md5Prefix60(gs(i)) % m.numBuckets).toInt
      acc += m.weights(b)
      i += 1
    }
    new GenericInternalRow(Array[Any](gs.length.toLong, m.bias + acc))
  }
}
