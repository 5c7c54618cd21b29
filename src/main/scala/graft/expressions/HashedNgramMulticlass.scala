package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A trained k-class hashed-n-gram linear classifier — the multiclass
  * generalization of [[HashedNgramModel]], in the fastText language-ID
  * shape (`lid.176`-style: one weight vector per language over hashed
  * word uni+bigram features, argmax at inference). `labels` fixes the
  * class order (index = position); `weights(c)` is class c's dense
  * bucket array, `biases(c)` its intercept.
  *
  * The feature space is EXACTLY [[HashedNgramScore.grams]] — words of
  * the single-space split of `lower(trim(text))` then adjacent bigrams,
  * bucketed by the portable 60-bit md5 prefix mod `numBuckets` — so the
  * binary quality screen and the language screen can never drift apart,
  * and a SQL oracle can rebuild every weight from counts.
  *
  * Reference semantics anchor: language screening before document
  * processing (cdk-datalake-ingest-upeu
  * aje_libs/documents/helpers/document_processor.py handles documents
  * one-at-a-time; this is the corpus-scale curation analogue).
  */
final class HashedNgramMulticlassModel(
    val numBuckets: Int,
    val labels: Array[String],
    val biases: Array[Double],
    val weights: Array[Array[Double]]
) extends Serializable {
  require(labels.nonEmpty, "multiclass model needs at least one class")
  require(biases.length == labels.length,
    s"biases length ${biases.length} != ${labels.length} classes")
  require(weights.length == labels.length,
    s"weights rows ${weights.length} != ${labels.length} classes")
  weights.foreach(w => require(w.length == numBuckets,
    s"weight row length ${w.length} != numBuckets $numBuckets"))
}

object HashedNgramMulticlass {

  /** Per-class scores in class order. One pass over the gram list — one
    * md5 per gram, k array probes — each class folded STRICTLY in
    * document order starting at 0.0 with the bias added LAST, the same
    * association as [[HashedNgramScore.compute]], so every score
    * replays bit-for-bit in an external SQL engine walking the same
    * gram list.
    */
  def scores(text: UTF8String, m: HashedNgramMulticlassModel): InternalRow = {
    val gs = HashedNgramScore.grams(HashedNgramScore.normalize(text))
    val k = m.labels.length
    val acc = new Array[Double](k)
    var i = 0
    while (i < gs.length) {
      val b = (TextHashKernels.md5Prefix60(gs(i)) % m.numBuckets).toInt
      var c = 0
      while (c < k) { acc(c) += m.weights(c)(b); c += 1 }
      i += 1
    }
    var c = 0
    while (c < k) { acc(c) += m.biases(c); c += 1 }
    new GenericInternalRow(Array[Any](gs.length.toLong,
      new GenericArrayData(acc)))
  }

  /** Argmax prediction: the highest-scoring class, first-in-class-order
    * on exact double ties (strict `>` update — the SQL replay's
    * `ORDER BY score DESC, class ASC LIMIT 1` when labels are bound in
    * index order).
    */
  def predict(text: UTF8String, m: HashedNgramMulticlassModel): InternalRow = {
    val row = scores(text, m)
    val arr = row.getArray(1).toDoubleArray()
    var best = 0
    var c = 1
    while (c < arr.length) { if (arr(c) > arr(best)) best = c; c += 1 }
    new GenericInternalRow(Array[Any](row.getLong(0),
      UTF8String.fromString(m.labels(best)), arr(best)))
  }
}

/** `struct<n_grams long, scores array<double>>` — per-class scores under
  * a [[HashedNgramMulticlassModel]] (the training-side surface: softmax
  * residuals need every class). Model rides the task binary via a
  * codegen reference object; the classifier stays a per-row scan
  * projection, no join, no map column.
  */
case class HashedNgramMultiScores(child: Expression,
    model: HashedNgramMulticlassModel) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("scores", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hashed_ngram_multi_scores"

  override protected def nullSafeEval(input: Any): Any =
    HashedNgramMulticlass.scores(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("hnmModel", model,
      "graft.expressions.HashedNgramMulticlassModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HashedNgramMulticlass.scores($c, $modelRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedNgramMultiScores = copy(child = newChild)
}

/** `struct<n_grams long, lang string, score double>` — argmax language
  * prediction under a [[HashedNgramMulticlassModel]] (the inference
  * surface: one kernel pass, k accumulators, argmax inside the kernel).
  */
case class HashedNgramArgmax(child: Expression,
    model: HashedNgramMulticlassModel) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hashed_ngram_argmax"

  override protected def nullSafeEval(input: Any): Any =
    HashedNgramMulticlass.predict(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("hnmModel", model,
      "graft.expressions.HashedNgramMulticlassModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HashedNgramMulticlass.predict($c, $modelRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedNgramArgmax = copy(child = newChild)
}
