package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Trainable hashed-n-gram quality classifier: NB (closed-form) and LR
  * (gradient descent) paths, feature/kernel agreement, determinism.
  */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  /** Separable corpus: clean sentences vs the same sentences with spam
    * vocabulary appended. Train/held-out split by id.
    */
  private def corpus(n: Int) = {
    val topics = Seq("the quick brown fox", "rain falls on the plain",
      "compilers fold constants", "ships sail the northern sea")
    (0 until n).map { i =>
      val base = s"${topics(i % topics.size)} item $i of many words"
      val spam = i % 2 == 1
      val text = if (spam) s"$base buy now click here free offer" else base
      (i.toLong, text, if (spam) 1 else 0)
    }.toDF("doc_id", "text", "label")
  }

  test("NB: perfect held-out accuracy on a separable corpus, deterministic retrain") {
    val df = corpus(200)
    val train = df.filter($"doc_id" < 120)
    val m1 = TextAnalysis.trainQualityNb(train, "text", "label", numBuckets = 1024)
    val m2 = TextAnalysis.trainQualityNb(train, "text", "label", numBuckets = 1024)
    assert(m1.bias === m2.bias)
    assert(m1.weights.toSeq === m2.weights.toSeq, "NB training must be deterministic")
    val held = df.filter($"doc_id" >= 120)
      .withColumn("q", TextAnalysis.qualityClassifierScore($"text", m1))
      .select($"label", ($"q.score" > 0).cast("int").alias("pred"))
      .collect()
    assert(held.nonEmpty)
    assert(held.forall(r => r.getInt(0) === r.getInt(1)),
      "spam suffix must be perfectly separable for NB")
  }

  test("LR: gradient descent reaches high held-out accuracy and beats the zero model") {
    val df = corpus(200)
    val train = df.filter($"doc_id" < 120)
    val m = TextAnalysis.trainQualityLr(train, "text", "label",
      numBuckets = 1024, iters = 15, step = 1.0)
    val held = df.filter($"doc_id" >= 120)
      .withColumn("q", TextAnalysis.qualityClassifierScore($"text", m))
      .select($"label", ($"q.score" > 0).cast("int").alias("pred"))
      .collect()
    val acc = held.count(r => r.getInt(0) === r.getInt(1)).toDouble / held.length
    assert(acc >= 0.95, s"LR held-out accuracy $acc")
    assert(m.weights.exists(_ != 0.0), "LR must have moved off the zero model")
  }

  test("kernel grams match the trainer's Column features exactly") {
    val texts = Seq("  The  Quick   brown fox ", "single", "", "a b c d e",
      "Tabs\tand multi  spaces")
    val viaKernel = texts.map(t => graft.expressions.HashedNgramScore
      .grams(graft.expressions.HashedNgramScore.normalize(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))).toSeq)
    // the trainer-side Column: private, so reproduce through a train run —
    // a one-doc corpus's gram count must equal the kernel's gram count
    texts.zip(viaKernel).foreach { case (t, gs) =>
      val df = Seq((t, 1), ("negative filler", 0)).toDF("text", "label")
      val m = TextAnalysis.trainQualityNb(df, "text", "label", numBuckets = 512)
      val scored = Seq(t).toDF("text")
        .withColumn("q", TextAnalysis.qualityClassifierScore($"text", m))
        .select($"q.n_grams").collect()(0).getLong(0)
      assert(scored === gs.length.toLong, s"text='$t'")
    }
  }

  test("score fold is bias-last: an empty doc scores exactly the prior") {
    val m = TextAnalysis.trainQualityNb(
      Seq(("spam words", 1), ("ham words", 0), ("more ham", 0))
        .toDF("text", "label"),
      "text", "label", numBuckets = 256)
    val got = Seq("", "   ").toDF("text")
      .withColumn("q", TextAnalysis.qualityClassifierScore($"text", m))
      .select($"q.n_grams", $"q.score").collect()
    got.foreach { r =>
      assert(r.getLong(0) === 0L)
      assert(r.getDouble(1) === m.bias)
    }
  }
}
