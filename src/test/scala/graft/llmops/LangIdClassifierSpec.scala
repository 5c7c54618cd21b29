package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Multiclass hashed-n-gram classifier (fastText-lid shape): NB
  * (closed-form, oracle-replayable) and softmax-GD paths, argmax
  * determinism, tie-break, degenerate inputs.
  */
class LangIdClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // Four planted "languages" built from characteristic function words,
  // with realistic cross-language collisions (la/de/en appear in more
  // than one vocabulary). Deterministic LCG so the corpus is stable.
  private val vocab = Map(
    "en" -> Array("the", "and", "of", "to", "in", "is", "was", "for", "with", "that"),
    "fr" -> Array("le", "la", "et", "les", "des", "une", "dans", "est", "pour", "de"),
    "de" -> Array("der", "die", "und", "das", "nicht", "mit", "ist", "von", "ein", "auf"),
    "es" -> Array("el", "la", "y", "de", "que", "en", "los", "una", "con", "por"))
  private val langs = vocab.keys.toArray.sorted

  private def corpus(perLang: Int) = {
    var seed = 0x5DEECE66DL
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    (for {
      l <- langs.toSeq
      i <- 0 until perLang
    } yield {
      val words = vocab(l)
      val text = Seq.fill(30)(words(next(words.length))).mkString(" ")
      (s"$l-$i", text, l)
    }).toDF("doc_id", "text", "lang")
  }

  test("NB: deterministic retrain, sorted class order, high held-out accuracy") {
    val df = corpus(120)
    val train = df.filter(expr("CAST(split(doc_id, '-')[1] AS INT) < 80"))
    val held = df.filter(expr("CAST(split(doc_id, '-')[1] AS INT) >= 80"))
    val m1 = TextAnalysis.trainLangIdNb(train, "text", "lang", numBuckets = 1024)
    val m2 = TextAnalysis.trainLangIdNb(train, "text", "lang", numBuckets = 1024)
    assert(m1.labels.toSeq == langs.toSeq, "class order must be sorted labels")
    assert(m1.biases.toSeq == m2.biases.toSeq &&
      m1.weights.map(_.toSeq).toSeq == m2.weights.map(_.toSeq).toSeq,
      "NB training must be deterministic")
    val scored = held
      .withColumn("p", TextAnalysis.langIdPredict($"text", m1))
      .select($"lang", $"p.lang".alias("pred")).collect()
    assert(scored.nonEmpty)
    val acc = scored.count(r => r.getString(0) == r.getString(1)).toDouble / scored.length
    assert(acc >= 0.95, s"NB lang-id held-out accuracy $acc")
  }

  test("softmax GD: held-out accuracy beats prior-only and clears 0.9") {
    val df = corpus(50)
    val train = df.filter(expr("CAST(split(doc_id, '-')[1] AS INT) < 35"))
    val held = df.filter(expr("CAST(split(doc_id, '-')[1] AS INT) >= 35"))
    val m = TextAnalysis.trainLangIdLr(train, "text", "lang",
      numBuckets = 512, iters = 12, step = 1.0)
    assert(m.labels.toSeq == langs.toSeq)
    val scored = held
      .withColumn("p", TextAnalysis.langIdPredict($"text", m))
      .select($"lang", $"p.lang".alias("pred")).collect()
    val acc = scored.count(r => r.getString(0) == r.getString(1)).toDouble / scored.length
    assert(acc >= 0.9, s"softmax lang-id held-out accuracy $acc")
    assert(m.weights.exists(_.exists(_ != 0.0)), "GD must move off the zero model")
  }

  test("argmax ties break to the first class in model order") {
    val w = Array.fill(8)(0.25)
    val m = new graft.expressions.HashedNgramMulticlassModel(
      8, Array("aa", "zz"), Array(1.5, 1.5), Array(w, w.clone()))
    val out = Seq("tie tie tie", "").toDF("text")
      .select(TextAnalysis.langIdPredict($"text", m).alias("p"))
      .select($"p.lang", $"p.score", $"p.n_grams").collect()
    assert(out.forall(_.getString(0) == "aa"))
    assert(out(1).getLong(2) == 0L && out(1).getDouble(1) == 1.5,
      "empty text scores the bias alone")
  }

  test("scores kernel agrees with predict and replays the NB closed form") {
    val df = corpus(40)
    val m = TextAnalysis.trainLangIdNb(df, "text", "lang", numBuckets = 256)
    val rows = df.limit(20)
      .select($"text",
        TextAnalysis.langIdScores($"text", m).alias("s"),
        TextAnalysis.langIdPredict($"text", m).alias("p"))
      .collect()
    rows.foreach { r =>
      val scores = r.getStruct(1).getSeq[Double](1)
      val best = scores.zipWithIndex.maxBy { case (s, i) => (s, -i) }
      val p = r.getStruct(2)
      assert(p.getString(1) == m.labels(best._2))
      assert(p.getDouble(2) == best._1)
      // closed-form replay: bias + in-order fold over gram weights
      val gs = graft.expressions.HashedNgramScore.grams(
        graft.expressions.HashedNgramScore.normalize(
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))))
      m.labels.indices.foreach { c =>
        var acc = 0.0
        gs.foreach { g =>
          val b = (graft.expressions.TextHashKernels.md5Prefix60(g) % m.numBuckets).toInt
          acc += m.weights(c)(b)
        }
        assert(m.biases(c) + acc == scores(c), "score fold must replay bit-for-bit")
      }
    }
  }
}
