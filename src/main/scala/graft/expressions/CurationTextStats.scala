package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Gopher word/repetition statistics for the fused curation
  * battery — `CurationTextStats(text, topN, dupN)` returns
  * `struct<n_words bigint, sum_word_len bigint, n_unique int,
  * max_word_run bigint, top_gram string, top_gram_run bigint,
  * dup_gram_chars bigint>`, replacing the split + three `array_sort`s +
  * three interpreted run-length `aggregate` folds that allocated a
  * named_struct per ELEMENT per document. All fractions stay in Column
  * space downstream (same divisions over identical counts → identical
  * doubles), so this kernel is all-integer/string and trivially exact:
  *
  *   - words = `split(text, " ")` semantics (single-space split; empty
  *     tokens dropped) — NOT the whitespace tokenizer; lengths count
  *     characters like `length()`;
  *   - `max_word_run` = the max multiplicity (the maxRun fold over the
  *     sorted words), `n_unique` = distinct count;
  *   - `top_gram`/`top_gram_run` = the topGram fold over sorted
  *     `WordNGrams(topN)` occurrences: the FIRST gram in sorted (binary
  *     UTF8) order whose run strictly exceeds every earlier run, count
  *     0 with a null gram when the doc has no topN-grams;
  *   - `dup_gram_chars` = Σ over sorted `WordNGrams(dupN)` runs with
  *     count > 1 of count × gram character length (the dupChars fold).
  */
case class CurationTextStats(child: Expression, topN: Int, dupN: Int)
    extends UnaryExpression {

  require(topN >= 1 && dupN >= 1, "n-gram sizes must be positive")

  override def dataType: DataType = CurationTextStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_curation_text_stats"

  override protected def nullSafeEval(input: Any): Any =
    CurationTextStats.compute(input.asInstanceOf[UTF8String], topN, dupN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.CurationTextStats.compute(
         |  $c, $topN, $dupN);
       """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): CurationTextStats = copy(child = newChild)
}

object CurationTextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("n_unique", IntegerType, nullable = false),
    StructField("max_word_run", LongType, nullable = false),
    StructField("top_gram", StringType, nullable = true),
    StructField("top_gram_run", LongType, nullable = false),
    StructField("dup_gram_chars", LongType, nullable = false)))

  /** (first max-run element, max run, Σ_{run>1} run·numChars) over a
    * SORTED array — the three folds share one run-length walk.
    */
  private def runStats(sorted: Array[UTF8String]):
      (UTF8String, Long, Long) = {
    var bestGram: UTF8String = null
    var bestRun = 0L
    var dupChars = 0L
    var i = 0
    while (i < sorted.length) {
      var j = i + 1
      while (j < sorted.length && sorted(j).equals(sorted(i))) j += 1
      val run = (j - i).toLong
      if (run > bestRun) { bestRun = run; bestGram = sorted(i) }
      if (run > 1) dupChars += run * sorted(i).numChars()
      i = j
    }
    (bestGram, bestRun, dupChars)
  }

  private def sortedCopy(a: Array[UTF8String]): Array[UTF8String] = {
    // array_sort on strings = UTF8String binary order
    java.util.Arrays.sort(a, new java.util.Comparator[UTF8String] {
      def compare(x: UTF8String, y: UTF8String): Int = x.compareTo(y)
    })
    a
  }

  def compute(text: UTF8String, topN: Int, dupN: Int): GenericInternalRow = {
    // words: split on the single space character (split(text, " ")
    // semantics — 0x20 never occurs inside a UTF-8 multibyte sequence,
    // so a byte walk splits identically), empties dropped
    val bytes = text.getBytes
    val words = new java.util.ArrayList[UTF8String]()
    var nWords = 0L
    var sumLen = 0L
    var s = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > s) {
          val w = UTF8String.fromBytes(bytes, s, i - s)
          words.add(w)
          nWords += 1
          sumLen += w.numChars()
        }
        s = i + 1
      }
      i += 1
    }
    val sortedWords = sortedCopy(words.toArray(new Array[UTF8String](0)))
    val (_, maxWordRun, _) = runStats(sortedWords)
    var nUnique = 0
    var k = 0
    while (k < sortedWords.length) {
      var j = k + 1
      while (j < sortedWords.length && sortedWords(j).equals(sortedWords(k))) j += 1
      nUnique += 1
      k = j
    }
    def gramArray(n: Int): Array[UTF8String] = {
      val ad = WordNGrams.compute(text, n, distinct = false)
      val out = new Array[UTF8String](ad.numElements())
      var x = 0
      while (x < out.length) { out(x) = ad.getUTF8String(x); x += 1 }
      out
    }
    val (topGram, topRun, _) = runStats(sortedCopy(gramArray(topN)))
    val (_, _, dupChars) = runStats(sortedCopy(gramArray(dupN)))
    new GenericInternalRow(Array[Any](nWords, sumLen, nUnique, maxWordRun,
      topGram, topRun, dupChars))
  }
}
