package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The Bloom-filter decontamination path: one-sided error in the safe
  * direction (no false KEEPS), determinism, and agreement with the
  * exact join at a tight fpp.
  */
class BloomDecontaminationSpec extends SparkTestBase {
  import spark.implicits._

  private val benchSents = Seq(
    "the quick brown fox jumps over the lazy dog every single day",
    "a watched pot never boils but a forgotten pot always burns dry")

  private def corpus = {
    val clean = (0 until 40).map(i =>
      (i.toLong, s"document $i talks about rivers and granite and " +
        s"compasses in paragraph $i with unique token u$i"))
    val dirty = Seq(
      (100L, "prefix words then " + benchSents(0) + " and a suffix"),
      (101L, benchSents(1)),
      (102L, "seven shared words only: a watched pot never boils but a misplaced end"))
    (clean ++ dirty).toDF("doc_id", "text")
  }

  test("every exactly-contaminated doc is removed; clean survive at tight fpp") {
    val bench = benchSents.toDF("text")
    val exact = DedupOps.decontaminate(corpus, "doc_id", "text", bench,
      "text", n = 8).select("doc_id").as[Long].collect().toSet
    val bloom = DedupOps.decontaminateBloom(corpus, "doc_id", "text",
      bench, "text", n = 8, expectedGrams = 1000L, fpp = 1e-6)
      .select("doc_id").as[Long].collect().toSet
    // safety: bloom keeps are a subset of exact keeps (no false keeps)
    assert(bloom.subsetOf(exact))
    // at fpp 1e-6 over a 43-doc corpus the two agree outright
    assert(bloom === exact)
    assert(!exact.contains(100L) && !exact.contains(101L))
    assert(exact.size === 40 + 1) // 40 clean + doc 102 (7-gram overlap stays under n = 8)
  }

  test("deterministic: reruns drop the same rows") {
    val bench = benchSents.toDF("text")
    def run() = DedupOps.decontaminateBloom(corpus, "doc_id", "text",
      bench, "text", n = 8, expectedGrams = 1000L, fpp = 0.01)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(run() === run())
  }
}
