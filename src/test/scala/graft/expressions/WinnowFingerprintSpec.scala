package graft.expressions

import graft.SparkTestBase
import graft.llmops.DedupOps
import org.apache.spark.sql.functions._

class WinnowFingerprintSpec extends SparkTestBase {
  import spark.implicits._

  private def fps(text: String, k: Int = 7, w: Int = 4): Seq[Long] =
    Seq(text).toDF("t")
      .select(DedupOps.winnowFingerprints($"t", k, w).as("f"))
      .collect().head.getSeq[Long](0)

  test("identical (whitespace/case-normalized) texts share all fingerprints") {
    assert(fps("Hello World  Again") === fps("hello   world again"))
  }

  test("MOSS guarantee: shared substring of length >= k+w-1 shares a fingerprint") {
    val shared = "the quick brown fox jumps" // 25 chars >> k+w-1 = 10
    val a = fps(s"AAAA $shared BBBB")
    val b = fps(s"CCCCCC $shared DDDD")
    assert(a.toSet.intersect(b.toSet).nonEmpty)
  }

  test("unrelated texts share no fingerprints") {
    val a = fps("completely different content about databases")
    val b = fps("zebra xylophone quantum mechanics")
    assert(a.toSet.intersect(b.toSet).isEmpty)
  }

  test("short text (fewer k-grams than window) yields one global min") {
    assert(fps("abcdefgh", k = 7, w = 4).length === 1)
    assert(fps("", k = 7, w = 4).isEmpty)
  }

  test("winnowNearDups finds planted near-duplicates via blocking join") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val df = Seq(
      (1L, base),
      (2L, base + " with a small suffix added"),
      (3L, "entirely unrelated words about catalyst optimizer internals and shuffles")
    ).toDF("doc_id", "text")
    val pairs = DedupOps.winnowNearDups(df, "text", "doc_id", minSharedFrac = 0.5)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("expression participates in whole-stage codegen over a file scan") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(DedupOps.winnowFingerprints($"text").as("f"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.contains("graft_winnow"),
      s"expected codegen'd graft_winnow in:\n$plan")
  }

  test("registered as SQL function with literal k/w") {
    graft.GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(graft_winnow('the quick brown fox jumps over the lazy dog')) AS n")
      .collect().head.getInt(0)
    assert(n > 0)
  }
}
