package graft.llmops

import graft.SparkTestBase
import graft.syntax._
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation pipeline composed from the fluent façade —
  * quality gate → PII scrub → fuzzy near-dup pairs → cluster dedup →
  * deterministic sample — the composition a real training-data pipeline
  * runs, exercised as one flow.
  */
class CurationPipelineSpec extends SparkTestBase {

  test("quality → scrub → near-dup cluster dedup → deterministic sample") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val n = docs.count()
    // plant exact duplicates of the whole corpus
    val doubled = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 1000000))

    val quality = doubled.withTextQuality("text")
      .filter(col("n_tokens") >= 3)
    assert(quality.count() === 2 * n, "corpus prose passes the quality gate")

    val scrubbed = quality.scrubPii("text")

    val pairs = scrubbed.nearDupsMinhash("text", "doc_id", threshold = 0.9)
      .select("key_a", "key_b")
    val deduped = scrubbed.dedupByClusters("doc_id", pairs)

    // every planted copy is clustered with its lower-keyed original → gone
    assert(deduped.filter(col("doc_id") >= 1000000).count() === 0)
    // survivors = one per duplicate cluster + singletons; never more than n
    val survivors = deduped.count()
    assert(survivors <= n && survivors > 0)

    // the sample is reproducible and nested within the survivors
    val s1 = deduped.hashSample("doc_id", 0.4)
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    val s2 = deduped.hashSample("doc_id", 0.4)
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    assert(s1.toSeq === s2.toSeq)
    assert(s1.nonEmpty && s1.length < survivors)
  }
}
