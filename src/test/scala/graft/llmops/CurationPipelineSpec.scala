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

  test("full crawl-to-shards flow: url gate → NFC → repetition gate → " +
      "scrub → dedup → decontaminate → bm25 triage → JSONL shards") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
      .withColumn("url",
        concat(lit("https://site"), col("doc_id") % 3, lit(".example.com/d/"),
          col("doc_id")))

    // 1. crawl-side gate: drop blocked hosts
    val urlOk = docs.withUrlFeatures("url", blockedHosts = Seq("site0.example.com"))
      .filter(!col("is_blocked"))
    assert(urlOk.count() < docs.count() && urlOk.count() > 0)

    // 2. encoding normalization before any hashing
    val norm = urlOk.unicodeNorm("text")

    // 3. repetition gate: corpus prose is varied, everything passes
    val rep = norm.gopherRepetition("doc_id", "text")
    val keep = norm.join(rep.filter(col("dup_ngram_char_frac") < 0.9), Seq("doc_id"))
    assert(keep.count() === urlOk.count())

    // 4. scrub + exact dedup + benchmark decontamination (docs 0-4 as eval)
    val scrubbed = keep.scrubPii("text")
    val deduped = scrubbed.dedupExact("text", "doc_id")
    val contaminated = DedupOps.contaminatedDocs(
      deduped, "doc_id", "text",
      deduped.filter(col("doc_id") < 5), "text", n = 8)
    val clean = deduped.join(contaminated,
      deduped("doc_id") === contaminated("key"), "left_anti")
    assert(clean.count() > 0 && clean.count() <= deduped.count())

    // 5. topic triage: probe ranks docs, all from the clean set
    val probe = clean.bm25("doc_id", "text", Seq("spark", "table"), k = 5)
    assert(probe.count() <= 5 && probe.count() > 0)

    // 6. export: deterministic JSONL shards a trainer can stream
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString + "/shards"
    clean.select("doc_id", "text").exportShardsJsonl("doc_id", 2, out)
    val shardDirs = new java.io.File(out).listFiles.filter(_.getName.startsWith("shard="))
    assert(shardDirs.length === 2)
  }
}
