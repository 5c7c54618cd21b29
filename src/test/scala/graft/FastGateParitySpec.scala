package graft

/** The `_fast` production-hash variants and their correctness gates.
  *
  * q88_fast IS bit-equal to its portable twin — exact-substring dedup is
  * content-determined (which 40-grams repeat), the fingerprint hash only
  * names them — so its gate replays q88's oracle verbatim; the first test
  * proves that premise on the gate fixture. q43_fast and q34_fast are NOT
  * bit-equal to their md5-portable twins (a different hash space picks
  * different window minima / simhash bits, so near-pair sets differ);
  * q43_fast therefore carries its own oracle replaying splitmix64 in SQL,
  * and here we assert the invariant that IS hash-independent: every
  * exact-duplicate pair (same text, doc_id vs doc_id+1000000) the portable
  * mode reports is reported by the fast mode too, and vice versa.
  */
class FastGateParitySpec extends SparkTestBase {

  private def collectSorted(name: String): Seq[String] = {
    val df = (SparkEntry.queries ++ SparkEntry.benchOnlyQueries)(name)(spark, sf0001)
    df.collect().map(_.toString).sorted.toSeq
  }

  private def twinPairs(name: String): Set[(Long, Long)] = {
    val df = (SparkEntry.queries ++ SparkEntry.benchOnlyQueries)(name)(spark, sf0001)
    df.select("key_a", "key_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (a, b) if b == a + 1000000 => (a, b) }
      .toSet
  }

  test("q88_fast is bit-identical to q88_substring_dedup on the gate fixture") {
    assert(collectSorted("q88_fast") == collectSorted("q88_substring_dedup"))
  }

  test("q43_fast finds the same exact-twin pairs as the portable mode") {
    val fast = twinPairs("q43_fast")
    val portable = twinPairs("q43_winnow_neardup")
    assert(fast == portable && fast.nonEmpty)
  }

  test("q34_fast finds the same exact-twin pairs as the portable mode") {
    val fast = twinPairs("q34_fast")
    val portable = twinPairs("q34_simhash_neardup")
    assert(fast == portable && fast.nonEmpty)
  }
}
