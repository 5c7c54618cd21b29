package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** Large mutation sweep over the whole corpus — never-throw under tens
  * of thousands of corruptions. Runs against the embedded
  * [[BrotliFixtures]] seeds when the full offline corpus
  * (/tmp/brotli_fuzz) is not mounted.
  */
class BrotliBigFuzzDev extends AnyFunSuite {
  test("50k mutations over the corpus never throw") {
    val seeds = BrotliFixtures.corpus().map(_._2).filter(_.length > 4)
    assert(seeds.nonEmpty)
    val r = new java.util.Random(2026)
    var n = 0
    while (n < 50000) {
      val seed = seeds(r.nextInt(seeds.length))
      val m = seed.clone()
      val flips = 1 + r.nextInt(4)
      for (_ <- 0 until flips)
        m(r.nextInt(m.length)) = (m(r.nextInt(m.length)) ^ (1 << r.nextInt(8))).toByte
      val out = Brotli.decode(m)
      if (out != null) assert(out.length <= (64 << 20))
      // truncations too
      if (n % 5 == 0) {
        val cut = java.util.Arrays.copyOf(seed, 1 + r.nextInt(seed.length))
        val o2 = Brotli.decode(cut)
        if (o2 != null) assert(o2.length <= (64 << 20))
      }
      n += 1
    }
  }
}
