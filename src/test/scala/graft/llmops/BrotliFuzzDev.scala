package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** Interop battery: decodes every reference-compressed stream in the
  * corpus and compares to the raw twin. The corpus is the full offline
  * sweep (/tmp/brotli_fuzz — public brotli library across qualities
  * 0–11 and window sizes 10–24, 876 streams) when mounted, else the
  * embedded [[BrotliFixtures]] seeds — so the battery always runs.
  */
class BrotliFuzzDev extends AnyFunSuite {

  test("decode matches the reference compressor across the fuzz corpus") {
    val corpus = BrotliFixtures.corpus()
    assert(corpus.nonEmpty)
    var failures = List.empty[String]
    for ((name, comp, raw) <- corpus) {
      val dec = Brotli.decode(comp)
      if (dec == null) failures ::= s"$name: null"
      else if (!java.util.Arrays.equals(dec, raw))
        failures ::= s"$name: mismatch (${dec.length} vs ${raw.length})"
    }
    assert(failures.isEmpty, s"${failures.size} failures:\n" +
      failures.take(20).mkString("\n"))
  }
}
