package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** Dev-time interop battery: decodes every reference-compressed stream
  * in /tmp/brotli_fuzz (generated offline with the public brotli
  * library across qualities 0–11 and window sizes 10–24) and compares
  * to the raw twin. Skipped when the corpus directory is absent — the
  * committed coverage lives in BrotliSpec's embedded fixtures.
  */
class BrotliFuzzDev extends AnyFunSuite {

  test("decode matches the reference compressor across the fuzz corpus") {
    val dir = new java.io.File("/tmp/brotli_fuzz")
    assume(dir.isDirectory, "fuzz corpus not present; dev-only battery")
    val brs = dir.listFiles().filter(_.getName.endsWith(".br")).sorted
    assert(brs.nonEmpty)
    var failures = List.empty[String]
    for (f <- brs) {
      val comp = java.nio.file.Files.readAllBytes(f.toPath)
      val raw = java.nio.file.Files.readAllBytes(
        new java.io.File(f.getPath.stripSuffix(".br") + ".raw").toPath)
      val dec = Brotli.decode(comp)
      if (dec == null) failures ::= s"${f.getName}: null"
      else if (!java.util.Arrays.equals(dec, raw))
        failures ::= s"${f.getName}: mismatch (${dec.length} vs ${raw.length})"
    }
    assert(failures.isEmpty, s"${failures.size} failures:\n" +
      failures.take(20).mkString("\n"))
  }
}
