package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** Brotli (RFC 7932) decoder + store-mode writer twin. The embedded
  * fixtures are reference-library compressions (public brotli across
  * qualities 2–11 and windows 10–24) covering the static dictionary +
  * transforms, UTF-8 multibyte, incompressible bytes, long repeats and
  * the empty stream; the full 876-stream interop corpus (both
  * directions: their compress → our decode, our encode → their
  * decompress) ran offline and lives in BrotliFuzzDev, assume-guarded.
  */
class BrotliSpec extends AnyFunSuite {

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getMimeDecoder.decode(s)

  // fixtures shared with the fuzz batteries — see BrotliFixtures for the
  // quality/window provenance of each stream
  import BrotliFixtures.{FxText, FxTextRaw, FxUtf8, FxUtf8Raw, FxRandom,
    FxRepeat, FxEmpty}

  test("reference-compressed fixtures decode exactly") {
    assert(new String(Brotli.decode(b64(FxText)), "UTF-8") === FxTextRaw)
    assert(new String(Brotli.decode(b64(FxUtf8)), "UTF-8") === FxUtf8Raw)
    assert(new String(Brotli.decode(b64(FxRepeat)), "UTF-8") ===
      "graft " * 400)
    assert(Brotli.decode(b64(FxEmpty)).length === 0)
    val rnd = Brotli.decode(b64(FxRandom))
    assert(rnd.length === 300)
    // deterministic checksum of the incompressible twin
    var h = 1125899906842597L
    rnd.foreach(x => h = h * 31 + x)
    assert(h === 6804420418399854613L)
  }

  test("store-mode writer twin round-trips, incl. multi-meta-block") {
    val payloads = Seq[Array[Byte]](
      Array.emptyByteArray,
      Array[Byte](42),
      FxTextRaw.getBytes("UTF-8"),
      Array.tabulate[Byte](100000)(i => ((i * 31 + 7) % 251).toByte),
      // > 4 MB forces a second uncompressed meta-block
      Array.tabulate[Byte]((4 << 20) + 12345)(i => ((i * 131) % 253).toByte))
    for (p <- payloads) {
      val enc = Brotli.encode(p)
      val dec = Brotli.decode(enc)
      assert(dec != null && java.util.Arrays.equals(dec, p), s"len ${p.length}")
    }
  }

  test("refusals: truncation, trailing garbage, bad window — never a throw") {
    val good = b64(FxText)
    for (n <- 1 until good.length) {
      // every truncation refuses (this fixture has no byte-aligned
      // prefix that is itself a complete stream)
      assert(Brotli.decode(java.util.Arrays.copyOf(good, n)) == null, s"n=$n")
    }
    assert(Brotli.decode(good :+ 0x55.toByte) == null, "trailing garbage")
    assert(Brotli.decode(Array[Byte](0x91.toByte, 0x00)) == null,
      "reserved WBITS pattern")
    assert(Brotli.decode(Array.emptyByteArray) == null)
    assert(Brotli.decode(null) == null)
  }

  test("mutation fuzz: bit flips over genuine streams never throw") {
    val seeds = Seq(b64(FxText), b64(FxUtf8), b64(FxRepeat), b64(FxRandom))
    val rnd = new java.util.Random(1234)
    for (seed <- seeds; _ <- 0 until 400) {
      val m = seed.clone()
      val flips = 1 + rnd.nextInt(3)
      for (_ <- 0 until flips) {
        val i = rnd.nextInt(m.length)
        m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      val out = Brotli.decode(m) // null or bytes — anything but a throw
      if (out != null) assert(out.length <= (64 << 20))
    }
  }

  test("Compression front door: named codec, suffix, mime; no sniffing") {
    val body = "brotli through the front door, twice for measure. " * 20
    val raw = body.getBytes("UTF-8")
    val enc = Compression.encode(raw, "br")
    assert(java.util.Arrays.equals(Compression.decode(enc, "br"), raw))
    // no magic: the sniffing paths must NOT claim brotli
    assert(Compression.sniffCodec(enc).isEmpty)
    assert(Compression.decodeAuto(enc) == null)
    assert(Compression.extension("br") === ".br")
    assert(Compression.codecForName("shard-00001.jsonl.br").contains("br"))
    assert(Compression.codecMime("br") === "application/x-brotli")
    assert(Compression.NamedCodecs.contains("br") &&
      !Compression.Codecs.contains("br"))
  }
}
