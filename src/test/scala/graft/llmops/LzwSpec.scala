package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** LZW `.Z` codec pair. Interop: nothing in this sandbox can CREATE
  * `.Z` streams (ncompress is absent; gzip only reads them), so the
  * external check is one-directional — `uncompress`/`zcat` must accept
  * the twin's output byte-exactly — plus roundtrips across every width
  * boundary and the CLEAR path, and mutation fuzz on the decode side.
  */
class LzwSpec extends AnyFunSuite {

  private def rnd(n: Int, seed: Long): Array[Byte] = {
    val r = new java.util.Random(seed)
    val a = new Array[Byte](n)
    r.nextBytes(a)
    a
  }

  private val payloads: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one" -> Array[Byte]('a'),
    "short text" -> "the compress format of 1984 still walks the web".getBytes("UTF-8"),
    // repetitive: exercises KwKwK constantly
    "ab runs" -> ("ab" * 50000).getBytes("UTF-8"),
    "single-byte run" -> Array.fill[Byte](70000)('x'),
    // every root code + growth through all widths to 16
    "byte cycle" -> Array.tabulate[Byte](200000)(i => (i % 251).toByte),
    // incompressible: dictionary fills -> CLEAR + reset path
    "random 400k" -> rnd(400000, 7),
    "text 300k" -> Array.tabulate[Byte](300000)(i =>
      ("etaoin shrdlu " + i / 1000)((i * 31 % 14)).toByte))

  test("roundtrip across width growth, KwKwK, and the CLEAR reset") {
    for ((name, p) <- payloads) {
      val enc = Lzw.encode(p)
      assert(Lzw.isCompressed(enc) || p.isEmpty, name)
      val dec = Lzw.decode(enc)
      assert(dec != null && java.util.Arrays.equals(dec, p), name)
    }
  }

  test("uncompress(1) accepts every twin stream byte-exactly") {
    val zcat = new java.io.File("/usr/bin/zcat")
    assume(zcat.canExecute, "gzip's zcat not present")
    for ((name, p) <- payloads if p.nonEmpty) {
      val f = java.nio.file.Files.createTempFile("graft-lzw", ".Z")
      java.nio.file.Files.write(f, Lzw.encode(p))
      val proc = new ProcessBuilder("/usr/bin/zcat", f.toString)
        .redirectErrorStream(false).start()
      val got = proc.getInputStream.readAllBytes()
      assert(proc.waitFor() == 0, s"$name: zcat exit")
      assert(java.util.Arrays.equals(got, p), s"$name: zcat bytes")
      java.nio.file.Files.delete(f)
    }
  }

  test("refusals: magic, flag bits, code beyond next; caps hold") {
    assert(Lzw.decode(null) == null)
    assert(Lzw.decode(Array[Byte](0x1f, -0x63)) == null) // too short
    assert(Lzw.decode("not a Z stream".getBytes) == null)
    val good = Lzw.encode("refusal fixture body".getBytes)
    // reserved flag bits 5-6
    for (bit <- Seq(0x20, 0x40)) {
      val m = good.clone(); m(2) = (m(2) | bit).toByte
      assert(Lzw.decode(m) == null, s"flag bit $bit")
    }
    // max width outside 9..16
    for (w <- Seq(0, 8, 17, 31)) {
      val m = good.clone(); m(2) = (0x80 | w).toByte
      assert(Lzw.decode(m) == null, s"maxbits $w")
    }
    // a first code >= 256 can never be valid (dictionary holds roots only)
    val bogus = Array[Byte](0x1f, -0x63, -0x70, -1, 1) // code 0x1ff
    assert(Lzw.decode(bogus) == null)
  }

  test("truncation degrades to the decodable prefix — documented limit") {
    // the 1985 format carries no length or checksum, so a truncated
    // stream is indistinguishable from a short one: decode returns the
    // prefix the surviving codes spell (it must never throw). Callers
    // needing integrity wrap .Z in a checksummed container.
    val p = ("prefix stability " * 500).getBytes("UTF-8")
    val enc = Lzw.encode(p)
    val cut = java.util.Arrays.copyOf(enc, enc.length / 2)
    val dec = Lzw.decode(cut)
    assert(dec != null && dec.length < p.length)
    assert(java.util.Arrays.equals(dec,
      java.util.Arrays.copyOf(p, dec.length)))
  }

  test("mutation fuzz: bit flips never throw") {
    val seeds = Seq(
      Lzw.encode(("graft " * 2000).getBytes),
      Lzw.encode(rnd(5000, 11)))
    val r = new java.util.Random(99)
    for (seed <- seeds; _ <- 0 until 500) {
      val m = seed.clone()
      m(r.nextInt(m.length)) = (m(r.nextInt(m.length)) ^ (1 << r.nextInt(8))).toByte
      val out = Lzw.decode(m)
      if (out != null) assert(out.length <= (64 << 20))
    }
  }

  test("Compression front door: sniff, auto-decode, suffix, mime") {
    val body = ("seventh sniffable codec " * 40).getBytes("UTF-8")
    val enc = Lzw.encode(body)
    assert(Compression.sniffCodec(enc).contains("compress"))
    assert(java.util.Arrays.equals(Compression.decodeAuto(enc), body))
    assert(java.util.Arrays.equals(
      Compression.decode(Compression.encode(body, "compress"), "compress"),
      body))
    assert(Compression.extension("compress") === ".Z")
    assert(Compression.codecForName("mirror/old-archive.tar.Z")
      .contains("compress"))
    assert(Compression.codecMime("compress") === "application/x-compress")
    assert(Compression.Codecs.contains("compress"))
  }
}
