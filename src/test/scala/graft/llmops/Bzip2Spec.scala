package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** bzip2 codec pair: writer-twin roundtrips, interop fixtures produced by
  * the reference `bzip2` command-line tool (embedded base64 — the
  * independent encoder arm), multi-stream walks, and refusal tiers.
  */
class Bzip2Spec extends AnyFunSuite {

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getMimeDecoder.decode(s)

  private def roundtrip(data: Array[Byte], level: Int): Unit = {
    val enc = Bzip2Writer.encode(data, level)
    val dec = Bzip2.decode(enc)
    assert(dec != null, s"decode null at level $level n=${data.length}")
    assert(java.util.Arrays.equals(dec, data),
      s"roundtrip mismatch at level $level n=${data.length}")
  }

  test("roundtrip: text, runs, random, periodic, edge sizes") {
    val rnd = new scala.util.Random(7)
    val text = Iterator.continually(
      "the quick brown fox jumps over the lazy dog ").take(60).mkString
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,
      Array[Byte](0),
      Array[Byte]('A'),
      "abab".getBytes, // fully periodic rotations
      ("ab" * 500).getBytes,
      Array.fill[Byte](1000)('Z'), // one long RLE1 run
      Array.fill[Byte](255 + 8)('Q'), // run crossing the 4+251 cap
      text.getBytes,
      Array.fill[Byte](3000)(rnd.nextInt(256).toByte),
      (0 until 256).map(_.toByte).toArray // all symbols used
    )
    for (c <- cases; lvl <- Seq(1, 9)) roundtrip(c, lvl)
  }

  test("roundtrip: input larger than a level-1 block splits and rejoins") {
    val rnd = new scala.util.Random(11)
    val big = new Array[Byte](260 * 1024)
    var i = 0
    while (i < big.length) {
      big(i) = ("abcdefgh now is the time ".charAt(rnd.nextInt(25))).toByte
      i += 1
    }
    roundtrip(big, 1)
    val enc = Bzip2Writer.encode(big, 1)
    // ~4.6-bit/char alphabet: entropy bound ~57%; just prove it compresses
    assert(enc.length < big.length * 3 / 5, "level-1 multi-block should compress")
  }

  test("compresses english text well below input size") {
    val text = Iterator.continually(
      "compression ratio sanity: bzip2 of natural text sits near a third ")
      .take(200).mkString.getBytes
    val enc = Bzip2Writer.encode(text, 9)
    assert(enc.length < text.length / 3,
      s"weak compression: ${enc.length} vs ${text.length}")
  }

  // ---- CLI interop: files produced by the reference bzip2 tool ----

  test("decodes reference-tool output (text, level 1)") {
    val dec = Bzip2.decode(b64(Bzip2Fixtures.cliTextL1))
    assert(dec != null && dec.length == 2275)
    assert(md5(dec) == "cb526a8b26033daa0b8301ce71f70f88")
  }

  test("decodes reference-tool output (run-heavy, level 9)") {
    val dec = Bzip2.decode(b64(Bzip2Fixtures.cliRunsL9))
    assert(dec != null && dec.length == 1790)
    assert(md5(dec) == "f8a99897bd657cea65a5cf219425cf00")
  }

  test("decodes reference-tool output (incompressible binary)") {
    val dec = Bzip2.decode(b64(Bzip2Fixtures.cliBinaryL9))
    assert(dec != null && dec.length == 3000)
    assert(md5(dec) == "4ae169c2537049a9f3e0986888ba16fb")
  }

  test("decodes reference-tool empty stream (zero blocks)") {
    val dec = Bzip2.decode(b64(Bzip2Fixtures.cliEmpty))
    assert(dec != null && dec.length == 0)
  }

  test("walks concatenated streams (pbzip2-style multi-stream)") {
    val dec = Bzip2.decode(b64(Bzip2Fixtures.cliMulti))
    assert(dec != null && dec.length == 2275 + 1790)
    assert(md5(java.util.Arrays.copyOfRange(dec, 0, 2275)) ==
      "cb526a8b26033daa0b8301ce71f70f88")
    assert(md5(java.util.Arrays.copyOfRange(dec, 2275, dec.length)) ==
      "f8a99897bd657cea65a5cf219425cf00")
  }

  test("twin output round-trips through decode after concat with CLI output") {
    val own = Bzip2Writer.encode("own stream payload".getBytes, 1)
    val cli = b64(Bzip2Fixtures.cliTextL1)
    val dec = Bzip2.decode(own ++ cli)
    assert(dec != null && dec.length == 18 + 2275)
    assert(new String(dec, 0, 18) == "own stream payload")
  }

  // ---- refusal tiers ----

  test("refuses corruption: flipped payload bit fails the block CRC") {
    val enc = Bzip2Writer.encode(
      "a body long enough to have real payload bits".getBytes, 9)
    val bad = enc.clone()
    bad(enc.length - 12) = (bad(enc.length - 12) ^ 0x10).toByte
    assert(Bzip2.decode(bad) == null)
  }

  test("refuses truncation, bad magic, bad level, junk") {
    val enc = Bzip2Writer.encode("truncate me please, thanks".getBytes, 9)
    assert(Bzip2.decode(java.util.Arrays.copyOf(enc, enc.length - 3)) == null)
    assert(Bzip2.decode(java.util.Arrays.copyOf(enc, 7)) == null)
    val badMagic = enc.clone(); badMagic(0) = 'X'
    assert(Bzip2.decode(badMagic) == null)
    val badLevel = enc.clone(); badLevel(3) = '0'
    assert(Bzip2.decode(badLevel) == null)
    assert(Bzip2.decode(null) == null)
    assert(Bzip2.decode(Array.fill[Byte](64)(0x5a)) == null)
  }
}
