package graft.llmops

import graft.SparkTestBase
import graft.expressions.{WavEnvelopeHash, WavSpectralHash}

/** FFT kernel and the spectral audio fingerprint: numerical agreement
  * with the naive DFT, pitch sensitivity the envelope hash lacks, gain
  * invariance, exact closed-form replay, refusal envelope, and the
  * spectral arms of incremental dedup + ingestion.
  */
class SpectralSpec extends SparkTestBase {

  private def clip(nf: Int, ch: Int, amp: Int, p1: Int, p2: Int): Array[Byte] = {
    def sq(n: Int, p: Int): Int = ((n / p) % 2) * 2 - 1
    MediaWriter.wavFromSamples(ch, 8000, Array.tabulate(nf * ch) { i =>
      val n = i / ch
      val c = i % ch
      (amp * (300 * sq(n, p1) + 150 * sq(n, p2) + 40 * c)).toShort
    })
  }

  test("FFT matches the naive DFT and satisfies Parseval") {
    for (n <- Seq(8, 64, 256, 1024)) {
      val sig = Array.tabulate(n)(i =>
        math.sin(2 * math.Pi * 3 * i / n) + 0.5 * math.cos(2 * math.Pi * 17 * i / n)
          + ((i * 31 + 7) % 13) / 13.0)
      val fast = Fft.powerSpectrum(sig)
      val slow = Fft.dftPower(sig)
      assert(fast.length === slow.length)
      fast.zip(slow).zipWithIndex.foreach { case ((f, s), k) =>
        assert(math.abs(f - s) <= 1e-6 * math.max(1.0, s),
          s"n=$n bin=$k fast=$f slow=$s")
      }
      // Parseval: Σ|x|² = (1/n)Σ|X|² — reconstruct full spectrum by symmetry
      val time = sig.map(x => x * x).sum
      val re = java.util.Arrays.copyOf(sig, n)
      val im = new Array[Double](n)
      Fft.fft(re, im)
      val freq = re.zip(im).map { case (a, b) => a * a + b * b }.sum / n
      assert(math.abs(time - freq) <= 1e-6 * time)
    }
  }

  test("spectral hash separates pitches the envelope hash cannot") {
    // equal-amplitude square waves: |sample| is constant, so the
    // time-domain loudness contour is flat and identical — but the
    // energy sits at different harmonics
    def square(nf: Int, p: Int): Array[Byte] =
      MediaWriter.wavFromSamples(1, 8000,
        Array.tabulate(nf)(n => (500 * (((n / p) % 2) * 2 - 1)).toShort))
    val a = square(256, 4)
    val b = square(256, 16)
    val ea = WavEnvelopeHash.compute(a)
    val eb = WavEnvelopeHash.compute(b)
    assert(ea !== null)
    assert(ea === eb, "envelope hash is blind to pitch by design")
    val sa = WavSpectralHash.compute(a)
    val sb = WavSpectralHash.compute(b)
    assert(sa !== null)
    assert(sb !== null)
    assert(sa !== sb, "spectral hash must separate different pitches")
  }

  test("gain invariance: 2x and 3x amplified clips fingerprint identically") {
    for ((ch, p1, p2) <- Seq((1, 5, 3), (2, 9, 4))) {
      val base = WavSpectralHash.compute(clip(300, ch, 1, p1, p2))
      assert(base !== null)
      assert(WavSpectralHash.compute(clip(300, ch, 2, p1, p2)) === base)
      assert(WavSpectralHash.compute(clip(300, ch, 3, p1, p2)) === base)
    }
  }

  test("kernel matches an independent closed-form replay") {
    // naive reference: same math, written separately (floor(x+0.5)
    // rounding, floor partitions, decimation) — the SQL oracle's shape
    val nf = 300; val ch = 2; val p1 = 5; val p2 = 3
    def sq(n: Int, p: Int): Int = ((n / p) % 2) * 2 - 1
    def mono(n: Int): Long =
      (0 until ch).map(c => 300 * sq(n, p1) + 150 * sq(n, p2) + 40 * c).sum
    var expect = 0L
    for (cell <- 0 until 8) {
      val start = (cell.toLong * nf / 8).toInt
      val end = ((cell + 1).toLong * nf / 8).toInt
      val len = end - start
      val stride = (len + 255) / 256
      val m = (len + stride - 1) / stride
      val e = (0 to 9).map { k =>
        if (k == 0) 0L
        else {
          var re = 0L; var im = 0L
          for (i <- 0 until m) {
            val th = 2.0 * math.Pi * k * i / m
            re += mono(start + i * stride) * math.floor(math.cos(th) * 64 + 0.5).toLong
            im += mono(start + i * stride) * math.floor(math.sin(th) * 64 + 0.5).toLong
          }
          re * re + im * im
        }
      }
      for (b <- 1 until 9 if e(b + 1) > e(b)) expect |= 1L << (cell * 8 + b - 1)
    }
    assert(WavSpectralHash.compute(clip(nf, ch, 1, p1, p2)) === expect)
  }

  test("spectral incremental screen: gain clones drop, different pitches survive") {
    import spark.implicits._
    val corpus = Seq(
      (1L, clip(300, 1, 1, 5, 3)),
      (2L, clip(280, 2, 1, 9, 4))).toDF("cid", "content")
    val sigs = Multimodal.audioSpectralSignatures(corpus, "cid", "content")
    val batch = Seq(
      (10L, clip(300, 1, 2, 5, 3)),   // 2x gain clone of 1 → drop
      (11L, clip(300, 1, 1, 11, 6)),  // different pitches → survive
      (12L, "noise".getBytes("UTF-8"))) // undecodable → survive
      .toDF("cid", "content")
    val got = Multimodal.audioSpectralDedupAgainstSignatures(batch, "cid",
        "content", sigs, maxDist = 3)
      .select("cid").as[Long].collect().toSet
    assert(got === Set(11L, 12L))
  }

  test("ingestAudioBatch(spectral = true): replay-idempotent with a shash store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_ingest").toString
    val b1 = Seq((1L, clip(300, 1, 1, 5, 3)), (2L, clip(280, 1, 1, 9, 4)))
      .toDF("cid", "content")
    val n1 = graft.streaming.CorpusIngest.ingestAudioBatch(spark, b1,
      s"$dir/corpus", "content", "cid",
      signaturePath = Some(s"$dir/sigs"), spectral = true)
    assert(n1 === 2)
    val n2 = graft.streaming.CorpusIngest.ingestAudioBatch(spark, b1,
      s"$dir/corpus", "content", "cid",
      signaturePath = Some(s"$dir/sigs"), spectral = true)
    assert(n2 === 0)
    assert(spark.read.parquet(s"$dir/sigs").columns.toSeq ===
      Seq("key", "shash"))
  }

  test("refusal envelope: short, many-channel, 8-bit, garbage") {
    assert(WavSpectralHash.compute(clip(127, 1, 1, 4, 3)) === null)
    assert(WavSpectralHash.compute(clip(128, 1, 1, 4, 3)) !== null)
    assert(WavSpectralHash.compute(clip(300, 3, 1, 4, 3)) === null) // 3 channels
    assert(WavSpectralHash.compute(MediaWriter.wav(1, 8000, 8, 300)) === null)
    assert(WavSpectralHash.compute("never audio".getBytes("UTF-8")) === null)
    assert(WavSpectralHash.compute(null) === null)
  }
}
