package graft.llmops

import graft.expressions.{WavEnvelopeHash, WavSpectralHash}
import org.scalatest.funsuite.AnyFunSuite

/** FFT kernel and the spectral audio fingerprint: numerical agreement
  * with the naive DFT, pitch sensitivity the envelope hash lacks, gain
  * invariance, exact closed-form replay, refusal envelope.
  */
class SpectralSpec extends AnyFunSuite {

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

  test("refusal envelope: short, many-channel, 8-bit, garbage") {
    assert(WavSpectralHash.compute(clip(127, 1, 1, 4, 3)) === null)
    assert(WavSpectralHash.compute(clip(128, 1, 1, 4, 3)) !== null)
    assert(WavSpectralHash.compute(clip(300, 3, 1, 4, 3)) === null) // 3 channels
    assert(WavSpectralHash.compute(MediaWriter.wav(1, 8000, 8, 300)) === null)
    assert(WavSpectralHash.compute("never audio".getBytes("UTF-8")) === null)
    assert(WavSpectralHash.compute(null) === null)
  }
}
