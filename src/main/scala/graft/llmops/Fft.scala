package graft.llmops

/** Iterative radix-2 Cooley–Tukey FFT — the O(n log n) spectral path for
  * real analysis windows (spectrograms, large-window band energies),
  * complementing the exact-integer fingerprint DFT in
  * [[graft.expressions.WavSpectralHash]] (9 bins × ≤ 256 samples, where
  * the direct form is cheaper AND bit-replayable by a SQL oracle — an
  * FFT's different summation order costs that exactness, so the
  * fingerprint stays direct and the FFT serves the general API).
  *
  * Plain JVM kernel: call it inside `mapPartitions`/expressions at the
  * executor, never on collected data — windows are per-row local work.
  */
object Fft {

  /** In-place FFT of (re, im); lengths must match and be a power of 2. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length, "re/im length mismatch")
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length must be a power of 2: $n")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(blk + k)
          val ui = im(blk + k)
          val vr = re(blk + k + len / 2) * cr - im(blk + k + len / 2) * ci
          val vi = re(blk + k + len / 2) * ci + im(blk + k + len / 2) * cr
          re(blk + k) = ur + vr
          im(blk + k) = ui + vi
          re(blk + k + len / 2) = ur - vr
          im(blk + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Power spectrum |X_k|² of a real signal, zero-padded to the next
    * power of 2; returns bins 0 .. n/2 (inclusive Nyquist).
    */
  def powerSpectrum(signal: Array[Double]): Array[Double] = {
    require(signal.nonEmpty, "empty signal")
    var n = 1
    while (n < signal.length) n <<= 1
    val re = java.util.Arrays.copyOf(signal, n)
    val im = new Array[Double](n)
    fft(re, im)
    Array.tabulate(n / 2 + 1)(k => re(k) * re(k) + im(k) * im(k))
  }

  /** Naive O(n²) DFT power spectrum — the reference the FFT is verified
    * against in specs; also the exact shape the fingerprint's integer
    * DFT quantizes.
    */
  def dftPower(signal: Array[Double]): Array[Double] = {
    val n = signal.length
    Array.tabulate(n / 2 + 1) { k =>
      var re = 0.0
      var im = 0.0
      var i = 0
      while (i < n) {
        val th = -2.0 * math.Pi * k * i / n
        re += signal(i) * math.cos(th)
        im += signal(i) * math.sin(th)
        i += 1
      }
      re * re + im * im
    }
  }
}
