package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Layer III codec pair: structural Huffman validation, filterbank
  * perfect reconstruction, writer↔decoder round trips, gapless trim,
  * refusal envelope, and envelope-hash WAV↔MP3 twin stability.
  */
class Mp3Spec extends AnyFunSuite {

  import Mp3Tables._

  // ---------- table structure ----------

  private def allTables: Seq[Huff] =
    Seq(H1, H2, H3, H5, H6, H7, H8, H9, H10, HA, HB)

  test("every shipped Huffman table is a complete prefix code") {
    for (t <- allTables) {
      assert(t.kraftExact, s"table ${t.id}: Kraft sum != 1")
      // dense LUT fully populated == prefix-free + complete
      assert(!t.lut.contains(-1), s"table ${t.id}: LUT holes")
      // lengths consistent: each entry's LUT span is 2^(maxLen-len)
      for ((x, y, l, c) <- t.entryList) {
        val span = 1 << (t.maxLen - l)
        val base = c << (t.maxLen - l)
        var i = 0
        while (i < span) {
          assert(t.lut(base | i) == (((x << 4 | y) << 8) | l))
          i += 1
        }
      }
    }
  }

  test("encode maps agree with decode LUTs on every symbol") {
    for (t <- Seq(H1, H2, H3, H5, H6, H7, H8, H9, H10)) {
      for (x <- 0 to t.maxXY; y <- 0 to t.maxXY) {
        val sym = (x << 4) | y
        val l = t.encLen(sym)
        assert(l > 0, s"table ${t.id} missing ($x,$y)")
        val c = t.encCode(sym)
        assert(t.lut(c << (t.maxLen - l)) == ((sym << 8) | l))
      }
    }
  }

  // ---------- codec round trips ----------

  private def sine(n: Int, freq: Double, amp: Double): Array[Short] =
    Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * freq * i)).toShort)

  /** Strong-contour AM signal: per-cell gains alternate ×2 steps so the
    * 65-cell envelope comparisons sit far from ties.
    */
  private def contourSignal(n: Int, freq: Double, seed: Int): Array[Short] = {
    val cells = 65
    val gains = Array.tabulate(cells) { c =>
      val r = (c * 2654435761L + seed * 40503L) & 3L
      math.pow(2.0, r.toDouble - 1.5)
    }
    Array.tabulate(n) { i =>
      val cell = math.min(cells - 1, i.toLong * cells / n).toInt
      (8000.0 * gains(cell) * math.sin(2 * math.Pi * freq * i)).toShort
    }
  }

  private def snrDb(ref: Array[Short], dec: Mp3Pcm, ch: Int): Double = {
    val n = math.min(ref.length, dec.samples.length)
    var sig = 0.0; var err = 0.0
    var i = 0
    while (i < n) {
      val r = ref(i).toDouble
      val e = dec.samples(i) - r
      sig += r * r; err += e * e
      i += 1
    }
    10.0 * math.log10(sig / math.max(err, 1e-12))
  }

  test("mono round trip: gapless length, duration, and > 20 dB snr") {
    val pcm = contourSignal(576 * 80, 0.013, 7)
    val mp3 = Mp3Writer.mp3FromSamples(1, 44100, pcm)
    val dec = Mp3.decode(mp3)
    assert(dec != null)
    assert(dec.channels == 1 && dec.sampleRate == 44100)
    assert(dec.samples.length == pcm.length, "gapless trim must restore the grid")
    val snr = snrDb(pcm, dec, 1)
    assert(snr > 20.0, s"snr $snr")
  }

  test("stereo round trip keeps channels separate") {
    val n = 576 * 40
    val l = sine(n, 0.011, 9000)
    val r = sine(n, 0.037, 9000)
    val inter = new Array[Short](n * 2)
    var i = 0
    while (i < n) { inter(2 * i) = l(i); inter(2 * i + 1) = r(i); i += 1 }
    val dec = Mp3.decode(Mp3Writer.mp3FromSamples(2, 44100, inter))
    assert(dec != null && dec.channels == 2)
    assert(dec.samples.length == inter.length)
    // channel-separated snr: compare against the matching source channel
    var sigL = 0.0; var errL = 0.0; var sigR = 0.0; var errR = 0.0
    i = 0
    while (i < n) {
      val el = dec.samples(2 * i) - l(i); val er = dec.samples(2 * i + 1) - r(i)
      sigL += l(i).toDouble * l(i); errL += el * el
      sigR += r(i).toDouble * r(i); errR += er * er
      i += 1
    }
    assert(10 * math.log10(sigL / errL) > 15.0)
    assert(10 * math.log10(sigR / errR) > 15.0)
    // cross-talk bound: decoding must not mix channels
    var cross = 0.0
    i = 0
    while (i < n) { cross += dec.samples(2 * i) * r(i).toDouble; i += 1 }
    assert(math.abs(cross) / (n * 9000.0 * 9000.0) < 0.05)
  }

  test("all supported sample rates round trip") {
    for (rate <- Seq(32000, 44100, 48000)) {
      val pcm = sine(576 * 30, 0.017, 12000)
      val dec = Mp3.decode(Mp3Writer.mp3FromSamples(1, rate, pcm))
      assert(dec != null && dec.sampleRate == rate)
      assert(dec.samples.length == pcm.length)
      assert(snrDb(pcm, dec, 1) > 15.0, s"rate $rate")
    }
  }

  test("low bitrate still yields a valid, aligned stream") {
    val pcm = sine(576 * 30, 0.019, 6000)
    val dec = Mp3.decode(Mp3Writer.mp3FromSamples(1, 44100, pcm, kbps = 64))
    assert(dec != null)
    assert(dec.samples.length == pcm.length)
  }

  test("decoded frame count matches AvMeta's header walk") {
    val pcm = sine(576 * 50, 0.02, 10000)
    val mp3 = Mp3Writer.mp3FromSamples(1, 44100, pcm)
    val dec = Mp3.decode(mp3)
    val meta = graft.expressions.AvMeta.compute(mp3)
    assert(meta != null)
    assert(meta.getUTF8String(0).toString == "mp3")
    assert(meta.getInt(2) == 44100)
    // CBR estimate counts the Info frame too; within one frame's ms
    val estMs = meta.getLong(4)
    val trueMs = dec.frames.toLong * 1152 * 1000 / 44100
    assert(math.abs(estMs - trueMs) <= 40, s"est $estMs true $trueMs")
  }

  // ---------- envelope twins ----------

  private def envelopeOfShorts(s: Array[Short], rate: Int): java.lang.Long =
    graft.expressions.WavEnvelopeHash.compute(
      MediaWriter.wavFromSamples(1, rate, s))

  test("WAV and MP3 twins of the same content hash at Hamming 0") {
    var zero = 0
    val total = 12
    for (seed <- 0 until total) {
      val n = 576 * (60 + 5 * seed)
      val pcm = contourSignal(n, 0.011 + 0.003 * seed, seed)
      val wavHash = envelopeOfShorts(pcm, 44100)
      val dec = Mp3.decode(Mp3Writer.mp3FromSamples(1, 44100, pcm))
      assert(dec != null && dec.samples.length == n)
      val rounded = new Array[Short](n)
      var i = 0
      while (i < n) {
        val v = math.rint(dec.samples(i))
        rounded(i) = math.max(-32768, math.min(32767, v)).toShort
        i += 1
      }
      val mp3Hash = envelopeOfShorts(rounded, 44100)
      assert(wavHash != null && mp3Hash != null)
      val ham = java.lang.Long.bitCount(wavHash ^ mp3Hash)
      if (ham == 0) zero += 1
    }
    assert(zero == total, s"only $zero/$total twins at Hamming 0")
  }

  // ---------- refusal envelope ----------

  test("refusals: wrong layers, LSF, free format, garbage, truncation") {
    val pcm = sine(576 * 20, 0.02, 9000)
    val good = Mp3Writer.mp3FromSamples(1, 44100, pcm)
    assert(Mp3.decode(good) != null)

    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // Layer II (bits 17-18 = 10)
    assert(Mp3.decode(mut(b => b(1) = 0xFD.toByte)) == null)
    // MPEG-2 LSF (gsutil-style header)
    assert(Mp3.decode(mut(b => b(1) = 0xF3.toByte)) == null)
    // free format (bitrate idx 0)
    assert(Mp3.decode(mut(b => b(2) = (b(2) & 0x0F).toByte)) == null)
    // reserved sample rate
    assert(Mp3.decode(mut(b => b(2) = (b(2) | 0x0C).toByte)) == null)
    // not audio at all
    assert(Mp3.decode("definitely not an mp3 stream".getBytes("UTF-8")) == null)
    // truncated below one frame
    assert(Mp3.decode(java.util.Arrays.copyOf(good, 40)) == null)
    assert(Mp3.decode(Array[Byte]()) == null)
    assert(Mp3.decode(null) == null)
  }

  test("sniff accepts our streams and AvMeta-style lookalikes only") {
    val good = Mp3Writer.mp3FromSamples(1, 44100, sine(576 * 8, 0.02, 5000))
    assert(Mp3.sniff(good))
    assert(!Mp3.sniff("RIFFxxxxWAVE".getBytes("US-ASCII")))
    assert(!Mp3.sniff(Array[Byte](0xFF.toByte, 0x00, 0x00, 0x00)))
    assert(!Mp3.sniff(null))
  }

  test("bit-flip fuzz never throws; decode is null or structurally sane") {
    val pcm = contourSignal(576 * 24, 0.015, 3)
    val good = Mp3Writer.mp3FromSamples(1, 44100, pcm)
    val rnd = new scala.util.Random(20260814)
    var survived = 0
    for (_ <- 0 until 300) {
      val b = good.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 0 until flips) {
        val i = rnd.nextInt(b.length)
        b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      val d = Mp3.decode(b) // must not throw
      if (d != null) {
        survived += 1
        assert(d.channels == 1 || d.channels == 2)
        assert(d.samples.length % d.channels == 0)
        assert(d.samples.length <= (good.length / 104 + 4) * 1152 * 2)
      }
    }
    assert(survived > 0, "fuzz should leave some decodable mutants")
  }

  test("truncation fuzz at every eighth of the stream") {
    val good = Mp3Writer.mp3FromSamples(1, 44100, sine(576 * 24, 0.02, 8000))
    for (k <- 1 until 8) {
      val b = java.util.Arrays.copyOf(good, good.length * k / 8)
      val d = Mp3.decode(b) // must not throw; prefix decode or refuse
      if (d != null) assert(d.samples.length % 1 == 0)
    }
  }

  // ---------- fused decode-stats kernel ----------

  test("Mp3DecodeStats fuses envelope hash + decode proof bit-identically") {
    import graft.expressions.{AudioEnvelopeHash, Mp3DecodeStats, Mp3Samples}
    def statsOf(b: Array[Byte]) = Mp3DecodeStats.compute(b)
    // MP3 path: eh == AudioEnvelopeHash, stats == Mp3Samples, one decode
    val pcm = contourSignal(576 * 70, 0.013, 3)
    val mp3 = Mp3Writer.mp3FromSamples(1, 44100, pcm)
    val fused = statsOf(mp3)
    assert(fused != null)
    assert(java.lang.Long.valueOf(fused.getLong(0)) ===
      AudioEnvelopeHash.compute(mp3))
    val ms = Mp3Samples.compute(mp3)
    assert(fused.getInt(1) === ms.getInt(0))   // channels
    assert(fused.getInt(2) === ms.getInt(1))   // sample_rate
    assert(fused.getLong(3) === ms.getLong(2)) // n_frames
    assert(fused.getInt(4) === ms.getInt(3))   // mp3_frames
    // WAV path: eh == the exact-int streaming hash, stats null
    val wav = MediaWriter.wavFromSamples(1, 44100, pcm)
    val fw = statsOf(wav)
    assert(java.lang.Long.valueOf(fw.getLong(0)) ===
      AudioEnvelopeHash.compute(wav))
    (1 to 4).foreach(i => assert(fw.isNullAt(i), s"wav stat field $i"))
    // refusal path: null struct, like both parents
    assert(statsOf("not audio at all, truly".getBytes) == null)
    assert(AudioEnvelopeHash.compute("not audio at all, truly".getBytes) == null)
  }
}
