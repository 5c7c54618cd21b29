package graft.llmops

import graft.SparkTestBase
import graft.expressions.{AudioEnvelopeHash, AudioSpectralHash, WavEnvelopeHash, WavSpectralHash}
import org.apache.spark.unsafe.types.UTF8String

class FlacSpec extends SparkTestBase {

  /** The closed-form fixture signal shared with the WAV twins. */
  private def sig(channels: Int, nFrames: Int, seed: Int): Array[Int] =
    Array.tabulate(nFrames * channels) { i =>
      val n = i / channels
      val c = i % channels
      ((5 * n + 11 * c + seed) % 4096) - 2048
    }

  private def assertExact(bytes: Array[Byte], channels: Int, rate: Int,
      want: Array[Int], tag: String): Unit = {
    val d = Flac.decode(bytes)
    assert(d != null, s"$tag refused")
    assert(d.channels === channels && d.sampleRate === rate && d.bits === 16,
      tag)
    assert(d.samples.length === want.length, tag)
    var i = 0
    while (i < want.length) {
      assert(d.samples(i) === want(i), s"$tag sample $i")
      i += 1
    }
  }

  test("round trips: verbatim, fixed, lpc, multi-frame, constant runs") {
    for ((ch, n, seed) <- Seq((1, 500, 3), (2, 777, 9))) {
      val s = sig(ch, n, seed)
      for (mode <- Seq("verbatim", "fixed")) {
        assertExact(FlacWriter.flac(ch, 44100, s, mode = mode), ch, 44100, s,
          s"$mode ch=$ch")
        // small blocks force several frames and UTF-8 frame numbers
        assertExact(FlacWriter.flac(ch, 22050, s, blockSize = 96,
          mode = mode), ch, 22050, s, s"$mode small-block ch=$ch")
      }
      assertExact(FlacWriter.flac(ch, 48000, s, mode = "lpc",
        lpcCoefs = Array(2, -1), lpcShift = 0), ch, 48000, s, s"lpc ch=$ch")
      assertExact(FlacWriter.flac(ch, 48000, s, mode = "lpc",
        lpcCoefs = Array(3, -3, 1), lpcShift = 0), ch, 48000, s, s"lpc3 ch=$ch")
      // shifted quantized coefficients: ~0.5*prev + 0.5*prev2
      assertExact(FlacWriter.flac(ch, 8000, s, mode = "lpc",
        lpcCoefs = Array(16, 16), lpcShift = 5), ch, 8000, s, s"lpcq ch=$ch")
    }
    // constant channels take the constant-subframe path
    val const = Array.fill(600)(1234)
    assertExact(FlacWriter.flac(1, 8000, const), 1, 8000, const, "const")
  }

  test("noisy signals exercise high rice parameters and order choice") {
    val rng = Array.tabulate(2000)(i =>
      (((i * 2654435761L) >>> 7) % 65536).toInt - 32768)
    assertExact(FlacWriter.flac(1, 44100, rng, mode = "fixed"), 1, 44100,
      rng, "noise")
    assertExact(FlacWriter.flac(1, 44100, rng, mode = "verbatim"), 1, 44100,
      rng, "noise-verbatim")
  }

  test("WAV and FLAC of one clip fingerprint IDENTICALLY (lossless twin)") {
    for ((ch, n, seed) <- Seq((1, 4000, 17), (2, 6000, 42))) {
      val s = sig(ch, n, seed)
      val wav = MediaWriter.wavFromSamples(ch, 8000, s.map(_.toShort))
      val flac = FlacWriter.flac(ch, 8000, s)
      val we = WavEnvelopeHash.compute(wav)
      val fe = AudioEnvelopeHash.compute(flac)
      assert(we != null && fe != null && we === fe, s"envelope ch=$ch")
      val ws = WavSpectralHash.compute(wav)
      val fs = AudioSpectralHash.compute(flac)
      assert(ws != null && fs != null && ws === fs, s"spectral ch=$ch")
    }
  }

  test("refusals: truncation, bad sync, reserved codes, non-16-bit arm") {
    val good = FlacWriter.flac(1, 8000, sig(1, 300, 5))
    assert(Flac.decode(good) != null)
    for (cut <- Seq(3, 20, 41, 60, good.length / 2, good.length - 4))
      assert(Flac.decode(good.take(cut)) === null, s"cut=$cut")
    // corrupt the first frame's sync byte
    val badSync = good.clone()
    badSync(42) = 0x00
    assert(Flac.decode(badSync) === null)
    assert(Flac.decode("not flac at all".getBytes) === null)
    assert(Flac.decode(null) === null)
    // header-only stub (MediaWriter.flac has no frames but declares
    // total samples) refuses: declared total never arrives
    assert(Flac.decode(MediaWriter.flac(2, 44100, 16, 1000)) === null)
    // the fingerprint arm refuses non-16-bit depths honestly
    assert(graft.expressions.AudioEnvelopeHash.compute(
      MediaWriter.flac(1, 8000, 24, 0)) === null)
  }

  test("bit-flip fuzz never throws") {
    val base = FlacWriter.flac(2, 8000, sig(2, 400, 7), blockSize = 128)
    for (i <- base.indices by 5) {
      val mutated = base.clone()
      mutated(i) = (mutated(i) ^ 0x5A).toByte
      Flac.decode(mutated) // refuse or decode, never throw
    }
  }

  test("ingestion accepts FLAC through the audio arm") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val s = sig(1, 4000, 23)
    val df = Seq(
      (1L, MediaWriter.wavFromSamples(1, 8000, s.map(_.toShort))),
      (2L, FlacWriter.flac(1, 8000, s))).toDF("doc_id", "content")
    val sigs = df.select(col("doc_id"),
      Multimodal.audioEnvelopeHash(col("content")).as("h")).collect()
    assert(sigs.length === 2 && sigs(0).getLong(1) === sigs(1).getLong(1))
  }
}
