package graft.llmops

import graft.SparkTestBase
import graft.expressions.{WavEnvelopeHash, WavSamples}
import org.apache.spark.sql.functions._

class WavSpec extends SparkTestBase {
  import spark.implicits._

  private case class Au(channels: Int, rate: Int, nFrames: Long,
      sum: Long, wsum: Long, peak: Int)

  private def decode(b: Array[Byte]): Option[Au] =
    Option(WavSamples.compute(b)).map(r => Au(r.getInt(0), r.getInt(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))

  /** Closed-form expectation from the writer's sample pattern. */
  private def expected(ch: Int, rate: Int, nFrames: Int, seed: Int): Au = {
    var sum = 0L; var wsum = 0L; var peak = 0
    for (i <- 0 until nFrames * ch) {
      val v = ((5 * (i / ch) + 11 * (i % ch) + seed) % 4096) - 2048
      sum += v; wsum += (i % 9973 + 1).toLong * v
      peak = math.max(peak, math.abs(v))
    }
    Au(ch, rate, nFrames.toLong, sum, wsum, peak)
  }

  test("PCM16 roundtrip recovers exact sample statistics") {
    for ((ch, rate, n, seed) <- Seq((1, 8000, 1, 0), (2, 44100, 500, 77),
        (4, 16000, 9973 + 5, 250), (3, 22050, 64, 9))) {
      assert(decode(MediaWriter.wavWithSamples(ch, rate, n, seed)) ===
        Some(expected(ch, rate, n, seed)), s"$ch ch × $n @ $rate seed=$seed")
    }
  }

  test("agrees with the JDK's own independent WAV decoder") {
    // javax.sound.sampled is a complete second implementation: same
    // bytes, independently decoded, must yield the same sample sum
    val bytes = MediaWriter.wavWithSamples(2, 8000, 333, 41)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val raw = in.readAllBytes()
    var jdkSum = 0L
    var i = 0
    while (i < raw.length) {
      jdkSum += ((raw(i) & 0xFF) | (raw(i + 1) << 8)).toShort
      i += 2
    }
    assert(decode(bytes).get.sum === jdkSum)
  }

  test("refuses non-PCM16, truncated, and non-WAV bytes") {
    assert(WavSamples.compute("not audio".getBytes("UTF-8")) === null)
    // header-only writer emits zeroed 16-bit PCM — decodable, all-zero
    val hdr = decode(MediaWriter.wav(2, 8000, 16, 10))
    assert(hdr === Some(Au(2, 8000, 10, 0, 0, 0)))
    // 8-bit depth refused (half-decoding would guess a sample layout)
    assert(WavSamples.compute(MediaWriter.wav(1, 8000, 8, 10)) === null)
    // truncated payload: chop the final sample bytes
    val full = MediaWriter.wavWithSamples(1, 8000, 100, 3)
    assert(WavSamples.compute(full.dropRight(3)) === null)
  }

  test("envelope hash: gain-invariant, refuses short clips") {
    def wavOf(f: Int => Int, frames: Int): Array[Byte] =
      MediaWriter.wavFromSamples(1, 8000,
        Array.tabulate(frames)(n => f(n).toShort))
    // loudness staircase over 65 cells of 4 frames each: |v| rises
    val rising = wavOf(n => (n / 4 + 1) * 10, 260)
    val h = WavEnvelopeHash.compute(rising)
    assert(h !== null)
    // every adjacent-cell comparison true → low 64 bits all set
    assert(h.longValue() === -1L)
    // uniform gain (×3, no clipping) preserves every comparison
    val louder = wavOf(n => (n / 4 + 1) * 30, 260)
    assert(WavEnvelopeHash.compute(louder) === h)
    // 64 frames < 65 cells → refused
    assert(WavEnvelopeHash.compute(wavOf(_ => 100, 64)) === null)
    assert(WavEnvelopeHash.compute("junk".getBytes("UTF-8")) === null)
  }

  test("audioNearDups: crafted Hamming distances through the banded join") {
    def envelope(cells: Int => Int): Array[Byte] =
      MediaWriter.wavFromSamples(1, 8000,
        Array.tabulate(260)(n => cells(n / 4).toShort))
    val base = envelope(k => (k + 1) * 10) // rising staircase
    // dip ONE cell (k=30): comparison 29 flips (5 > 300 now false),
    // comparison 30 keeps its direction (320 > 5 still true) → Hamming 1
    val dipped = envelope(k => if (k == 30) 5 else (k + 1) * 10)
    val falling = envelope(k => (66 - k) * 10) // all bits 0, far away
    val rows = Seq(
      (1L, base), (2L, dipped), (3L, falling),
      (4L, "junk".getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "content").repartition(3)
    val pairs = Multimodal.audioNearDups(df, "doc_id", "content")
      .select("key_a", "key_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    assert(pairs === Set((1L, 2L, 1)))
    // incremental screen: store = base → dipped drops, falling + junk stay
    val sigs = Multimodal.audioSignatures(
      Seq((1L, base)).toDF("doc_id", "content"), "doc_id", "content")
    val survivors = Multimodal.audioDedupAgainstSignatures(
        df.filter($"doc_id" > 1L), "doc_id", "content", sigs)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === Set(3L, 4L))
  }

  test("SQL registration: graft_wav_samples / graft_wav_envelope_hash") {
    graft.GraftFunctions.register(spark)
    val bytes = MediaWriter.wavWithSamples(2, 8000, 100, 7)
    Seq(Tuple1(bytes)).toDF("content").createOrReplaceTempView("wav_one")
    val got = spark.sql(
      """SELECT graft_wav_samples(content).samp_sum AS s,
                graft_wav_envelope_hash(content) AS h FROM wav_one""")
      .as[(Long, java.lang.Long)].head()
    assert(got._1 === decode(bytes).get.sum)
    assert(got._2 === WavEnvelopeHash.compute(bytes))
  }
}
