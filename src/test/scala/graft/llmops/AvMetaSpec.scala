package graft.llmops

import graft.SparkTestBase
import graft.expressions.AvMeta
import org.apache.spark.sql.functions._

/** MediaWriter → AvMeta round trips plus header edge cases. */
class AvMetaSpec extends SparkTestBase {
  import spark.implicits._

  private def meta(bytes: Array[Byte]) =
    Option(AvMeta.compute(bytes)).map { r =>
      (r.getUTF8String(0).toString,
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }

  test("wav: channels, rate, bits, duration from fmt + data chunks") {
    val b = MediaWriter.wav(channels = 2, sampleRate = 44100, bits = 16, nSamples = 44100)
    assert(meta(b) === Some(("wav", Some(2), Some(44100), Some(16), Some(1000L))))
    val mono = MediaWriter.wav(1, 8000, 8, 2000)
    assert(meta(mono) === Some(("wav", Some(1), Some(8000), Some(8), Some(250L))))
  }

  test("wav: odd-length data chunk rounds duration down, not up") {
    // 3 samples of 1ch/8bit at 1000 Hz = 3 ms
    assert(meta(MediaWriter.wav(1, 1000, 8, 3)).get._5 === Some(3L))
  }

  test("wav: fmt without data chunk yields NULL duration (truncated stream)") {
    val full = MediaWriter.wav(1, 8000, 16, 100)
    val headerOnly = java.util.Arrays.copyOfRange(full, 0, 36) // RIFF+fmt, no data
    assert(meta(headerOnly) === Some(("wav", Some(1), Some(8000), Some(16), None)))
  }

  test("mp4: mvhd v0 and v1 movie durations") {
    assert(meta(MediaWriter.mp4(1000, 90500)) ===
      Some(("mp4", None, None, None, Some(90500L))))
    assert(meta(MediaWriter.mp4(600, 1234, version = 1)) ===
      Some(("mp4", None, None, None, Some(1234L * 1000 / 600))))
  }

  test("mp3: rate/mode/CBR duration, ID3 skip, two-frame strictness") {
    // 10 frames @ 128 kbps / 44100: frameLen = 144000*128/44100 = 417
    val b = MediaWriter.mp3(10, 128, 44100, mono = false, seed = 5)
    assert(b.length === 4170)
    assert(meta(b) === Some(("mp3", Some(2), Some(44100), None,
      Some(4170L * 8 / 128))))
    // mono, other rate, ID3v2-prefixed: tag bytes excluded from duration
    val tagged = MediaWriter.mp3(4, 64, 32000, mono = true, seed = 1,
      id3Body = 100)
    val audio = 4 * (144000 * 64 / 32000)
    assert(meta(tagged) === Some(("mp3", Some(1), Some(32000), None,
      Some(audio.toLong * 8 / 64))))
    // a single complete frame is valid (end-of-file second frame)
    assert(meta(MediaWriter.mp3(1, 128, 44100, mono = true, seed = 2))
      .get._1 === "mp3")
    // tail truncation still parses — duration follows the actual byte
    // count (the CBR estimate convention for cut-off files)
    assert(meta(b.dropRight(7)).get._5 === Some(4163L * 8 / 128))
    // but a HEAD frame cut before its implied length refuses: the
    // two-frame check cannot place the second header
    assert(meta(MediaWriter.mp3(1, 128, 44100, mono = true, seed = 2)
      .dropRight(7)) === None)
    // a stray sync byte inside arbitrary bytes must not false-positive
    // (the byte after 0xFF fails the version/layer check here)
    val stray = Array.tabulate[Byte](600)(i => if (i == 77) 0xFF.toByte else 65)
    assert(meta(stray) === None)
  }

  test("mp3: trailing ID3v1 'TAG' block is stripped before validation and duration") {
    val id3v1 = {
      val t = new Array[Byte](128)
      t(0) = 'T'; t(1) = 'A'; t(2) = 'G'
      java.util.Arrays.fill(t, 3, 128, 'x'.toByte)
      t
    }
    // single frame + v1 trailer: without the strip, the byte after frame 1
    // is neither a header nor EOF → the old code refused the whole file
    val one = MediaWriter.mp3(1, 128, 44100, mono = true, seed = 2)
    assert(meta(one ++ id3v1) === meta(one))
    // multi-frame: the 128 tag bytes must not inflate the CBR duration
    val many = MediaWriter.mp3(10, 128, 44100, mono = false, seed = 5)
    assert(meta(many ++ id3v1).get._5 === Some(4170L * 8 / 128))
    // both v2 prefix and v1 trailer together
    val both = MediaWriter.mp3(4, 64, 32000, mono = true, seed = 1, id3Body = 100)
    val audio = 4 * (144000 * 64 / 32000)
    assert(meta(both ++ id3v1).get._5 === Some(audio.toLong * 8 / 64))
    // a file that is ONLY a v1 tag is not audio
    assert(meta(id3v1) === None)
  }

  test("avi: duration from avih totalFrames x usPerFrame; truncation and overflow refuse") {
    val avi = AviWriter.avi(32, 24, (0 until 5).map(f => Array[Byte](f.toByte)),
      usPerFrame = 40000)
    assert(meta(avi) === Some(("avi", None, None, None, Some(200L))))
    // magic intact, header cut mid-claim: recognized, duration unknown
    assert(meta(java.util.Arrays.copyOf(avi, 16)) ===
      Some(("avi", None, None, None, None)))
    // forged avih with us * frames past Long.MaxValue must refuse the
    // product, not wrap it: patch both fields to 0xFFFFFFFF
    val forged = avi.clone()
    val at = (0 until forged.length - 4)
      .find(i => new String(forged, i, 4, "US-ASCII") == "avih").get
    for (o <- 0 until 4) { forged(at + 8 + o) = 0xFF.toByte; forged(at + 24 + o) = 0xFF.toByte }
    assert(meta(forged) === Some(("avi", None, None, None, None)))
    // a RIFF/WAVE is still wav, not avi
    assert(meta(MediaWriter.wav(1, 8000, 16, 100)).get._1 === "wav")
  }

  test("unrecognized bytes and nulls yield NULL") {
    assert(meta("not a container".getBytes) === None)
    assert(meta(Array[Byte](1, 2, 3)) === None)
    assert(meta(null) === None)
  }

  test("withAvMeta appends the struct in the scan projection") {
    val rows = Seq(
      (1L, MediaWriter.wav(2, 16000, 16, 8000)),
      (2L, MediaWriter.mp4(1000, 2500)),
      (3L, "junk".getBytes))
    val got = Multimodal.withAvMeta(rows.toDF("id", "content"))
      .select(col("id"), col("av.format"), col("av.duration_ms"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq === Seq(
      (1L, Some("wav"), Some(500L)),
      (2L, Some("mp4"), Some(2500L)),
      (3L, None, None)))
  }

  test("graft_av_meta SQL function") {
    graft.GraftFunctions.register(spark)
    spark.createDataFrame(Seq(Tuple1(MediaWriter.wav(1, 22050, 16, 22050))))
      .toDF("content").createOrReplaceTempView("av_nk")
    val r = spark.sql(
      "SELECT graft_av_meta(content) AS m FROM av_nk").collect().head.getStruct(0)
    assert((r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)) ===
      (("wav", 1, 22050, 16, 1000L)))
  }

  test("FLAC STREAMINFO: packed rate/channels/bits/total -> duration") {
    val r = graft.expressions.AvMeta.compute(
      MediaWriter.flac(2, 44100, 16, 441000L))
    assert(r != null && r.getUTF8String(0).toString === "flac")
    assert(r.getInt(1) === 2 && r.getInt(2) === 44100 && r.getInt(3) === 16)
    assert(r.getLong(4) === 10000L)
    // 24-bit mono at an odd rate; zero total samples -> NULL duration
    val r2 = graft.expressions.AvMeta.compute(MediaWriter.flac(1, 96000, 24, 0))
    assert(r2.getInt(3) === 24 && r2.isNullAt(4))
    // a non-STREAMINFO first block refuses
    val bad = MediaWriter.flac(2, 44100, 16, 1000L).clone()
    bad(4) = 4 // VORBIS_COMMENT
    assert(graft.expressions.AvMeta.compute(bad) === null)
  }

  test("Ogg identification headers: Vorbis and Opus") {
    val v = graft.expressions.AvMeta.compute(MediaWriter.ogg(2, 22050))
    assert(v != null && v.getUTF8String(0).toString === "vorbis")
    assert(v.getInt(1) === 2 && v.getInt(2) === 22050)
    assert(v.isNullAt(3) && v.isNullAt(4))
    val o = graft.expressions.AvMeta.compute(
      MediaWriter.ogg(1, 48000, opus = true))
    assert(o != null && o.getUTF8String(0).toString === "opus")
    assert(o.getInt(1) === 1 && o.getInt(2) === 48000)
    // an OggS page with neither header refuses
    val junk = MediaWriter.ogg(2, 22050).clone()
    junk(28) = 'x' // corrupt the \u0001vorbis tag
    assert(graft.expressions.AvMeta.compute(junk) === null)
  }

  test("ADTS AAC: frame walk, channel config 7, truncation → NULL ms") {
    val a = graft.expressions.AvMeta.compute(MediaWriter.adts(25, 4, 2))
    assert(a != null && a.getUTF8String(0).toString === "aac")
    assert(a.getInt(1) === 2 && a.getInt(2) === 44100)
    assert(a.getLong(4) === 25L * 1024 * 1000 / 44100)
    val eight = graft.expressions.AvMeta.compute(MediaWriter.adts(3, 11, 7))
    assert(eight.getInt(1) === 8 && eight.getInt(2) === 8000)
    // truncated final frame: format survives, duration goes NULL
    val full = MediaWriter.adts(25, 4, 2)
    val cut = java.util.Arrays.copyOf(full, full.length - 10)
    val t = graft.expressions.AvMeta.compute(cut)
    assert(t != null && t.getUTF8String(0).toString === "aac" && t.isNullAt(4))
    // an mp3 header (layer 01) must NOT land in the aac arm
    val mp3 = graft.expressions.AvMeta.compute(
      MediaWriter.mp3(4, 128, 44100, mono = true, seed = 1, id3Body = 0))
    assert(mp3 != null && mp3.getUTF8String(0).toString === "mp3")
    // bad second frame refuses (anti false positive)
    val bad = full.clone()
    bad(7 + 64) = 0 // second frame sync byte
    assert(graft.expressions.AvMeta.compute(bad) === null)
  }

  test("M4A: audio track metadata; audio-less mp4 keeps the movie arm") {
    val m = graft.expressions.AvMeta.compute(
      MediaWriter.m4a(2, 44100, 600L, 1234L))
    assert(m != null && m.getUTF8String(0).toString === "m4a")
    assert(m.getInt(1) === 2 && m.getInt(2) === 44100 && m.getInt(3) === 16)
    assert(m.getLong(4) === 1234L * 1000 / 600)
    val plain = graft.expressions.AvMeta.compute(MediaWriter.mp4(1000L, 777L))
    assert(plain != null && plain.getUTF8String(0).toString === "mp4")
    assert(plain.isNullAt(1) && plain.getLong(4) === 777L)
  }
}
