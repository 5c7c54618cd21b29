package graft.llmops

import graft.SparkTestBase
import graft.expressions.{AviFrames, JpegDHash}
import org.apache.spark.sql.functions._

/** MJPEG AVI container: frame extraction against the writer twin, the
  * frame → JPEG pipeline composition, and video-level near-dup.
  */
class AviSpec extends SparkTestBase {
  import spark.implicits._

  /** 72×16 block-constant frames: the 9 block columns align exactly with
    * the 9 dHash cells, so each seed's 18 pseudorandom block values give
    * a 16-comparison signature — plenty of distinct hashes per seed.
    */
  private def grayPat(seed: Int)(x: Int, y: Int): Int = {
    // quadratic in the block index — adjacent-block differences vary
    // with position, so distinct seeds give distinct sign signatures
    val k = (y / 8) * 9 + (x / 8)
    (seed * seed * (k + 1) + seed * k * k + 13 * k + 7 * seed) % 256
  }

  private def mjpeg(seeds: Seq[Int]): Array[Byte] =
    AviWriter.avi(72, 16, seeds.map(s => JpegWriter.gray(72, 16, grayPat(s))))

  private def frames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] =
    Option(AviFrames.compute(bytes))
      .map(_.array.toSeq.map(_.asInstanceOf[Array[Byte]]))

  test("frames come back byte-identical, in stream order") {
    val payloads = Seq(3, 99, 7).map(s => JpegWriter.gray(72, 16, grayPat(s)))
    val got = frames(AviWriter.avi(72, 16, payloads))
    assert(got.isDefined)
    assert(got.get.length === 3)
    got.get.zip(payloads).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    // odd-length payloads exercise the word-alignment pad
    val odd = Seq(Array[Byte](1, 2, 3), Array[Byte](9), Array[Byte](4, 5))
    val oddGot = frames(AviWriter.avi(4, 4, odd))
    assert(oddGot.get.map(_.toSeq) === odd.map(_.toSeq))
    // no-index variant parses the same
    assert(frames(AviWriter.avi(4, 4, odd, withIndex = false))
      .get.map(_.toSeq) === odd.map(_.toSeq))
  }

  test("every extracted frame decodes through the JPEG pipeline") {
    val seeds = Seq(11, 42, 11, 200)
    val got = frames(mjpeg(seeds)).get
    val hashes = got.map(f => JpegDHash.compute(f))
    assert(hashes.forall(_ != null))
    // same seed → same frame bytes → same hash; different seeds differ
    assert(hashes(0) === hashes(2))
    assert(Seq(10, 20, 30, 99, 101, 102).map(s =>
      JpegDHash.compute(JpegWriter.gray(72, 16, grayPat(s))).longValue)
      .distinct.size === 6, "test seeds must give pairwise distinct hashes")
  }

  test("refuses what is not a well-formed AVI") {
    assert(frames(null) === None)
    assert(frames("RIFF but not really".getBytes("UTF-8")) === None)
    assert(frames(MediaWriter.wav(1, 8000, 16, 10)) === None) // RIFF/WAVE
    val good = mjpeg(Seq(1, 2, 3))
    for (cut <- 0 until good.length by 7)
      assert(frames(java.util.Arrays.copyOfRange(good, 0, cut)) === None,
        s"cut=$cut")
    // a movi-free AVI (header only) refuses: no frames is not a video
    val hdrOnly = {
      val full = AviWriter.avi(8, 8, Seq(Array[Byte](1)))
      // truncate right after hdrl: find 'LIST....movi' and cut there, then
      // patch the RIFF size so the span claim stays consistent
      val at = (0 until full.length - 4)
        .find(i => new String(full, i, 4, "US-ASCII") == "movi").get - 8
      val cut = java.util.Arrays.copyOf(full, at)
      val size = at - 8
      cut(4) = (size & 0xFF).toByte
      cut(5) = ((size >> 8) & 0xFF).toByte
      cut(6) = ((size >> 16) & 0xFF).toByte
      cut(7) = ((size >> 24) & 0xFF).toByte
      cut
    }
    assert(frames(hdrOnly) === None)
  }

  test("videoNearDups pairs videos sharing enough frames, via hash join") {
    // v1 and v2 share 2 of 3 distinct frames (frac 2/3); v3 shares 1 of 3
    // with v1 (frac 1/3 — below 0.5); v4 is undecodable noise
    val rows = Seq(
      (1L, mjpeg(Seq(10, 20, 30))),
      (2L, mjpeg(Seq(10, 20, 99))),
      (3L, mjpeg(Seq(30, 101, 102))),
      (4L, "not a video".getBytes("UTF-8")))
    val df = rows.toDF("vid", "content")
    val got = Multimodal.videoNearDups(df, "vid", "content",
        minSharedFrac = 0.5)
      .select("key_a", "key_b", "shared_frames").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === Set((1L, 2L, 2L)))
    val sigs = Multimodal.videoFrameSignatures(df, "vid", "content")
    assert(sigs.count() === 9) // 3 videos × 3 decodable frames
    assert(sigs.filter(col("key") === 4L).count() === 0)
  }

  test("stop-frame cap: ubiquitous frame is screened, results below the cap unchanged") {
    // every video carries stop frame seed 7 (think: black frame / studio
    // logo) plus its own distinctive frames — the videoNearDups fixture
    // from above, one shared frame added everywhere
    val rows = Seq(
      (1L, mjpeg(Seq(7, 10, 20, 30))),
      (2L, mjpeg(Seq(7, 10, 20, 99))),
      (3L, mjpeg(Seq(7, 30, 101, 102))),
      (4L, mjpeg(Seq(7, 103, 104, 105))),
      (5L, mjpeg(Seq(7, 106, 107, 108))))
    val df = rows.toDF("vid", "content")
    // cap 4 < 5 videos: the ubiquitous frame leaves the universe, and the
    // result equals the base fixture's (1,2) pair with the SAME counts —
    // shared=2 of min 3 distinctive frames, not 3 of 4
    val capped = Multimodal.videoNearDups(df, "vid", "content",
        minSharedFrac = 0.5, maxFrameDf = 4)
      .select("key_a", "key_b", "shared_frames").as[(Long, Long, Long)]
      .collect().toSet
    assert(capped === Set((1L, 2L, 2L)))
    // without the cap the stop frame welds ALL 10 pairs into candidates
    // and lifts (1,3) over the threshold — the skew the screen removes
    val uncapped = Multimodal.videoNearDups(df, "vid", "content",
        minSharedFrac = 0.5, maxFrameDf = 1000)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((1L, 3L)))
    // a frame at EXACTLY the cap survives: df counts videos, > is strict
    val atCap = Multimodal.videoNearDups(df, "vid", "content",
        minSharedFrac = 0.5, maxFrameDf = 5)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    assert(atCap === uncapped)

    // the incremental screen applies the same cap across batch ∪ store
    val corpus = Seq(
      (1L, mjpeg(Seq(7, 10, 20, 30))),
      (2L, mjpeg(Seq(7, 40, 50, 60)))).toDF("vid", "content")
    val sigs = Multimodal.videoFrameSignatures(corpus, "vid", "content")
      .select(col("key"), col("fhash"))
    val batch = Seq(
      (10L, mjpeg(Seq(7, 10, 20, 31))),   // 2 of 3 distinctive shared → drop
      (11L, mjpeg(Seq(7, 200, 201, 202))) // only the stop frame shared → survive
    ).toDF("vid", "content")
    val kept = Multimodal.videoDedupAgainstSignatures(batch, "vid", "content",
        sigs, minSharedFrac = 0.5, maxFrameDf = 3)
      .select("vid").as[Long].collect().toSet
    assert(kept === Set(11L))
    // uncapped, the stop frame alone is 1 of 4 = 0.25 < 0.5 for 11, but
    // it inflates 10's share to 3 of 4 — same drop decision here; the
    // cap's value is the bounded fan-out, proven by the count identity:
    val bs = Multimodal.videoFrameSignatures(batch, "vid", "content")
      .select(col("key"), col("fhash"))
    val universe = bs.unionByName(sigs).groupBy("fhash").count()
    assert(universe.filter(col("count") > 3).count() === 1) // just the stop frame
  }

  test("videoDedupAgainstSignatures: store screen drops replays, keeps fresh and undecodable") {
    val corpus = Seq(
      (1L, mjpeg(Seq(10, 20, 30))),
      (2L, mjpeg(Seq(40, 50, 60, 70)))).toDF("vid", "content")
    val sigs = Multimodal.videoFrameSignatures(corpus, "vid", "content")
      .select(col("key"), col("fhash"))
    val batch = Seq(
      (10L, mjpeg(Seq(10, 20, 30))),      // exact replay of 1 → drop
      (11L, mjpeg(Seq(40, 50, 99))),      // 2 of 3 shared with 2 → drop
      (12L, mjpeg(Seq(200, 201, 202))),   // disjoint → survive
      (13L, mjpeg(Seq(30, 210, 211, 212))), // 1 of 4 shared → survive
      (14L, "not a video".getBytes("UTF-8"))) // undecodable → survive
      .toDF("vid", "content")
    val got = Multimodal.videoDedupAgainstSignatures(batch, "vid", "content",
        sigs, minSharedFrac = 0.5)
      .select("vid").as[Long].collect().toSet
    assert(got === Set(12L, 13L, 14L))
  }

  test("ingestVideoBatch: shared protocol — keep-first in batch, store screen, replay-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vid_ingest").toString
    val corpusPath = s"$dir/corpus"
    val sigPath = s"$dir/sigs"
    val b1 = Seq(
      (1L, mjpeg(Seq(10, 20, 30))),
      (2L, mjpeg(Seq(10, 20, 30))), // within-batch dup of 1 → dropped
      (3L, mjpeg(Seq(80, 81, 82)))).toDF("vid", "content")
    val n1 = graft.streaming.CorpusIngest.ingestVideoBatch(spark, b1,
      corpusPath, "content", "vid", signaturePath = Some(sigPath))
    assert(n1 === 2)
    // replay the same batch: everything shares 100% with the store
    val n2 = graft.streaming.CorpusIngest.ingestVideoBatch(spark, b1,
      corpusPath, "content", "vid", signaturePath = Some(sigPath))
    assert(n2 === 0)
    // a fresh video plus a store near-dup: only the fresh one lands
    val b2 = Seq(
      (4L, mjpeg(Seq(10, 20, 99))),  // 2/3 shared with stored video 1
      (5L, mjpeg(Seq(300, 301, 302)))).toDF("vid", "content")
    val n3 = graft.streaming.CorpusIngest.ingestVideoBatch(spark, b2,
      corpusPath, "content", "vid", signaturePath = Some(sigPath))
    assert(n3 === 1)
    val stored = spark.read.parquet(corpusPath).select("vid").as[Long]
      .collect().toSet
    assert(stored === Set(1L, 3L, 5L))
  }

  test("SQL registration agrees with the API") {
    graft.GraftFunctions.register(spark)
    val df = Seq((1L, mjpeg(Seq(5, 6))), (2L, "junk".getBytes("UTF-8")))
      .toDF("id", "content")
    df.createOrReplaceTempView("avi_src")
    val viaSql = spark.sql(
      "SELECT id, size(graft_avi_frames(content)) AS n FROM avi_src")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(viaSql === Map(1L -> 2, 2L -> -1))
  }
}
