package graft.llmops

import graft.SparkTestBase
import graft.expressions.{JpegDHash, Mp4Frames, VideoFrames}
import org.apache.spark.sql.functions._

/** Motion-JPEG MP4/MOV: sample-table walk against the writer twin, the
  * container-agnostic dispatch, and the mixed-container video family.
  */
class Mp4Spec extends SparkTestBase {
  import spark.implicits._

  private def grayPat(seed: Int)(x: Int, y: Int): Int = {
    val k = (y / 8) * 9 + (x / 8)
    (seed * seed * (k + 1) + seed * k * k + 13 * k + 7 * seed) % 256
  }

  private def jf(seed: Int): Array[Byte] =
    JpegWriter.gray(72, 16, grayPat(seed))

  private def frames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] =
    Option(Mp4Frames.compute(bytes))
      .map(_.array.toSeq.map(_.asInstanceOf[Array[Byte]]))

  test("samples come back byte-identical, in sample order, across layouts") {
    val payloads = Seq(3, 99, 7, 42, 11).map(jf)
    val layouts = Seq(
      Mp4Writer.mp4(72, 16, payloads), // single chunk, stco, isom
      Mp4Writer.mp4(72, 16, payloads, samplesPerChunk = 2), // multi-chunk + short tail
      Mp4Writer.mp4(72, 16, payloads, samplesPerChunk = 1), // chunk per sample
      Mp4Writer.mp4(72, 16, payloads, useCo64 = true), // 64-bit offsets
      Mp4Writer.mp4(72, 16, payloads, quicktime = true), // qt brand + jpeg entry
      Mp4Writer.mp4(72, 16, payloads, moovFirst = true), // faststart layout
      Mp4Writer.mp4(72, 16, payloads, samplesPerChunk = 2,
        useCo64 = true, quicktime = true, moovFirst = true)) // everything at once
    layouts.zipWithIndex.foreach { case (mp4, li) =>
      val got = frames(mp4)
      assert(got.isDefined, s"layout $li refused")
      assert(got.get.length === 5, s"layout $li")
      got.get.zip(payloads).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b), s"layout $li")
      }
    }
  }

  test("every extracted sample decodes through the JPEG pipeline") {
    val got = frames(Mp4Writer.mp4(72, 16, Seq(11, 42, 11, 200).map(jf))).get
    val hashes = got.map(f => JpegDHash.compute(f))
    assert(hashes.forall(_ != null))
    assert(hashes(0) === hashes(2)) // same seed, same frame, same hash
  }

  test("refuses what is not a well-formed motion-JPEG BMFF file") {
    assert(frames(null) === None)
    assert(frames("utterly not a container".getBytes("UTF-8")) === None)
    assert(frames(MediaWriter.wav(1, 8000, 16, 10)) === None) // RIFF
    assert(frames(AviWriter.avi(72, 16, Seq(jf(1)))) === None) // AVI is AviFrames' job
    val good = Mp4Writer.mp4(72, 16, Seq(1, 2, 3).map(jf))
    // truncation fuzz: every cut must refuse, never partial-parse.
    // moov trails mdat in this layout, so any cut loses table bytes
    for (cut <- 0 until good.length by 11)
      assert(frames(java.util.Arrays.copyOfRange(good, 0, cut)) === None,
        s"cut=$cut")
    // moovFirst + truncation into mdat: tables parse but samples point
    // past the cut — the bounds check must refuse
    val fast = Mp4Writer.mp4(72, 16, Seq(1, 2, 3).map(jf), moovFirst = true)
    assert(frames(java.util.Arrays.copyOf(fast, fast.length - 40)) === None)
    // a non-MJPEG codec fourcc must refuse: patch the stsd entry format
    val patched = good.clone()
    val at = (0 until patched.length - 4).find(i =>
      new String(patched, i, 4, "US-ASCII") == "dmb1").get
    "avc1".getBytes("US-ASCII").copyToArray(patched, at)
    assert(frames(patched) === None)
    // stsz/stsc disagreement: claim one extra sample
    val overclaim = good.clone()
    val stszAt = (0 until overclaim.length - 4).find(i =>
      new String(overclaim, i, 4, "US-ASCII") == "stsz").get
    // sample_count lives at stszAt+4(ver/flags)+4(fixed) .. +4
    val cntAt = stszAt + 12
    overclaim(cntAt + 3) = (overclaim(cntAt + 3) + 1).toByte
    assert(frames(overclaim) === None)
  }

  test("VideoFrames dispatches by container and unifies the Hamming space") {
    val payloads = Seq(10, 20, 30).map(jf)
    val avi = AviWriter.avi(72, 16, payloads)
    val mp4 = Mp4Writer.mp4(72, 16, payloads)
    val both = Seq(avi, mp4).map(b => Option(VideoFrames.compute(b))
      .map(_.array.toSeq.map(_.asInstanceOf[Array[Byte]])))
    assert(both.forall(_.isDefined))
    // identical frame payloads regardless of container
    both.head.get.zip(both(1).get).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    assert(VideoFrames.compute("neither".getBytes("UTF-8")) === null)
  }

  test("videoNearDups pairs an AVI with its MP4 remux — cross-container near-dup") {
    val rows = Seq(
      (1L, AviWriter.avi(72, 16, Seq(10, 20, 30).map(jf))),
      (2L, Mp4Writer.mp4(72, 16, Seq(10, 20, 99).map(jf))), // 2/3 shared, other container
      (3L, Mp4Writer.mp4(72, 16, Seq(101, 102, 103).map(jf))), // disjoint
      (4L, "not a video".getBytes("UTF-8")))
    val df = rows.toDF("vid", "content")
    val got = Multimodal.videoNearDups(df, "vid", "content",
        minSharedFrac = 0.5)
      .select("key_a", "key_b", "shared_frames").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === Set((1L, 2L, 2L)))
    // and the incremental screen sees through the remux too: an MP4
    // replay of an AVI corpus video drops
    val sigs = Multimodal.videoFrameSignatures(
        Seq((1L, AviWriter.avi(72, 16, Seq(10, 20, 30).map(jf))))
          .toDF("vid", "content"), "vid", "content")
      .select(col("key"), col("fhash"))
    val batch = Seq(
      (10L, Mp4Writer.mp4(72, 16, Seq(10, 20, 30).map(jf))), // remuxed replay → drop
      (11L, Mp4Writer.mp4(72, 16, Seq(200, 201).map(jf)))) // fresh → survive
      .toDF("vid", "content")
    val kept = Multimodal.videoDedupAgainstSignatures(batch, "vid", "content",
        sigs, minSharedFrac = 0.5)
      .select("vid").as[Long].collect().toSet
    assert(kept === Set(11L))
  }

  test("ingestVideoBatch is container-agnostic: MP4 batch screens against an AVI-built store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mp4_ingest").toString
    val corpusPath = s"$dir/corpus"
    val sigPath = s"$dir/sigs"
    // seed the store from AVI content
    val b1 = Seq(
      (1L, AviWriter.avi(72, 16, Seq(10, 20, 30).map(jf))),
      (2L, AviWriter.avi(72, 16, Seq(80, 81, 82).map(jf)))).toDF("vid", "content")
    assert(graft.streaming.CorpusIngest.ingestVideoBatch(spark, b1,
      corpusPath, "content", "vid", signaturePath = Some(sigPath)) === 2)
    // MP4 batch: a remux of stored AVI 1 drops, within-batch MP4 dup
    // collapses keep-first, fresh MP4 lands
    val b2 = Seq(
      (10L, Mp4Writer.mp4(72, 16, Seq(10, 20, 30).map(jf))), // remux of 1 → drop
      (11L, Mp4Writer.mp4(72, 16, Seq(200, 201, 202).map(jf))), // fresh → land
      (12L, Mp4Writer.mp4(72, 16, Seq(200, 201, 202).map(jf)))) // batch dup of 11 → drop
      .toDF("vid", "content")
    assert(graft.streaming.CorpusIngest.ingestVideoBatch(spark, b2,
      corpusPath, "content", "vid", signaturePath = Some(sigPath)) === 1)
    // replay is idempotent across containers
    assert(graft.streaming.CorpusIngest.ingestVideoBatch(spark, b2,
      corpusPath, "content", "vid", signaturePath = Some(sigPath)) === 0)
    import spark.implicits._
    val stored = spark.read.parquet(corpusPath).select("vid").as[Long]
      .collect().toSet
    assert(stored === Set(1L, 2L, 11L))
  }

  test("sampleFrames: uniform indices, pass-through under n, NULL for non-video") {
    val payloads = (0 until 10).map(jf)
    val rows = Seq(
      (1L, Mp4Writer.mp4(72, 16, payloads)), // 10 frames
      (2L, AviWriter.avi(72, 16, payloads.take(3))), // 3 frames ≤ n
      (3L, "not a video".getBytes("UTF-8")))
    val df = rows.toDF("vid", "content")
    val got = df.select(col("vid"),
        Multimodal.sampleFrames(col("content"), 4).alias("fs"))
      .orderBy("vid").collect()
    // 10 frames sampled at floor(i*10/4) = 0, 2, 5, 7
    val s1 = got(0).getSeq[Array[Byte]](1)
    assert(s1.length === 4)
    Seq(0, 2, 5, 7).zip(s1).foreach { case (idx, f) =>
      assert(java.util.Arrays.equals(f, payloads(idx)), s"index $idx")
    }
    // short video passes through whole, in order
    val s2 = got(1).getSeq[Array[Byte]](1)
    assert(s2.length === 3)
    s2.zip(payloads.take(3)).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    assert(got(2).isNullAt(1))
  }

  test("maxFramesPerVideo bounds signature rows and keeps near-dup verdicts") {
    // a "long" video (24 frames) and its remux — signature work must cap
    // at n rows per video while the sampled sets still pair them up
    val payloads = (0 until 24).map(jf)
    val rows = Seq(
      (1L, AviWriter.avi(72, 16, payloads)),
      (2L, Mp4Writer.mp4(72, 16, payloads)), // remux of 1 → same sampled frames
      (3L, Mp4Writer.mp4(72, 16, (100 until 124).map(jf)))) // disjoint
    val df = rows.toDF("vid", "content")
    val sigs = Multimodal.videoFrameSignatures(df, "vid", "content",
      maxFramesPerVideo = 6)
    val perVideo = sigs.groupBy("key").count().as[(Long, Long)].collect().toMap
    assert(perVideo.values.forall(_ <= 6), s"unbounded: $perVideo")
    assert(perVideo(1L) === 6)
    val pairs = Multimodal.videoNearDups(df, "vid", "content",
        minSharedFrac = 0.5, maxFramesPerVideo = 6)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    // incremental screen under sampling: remux drops, fresh survives
    val store = Multimodal.videoFrameSignatures(
      Seq((1L, AviWriter.avi(72, 16, payloads))).toDF("vid", "content"),
      "vid", "content", maxFramesPerVideo = 6)
      .select(col("key"), col("fhash"))
    val batch = Seq(
      (10L, Mp4Writer.mp4(72, 16, payloads)),
      (11L, Mp4Writer.mp4(72, 16, (200 until 224).map(jf))))
      .toDF("vid", "content")
    val kept = Multimodal.videoDedupAgainstSignatures(batch, "vid", "content",
        store, minSharedFrac = 0.5, maxFramesPerVideo = 6)
      .select("vid").as[Long].collect().toSet
    assert(kept === Set(11L))
  }

  test("SQL registration agrees with the API") {
    graft.GraftFunctions.register(spark)
    val mp4 = Mp4Writer.mp4(72, 16, Seq(5, 6).map(jf))
    val df = Seq((1L, mp4)).toDF("vid", "content")
    df.createOrReplaceTempView("mp4_sql_check")
    val viaSql = spark.sql(
      "SELECT size(graft_mp4_frames(content)) AS n, " +
        "size(graft_video_frames(content)) AS nv FROM mp4_sql_check")
      .collect().head
    assert(viaSql.getInt(0) === 2)
    assert(viaSql.getInt(1) === 2)
  }
}
