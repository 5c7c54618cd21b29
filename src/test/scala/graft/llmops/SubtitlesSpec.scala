package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SubtitlesSpec extends SparkTestBase {
  import Subtitles._

  test("SRT parse: indices, multi-line text, comma/dot millis, hour rollover") {
    val srt =
      """1
        |00:00:01,500 --> 00:00:03,000
        |First line
        |second line
        |
        |2
        |00:01:00.250 --> 01:02:03,004
        |Dot millis and long span
        |
        |
        |3
        |bad timing here
        |
        |00:09:00,000 --> 00:09:01,000
        |No index line
        |""".stripMargin
    val cues = parseSrt(srt)
    assert(cues.length == 3) // malformed block 3 skipped
    assert(cues(0) == Cue(1, 1500L, 3000L, "First line\nsecond line"))
    assert(cues(1).startMs == 60250L &&
      cues(1).endMs == (1 * 3600 + 2 * 60 + 3) * 1000L + 4)
    assert(cues(2).text == "No index line" && cues(2).startMs == 540000L)
  }

  test("WebVTT parse: signature gate, NOTE/STYLE skip, tag stripping") {
    val vtt =
      """WEBVTT - captions
        |
        |NOTE this is a comment
        |that spans lines
        |
        |STYLE
        |::cue { color: lime }
        |
        |intro
        |00:01.000 --> 00:02.500 align:start position:10%
        |<c.yellow>Hello</c> <i>world</i>
        |
        |00:03.000 --> 00:04.000
        |<00:00:03.200>karaoke<00:00:03.700> line
        |""".stripMargin
    val cues = parseVtt(vtt)
    assert(cues.length == 2)
    assert(cues(0) == Cue(1, 1000L, 2500L, "Hello world"))
    assert(cues(1).text == "karaoke line")
    assert(parseVtt("1\n00:00:01,000 --> 00:00:02,000\nnot vtt\n").isEmpty)
  }

  test("BOM strips; null and garbage are empty, never throw") {
    val bom = "﻿" + "WEBVTT\n\n00:01.000 --> 00:02.000\nx\n"
    assert(parseVtt(bom).length == 1)
    assert(parse(null).isEmpty)
    assert(parseSrt("complete garbage\nwith lines\n").isEmpty)
  }

  test("writer twins round-trip through their own parsers") {
    val cues = Seq(Cue(1, 1500L, 3000L, "one\ntwo"),
      Cue(2, 3_725_042L, 3_999_999L, "late cue"))
    assert(parseSrt(formatSrt(cues)) == cues)
    // VTT drops explicit indices; compare on timing+text
    val back = parseVtt(formatVtt(cues))
    assert(back.map(c => (c.startMs, c.endMs, c.text)) ==
      cues.map(c => (c.startMs, c.endMs, c.text)))
  }

  test("cues() explodes per doc and transcript() reassembles in order") {
    val ss = spark
    import ss.implicits._
    val srtFor = (id: Long) => formatSrt(Seq(
      Cue(1, id * 1000, id * 1000 + 400, s"doc $id part one"),
      Cue(2, id * 1000 + 500, id * 1000 + 900, s"and part two")))
    val df = (1L to 30L).map(i =>
      (i, if (i % 3 == 0) formatVtt(Seq(Cue(1, 100, 200, s"vtt $i")))
      else srtFor(i))).toDF("doc_id", "sub")
    val c = Subtitles.cues(df, "doc_id", "sub")
    assert(c.count() == 20 * 2 + 10)
    val t = Subtitles.transcript(c, "doc_id")
      .filter(col("doc_id") === 2).head
    assert(t.getAs[String]("transcript") == "doc 2 part one and part two")
    assert(math.abs(t.getAs[Double]("duration_s") - 2.9) < 1e-9)
    assert(t.getAs[Long]("n_cues") == 2L)
  }
}
