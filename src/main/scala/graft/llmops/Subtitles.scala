package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subtitle/caption ingestion — SRT and WebVTT, the formats
  * speech-transcript corpora (video captions, ASR output) arrive in.
  * Reference hook: arbitrary-binary document ingestion,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Parsing is LENIENT per cue, strict per field: subtitle files in the
  * wild are messy (stray blank lines, BOM, missing indices, `.` vs `,`
  * millisecond separators), so a malformed cue block is skipped while
  * the rest of the file survives — but a timing that does parse is
  * parsed exactly (overflow-free millisecond arithmetic). WebVTT
  * markup tags (`<i>`, `<c.class>`, `<00:00:01.000>` karaoke stamps)
  * strip from cue text; NOTE/STYLE/REGION blocks skip. Everything is a
  * per-row flatMap in the scan — zero shuffles, the per-file unit is
  * tiny (subtitles are KBs), so the corpus scales on row count alone.
  */
object Subtitles {

  final case class Cue(seq: Int, startMs: Long, endMs: Long, text: String)

  private val SrtTiming =
    """(?:(\d+):)?(\d{1,2}):(\d{1,2})[,.](\d{1,3})\s*-->\s*(?:(\d+):)?(\d{1,2}):(\d{1,2})[,.](\d{1,3})(?:\s+.*)?""".r

  private def ms(h: String, m: String, s: String, f: String): Long = {
    val hh = if (h == null) 0L else h.toLong
    ((hh * 60 + m.toLong) * 60 + s.toLong) * 1000 +
      f.padTo(3, '0').toLong
  }

  private def stripBom(s: String): String =
    if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s

  private def blocks(s: String): Seq[Seq[String]] =
    stripBom(s).split("\r\n|\n|\r", -1).toSeq
      .foldLeft(Vector(Vector.empty[String])) { (acc, line) =>
        if (line.trim.isEmpty) acc :+ Vector.empty
        else acc.init :+ (acc.last :+ line)
      }
      .filter(_.nonEmpty)

  /** Parse SRT text into cues; malformed blocks skip individually.
    * `seq` is the file's own index when present and parseable, else
    * the running block position.
    */
  def parseSrt(s: String): Seq[Cue] = {
    if (s == null) return Seq.empty
    blocks(s).zipWithIndex.flatMap { case (b, pos) =>
      // optional numeric index line, then the timing line
      val (idx, rest) = b.head.trim.toIntOption match {
        case Some(n) if b.length > 1 => (n, b.tail)
        case _ => (pos + 1, b)
      }
      rest.headOption.map(_.trim) match {
        case Some(SrtTiming(h1, m1, s1, f1, h2, m2, s2, f2)) =>
          Some(Cue(idx, ms(h1, m1, s1, f1), ms(h2, m2, s2, f2),
            rest.tail.mkString("\n")))
        case _ => None
      }
    }
  }

  /** Parse WebVTT; empty unless the `WEBVTT` signature leads. Cue
    * identifier lines (no `-->`) are allowed and dropped; NOTE/STYLE/
    * REGION blocks skip; inline markup strips.
    */
  def parseVtt(s: String): Seq[Cue] = {
    if (s == null) return Seq.empty
    val body = stripBom(s)
    if (!body.startsWith("WEBVTT")) return Seq.empty
    val bs = blocks(body)
    val cueBlocks = bs.drop(1).filterNot { b =>
      val h = b.head.trim
      h.startsWith("NOTE") || h.startsWith("STYLE") || h.startsWith("REGION")
    }
    cueBlocks.zipWithIndex.flatMap { case (b, pos) =>
      val (idx, rest) =
        if (!b.head.contains("-->") && b.length > 1) (pos + 1, b.tail)
        else (pos + 1, b)
      rest.headOption.map(_.trim) match {
        case Some(SrtTiming(h1, m1, s1, f1, h2, m2, s2, f2)) =>
          val text = rest.tail.mkString("\n")
            .replaceAll("<[^>]*>", "") // <i>, <c.class>, karaoke stamps
          Some(Cue(idx, ms(h1, m1, s1, f1), ms(h2, m2, s2, f2), text))
        case _ => None
      }
    }
  }

  /** Auto-dispatch on the WEBVTT signature. */
  def parse(s: String): Seq[Cue] =
    if (s != null && stripBom(s).startsWith("WEBVTT")) parseVtt(s)
    else parseSrt(s)

  private def stamp(msTotal: Long, sep: Char): String = {
    val h = msTotal / 3600000
    val m = (msTotal % 3600000) / 60000
    val s = (msTotal % 60000) / 1000
    val f = msTotal % 1000
    f"$h%02d:$m%02d:$s%02d$sep$f%03d"
  }

  /** SRT writer twin. */
  def formatSrt(cues: Seq[Cue]): String =
    cues.map(c =>
      s"${c.seq}\n${stamp(c.startMs, ',')} --> ${stamp(c.endMs, ',')}\n${c.text}")
      .mkString("", "\n\n", "\n")

  /** WebVTT writer twin. */
  def formatVtt(cues: Seq[Cue]): String =
    "WEBVTT\n\n" + cues.map(c =>
      s"${stamp(c.startMs, '.')} --> ${stamp(c.endMs, '.')}\n${c.text}")
      .mkString("", "\n\n", "\n")

  /** Explode `(key, subtitle text)` rows into
    * `(key, seq, start_ms, end_ms, text)` cue rows — SRT or WebVTT per
    * row, auto-dispatched.
    */
  def cues(df: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val ss = df.sparkSession
    import ss.implicits._
    df.select(col(keyCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (k, s) =>
        parse(s).iterator.map(c => (k, c.seq, c.startMs, c.endMs, c.text))
      }
      .toDF(keyCol, "seq", "start_ms", "end_ms", "text")
  }

  /** Transcript view: cues joined into one document per key, in cue
    * order — the corpus-protocol form (feed to dedup/quality like any
    * other text).
    */
  def transcript(cueDf: DataFrame, keyCol: String): DataFrame =
    cueDf.groupBy(col(keyCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("start_ms"), col("seq"),
            col("text")))),
          s => s.getField("text")), " ").as("transcript"),
        (max(col("end_ms")) / 1000.0).as("duration_s"),
        count(lit(1)).as("n_cues"))
}
