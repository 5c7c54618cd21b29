package graft.llmops

import org.apache.spark.sql.DataFrame

/** Git history ingestion (`git log -p` / format-patch text) — commit
  * messages paired with their diffs are the CommitPack-style supervised
  * slice for edit/instruction training. Reference hook: document
  * ingestion, `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * A line-oriented per-row scan: `commit <sha>` headers, `Author:`,
  * indented message block, `diff --git` file sections, `@@` hunks with
  * +/-/space body lines. No git binary, no object store — this reads the
  * textual interchange format. Per-row flatMap; scales on row count.
  */
object GitDiffs {

  final case class FileDiff(oldPath: String, newPath: String,
      added: Seq[String], removed: Seq[String])

  final case class Commit(sha: String, author: String, message: String,
      files: Seq[FileDiff])

  private val CommitRe = """^commit ([0-9a-f]{7,40})\b.*$""".r
  private val DiffRe = """^diff --git a/(.+) b/(.+)$""".r

  /** Parse one `git log -p` document into commits. Unrecognized lines
    * between sections are skipped (tags, merges, stat lines); malformed
    * input yields the commits that did parse.
    */
  private[llmops] def parseLog(log: String): Seq[Commit] = {
    if (log == null) return Nil
    val lines = log.split("\n", -1)
    val commits = scala.collection.mutable.ArrayBuffer.empty[Commit]
    var sha: String = null
    var author: String = null
    var msg = scala.collection.mutable.ArrayBuffer.empty[String]
    var files = scala.collection.mutable.ArrayBuffer.empty[FileDiff]
    var curOld: String = null
    var curNew: String = null
    var added = scala.collection.mutable.ArrayBuffer.empty[String]
    var removed = scala.collection.mutable.ArrayBuffer.empty[String]
    var inHunk = false

    def flushFile(): Unit = if (curNew != null) {
      files += FileDiff(curOld, curNew, added.toSeq, removed.toSeq)
      curOld = null; curNew = null
      added = scala.collection.mutable.ArrayBuffer.empty[String]
      removed = scala.collection.mutable.ArrayBuffer.empty[String]
      inHunk = false
    }
    def flushCommit(): Unit = if (sha != null) {
      flushFile()
      commits += Commit(sha, author, msg.mkString("\n").trim,
        files.toSeq)
      sha = null; author = null
      msg = scala.collection.mutable.ArrayBuffer.empty[String]
      files = scala.collection.mutable.ArrayBuffer.empty[FileDiff]
    }

    lines.foreach {
      case CommitRe(s) => flushCommit(); sha = s
      case DiffRe(o, n) if sha != null => flushFile(); curOld = o; curNew = n
      case l if sha != null && curNew == null && l.startsWith("Author:") =>
        author = l.drop(7).trim
      case l if sha != null && curNew == null && l.startsWith("    ") =>
        msg += l.drop(4)
      case l if curNew != null && l.startsWith("@@") => inHunk = true
      case l if inHunk && l.startsWith("+") && !l.startsWith("+++") =>
        added += l.drop(1)
      case l if inHunk && l.startsWith("-") && !l.startsWith("---") =>
        removed += l.drop(1)
      case _ =>
    }
    flushCommit()
    commits.toSeq
  }

  /** Explode (key, log) into one row per commit:
    * (key, sha, author, message, n_files, n_added, n_removed).
    */
  def commits(df: DataFrame, keyCol: String, logCol: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(keyCol),
      org.apache.spark.sql.types.StructField("sha",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("author",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("message",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_files",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_added",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_removed",
        org.apache.spark.sql.types.LongType)))
    val ki = df.schema.fieldIndex(keyCol)
    val li = df.schema.fieldIndex(logCol)
    df.flatMap { row =>
      parseLog(row.getString(li)).map(c =>
        org.apache.spark.sql.Row(row.get(ki), c.sha, c.author, c.message,
          c.files.size.toLong,
          c.files.map(_.added.size).sum.toLong,
          c.files.map(_.removed.size).sum.toLong))
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Explode into one row per changed file — the CommitPack unit:
    * (key, sha, message, old_path, new_path, added, removed) with the
    * +/- line bodies newline-joined.
    */
  def fileDiffs(df: DataFrame, keyCol: String,
      logCol: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(keyCol),
      org.apache.spark.sql.types.StructField("sha",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("message",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("old_path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("new_path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("added",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("removed",
        org.apache.spark.sql.types.StringType)))
    val ki = df.schema.fieldIndex(keyCol)
    val li = df.schema.fieldIndex(logCol)
    df.flatMap { row =>
      parseLog(row.getString(li)).flatMap(c => c.files.map(f =>
        org.apache.spark.sql.Row(row.get(ki), c.sha, c.message,
          f.oldPath, f.newPath, f.added.mkString("\n"),
          f.removed.mkString("\n"))))
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Writer twin: a canonical `git log -p` document. Hunk headers are
    * synthesized as full-file ranges — parsers only need the +/- bodies.
    */
  def formatLog(cs: Seq[Commit]): String = {
    val b = new StringBuilder
    cs.foreach { c =>
      b ++= s"commit ${c.sha}\n"
      if (c.author != null) b ++= s"Author: ${c.author}\n"
      b ++= "Date:   Thu Jan 1 00:00:00 1970 +0000\n\n"
      c.message.split("\n", -1).foreach(l => b ++= s"    $l\n")
      b ++= "\n"
      c.files.foreach { f =>
        b ++= s"diff --git a/${f.oldPath} b/${f.newPath}\n"
        b ++= s"--- a/${f.oldPath}\n+++ b/${f.newPath}\n"
        b ++= s"@@ -1,${f.removed.size} +1,${f.added.size} @@\n"
        f.removed.foreach(l => b ++= s"-$l\n")
        f.added.foreach(l => b ++= s"+$l\n")
      }
    }
    b.toString
  }
}
