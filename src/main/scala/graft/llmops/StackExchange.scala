package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stack Exchange data-dump ingestion (the `Posts.xml` convention: one
  * self-closing `<row .../>` element per post, attribute-encoded, bodies
  * XML-escaped HTML) — the canonical public Q&A corpus for instruction
  * tuning. Reference hook: arbitrary-document ingestion,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Parsing is a per-row JVM attribute scan (the dump's row-per-line
  * self-closing shape needs no XML tree); body HTML reduces through the
  * shared [[DocumentText.htmlToText]] state machine, so Q&A text joins
  * the one corpus-text convention. Q↔A pairing is a single equi-join on
  * the accepted-answer id — the only shuffle in the pipeline.
  */
object StackExchange {

  /** One parsed post. `postType` 1 = question, 2 = answer. */
  final case class Post(id: Long, postType: Int, parentId: Option[Long],
      acceptedAnswerId: Option[Long], score: Option[Long], title: String,
      bodyText: String, tags: Seq[String])

  private[llmops] def unescapeXml(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          s.substring(i + 1, semi) match {
            case "lt" => out.append('<'); i = semi + 1
            case "gt" => out.append('>'); i = semi + 1
            case "amp" => out.append('&'); i = semi + 1
            case "quot" => out.append('"'); i = semi + 1
            case "apos" => out.append('\''); i = semi + 1
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try { out.appendCodePoint(Integer.parseInt(e.drop(2), 16)); i = semi + 1 }
              catch { case _: NumberFormatException => out.append(c); i += 1 }
            case e if e.startsWith("#") =>
              try { out.appendCodePoint(Integer.parseInt(e.drop(1))); i = semi + 1 }
              catch { case _: NumberFormatException => out.append(c); i += 1 }
            case _ => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Attribute map of one `<row .../>` element (lenient: any attribute
    * order, single or double quotes, whitespace tolerance). Empty map =
    * not a row element.
    */
  private[llmops] def parseAttrs(line: String): Map[String, String] = {
    val start = line.indexOf("<row")
    if (start < 0) return Map.empty
    val out = Map.newBuilder[String, String]
    var i = start + 4
    val n = line.length
    while (i < n && line.charAt(i) != '>') {
      while (i < n && Character.isWhitespace(line.charAt(i))) i += 1
      val nameStart = i
      while (i < n && line.charAt(i) != '=' && line.charAt(i) != '>' &&
        line.charAt(i) != '/' && !Character.isWhitespace(line.charAt(i))) i += 1
      val name = line.substring(nameStart, i)
      while (i < n && Character.isWhitespace(line.charAt(i))) i += 1
      if (i < n && line.charAt(i) == '=' && name.nonEmpty) {
        i += 1
        while (i < n && Character.isWhitespace(line.charAt(i))) i += 1
        if (i < n && (line.charAt(i) == '"' || line.charAt(i) == '\'')) {
          val q = line.charAt(i)
          i += 1
          val vStart = i
          while (i < n && line.charAt(i) != q) i += 1
          out += name -> unescapeXml(line.substring(vStart, math.min(i, n)))
          if (i < n) i += 1
        }
      } else if (name.isEmpty) i += 1
    }
    out.result()
  }

  /** `Tags` attribute (`<a><b>` after unescape) → tag list. */
  private[llmops] def parseTags(tags: String): Seq[String] =
    if (tags == null || tags.isEmpty) Nil
    else tags.split("[<>]").toSeq.filter(_.nonEmpty)

  /** Parse every `<row .../>` in a Posts.xml document (whole file or any
    * line batch). Non-row lines and rows without a numeric Id vanish —
    * refusal is absence, the ingestion-family convention.
    */
  private[llmops] def parsePosts(xml: String): Seq[Post] = {
    if (xml == null) return Nil
    xml.split("\n").toSeq.flatMap { line =>
      val a = parseAttrs(line)
      for {
        id <- a.get("Id").flatMap(_.toLongOption)
        tpe <- a.get("PostTypeId").flatMap(_.toIntOption)
      } yield Post(id, tpe,
        a.get("ParentId").flatMap(_.toLongOption),
        a.get("AcceptedAnswerId").flatMap(_.toLongOption),
        a.get("Score").flatMap(_.toLongOption),
        a.getOrElse("Title", null),
        DocumentText.htmlToText(a.getOrElse("Body", "")),
        parseTags(a.getOrElse("Tags", null)))
    }
  }

  /** Explode (key, PostsXml) rows into one row per post. */
  def posts(df: DataFrame, keyCol: String, xmlCol: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(keyCol),
      org.apache.spark.sql.types.StructField("post_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("post_type",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("parent_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("accepted_answer_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("title",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("body_text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("tags",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
    val ki = df.schema.fieldIndex(keyCol)
    val xi = df.schema.fieldIndex(xmlCol)
    df.flatMap { row =>
      parsePosts(row.getString(xi)).map(p =>
        org.apache.spark.sql.Row(row.get(ki), p.id, p.postType,
          p.parentId.map(Long.box).orNull,
          p.acceptedAnswerId.map(Long.box).orNull,
          p.score.map(Long.box).orNull, p.title, p.bodyText, p.tags))
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Question ↔ accepted-answer pairs: ONE equi-join (question's
    * accepted_answer_id = answer's post_id), scoped per source document
    * key so ids from different dumps never cross.
    */
  def qaPairs(postsDf: DataFrame, keyCol: String): DataFrame = {
    val q = postsDf.filter(col("post_type") === 1 &&
        col("accepted_answer_id").isNotNull)
      .select(col(keyCol), col("post_id").as("question_id"),
        col("accepted_answer_id"), col("title"),
        col("body_text").as("question_text"), col("tags"))
    val a = postsDf.filter(col("post_type") === 2)
      .select(col(keyCol).as("_akey"), col("post_id").as("_aid"),
        col("body_text").as("answer_text"),
        col("score").as("answer_score"))
    q.join(a, col(keyCol) === col("_akey") &&
        col("accepted_answer_id") === col("_aid"))
      .select(col(keyCol), col("question_id"), col("title"),
        col("question_text"), col("answer_text"), col("answer_score"),
        col("tags"))
  }

  private def escAttr(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Writer twin: a canonical Posts.xml document. */
  def formatPosts(rows: Seq[Post]): String = {
    val b = new StringBuilder
    b ++= "<?xml version=\"1.0\" encoding=\"utf-8\"?>\n<posts>\n"
    rows.foreach { p =>
      b ++= s"""  <row Id="${p.id}" PostTypeId="${p.postType}""""
      p.parentId.foreach(v => b ++= s""" ParentId="$v"""")
      p.acceptedAnswerId.foreach(v => b ++= s""" AcceptedAnswerId="$v"""")
      p.score.foreach(v => b ++= s""" Score="$v"""")
      if (p.title != null) b ++= s""" Title="${escAttr(p.title)}""""
      b ++= s""" Body="${escAttr(p.bodyText)}""""
      if (p.tags.nonEmpty)
        b ++= s""" Tags="${escAttr(p.tags.map(t => s"<$t>").mkString)}""""
      b ++= " />\n"
    }
    b ++= "</posts>\n"
    b.toString
  }
}
