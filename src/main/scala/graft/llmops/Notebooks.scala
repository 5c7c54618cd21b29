package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Jupyter notebook (`.ipynb`, nbformat 4) ingestion — notebooks are a
  * first-class slice of public code corpora and arrive as JSON documents.
  * Reference hook: arbitrary-document ingestion,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Everything is pure `from_json` projection (codegen'd, zero shuffles).
  * The nbformat quirk handled here: `source` is EITHER one string or an
  * array of line strings (the canonical on-disk form). Parsing with a
  * string-typed field makes Spark capture an array value as its raw JSON
  * text, which a second `from_json` then unwraps — both shapes normalize
  * without a UDF or a JVM parser.
  */
object Notebooks {

  private val NbSchema: DataType = DataType.fromDDL(
    "nbformat int, " +
    "metadata struct<kernelspec:struct<name:string,language:string>," +
    "language_info:struct<name:string>>, " +
    "cells array<struct<cell_type:string,source:string>>")

  /** One string or JSON-array-of-lines → the joined cell text. */
  private def sourceText(raw: Column): Column =
    when(raw.startsWith("["),
      coalesce(array_join(from_json(raw, ArrayType(StringType)), ""), raw))
      .otherwise(raw)

  /** Kernel language: `metadata.language_info.name` with the kernelspec
    * fallback (nbformat's own resolution order). NULL when absent.
    */
  def language(json: Column): Column = {
    val p = from_json(json, NbSchema)
    coalesce(p.getField("metadata").getField("language_info")
      .getField("name"),
      p.getField("metadata").getField("kernelspec").getField("language"))
  }

  /** Explode a notebook-JSON column into
    * (key, cell_idx, cell_type, src) rows. Malformed JSON / missing
    * cells yield no rows for that key (refusal = absence, the
    * ingestion-family convention).
    */
  def cells(df: DataFrame, keyCol: String, jsonCol: String): DataFrame = {
    val p = from_json(col(jsonCol), NbSchema)
    df.select(col(keyCol), posexplode(p.getField("cells"))
        .as(Seq("cell_idx", "c")))
      .select(col(keyCol), col("cell_idx").cast("long").as("cell_idx"),
        col("c.cell_type").as("cell_type"),
        sourceText(col("c.source")).as("src"))
  }

  /** Code cells only, joined per notebook into one script (cells
    * separated by a blank line, notebook order). One aggregation on the
    * already-exploded rows — `concat_ws` over `collect_list` would lose
    * ordering, so sort happens inside the array before joining.
    */
  def script(df: DataFrame, keyCol: String, jsonCol: String): DataFrame =
    cells(df, keyCol, jsonCol)
      .filter(col("cell_type") === "code")
      .groupBy(col(keyCol))
      .agg(array_join(transform(array_sort(
        collect_list(struct(col("cell_idx"), col("src")))),
        s => s.getField("src")), "\n\n").as("script"))

  private def jsonEscape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** Writer twin: a canonical nbformat-4 document whose `source` fields
    * are arrays of lines (each keeping its trailing newline, like
    * jupyter writes them). `cells` = (cell_type, text) in order.
    */
  def formatNotebook(cellSeq: Seq[(String, String)],
      language: String = "python"): String = {
    val cellJson = cellSeq.map { case (tpe, text) =>
      // split keeping the newline on each line but the last
      val lines = text.split("\n", -1)
      val parts = lines.zipWithIndex.map { case (l, i) =>
        "\"" + jsonEscape(if (i < lines.length - 1) l + "\n" else l) + "\""
      }
      val src = parts.mkString("[", ",", "]")
      val extra = if (tpe == "code") "\"outputs\":[],\"execution_count\":null,"
        else ""
      s"""{"cell_type":"$tpe",$extra"metadata":{},"source":$src}"""
    }.mkString("[", ",", "]")
    s"""{"nbformat":4,"nbformat_minor":5,"metadata":{"kernelspec":{"name":"$language","language":"$language"},"language_info":{"name":"$language"}},"cells":$cellJson}"""
  }
}
