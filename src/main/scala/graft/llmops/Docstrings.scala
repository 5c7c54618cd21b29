package graft.llmops

import org.apache.spark.sql.DataFrame

/** Python docstring ↔ signature pair extraction (CodeSearchNet-style) —
  * the classic supervised slice mined from code corpora for doc-to-code
  * and code-to-doc training. Reference hook: document ingestion,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * A line-oriented per-row scan (no AST — the signature/docstring shape
  * is regular): `def`/`async def` headers (single-line or continued
  * across balanced parens), then the immediately following triple-quoted
  * string if any. Distribution shape: per-row flatMap, scales on row
  * count alone.
  */
object Docstrings {

  /** One extracted function. `docstring` is null when absent. */
  final case class PyFunc(name: String, signature: String,
      docstring: String, line: Int)

  private val DefStart =
    """^(\s*)(?:async\s+)?def\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r

  /** Extract every def in a python source string. */
  private[llmops] def pythonFunctions(src: String): Seq[PyFunc] = {
    if (src == null) return Nil
    val lines = src.split("\n", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[PyFunc]
    var i = 0
    while (i < lines.length) {
      val m = DefStart.findFirstMatchIn(lines(i))
      if (m.isDefined) {
        val startLine = i
        // accumulate header lines until parens balance and a ':' closes
        val sig = new StringBuilder
        var depth = 0
        var done = false
        var j = i
        while (j < lines.length && !done) {
          val l = lines(j)
          var k = 0
          var closedAt = -1
          while (k < l.length && closedAt < 0) {
            l.charAt(k) match {
              case '(' | '[' | '{' => depth += 1
              case ')' | ']' | '}' => depth -= 1
              case ':' if depth == 0 => closedAt = k
              case _ =>
            }
            k += 1
          }
          if (closedAt >= 0) {
            sig ++= l.substring(0, closedAt + 1).trim
            done = true
          } else {
            sig ++= l.trim
            sig += ' '
            j += 1
          }
        }
        if (!done) { i += 1 } // unterminated header: skip the def line
        else {
          // docstring = first statement if it is a triple-quoted string
          var d = j + 1
          while (d < lines.length && lines(d).trim.isEmpty) d += 1
          var doc: String = null
          if (d < lines.length) {
            val t = lines(d).trim
            val q = if (t.startsWith("\"\"\"")) "\"\"\""
              else if (t.startsWith("'''")) "'''" else null
            if (q != null) {
              val body = t.drop(3)
              val endSame = body.indexOf(q)
              if (endSame >= 0) doc = body.substring(0, endSame)
              else {
                val b = new StringBuilder(body)
                var e = d + 1
                var found = false
                while (e < lines.length && !found) {
                  val idx = lines(e).indexOf(q)
                  if (idx >= 0) {
                    b += '\n'; b ++= lines(e).substring(0, idx)
                    found = true
                  } else { b += '\n'; b ++= lines(e) }
                  e += 1
                }
                if (found) doc = b.toString
              }
            }
          }
          out += PyFunc(m.get.group(2), sig.toString,
            if (doc == null) null else doc.trim, startLine + 1)
          i = j + 1
        }
      } else i += 1
    }
    out.toSeq
  }

  /** Explode (key, python source) rows into one row per function:
    * (key, func_name, signature, docstring, line). Functions without a
    * docstring keep a NULL docstring — filtering is the caller's policy.
    */
  def functions(df: DataFrame, keyCol: String,
      contentCol: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(keyCol),
      org.apache.spark.sql.types.StructField("func_name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("signature",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("docstring",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("line",
        org.apache.spark.sql.types.IntegerType)))
    val ki = df.schema.fieldIndex(keyCol)
    val ci = df.schema.fieldIndex(contentCol)
    df.flatMap { row =>
      pythonFunctions(row.getString(ci)).map(f =>
        org.apache.spark.sql.Row(row.get(ki), f.name, f.signature,
          f.docstring, f.line))
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
