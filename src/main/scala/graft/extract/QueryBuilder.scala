package graft.extract

import graft.config.TableConfig

/** Source-SQL generation from table configuration
  * (reference: utils/extract_data_v2/extract/query_builder.py:13-272;
  * Glue-layer duplicates at artifacts/aws-glue/layer/raw/query_generator.py).
  *
  * These strings go into `spark.read.format("jdbc").option("query", …)` —
  * full-fidelity pushdown including the verbatim JOIN_EXPR (J1), which the
  * reference never executes itself (SURVEY §2.4).
  */
final class QueryBuilder(table: TableConfig) {

  private def fromClause: String = {
    val base = s"FROM ${table.sourceSchema}.${table.sourceTable}"
    if (table.joinExpr.trim.nonEmpty) s"$base ${table.joinExpr.trim}" else base
  }

  private def filterCondition: Option[String] =
    Option(table.filterExp).map(_.trim).filter(_.nonEmpty)
      .map(f => s"(${f.replace("\"", "")})")

  private def whereClause(conditions: Seq[String]): String =
    if (conditions.isEmpty) "" else s" WHERE ${conditions.mkString(" AND ")}"

  /** L1 standard full query. */
  def standardQuery(additionalWhere: Option[String] = None): String = {
    val conds = filterCondition.toSeq ++ additionalWhere.map(w => s"($w)")
    s"SELECT $processedColumns $fromClause${whereClause(conds)}"
  }

  /** L2 strided partition-range query (P7): `part >= lo AND part < hi`. */
  def partitionedQuery(
      partitionColumn: String,
      startValue: Long,
      endValue: Long,
      additionalWhere: Option[String] = None
  ): String = {
    val range = s"$partitionColumn >= $startValue AND $partitionColumn < $endValue"
    val conds = Seq(range) ++ filterCondition ++ additionalWhere.map(w => s"($w)")
    s"SELECT $processedColumns $fromClause${whereClause(conds)}"
  }

  /** L4/L5 date-range query (P5): null-guarded BETWEEN, multi-column OR. */
  def dateRangeQuery(
      startDate: String,
      endDate: String,
      dateColumn: String,
      dateType: Option[String] = None
  ): String = {
    val (lo, hi) = dateType match {
      case Some(t) => (Dialects.formatDateForDb(startDate, t), Dialects.formatDateForDb(endDate, t))
      case None    => (s"'$startDate'", s"'$endDate'")
    }
    val rangeCond =
      if (dateColumn.contains(",")) {
        val parts = dateColumn.split(',').map(_.trim).map(c =>
          s"($c IS NOT NULL AND $c BETWEEN $lo AND $hi)")
        s"(${parts.mkString(" OR ")})"
      } else
        s"$dateColumn IS NOT NULL AND $dateColumn BETWEEN $lo AND $hi"
    val conds = Seq(rangeCond) ++ filterCondition
    s"SELECT $processedColumns $fromClause${whereClause(conds)}"
  }

  /** A1 min/max planning aggregate with the `<> 0` guard. */
  def minMaxQuery(column: String, additionalWhere: Option[String] = None): String = {
    val conds = Seq(s"$column <> 0") ++ filterCondition ++ additionalWhere.map(w => s"($w)")
    s"SELECT MIN($column) as min_val, MAX($column) as max_val $fromClause${whereClause(conds)}"
  }

  /** P6 typed watermark predicate (incremental.py:257-344, per-dialect
    * dispatch at :331-435): datetime columns need the source dialect's own
    * conversion — DATETIME2 exists only on SQL Server; Oracle takes
    * TO_TIMESTAMP; MySQL (and the embedded Derby test dialect) compare a
    * plain literal natively. Numeric columns compare raw everywhere.
    */
  def watermarkPredicate(column: String, value: String, columnType: String,
      bdType: String = "mssql"): String =
    columnType.toLowerCase match {
      case t if t.contains("datetime") || t.contains("timestamp") || t == "date" =>
        bdType.toLowerCase match {
          case "mssql" =>
            s"CAST($column AS DATETIME2(6)) > CAST('$value' AS DATETIME2(6))"
          case "oracle" =>
            s"$column > TO_TIMESTAMP('$value', 'YYYY-MM-DD HH24:MI:SS.FF')"
          case _ => // mysql, derby: engine-native literal comparison
            s"$column > '$value'"
        }
      case _ =>
        s"$column > $value"
    }

  /** P1/P2/P3: the config SELECT list, with `ID_COLUMN as id` prepended and
    * expression-aware splitting (columns may be SQL like `ltrim(x)+rtrim(y) alias`).
    *
    * Parity note: ID_COLUMN with the default COLUMNS='*' renders
    * `SELECT pk as id, *` — exactly the reference's construction
    * (extract_data_spark.py:657-659), which SQL Server accepts but
    * Oracle/MySQL reject (`*` must stand alone/first there). The
    * reference's configs always pair ID_COLUMN with an explicit column
    * list; do the same on those dialects.
    */
  def processedColumns: String = {
    val base = Option(table.columns).map(_.trim).filter(_.nonEmpty).getOrElse("*")
    val withId =
      if (table.idColumn.trim.nonEmpty) s"${table.idColumn.trim} as id, $base" else base
    QueryBuilder.splitColumns(QueryBuilder.cleanQuotes(withId)).mkString(", ")
  }
}

object QueryBuilder {

  /** Quote cleanup (query_builder.py:148-165). */
  def cleanQuotes(columnsStr: String): String = {
    val clean = columnsStr.trim
    val quotes = clean.count(_ == '"')
    if (quotes == 0) clean
    else if (clean.startsWith("\"") && clean.endsWith("\"") && quotes == 2)
      clean.substring(1, clean.length - 1)
    else clean.replace("\"", "")
  }

  /** Expression-aware column splitting (query_builder.py:167-203):
    * split on commas outside parens and single quotes.
    */
  def splitColumns(columnsStr: String): Seq[String] = {
    if (columnsStr.trim.isEmpty) return Seq("*")
    val out = List.newBuilder[String]
    val cur = new StringBuilder
    var parens = 0
    var inQuote = false
    for (ch <- columnsStr) {
      ch match {
        case '\'' => inQuote = !inQuote; cur += ch
        case '(' if !inQuote => parens += 1; cur += ch
        case ')' if !inQuote => parens -= 1; cur += ch
        case ',' if !inQuote && parens == 0 =>
          if (cur.toString.trim.nonEmpty) out += cur.toString.trim
          cur.clear()
        case _ => cur += ch
      }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  private val AsAlias = """(?i)\s+AS\s+([a-zA-Z_][a-zA-Z0-9_]*)\s*$""".r.unanchored
  private val SimpleName = """^[a-zA-Z_][a-zA-Z0-9_]*$""".r
  private val TableColumn = """^([a-zA-Z_][a-zA-Z0-9_]*)\.([a-zA-Z_][a-zA-Z0-9_]*)$""".r
  private val ExprIndicators =
    Seq("(", "+", "-", "*", "/", "ltrim", "rtrim", "convert", "cast")

  /** Output-name inference for a SELECT-list expression
    * (query_builder.py:205-272) — used only to predict the schema of empty
    * results; Catalyst derives real names once expressions go through expr().
    */
  def columnAlias(expression: String): String = {
    val expr = expression.trim
    AsAlias.findFirstMatchIn(expr) match {
      case Some(m) => m.group(1)
      case None =>
        val lower = expr.toLowerCase
        val isExpr = ExprIndicators.exists(lower.contains)
        val implicitAlias =
          if (isExpr) {
            val words = expr.split("\\s+")
            words.lastOption.filter(w =>
              SimpleName.matches(w) &&
                !Set("and", "or", "not", "in", "like", "is", "null", "from",
                  "where", "select").contains(w.toLowerCase))
          } else None
        implicitAlias.getOrElse {
          expr match {
            case TableColumn(_, c) => c
            case _ if !isExpr && !expr.contains("'") && !expr.contains("\"") &&
              SimpleName.matches(expr.stripPrefix("[").stripSuffix("]")) =>
              expr.stripPrefix("[").stripSuffix("]")
            case _ => s"expr_field_${math.abs(expr.hashCode) % 1000}"
          }
        }
    }
  }
}
