package graft.config

import scala.io.{Codec, Source}

/** Loader for the `;`-delimited latin-1 config CSVs, with the reference's
  * quote sanitization (light_transform.py:585-617): `"""` → `"` then strip
  * one surrounding quote pair. Plain Scala (config files are tiny driver-side
  * metadata — no reason to spin Spark for them).
  */
object ConfigLoader {

  /** Parse `;`-CSV text into header-keyed rows. Values inside double quotes
    * may contain `;` (the reference's transformation strings contain commas
    * but the delimiter is `;`, so simple quote-aware splitting suffices).
    */
  def parseCsv(content: String): Seq[Map[String, String]] = {
    val lines = content.split("\r?\n").filter(_.trim.nonEmpty)
    if (lines.isEmpty) return Nil
    // header cells get the same sanitization as values: a quoted header
    // row (spreadsheet exports) would otherwise miss every column lookup
    // and silently run on all-default config. Trim BEFORE the quote
    // strip — a `; `-padded cell like ` "SOURCE_TABLE"` must still shed
    // its quotes — then after, for unquoted padding
    val header = splitLine(lines.head).map(h => sanitize(h.trim).trim)
    lines.tail.toIndexedSeq.map { line =>
      val values = splitLine(line)
      header.zipAll(values, "", "")
        .map { case (k, v) => k -> sanitize(v.trim) }.toMap
    }
  }

  private def splitLine(line: String): Seq[String] = {
    val out = List.newBuilder[String]
    val cur = new StringBuilder
    var inQuotes = false
    for (ch <- line) ch match {
      case '"'              => inQuotes = !inQuotes; cur += ch
      case ';' if !inQuotes => out += cur.toString; cur.clear()
      case c                => cur += c
    }
    out += cur.toString
    out.result()
  }

  private def sanitize(value: String): String = {
    val clean = value.replace("\"\"\"", "\"")
    if (clean.length >= 2 && clean.startsWith("\"") && clean.endsWith("\""))
      clean.substring(1, clean.length - 1)
    else clean
  }

  def loadFile(path: String): Seq[Map[String, String]] = {
    val src = Source.fromFile(path)(Codec.ISO8859)
    try parseCsv(src.mkString)
    finally src.close()
  }

  private def flag(v: String): Boolean = {
    val t = v.trim.toLowerCase
    t == "t" || t == "true" || t == "1" || t == "y" || t == "yes"
  }

  def columnsFrom(rows: Seq[Map[String, String]]): Seq[ColumnMetadata] =
    rows.map { r =>
      ColumnMetadata(
        name = r.getOrElse("COLUMN_NAME", ""),
        columnId = r.getOrElse("COLUMN_ID", "0").trim.toIntOption.getOrElse(0),
        dataType = r.getOrElse("NEW_DATA_TYPE", "string"),
        transformation = r.getOrElse("TRANSFORMATION", ""),
        isPartition = flag(r.getOrElse("IS_PARTITION", "")),
        isId = flag(r.getOrElse("IS_ID", "")),
        isOrderBy = flag(r.getOrElse("IS_ORDER_BY", "")),
        isFilterDate = flag(r.getOrElse("IS_FILTER_DATE", ""))
      )
    }

  def tablesFrom(rows: Seq[Map[String, String]]): Seq[TableConfig] =
    rows.map { r =>
      TableConfig(
        stageTableName = r.getOrElse("STAGE_TABLE_NAME", ""),
        sourceTable = r.getOrElse("SOURCE_TABLE", ""),
        sourceSchema = r.getOrElse("SOURCE_SCHEMA", ""),
        sourceTableType = r.getOrElse("SOURCE_TABLE_TYPE", ""),
        loadType = r.getOrElse("LOAD_TYPE", ""),
        columns = r.getOrElse("COLUMNS", "*"),
        partitionColumn = r.getOrElse("PARTITION_COLUMN", ""),
        partitionMode = r.getOrElse("PARTITION_MODE", ""),
        delayIncrementalIni = orDefault(r.getOrElse("DELAY_INCREMENTAL_INI", ""), "-2"),
        delayIncrementalEnd = orDefault(r.getOrElse("DELAY_INCREMENTAL_END", ""), "0"),
        filterColumn = r.getOrElse("FILTER_COLUMN", ""),
        filterDataType = r.getOrElse("FILTER_DATA_TYPE", ""),
        filterExp = r.getOrElse("FILTER_EXP", ""),
        idColumn = r.getOrElse("ID_COLUMN", ""),
        joinExpr = r.getOrElse("JOIN_EXPR", ""),
        processId = r.getOrElse("PROCESS_ID", ""),
        partitionFormat = r.get("PARTITION_FORMAT").map(_.trim).filter(_.nonEmpty),
        status = r.getOrElse("STATUS", "A"),
        // the reference CSV carries NUM_DAYS and the stage loader reads
        // it (light_transform.py:1593) — without this mapping an
        // explicit days_off table would silently fall back to the
        // 10-day inference default
        numDays = r.getOrElse("NUM_DAYS", "")
      )
    }

  def endpointsFrom(rows: Seq[Map[String, String]]): Seq[EndpointConfig] =
    rows.map { r =>
      EndpointConfig(
        endpointName = r.getOrElse("ENDPOINT_NAME", ""),
        bdType = r.getOrElse("BD_TYPE", "mssql"),
        dbPortNumber = r.getOrElse("DB_PORT_NUMBER", "1433"),
        srcDbName = r.getOrElse("SRC_DB_NAME", ""),
        srcServerName = r.getOrElse("SRC_SERVER_NAME", ""),
        srcDbUsername = r.getOrElse("SRC_DB_USERNAME", ""),
        environment = r.getOrElse("ENV", "DEV"),
        isPrincipal = r.getOrElse("IS_PRINCIPAL", "true").trim.equalsIgnoreCase("true")
      )
    }

  private def orDefault(v: String, d: String): String =
    if (v.trim.isEmpty) d else v.trim
}
