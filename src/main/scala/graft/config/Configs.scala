package graft.config

/** Configuration entities — one row each of the reference's three config CSVs
  * (reference: artifacts/configuration/csv/{tables,columns,credentials}.csv,
  * parsed at light_transform.py:522-554 and
  * utils/extract_data_v2/core/orchestrator.py:259-320).
  */
final case class ColumnMetadata(
    name: String,
    columnId: Int,
    dataType: String,
    transformation: String,
    isPartition: Boolean = false,
    isId: Boolean = false,
    isOrderBy: Boolean = false,
    isFilterDate: Boolean = false
)

final case class TableConfig(
    stageTableName: String,
    sourceTable: String,
    sourceSchema: String = "",
    sourceTableType: String = "",   // 't' transactional | 'm' master
    loadType: String = "",          // full | incremental | between-date | time_range
    columns: String = "*",          // SELECT list (may contain SQL expressions)
    partitionColumn: String = "",
    partitionMode: String = "",
    delayIncrementalIni: String = "-2",
    delayIncrementalEnd: String = "0",
    filterColumn: String = "",
    filterDataType: String = "",
    filterExp: String = "",
    idColumn: String = "",
    joinExpr: String = "",
    processId: String = "",
    partitionFormat: Option[String] = None,
    /** DATE_PROCESS: how many days back the raw partition to process sits
      * (light_transform.py:1633-1704 — 0 = today, 1 = yesterday).
      */
    dateProcess: Int = 0,
    status: String = "A",
    /** NUM_DAYS: width of the days_off trailing window in days. The
      * reference pins it to '10' when it infers days_off for a
      * Salesforce transactional table (extract_data_spark.py:193).
      */
    numDays: String = ""
) {
  /** Blank LOAD_TYPE inference, endpoint-neutral form
    * (extract_data_spark.py:188-199): transactional tables default to
    * incremental, others to full. The Salesforce arm needs the
    * endpoint name — use the one-arg overload or
    * [[withInferredLoadType]] where it is known.
    */
  def effectiveLoadType: String = effectiveLoadType("")

  /** Blank LOAD_TYPE inference with the endpoint known
    * (extract_data_spark.py:188-198): a transactional table under the
    * `SALESFORCE_ING` endpoint becomes a `days_off` trailing-window
    * load; any other transactional table becomes incremental;
    * non-transactional tables become full.
    */
  def effectiveLoadType(endpointName: String): String =
    // lowercased like the reference (`load_type.strip().lower()`,
    // extract_data_spark.py:695) — a spreadsheet-cased "Incremental"
    // must not fall through the stage merge routing and OVERWRITE the
    // accumulated table
    if (loadType.trim.nonEmpty) loadType.trim.toLowerCase
    else if (sourceTableType.trim.equalsIgnoreCase("t")) {
      if (endpointName == "SALESFORCE_ING") "days_off" else "incremental"
    } else "full"

  /** The reference mutates table_data in place when it infers the load
    * type (extract_data_spark.py:189-197) — this is that step as a
    * copy: fills LOAD_TYPE, and for the inferred Salesforce days_off
    * arm also pins NUM_DAYS='10' (the reference overwrites it
    * unconditionally there). An explicit LOAD_TYPE passes through with
    * its own NUM_DAYS untouched.
    */
  def withInferredLoadType(endpointName: String): TableConfig =
    if (loadType.trim.nonEmpty) this
    else {
      val lt = effectiveLoadType(endpointName)
      if (lt == "days_off") copy(loadType = lt, numDays = "10")
      else copy(loadType = lt)
    }

  /** Multi-value PROCESS_ID ("10,20") = table shared by groups (app.py:44-55). */
  def processIds: Seq[String] =
    processId.split(',').map(_.trim).filter(_.nonEmpty).toSeq
}

final case class EndpointConfig(
    endpointName: String,
    bdType: String,               // mssql | oracle | mysql
    dbPortNumber: String,
    srcDbName: String,
    srcServerName: String,
    srcDbUsername: String,
    environment: String = "DEV",
    isPrincipal: Boolean = true
)
