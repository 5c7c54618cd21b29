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
    status: String = "A"
) {
  /** Blank LOAD_TYPE inference (extract_data_spark.py:188-199):
    * transactional tables default to incremental, others to full.
    */
  def effectiveLoadType: String =
    if (loadType.trim.nonEmpty) loadType.trim
    else if (sourceTableType.trim.equalsIgnoreCase("t")) "incremental"
    else "full"

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
