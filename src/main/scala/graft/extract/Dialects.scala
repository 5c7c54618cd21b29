package graft.extract

import graft.config.EndpointConfig

import java.time.format.DateTimeFormatter
import java.time.{LocalDateTime, ZoneOffset}

/** JDBC dialect helpers: connection URL + driver class per source RDBMS
  * (reference: extract_data_spark.py:261-271) and typed date-literal
  * formatting for generated predicates
  * (utils/extract_data_v2/utils/date_utils.py:30-45, duplicated at
  * query_generator.py:369-397 and extract_data_spark.py:626-651).
  */
object Dialects {

  final case class JdbcTarget(url: String, driver: String)

  def jdbcTarget(ep: EndpointConfig): JdbcTarget = ep.bdType.toLowerCase match {
    case "mssql" =>
      JdbcTarget(
        s"jdbc:sqlserver://${ep.srcServerName}:${ep.dbPortNumber};databaseName=${ep.srcDbName};encrypt=false",
        "com.microsoft.sqlserver.jdbc.SQLServerDriver")
    case "oracle" =>
      JdbcTarget(
        s"jdbc:oracle:thin:@${ep.srcServerName}:${ep.dbPortNumber}:${ep.srcDbName}",
        "oracle.jdbc.OracleDriver")
    case "mysql" =>
      JdbcTarget(
        s"jdbc:mysql://${ep.srcServerName}:${ep.dbPortNumber}/${ep.srcDbName}",
        "com.mysql.cj.jdbc.Driver")
    case "derby" =>
      // embedded test dialect (ships with Spark) — lets the whole
      // extract path run end-to-end without a database server
      JdbcTarget(
        s"jdbc:derby:memory:${ep.srcDbName};create=true",
        "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    case other =>
      throw new IllegalArgumentException(s"unsupported BD_TYPE: $other")
  }

  /** Wrap a `yyyy-MM-dd HH:mm:ss[.SSS]` date string in the dialect-specific
    * conversion the source database expects (date_utils.py:30-45).
    */
  def formatDateForDb(dateStr: String, dateType: String): String = dateType match {
    case "smalldatetime" => s"CONVERT(smalldatetime, '$dateStr', 120)"
    case "DATE"          => s"TO_DATE('${dateStr.take(19)}', 'YYYY-MM-DD HH24:MI:SS')"
    case "TIMESTAMP(6)"  => s"TO_TIMESTAMP('$dateStr', 'YYYY-MM-DD HH24:MI:SS.FF')"
    case "SQL_DATETIME"  => s"CONVERT(DATETIME, '$dateStr', 102)"
    case "BIGINT" =>
      // between-date windows carry full timestamps, but DateWindows'
      // default month-window limits are date-only (`yyyy-MM-dd`) — a
      // BIGINT-typed filter over such a window must parse both, not
      // throw DateTimeParseException on every planning run
      val dt =
        if (dateStr.trim.length <= 10)
          java.time.LocalDate.parse(dateStr.trim).atStartOfDay()
        else LocalDateTime.parse(dateStr,
          DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      dt.toEpochSecond(ZoneOffset.UTC).toString
    case _ => s"'$dateStr'"
  }
}
