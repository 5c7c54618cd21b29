package graft.extract

import graft.config.{EndpointConfig, TableConfig}
import org.scalatest.funsuite.AnyFunSuite

import java.time.{ZoneId, ZonedDateTime}

/** Per-dialect SQL goldens: the COMPLETE generated statement for each
  * supported source RDBMS (SQL Server, Oracle, MySQL, plus the embedded
  * Derby test dialect), frozen as strings. The extract path runs
  * end-to-end against Derby in RunnerSpec; these goldens pin the
  * dialect-specific text the other three engines would receive — the
  * sandbox ships no server to round-trip them against, so the golden IS
  * the contract (reference dispatch: incremental.py:331-435,
  * extract_data_spark.py:261-271, date_utils.py:30-45).
  */
class DialectGoldenSpec extends AnyFunSuite {

  private val base = TableConfig(
    stageTableName = "stage_t", sourceTable = "VENTAS", sourceSchema = "dbo",
    columns = "id, total", idColumn = "",
    filterExp = "", joinExpr = "")

  private def ep(bd: String) = EndpointConfig(
    endpointName = "e1", bdType = bd, dbPortNumber = "1433",
    srcDbName = "corp", srcServerName = "srv.example.internal",
    srcDbUsername = "svc")

  test("incremental extract SQL per dialect: typed datetime watermark") {
    val table = base.copy(loadType = "incremental", partitionColumn = "mod_ts",
      filterDataType = "datetime")
    def sql(bd: String): String =
      LoadPlanner.plan(table, watermark = Some("2025-06-01 00:00:00"),
        bdType = bd).queries.head
    assert(sql("mssql") ===
      "SELECT id, total FROM dbo.VENTAS WHERE (CAST(mod_ts AS DATETIME2(6))" +
        " > CAST('2025-06-01 00:00:00' AS DATETIME2(6)))")
    assert(sql("oracle") ===
      "SELECT id, total FROM dbo.VENTAS WHERE (mod_ts > " +
        "TO_TIMESTAMP('2025-06-01 00:00:00', 'YYYY-MM-DD HH24:MI:SS.FF'))")
    assert(sql("mysql") ===
      "SELECT id, total FROM dbo.VENTAS WHERE (mod_ts > '2025-06-01 00:00:00')")
    assert(sql("derby") === sql("mysql"),
      "the embedded test dialect must take the engine-native literal arm")
  }

  test("numeric watermark compares raw on every dialect") {
    val table = base.copy(loadType = "incremental", partitionColumn = "seq_id",
      filterDataType = "bigint")
    for (bd <- Seq("mssql", "oracle", "mysql", "derby")) {
      assert(LoadPlanner.plan(table, watermark = Some("12345"), bdType = bd)
        .queries.head ===
        "SELECT id, total FROM dbo.VENTAS WHERE (seq_id > 12345)", bd)
    }
  }

  test("between-date slices wear each dialect's date conversion") {
    val now = ZonedDateTime.of(2025, 10, 17, 12, 0, 0, 0,
      ZoneId.of("America/Lima"))
    def q(fdt: String): String = LoadPlanner.plan(
      base.copy(loadType = "between-date", filterColumn = "fecha",
        filterDataType = fdt, delayIncrementalIni = "-1",
        delayIncrementalEnd = "0"), now = now).queries.head
    // SQL Server smalldatetime / DATETIME CONVERT styles
    assert(q("smalldatetime").contains("fecha BETWEEN CONVERT(smalldatetime," +
      " '2025-09-17', 120) AND CONVERT(smalldatetime, '2025-10-17', 120)"))
    assert(q("SQL_DATETIME").contains("CONVERT(DATETIME, '2025-09-17', 102)"))
    // Oracle DATE / TIMESTAMP(6)
    assert(q("DATE").contains(
      "TO_DATE('2025-09-17', 'YYYY-MM-DD HH24:MI:SS')"))
    assert(q("TIMESTAMP(6)").contains(
      "TO_TIMESTAMP('2025-09-17', 'YYYY-MM-DD HH24:MI:SS.FF')"))
    // epoch-seconds BIGINT columns: full datetime precision, and the
    // date-only strings between-date windows emit convert at midnight —
    // a BIGINT-filtered between-date table must plan, not crash (r17)
    assert(Dialects.formatDateForDb("2025-09-17 00:00:00", "BIGINT") ===
      "1758067200")
    assert(Dialects.formatDateForDb("2025-09-17", "BIGINT") === "1758067200")
    assert(q("BIGINT").contains(
      "fecha BETWEEN 1758067200 AND 1760659200"), q("BIGINT"))
  }

  test("strided partition queries are dialect-independent and closed") {
    val table = base.copy(sourceTableType = "t", partitionColumn = "pc",
      loadType = "full")
    for (bd <- Seq("mssql", "oracle", "mysql", "derby")) {
      val pr = LoadPlanner.plan(table, minMax = Some((0L, 100L)), bdType = bd)
        .asInstanceOf[LoadPlanner.PartitionedRead]
      assert(pr.queries.head ===
        "SELECT id, total FROM dbo.VENTAS WHERE pc >= 0 AND pc < 10", bd)
      assert(pr.queries.last ===
        "SELECT id, total FROM dbo.VENTAS WHERE pc >= 90 AND pc < 101", bd)
    }
  }

  test("JDBC URL + driver per dialect") {
    assert(Dialects.jdbcTarget(ep("mssql")) === Dialects.JdbcTarget(
      "jdbc:sqlserver://srv.example.internal:1433;databaseName=corp;" +
        "encrypt=false",
      "com.microsoft.sqlserver.jdbc.SQLServerDriver"))
    assert(Dialects.jdbcTarget(ep("oracle")) === Dialects.JdbcTarget(
      "jdbc:oracle:thin:@srv.example.internal:1433:corp",
      "oracle.jdbc.OracleDriver"))
    assert(Dialects.jdbcTarget(ep("mysql")) === Dialects.JdbcTarget(
      "jdbc:mysql://srv.example.internal:1433/corp",
      "com.mysql.cj.jdbc.Driver"))
    assert(Dialects.jdbcTarget(ep("derby")).url ===
      "jdbc:derby:memory:corp;create=true")
    intercept[IllegalArgumentException](Dialects.jdbcTarget(ep("postgres")))
  }

  test("min/max planning query is dialect-neutral SQL-92") {
    val qb = new QueryBuilder(base)
    assert(qb.minMaxQuery("pc") ===
      "SELECT MIN(pc) as min_val, MAX(pc) as max_val FROM dbo.VENTAS " +
        "WHERE pc <> 0")
  }
}
