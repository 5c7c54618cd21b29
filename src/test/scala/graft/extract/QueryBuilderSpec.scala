package graft.extract

import graft.config.TableConfig
import org.scalatest.funsuite.AnyFunSuite

import java.time.{ZoneId, ZonedDateTime}

class QueryBuilderSpec extends AnyFunSuite {

  private val base = TableConfig(
    stageTableName = "stage_t", sourceTable = "ACTIVIDAD", sourceSchema = "dbo",
    columns = "id, nombre, ltrim(a)+rtrim(b) full_name", idColumn = "",
    filterExp = "estado = 1", joinExpr = "")

  test("L1 standard query: SELECT list + filter") {
    val q = new QueryBuilder(base).standardQuery()
    assert(q === "SELECT id, nombre, ltrim(a)+rtrim(b) full_name FROM dbo.ACTIVIDAD WHERE (estado = 1)")
  }

  test("ID_COLUMN prepended as id") {
    val q = new QueryBuilder(base.copy(idColumn = "pk")).standardQuery()
    assert(q.startsWith("SELECT pk as id, id, nombre"))
  }

  test("JOIN_EXPR spliced verbatim (J1 passthrough)") {
    val q = new QueryBuilder(base.copy(
      joinExpr = "INNER JOIN dbo.X x ON x.id = ACTIVIDAD.id")).standardQuery()
    assert(q.contains("FROM dbo.ACTIVIDAD INNER JOIN dbo.X x ON x.id = ACTIVIDAD.id WHERE"))
  }

  test("P7 partitioned query range") {
    val q = new QueryBuilder(base).partitionedQuery("part_col", 100, 200)
    assert(q.contains("WHERE part_col >= 100 AND part_col < 200 AND (estado = 1)"))
  }

  test("P5 date-range query: null-guarded BETWEEN; multi-column ORed") {
    val q = new QueryBuilder(base).dateRangeQuery("2025-01-01", "2025-02-01", "f1,f2")
    assert(q.contains(
      "((f1 IS NOT NULL AND f1 BETWEEN '2025-01-01' AND '2025-02-01') OR " +
        "(f2 IS NOT NULL AND f2 BETWEEN '2025-01-01' AND '2025-02-01'))"))
  }

  test("A1 min/max query with <> 0 guard") {
    val q = new QueryBuilder(base).minMaxQuery("pcol")
    assert(q === "SELECT MIN(pcol) as min_val, MAX(pcol) as max_val FROM dbo.ACTIVIDAD WHERE pcol <> 0 AND (estado = 1)")
  }

  test("P6 typed watermark predicate dispatches per dialect") {
    val qb = new QueryBuilder(base)
    // default = mssql (DATETIME2 exists only there)
    assert(qb.watermarkPredicate("c", "2025-01-01 00:00:00", "datetime") ===
      "CAST(c AS DATETIME2(6)) > CAST('2025-01-01 00:00:00' AS DATETIME2(6))")
    assert(qb.watermarkPredicate("c", "2025-01-01 00:00:00", "datetime", "mssql") ===
      "CAST(c AS DATETIME2(6)) > CAST('2025-01-01 00:00:00' AS DATETIME2(6))")
    assert(qb.watermarkPredicate("c", "2025-01-01 00:00:00.123", "timestamp", "oracle") ===
      "c > TO_TIMESTAMP('2025-01-01 00:00:00.123', 'YYYY-MM-DD HH24:MI:SS.FF')")
    assert(qb.watermarkPredicate("c", "2025-01-01 00:00:00", "datetime", "mysql") ===
      "c > '2025-01-01 00:00:00'")
    assert(qb.watermarkPredicate("c", "2025-01-01 00:00:00", "datetime", "derby") ===
      "c > '2025-01-01 00:00:00'")
    // numeric compares raw on every dialect
    assert(qb.watermarkPredicate("c", "42", "bigint") === "c > 42")
    assert(qb.watermarkPredicate("c", "42", "bigint", "oracle") === "c > 42")
  }

  test("dialect JDBC targets per BD_TYPE") {
    import graft.config.EndpointConfig
    val base = EndpointConfig("E", "mssql", "1433", "DB", "host", "usr")
    assert(Dialects.jdbcTarget(base).url ===
      "jdbc:sqlserver://host:1433;databaseName=DB;encrypt=false")
    assert(Dialects.jdbcTarget(base).driver === "com.microsoft.sqlserver.jdbc.SQLServerDriver")
    assert(Dialects.jdbcTarget(base.copy(bdType = "oracle", dbPortNumber = "1521")).url ===
      "jdbc:oracle:thin:@host:1521:DB")
    assert(Dialects.jdbcTarget(base.copy(bdType = "mysql", dbPortNumber = "3306")).url ===
      "jdbc:mysql://host:3306/DB")
    assertThrows[IllegalArgumentException](Dialects.jdbcTarget(base.copy(bdType = "db2")))
  }

  test("latin-1 config file round trip with accented characters") {
    val f = java.nio.file.Files.createTempFile("graft-cfg", ".csv")
    java.nio.file.Files.write(f,
      "COLUMN_NAME;TRANSFORMATION\nAño;fn_transform_ClearString(Año)\n"
        .getBytes("ISO-8859-1"))
    val rows = graft.config.ConfigLoader.loadFile(f.toString)
    assert(rows.head("COLUMN_NAME") === "Año")
    assert(rows.head("TRANSFORMATION") === "fn_transform_ClearString(Año)")
  }

  test("dialect date formatting") {
    assert(Dialects.formatDateForDb("2025-01-01 00:00:00", "smalldatetime") ===
      "CONVERT(smalldatetime, '2025-01-01 00:00:00', 120)")
    assert(Dialects.formatDateForDb("2025-01-01 00:00:00", "DATE") ===
      "TO_DATE('2025-01-01 00:00:00', 'YYYY-MM-DD HH24:MI:SS')")
    assert(Dialects.formatDateForDb("2025-01-01 00:00:00", "BIGINT") === "1735689600")
  }

  test("column alias inference") {
    assert(QueryBuilder.columnAlias("a AS b") === "b")
    assert(QueryBuilder.columnAlias("ltrim(x)+rtrim(y) full_name") === "full_name")
    assert(QueryBuilder.columnAlias("t.c") === "c")
    assert(QueryBuilder.columnAlias("plain") === "plain")
  }

  test("L2 plan: partitioned read from min/max; strided queries closed at top") {
    val table = base.copy(sourceTableType = "t", partitionColumn = "pc", loadType = "full")
    val plan = LoadPlanner.plan(table, minMax = Some((0L, 100L)))
    val pr = plan.asInstanceOf[LoadPlanner.PartitionedRead]
    assert(pr.numPartitions === 10)
    val qs = pr.queries
    assert(qs.head.contains("pc >= 0 AND pc < 10"))
    assert(qs.last.contains("pc >= 90 AND pc < 101")) // last bucket +1 closure
  }

  test("L3 plan: watermark increment when watermark exists") {
    val table = base.copy(loadType = "incremental", partitionColumn = "ts_col",
      filterDataType = "datetime")
    val plan = LoadPlanner.plan(table, watermark = Some("2025-06-01 00:00:00"))
    val q = plan.queries.head
    assert(q.contains("CAST(ts_col AS DATETIME2(6)) > CAST('2025-06-01 00:00:00' AS DATETIME2(6))"))
  }

  test("L3 plan: rolling month window when no watermark (frozen clock)") {
    val now = ZonedDateTime.of(2025, 10, 17, 12, 0, 0, 0, ZoneId.of("America/Lima"))
    val table = base.copy(loadType = "incremental", filterColumn = "fecha",
      filterDataType = "aje_period", delayIncrementalIni = "-2")
    val plan = LoadPlanner.plan(table, now = now)
    assert(plan.queries.head.contains("fecha IS NOT NULL AND fecha BETWEEN '202508' AND '202510'"))
  }

  test("L4 between-date plan: date-range slice with dialect formatting") {
    val now = ZonedDateTime.of(2025, 10, 17, 12, 0, 0, 0, ZoneId.of("America/Lima"))
    val table = base.copy(loadType = "between-date", filterColumn = "fecha",
      filterDataType = "smalldatetime", delayIncrementalIni = "-1",
      delayIncrementalEnd = "0")
    val q = LoadPlanner.plan(table, now = now).queries.head
    assert(q.contains("fecha IS NOT NULL AND fecha BETWEEN " +
      "CONVERT(smalldatetime, '2025-09-17', 120) AND CONVERT(smalldatetime, '2025-10-17', 120)"))
  }

  test("L7 days_off plan: NUM_DAYS trailing window under Salesforce (frozen clock)") {
    val now = ZonedDateTime.of(2025, 10, 17, 12, 0, 0, 0, ZoneId.of("America/Lima"))
    // blank LOAD_TYPE + 't' + SALESFORCE_ING infers days_off/NUM_DAYS=10
    val table = base.copy(loadType = "", sourceTableType = "t",
      filterColumn = "fecha", filterDataType = "")
    val q = LoadPlanner.plan(table, now = now,
      endpointName = "SALESFORCE_ING").queries.head
    assert(q.contains(
      "fecha IS NOT NULL AND fecha BETWEEN '2025-10-07' AND '2025-10-17'"))
    // explicit days_off honors its own NUM_DAYS and dialect formatting
    val explicit = base.copy(loadType = "days_off", numDays = "30",
      filterColumn = "fecha", filterDataType = "aje_period")
    val q2 = LoadPlanner.plan(explicit, now = now).queries.head
    assert(q2.contains("fecha IS NOT NULL AND fecha BETWEEN '202509' AND '202510'"))
    // no filter column → one plain standard cursor, never partitioned
    // (the reference's partitioned_full arm requires LOAD_TYPE='full')
    val bare = base.copy(loadType = "days_off", sourceTableType = "t",
      partitionColumn = "pc", filterExp = "")
    val p = LoadPlanner.plan(bare, minMax = Some((0L, 100L)))
    assert(p.isInstanceOf[LoadPlanner.SingleQuery])
    assert(!p.queries.head.contains("WHERE"))
  }

  test("FORCE_FULL demotes only incremental; days_off survives it") {
    val now = ZonedDateTime.of(2025, 10, 17, 12, 0, 0, 0, ZoneId.of("America/Lima"))
    val sf = base.copy(loadType = "", sourceTableType = "t", filterColumn = "fecha")
    val q = LoadPlanner.plan(sf, now = now, forceFullLoad = true,
      endpointName = "SALESFORCE_ING").queries.head
    assert(q.contains("BETWEEN '2025-10-07' AND '2025-10-17'"))
    // same table under a plain endpoint: incremental → full under FORCE_FULL
    val full = LoadPlanner.plan(sf, now = now, forceFullLoad = true)
    assert(!full.queries.head.contains("BETWEEN"))
  }

  test("LoadMode.Reset ignores the stored watermark") {
    val table = base.copy(loadType = "incremental", partitionColumn = "pc")
    val plan = LoadPlanner.plan(table, watermark = Some("99"),
      mode = LoadPlanner.LoadMode.Reset)
    assert(!plan.queries.head.contains("99"))
  }

  test("Initial/Reset plan a FULL load even with a filter column") {
    // incremental.py:25-38: INITIAL and RESET are 'Carga COMPLETA sin
    // filtros' + watermark save — a windowed plan would permanently lose
    // every row older than the delay window on the very first load
    val table = base.copy(loadType = "incremental",
      partitionColumn = "pc", filterColumn = "fecha")
    for (m <- Seq(LoadPlanner.LoadMode.Initial, LoadPlanner.LoadMode.Reset)) {
      val q = LoadPlanner.plan(table, watermark = Some("99"), mode = m)
        .queries.head
      // no date window, no watermark — the static FILTER_EXP survives
      // (the reference drops WATERMARK filters, not the table's own)
      assert(!q.contains("BETWEEN") && !q.contains("99"),
        s"$m must plan a full load without watermark/window filters: $q")
    }
  }

  test("blank FILTER_DATA_TYPE detects the watermark type from the value") {
    // _detect_watermark_data_type (incremental.py:368-380): digits-only
    // compares raw — a blind datetime CAST over a numeric sequence
    // column fails every incremental run at the source
    val table = base.copy(loadType = "incremental",
      partitionColumn = "seq_id", filterDataType = "")
    val qNum = LoadPlanner.plan(table, watermark = Some("12345")).queries.head
    assert(qNum.contains("seq_id > 12345") && !qNum.contains("CAST"), qNum)
    val qDt = LoadPlanner.plan(table.copy(partitionColumn = "ts"),
      watermark = Some("2025-01-01 00:00:00")).queries.head
    assert(qDt.contains("CAST"), qDt)
  }

  test("PartitionedRead.queries composes FILTER_EXP with one WHERE") {
    val table = base.copy(loadType = "full", sourceTableType = "t",
      partitionColumn = "pc", filterExp = "estado = 1")
    val plan = LoadPlanner.plan(table, minMax = Some((0L, 100L)))
    plan.queries.foreach { q =>
      assert("WHERE".r.findAllIn(q).size == 1, q)
      assert(q.contains("(estado = 1) AND pc >="), q)
    }
  }

  test("partition count survives ranges wider than Int.MaxValue") {
    val table = base.copy(loadType = "full", sourceTableType = "t",
      partitionColumn = "pc")
    val plan = LoadPlanner.plan(table, minMax = Some((0L, 3000000000L)))
    plan match {
      case p: LoadPlanner.PartitionedRead =>
        assert(p.numPartitions === LoadPlanner.DefaultNumPartitions)
      case other => fail(s"expected PartitionedRead, got $other")
    }
  }

  test("watermark type: FILTER_DATA_TYPE applies only to its own column") {
    // FILTER_DATA_TYPE describes FILTER_COLUMN; a numeric watermark on a
    // DIFFERENT partition column must not inherit the datetime cast
    val table = base.copy(loadType = "incremental",
      partitionColumn = "seq_id", filterColumn = "fecha",
      filterDataType = "SQL_DATETIME")
    val q = LoadPlanner.plan(table, watermark = Some("12345")).queries.head
    assert(q.contains("seq_id > 12345") && !q.contains("CONVERT"), q)
    // same column: the declared type DOES drive the predicate
    val same = base.copy(loadType = "incremental",
      partitionColumn = "fecha", filterColumn = "fecha",
      filterDataType = "SQL_DATETIME")
    val q2 = LoadPlanner.plan(same,
      watermark = Some("2025-01-01 00:00:00")).queries.head
    assert(q2.contains("CAST(fecha AS DATETIME2(6))"), q2)
    // negative integers are numeric, not datetime
    val q3 = LoadPlanner.plan(base.copy(loadType = "incremental",
      partitionColumn = "seq_id"), watermark = Some("-5")).queries.head
    assert(q3.contains("seq_id > -5") && !q3.contains("CAST"), q3)
  }

  test("BIGINT filter type accepts date-only window limits") {
    // DateWindows' default month-window limits are `yyyy-MM-dd`; the
    // BIGINT arm converts them at midnight instead of throwing
    assert(Dialects.formatDateForDb("2026-06-16", "BIGINT") ===
      java.time.LocalDate.of(2026, 6, 16).atStartOfDay()
        .toEpochSecond(java.time.ZoneOffset.UTC).toString)
    // and full timestamps keep working
    assert(Dialects.formatDateForDb("2026-06-16 01:02:03", "BIGINT") ===
      java.time.LocalDateTime.of(2026, 6, 16, 1, 2, 3)
        .toEpochSecond(java.time.ZoneOffset.UTC).toString)
    // end-to-end: a between-date plan over BIGINT no longer crashes
    val table = base.copy(loadType = "between-date",
      filterColumn = "epoch_col", filterDataType = "BIGINT")
    val q = LoadPlanner.plan(table).queries.head
    assert(q.contains("epoch_col"), q)
  }

  test("numPartitions lever: up to the query_generator 30-cursor ceiling") {
    val table = base.copy(loadType = "full", sourceTableType = "t",
      partitionColumn = "pc")
    val p = LoadPlanner.plan(table, minMax = Some((0L, 1000000L)),
      numPartitions = LoadPlanner.MaxPartitions)
      .asInstanceOf[LoadPlanner.PartitionedRead]
    assert(p.numPartitions === 30)
    intercept[IllegalArgumentException] {
      LoadPlanner.plan(table, minMax = Some((0L, 10L)), numPartitions = 31)
    }
  }

  test("aje_date window: FoxPro day numbers, month-snapped") {
    val now = ZonedDateTime.of(2025, 10, 17, 12, 0, 0, 0, ZoneId.of("America/Lima"))
    val (lo, hi) = DateWindows.dateLimits("-2", "0", "aje_date", now)
    // 2025-08-01 and 2025-10-31 as day numbers
    assert(lo === DateWindows.dayNumber(java.time.LocalDate.of(2025, 8, 1)).toString)
    assert(hi === DateWindows.dayNumber(java.time.LocalDate.of(2025, 10, 31)).toString)
    // round-trip
    assert(DateWindows.dateFromDayNumber(lo.toLong) === java.time.LocalDate.of(2025, 8, 1))
  }
}
