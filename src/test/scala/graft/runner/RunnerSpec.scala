package graft.runner

import graft.SparkTestBase
import graft.catalog.CatalogSync
import graft.config.{ColumnMetadata, EndpointConfig, TableConfig}
import graft.extract.{Dialects, LoadPlanner}
import graft.operators.WatermarkStore

import java.nio.file.Files
import java.sql.DriverManager

/** End-to-end slice #2 (SURVEY §7.2): JDBC extract against an embedded
  * Derby database → stringified raw parquet → stage transform → catalog,
  * with watermark increment across two runs.
  */
class RunnerSpec extends SparkTestBase {

  private val ep = EndpointConfig(
    endpointName = "TEST", bdType = "derby", dbPortNumber = "0",
    srcDbName = "graftdb", srcServerName = "local", srcDbUsername = "app")

  private def seedDerby(): Unit = {
    val conn = DriverManager.getConnection("jdbc:derby:memory:graftdb;create=true")
    val st = conn.createStatement()
    try st.execute("DROP TABLE APP.ACTIVIDAD") catch { case _: Exception => () }
    st.execute(
      "CREATE TABLE APP.ACTIVIDAD (id INT, nombre VARCHAR(50), estado INT, ts_ver INT)")
    st.execute("INSERT INTO APP.ACTIVIDAD VALUES " +
      "(1, '  Ana ', 1, 100), (2, 'None', 1, 110), (3, 'Bob', 0, 120), (1, 'Ana v2', 1, 130)")
    st.close(); conn.close()
  }

  private def addRows(): Unit = {
    val conn = DriverManager.getConnection("jdbc:derby:memory:graftdb")
    val st = conn.createStatement()
    st.execute("INSERT INTO APP.ACTIVIDAD VALUES (2, 'Bea', 1, 140), (4, 'Cara', 1, 150)")
    st.close(); conn.close()
  }

  private val table = TableConfig(
    stageTableName = "actividad", sourceTable = "ACTIVIDAD", sourceSchema = "APP",
    sourceTableType = "t", loadType = "incremental",
    columns = "id, nombre, estado, ts_ver",
    partitionColumn = "ts_ver", filterDataType = "int",
    idColumn = "", processId = "10")

  private val columns = Seq(
    ColumnMetadata("id", 1, "int", "fn_transform_Integer(id)", isId = true),
    ColumnMetadata("nombre", 2, "string", "fn_transform_ClearString(nombre)"),
    ColumnMetadata("estado", 3, "int", "fn_transform_Integer(estado)"),
    ColumnMetadata("ts_ver", 4, "int", "fn_transform_Integer(ts_ver)", isOrderBy = true))

  test("derby jdbc: single query and partitioned read plans execute") {
    seedDerby()
    val qPlan = LoadPlanner.plan(table.copy(loadType = "full", sourceTableType = "m"))
    val df = LoadPlanner.execute(spark, qPlan, ep, password = "")
    assert(df.count() === 4)

    val pPlan = LoadPlanner.plan(
      table.copy(loadType = "full"), minMax = Some((100L, 130L)))
    assert(pPlan.isInstanceOf[LoadPlanner.PartitionedRead])
    val pdf = LoadPlanner.execute(spark, pPlan, ep, password = "")
    assert(pdf.count() === 4)
    assert(pdf.rdd.getNumPartitions > 1) // range-partitioned JDBC read
  }

  test("full pipeline: extract → raw → stage with watermark across runs") {
    seedDerby()
    val root = Files.createTempDirectory("graft-runner").toString
    val store = new WatermarkStore(spark, s"$root/wm")
    val spec = Runner.TableSpec(table, columns,
      rawPath = s"$root/raw/actividad", stagePath = s"$root/stage/actividad",
      source = Left((ep, "")))

    val report1 = Runner.run(spark, Seq(spec), maxConcurrency = 2,
      watermarkStore = Some(store))
    assert(report1.runs.head.status === "SUCCESS")
    // PROCESS_TYPE of the monitoring row: 'D' for incremental loads
    assert(report1.runs.head.processType === "D")
    val s1 = spark.read.parquet(s"$root/stage/actividad").orderBy("id").collect()
    assert(s1.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(s1.head.getString(1) === "Ana v2")     // keep-latest by ts_ver
    assert(s1(1).isNullAt(1))                     // 'None' cleaned to null
    assert(store.get(store.key("10", "actividad", "ts_ver")) === Some("130"))

    // incremental run: only rows past the watermark are extracted
    addRows()
    val report2 = Runner.run(spark, Seq(spec), maxConcurrency = 2,
      watermarkStore = Some(store))
    assert(report2.runs.head.status === "SUCCESS")
    val s2 = spark.read.parquet(s"$root/stage/actividad").orderBy("id").collect()
    assert(s2.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    assert(s2(1).getString(1) === "Bea")          // upserted
    assert(store.get(store.key("10", "actividad", "ts_ver")) === Some("150"))

    // raw layer of run 2 contains only the delta (watermark pushdown)
    val raw2 = spark.read.parquet(s"$root/raw/actividad")
    assert(raw2.count() === 2)
    assert(raw2.schema.fields.forall(_.dataType.typeName === "string"))
  }

  test("salesforce blank LOAD_TYPE reports PROCESS_TYPE 'F' (days_off)") {
    // the reference logs the POST-inference LOAD_TYPE: a blank-type
    // transactional table under SALESFORCE_ING becomes days_off → 'F',
    // NOT the endpoint-neutral incremental → 'D'
    // (extract_data_spark.py:189-197,323)
    seedDerby()
    val root = Files.createTempDirectory("graft-runner-sf").toString
    val sfEp = ep.copy(endpointName = "SALESFORCE_ING")
    val spec = Runner.TableSpec(table.copy(loadType = ""), columns,
      s"$root/raw/sf", s"$root/stage/sf", Left((sfEp, "")))
    val report = Runner.run(spark, Seq(spec))
    assert(report.runs.head.status === "SUCCESS")
    assert(report.runs.head.processType === "F")
    // and the stage step OVERWRITES (days_off never merges,
    // light_transform.py:1554): a row deleted at the source is gone
    // after the next run, where a merge would have kept it
    val conn = DriverManager.getConnection("jdbc:derby:memory:graftdb")
    val st = conn.createStatement()
    st.execute("DELETE FROM APP.ACTIVIDAD WHERE id = 3")
    st.close(); conn.close()
    val report2 = Runner.run(spark, Seq(spec))
    assert(report2.runs.head.status === "SUCCESS")
    val ids = spark.read.parquet(s"$root/stage/sf")
      .select("id").collect().map(_.getInt(0)).toSet
    assert(!ids.contains(3))
    assert(ids === Set(1, 2))
  }

  test("failure isolation: one broken table does not sink the run") {
    seedDerby()
    val root = Files.createTempDirectory("graft-runner-f").toString
    val good = Runner.TableSpec(table.copy(loadType = "full"), columns,
      s"$root/raw/g", s"$root/stage/g", Left((ep, "")))
    val bad = Runner.TableSpec(
      table.copy(stageTableName = "broken", sourceTable = "NO_SUCH_TABLE"),
      columns, s"$root/raw/b", s"$root/stage/b", Left((ep, "")))
    // failure-alerting hook: FAILED outcomes reach the notifier (from the
    // worker thread), a throwing notifier is swallowed, SUCCESS stays quiet
    val alerted = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val notifier = Runner.RunNotifier.onFailure { run =>
      alerted.add(run.table)
      throw new RuntimeException("alert channel down") // must not sink the run
    }
    val report = Runner.run(spark, Seq(good, bad), maxConcurrency = 2,
      notifier = Some(notifier))
    assert(report.succeeded.map(_.table) === Seq("actividad"))
    assert(report.failed.map(_.table) === Seq("broken"))
    assert(report.failed.head.error.nonEmpty)
    assert(alerted.toArray.toSeq === Seq("broken"))
  }

  test("catalog sync registers stage tables for spark.sql") {
    seedDerby()
    val root = Files.createTempDirectory("graft-cat").toString
    val spec = Runner.TableSpec(table.copy(loadType = "full"), columns,
      s"$root/raw/a", s"$root/stage/a", Left((ep, "")))
    Runner.run(spark, Seq(spec))
    CatalogSync.registerTable(spark, "stage", "actividad", s"$root/stage/a")
    val got = spark.sql("SELECT id, nombre FROM stage.actividad WHERE estado = 1 ORDER BY id")
      .collect()
    assert(got.map(_.getInt(0)).toSeq === Seq(1, 2))
    assert(CatalogSync.listTables(spark, "stage") === Seq("actividad"))
  }

  test("concurrent multi-table run: shared session + store, all tables land") {
    val conn = DriverManager.getConnection("jdbc:derby:memory:graftdb;create=true")
    val st = conn.createStatement()
    val tableNames = (1 to 6).map(i => s"MT$i")
    tableNames.foreach { tn =>
      try st.execute(s"DROP TABLE APP.$tn") catch { case _: Exception => () }
      st.execute(s"CREATE TABLE APP.$tn (id INT, nombre VARCHAR(50), estado INT, ts_ver INT)")
      st.execute(s"INSERT INTO APP.$tn VALUES (1,'a',1,10),(2,'b',1,20),(3,'c',0,30)")
    }
    st.close(); conn.close()

    val root = Files.createTempDirectory("graft-multi").toString
    val store = new WatermarkStore(spark, s"$root/wm")
    val specs = tableNames.map { tn =>
      Runner.TableSpec(
        table.copy(stageTableName = tn.toLowerCase, sourceTable = tn),
        columns, s"$root/raw/$tn", s"$root/stage/$tn", Left((ep, "")))
    }
    val report = Runner.run(spark, specs, maxConcurrency = 4,
      watermarkStore = Some(store))
    assert(report.failed.isEmpty, report.failed.map(_.error).mkString("; "))
    tableNames.foreach { tn =>
      assert(spark.read.parquet(s"$root/stage/$tn").count() === 3)
      assert(store.get(store.key("10", tn.toLowerCase, "ts_ver")) === Some("30"))
    }
  }

  test("extractor retry: transient failures succeed on a later attempt") {
    import java.util.concurrent.atomic.AtomicInteger
    val root = Files.createTempDirectory("graft-retry").toString
    val fails = new AtomicInteger(0)
    val flaky = Runner.TableSpec(
      table.copy(stageTableName = "flaky", loadType = "full"), columns,
      s"$root/raw/f", s"$root/stage/f",
      source = Right { s =>
        if (fails.incrementAndGet() <= 2)
          throw new RuntimeException("simulated connection reset")
        import s.implicits._
        Seq((1, "ok", 1, 10)).toDF("id", "nombre", "estado", "ts_ver")
      })
    val report = Runner.run(spark, Seq(flaky), retryDelayMs = 0)
    assert(report.runs.head.status === "SUCCESS")
    assert(report.runs.head.attempts === 3)
    assert(spark.read.parquet(s"$root/stage/f").count() === 1)

    // permanent failure: attempts capped, table FAILED, error surfaced
    val dead = flaky.copy(
      table = table.copy(stageTableName = "dead", loadType = "full"),
      rawPath = s"$root/raw/d", stagePath = s"$root/stage/d",
      source = Right(_ => throw new RuntimeException("down for good")))
    val report2 = Runner.run(spark, Seq(dead), retries = 2, retryDelayMs = 0)
    assert(report2.runs.head.status === "FAILED")
    assert(report2.runs.head.attempts === 2)
    assert(report2.runs.head.error.exists(_.contains("down for good")))
  }

  test("run report persists every outcome taxonomy row") {
    seedDerby()
    val root = Files.createTempDirectory("graft-report").toString
    val reportPath = s"$root/run_report"
    val ok = Runner.TableSpec(table.copy(loadType = "full"), columns,
      s"$root/raw/ok", s"$root/stage/ok", Left((ep, "")))
    val failed = Runner.TableSpec(
      table.copy(stageTableName = "failed", sourceTable = "NO_SUCH_TABLE"),
      columns, s"$root/raw/x", s"$root/stage/x", Left((ep, "")))
    // warning: one bad transform among four (≤50% failed columns)
    val warnCols = columns.updated(1,
      ColumnMetadata("nombre", 2, "string", "fn_transform_ClearString(no_such_col)"))
    val warn = Runner.TableSpec(
      table.copy(stageTableName = "warned", loadType = "full"), warnCols,
      s"$root/raw/w", s"$root/stage/w", Left((ep, "")))
    // empty: no raw data at the path and no extract step
    val empty = Runner.TableSpec(
      table.copy(stageTableName = "empty", loadType = "full"), columns,
      s"$root/raw/missing", s"$root/stage/e", Left((ep, "")))

    Runner.run(spark, Seq(ok, warn, failed), retryDelayMs = 0,
      reportPath = Some(reportPath))
    Runner.run(spark, Seq(empty), runExtract = false, reportPath = Some(reportPath))

    val persisted = spark.read.parquet(reportPath)
      .select("table", "status", "rows_written", "attempts")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(persisted("actividad") === "SUCCESS")
    assert(persisted("warned") === "WARNING")
    assert(persisted("failed") === "FAILED")
    assert(persisted("empty") === "EMPTY")
    // appended across runs, queryable after the fact
    assert(spark.read.parquet(reportPath).count() === 4)
  }

  test("dated raw path: frozen clock reads yesterday's partition e2e") {
    import graft.partition.PartitionPathFormatter
    import java.time.ZonedDateTime
    val root = Files.createTempDirectory("graft-dated").toString
    val frozen = ZonedDateTime.of(2026, 3, 15, 10, 0, 0, 0, PartitionPathFormatter.Lima)
    val dated = table.copy(stageTableName = "dated", loadType = "full",
      dateProcess = 1) // yesterday
    val spec = Runner.datedSpec(dated, columns, s"$root/raw", s"$root/stage",
      source = Left((ep, "")), now = frozen)
    // composition: DATE_PROCESS=1 from 2026-03-15 → 2026-03-14, default template
    assert(spec.rawPath === s"$root/raw/dated/year=2026/month=03/day=14")
    assert(spec.stagePath === s"$root/stage/dated")
    // reverse-parse round-trip (light_transform.py:1884-1902)
    assert(PartitionPathFormatter.extractPartitionValues(spec.rawPath) ===
      Map("year" -> "2026", "month" -> "03", "day" -> "14"))

    // land raw data at yesterday's partition, then run the stage job only:
    // it reads exactly that dated partition
    import spark.implicits._
    graft.sources.RawLayer.writeRawStringified(
      Seq((7, "Dia", 1, 10)).toDF("id", "nombre", "estado", "ts_ver"),
      spec.rawPath)
    val report = Runner.run(spark, Seq(spec), runExtract = false)
    assert(report.runs.head.status === "SUCCESS")
    val got = spark.read.parquet(spec.stagePath).select("id", "nombre").collect()
    assert(got.map(r => (r.getInt(0), r.getString(1))).toSeq === Seq((7, "Dia")))
  }

  test("process-id group resolution includes shared tables") {
    val ts = Seq(
      table.copy(stageTableName = "t1", processId = "10"),
      table.copy(stageTableName = "t2", processId = "10,20"),
      table.copy(stageTableName = "t3", processId = "20"),
      table.copy(stageTableName = "t4", processId = "10", status = "I"))
    assert(Runner.tablesForProcess(ts, "10").map(_.stageTableName) === Seq("t1", "t2"))
    assert(Runner.tablesForProcess(ts, "20").map(_.stageTableName) === Seq("t2", "t3"))
  }
}
