package graft

import java.nio.file.{Files, Path}
import java.sql.DriverManager

class PipelineMainSpec extends SparkTestBase {

  private def write(dir: Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.write(p, content.getBytes("ISO-8859-1"))
    p.toString
  }

  test("config CSVs to landed stage tables, end to end") {
    // seed an embedded Derby source with two tables
    val conn = DriverManager.getConnection("jdbc:derby:memory:graftpm;create=true")
    val st = conn.createStatement()
    for (t <- Seq("ALPHA", "BETA")) {
      try st.execute(s"DROP TABLE APP.$t") catch { case _: Exception => () }
      st.execute(s"CREATE TABLE APP.$t (id INT, nombre VARCHAR(50), ver INT)")
      st.execute(s"INSERT INTO APP.$t VALUES (1, 'uno', 10), (2, ' None ', 10), (2, 'dos v2', 20)")
    }
    st.close(); conn.close()

    val dir = Files.createTempDirectory("graft_pm")
    val endpoints = write(dir, "endpoints.csv",
      "ENDPOINT_NAME;BD_TYPE;DB_PORT_NUMBER;SRC_DB_NAME;SRC_SERVER_NAME;SRC_DB_USERNAME;ENV;IS_PRINCIPAL\n" +
        "MAIN;derby;0;graftpm;local;app;DEV;true")
    val tables = write(dir, "tables.csv",
      "STAGE_TABLE_NAME;SOURCE_TABLE;SOURCE_SCHEMA;SOURCE_TABLE_TYPE;LOAD_TYPE;COLUMNS;ID_COLUMN;PROCESS_ID;STATUS\n" +
        "alpha;ALPHA;APP;t;full;id, nombre, ver;;77;A\n" +
        "beta;BETA;APP;t;full;id, nombre, ver;;77;A\n" +
        "gamma;GAMMA;APP;t;full;id, nombre, ver;;88;A") // other process: skipped
    val columns = write(dir, "columns.csv",
      "COLUMN_NAME;COLUMN_ID;NEW_DATA_TYPE;TRANSFORMATION;IS_ID;IS_ORDER_BY;TABLE_NAME\n" +
        "id;1;int;fn_transform_Integer(id);t;;alpha\n" +
        "nombre;2;string;fn_transform_ClearString(nombre);;;alpha\n" +
        "ver;3;int;fn_transform_Integer(ver);;t;alpha\n" +
        "id;1;int;fn_transform_Integer(id);t;;beta\n" +
        "nombre;2;string;fn_transform_ClearString(nombre);;;beta\n" +
        "ver;3;int;fn_transform_Integer(ver);;t;beta")

    val rawRoot = dir.resolve("raw").toString
    val stageRoot = dir.resolve("stage").toString
    val report = PipelineMain.run(spark, endpoints, tables, columns,
      processId = "77", rawRoot = rawRoot, stageRoot = stageRoot)

    // only the two process-77 tables ran, both landed
    assert(report.runs.map(_.table).sorted === Seq("alpha", "beta"))
    assert(report.failed.isEmpty, report.failed.map(_.error).mkString("; "))

    val alpha = spark.read.parquet(s"$stageRoot/alpha")
      .orderBy("id").collect()
    // IS_ID + IS_ORDER_BY keep-latest: one row per id, highest ver wins;
    // ClearString turns ' None ' (ver 10, superseded) into a dropped row
    assert(alpha.map(_.getInt(0)).toSeq === Seq(1, 2))
    assert(alpha.map(_.getString(1)).toSeq === Seq("uno", "dos v2"))

    // the run report persisted under the stage root
    val persisted = spark.read.parquet(s"$stageRoot/__run_report")
    assert(persisted.count() === 2)
  }

  test("multi-endpoint fan-out: every table lands once per endpoint, env-filtered") {
    // two Derby instances standing in for two database endpoints
    for (db <- Seq("graftpm_a", "graftpm_b")) {
      val conn = DriverManager.getConnection(s"jdbc:derby:memory:$db;create=true")
      val st = conn.createStatement()
      try st.execute("DROP TABLE APP.ALPHA") catch { case _: Exception => () }
      st.execute("CREATE TABLE APP.ALPHA (id INT, nombre VARCHAR(50))")
      st.execute(s"INSERT INTO APP.ALPHA VALUES (1, '$db')")
      st.close(); conn.close()
    }

    val dir = Files.createTempDirectory("graft_pm_multi")
    val endpoints = write(dir, "endpoints.csv",
      "ENDPOINT_NAME;BD_TYPE;DB_PORT_NUMBER;SRC_DB_NAME;SRC_SERVER_NAME;SRC_DB_USERNAME;ENV;IS_PRINCIPAL\n" +
        "EPA;derby;0;graftpm_a;local;app;DEV;true\n" +
        "EPB;derby;0;graftpm_b;local;app;DEV;false\n" +
        "EPX;derby;0;graftpm_x;local;app;PROD;false") // other env: filtered out
    val tables = write(dir, "tables.csv",
      "STAGE_TABLE_NAME;SOURCE_TABLE;SOURCE_SCHEMA;SOURCE_TABLE_TYPE;LOAD_TYPE;COLUMNS;ID_COLUMN;PROCESS_ID;STATUS\n" +
        "alpha;ALPHA;APP;t;full;id, nombre;;77;A")
    val columns = write(dir, "columns.csv",
      "COLUMN_NAME;COLUMN_ID;NEW_DATA_TYPE;TRANSFORMATION;IS_ID;IS_ORDER_BY;TABLE_NAME\n" +
        "id;1;int;fn_transform_Integer(id);t;;alpha\n" +
        "nombre;2;string;fn_transform_ClearString(nombre);;;alpha")

    val stageRoot = dir.resolve("stage").toString
    val report = PipelineMain.run(spark, endpoints, tables, columns,
      processId = "77", rawRoot = dir.resolve("raw").toString,
      stageRoot = stageRoot, environment = Some("dev"))

    // one run per (table, endpoint), suffixed stage names, PROD filtered
    assert(report.runs.map(_.table).sorted === Seq("alpha_epa", "alpha_epb"))
    assert(report.failed.isEmpty, report.failed.map(_.error).mkString("; "))
    val a = spark.read.parquet(s"$stageRoot/alpha_epa").collect()
    val b = spark.read.parquet(s"$stageRoot/alpha_epb").collect()
    assert(a.map(_.getString(1)).toSeq === Seq("graftpm_a"))
    assert(b.map(_.getString(1)).toSeq === Seq("graftpm_b"))
  }

  test("GRAFT_LOAD_MODE parsing: the reference's job-arg lever") {
    import graft.extract.LoadPlanner.LoadMode
    assert(PipelineMain.parseLoadMode(None) === LoadMode.Normal)
    assert(PipelineMain.parseLoadMode(Some("normal")) === LoadMode.Normal)
    assert(PipelineMain.parseLoadMode(Some("INITIAL")) === LoadMode.Initial)
    assert(PipelineMain.parseLoadMode(Some(" reset ")) === LoadMode.Reset)
    assert(PipelineMain.parseLoadMode(Some("REPROCESS")) === LoadMode.Reprocess)
    intercept[IllegalArgumentException] {
      PipelineMain.parseLoadMode(Some("YOLO"))
    }
  }

  test("GRAFT_DATE_PROCESS parsing: the reference's multi-format ladder") {
    val lima = graft.partition.PartitionPathFormatter.Lima
    def d(s: String) = PipelineMain.parseDateProcess(s)
    assert(d("2025-10-17").get.toLocalDate.toString === "2025-10-17")
    assert(d("20251017").get.toLocalDate.toString === "2025-10-17")
    assert(d("2025-10-17 14:30:00").get.getHour === 14)
    assert(d("2025-10-17 14:30").get.getMinute === 30)
    assert(d("2025-10-17T14:30:00").get.getHour === 14)
    // Z = UTC: 14:30Z is 09:30 Lima wall-clock (UTC-5, no DST)
    assert(d("2025-10-17T14:30:00Z").get.getHour === 9)
    assert(d("2025-10-17T14:30:00Z").get.toLocalDate.toString === "2025-10-17")
    assert(d("20251017143000").get.getHour === 14)
    assert(d("2025-10-17").get.getZone === lima)
    // invalid: warn + None (run proceeds on the current date, the
    // reference's "DATE_PROCESS inválido, usando fecha actual")
    assert(d("not-a-date").isEmpty)
  }
}
