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
}
