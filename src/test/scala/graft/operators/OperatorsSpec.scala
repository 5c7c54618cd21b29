package graft.operators

import graft.SparkTestBase
import graft.config.{ColumnMetadata, TableConfig}
import graft.stage.{StageJob, TransformationEngine}
import org.apache.spark.sql.functions._

import java.nio.file.Files

class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-test").toString

  test("W1 keepLatest keeps newest version per key") {
    val df = Seq(
      (1, 10, "old"), (1, 20, "new"),
      (2, 5, "only")).toDF("id", "version", "payload")
    val got = Dedup.keepLatest(df, Seq("id"), Seq("version"))
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(2)))
    assert(got.toSeq === Seq((1, "new"), (2, "only")))
  }

  test("K5 merge: new wins on match, old kept, new inserted") {
    val old = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val batch = Seq((2, "B"), (3, "C")).toDF("id", "v")
    val got = MergeUpsert.merge(old, batch, Seq("id"))
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq === Seq((1, "a"), (2, "B"), (3, "C")))
  }

  test("K5 merge: tables with map columns upsert (hash tie-break map-safe)") {
    // xxhash64 rejects MapType; the deterministic-survivor hash must route
    // map columns through to_json or planning fails on any map-typed table
    val old = Seq((1, Map("k" -> "a")), (2, Map("k" -> "b"))).toDF("id", "m")
    val batch = Seq((2, Map("k" -> "B")), (3, Map("k" -> "C"))).toDF("id", "m")
    val got = MergeUpsert.merge(old, batch, Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getMap[String, String](1)("k")))
    assert(got.toSeq === Seq((1, "a"), (2, "B"), (3, "C")))
    // nested: map inside a struct must also be routed through to_json
    val oldN = Seq((1, ("x", Map("k" -> 1)))).toDF("id", "s")
    val batchN = Seq((1, ("y", Map("k" -> 2))), (2, ("z", Map("k" -> 3))))
      .toDF("id", "s")
    val gotN = MergeUpsert.merge(oldN, batchN, Seq("id"))
      .orderBy("id").collect().map(r => (r.getInt(0), r.getStruct(1).getString(0)))
    assert(gotN.toSeq === Seq((1, "y"), (2, "z")))
  }

  test("merge idempotency: re-applying the same batch is a no-op") {
    val dir = tmpDir() + "/t"
    val b1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    MergeUpsert.upsertParquet(spark, b1, dir, Seq("id"))
    val b2 = Seq((2, "B"), (3, "C")).toDF("id", "v")
    MergeUpsert.upsertParquet(spark, b2, dir, Seq("id"))
    val once = spark.read.parquet(dir).orderBy("id").collect().map(_.toSeq).toSeq
    MergeUpsert.upsertParquet(spark, b2, dir, Seq("id"))
    val twice = spark.read.parquet(dir).orderBy("id").collect().map(_.toSeq).toSeq
    assert(once === twice)
    assert(once.map(_.head) === Seq(1, 2, 3))
  }

  test("watermark store: provisional → confirm lifecycle + reset") {
    val store = new WatermarkStore(spark, tmpDir() + "/wm")
    val k = store.key("proj", "tbl", "col")
    assert(store.get(k) === None)
    store.saveProvisional(k, "100")
    assert(store.get(k) === None) // not confirmed yet
    store.confirm(k)
    assert(store.get(k) === Some("100"))
    store.saveProvisional(k, "150")
    store.confirm(k)
    assert(store.get(k) === Some("150"))
    store.delete(k)
    assert(store.get(k) === None)
  }

  test("watermark store survives concurrent writers (runner threads)") {
    val store = new WatermarkStore(spark, tmpDir() + "/wmc")
    val keys = (1 to 8).map(i => store.key("p", s"t$i", "c"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val work = keys.map { k =>
      Future { store.saveProvisional(k, k.length.toString); store.confirm(k) }
    }
    Await.result(Future.sequence(work), 2.minutes)
    keys.foreach(k => assert(store.get(k) === Some(k.length.toString)))
  }

  test("transformation engine: per-column error containment with typed nulls") {
    val df = Seq(("1", "x")).toDF("a", "b")
    val cols = Seq(
      ColumnMetadata("a_int", 1, "int", "fn_transform_Integer(a)"),
      ColumnMetadata("bad", 2, "int", "fn_transform_Integer(missing_col)"),
      ColumnMetadata("b_str", 3, "string", "fn_transform_ClearString(b)"))
    val res = TransformationEngine.applyTransformations(df, cols)
    assert(res.errors.size === 1)
    assert(res.outcome.isInstanceOf[TransformationEngine.Warning])
    val row = res.df.collect().head
    assert(row.getInt(0) === 1)
    assert(row.isNullAt(1))
    assert(row.getString(2) === "x")
  }

  test("transformation engine: >50% failed columns fails the table") {
    val df = Seq(("1", "x")).toDF("a", "b")
    val cols = Seq(
      ColumnMetadata("ok", 1, "int", "fn_transform_Integer(a)"),
      ColumnMetadata("bad1", 2, "int", "fn_transform_Integer(no1)"),
      ColumnMetadata("bad2", 3, "int", "fn_transform_Bogus(a)"))
    val res = TransformationEngine.applyTransformations(df, cols)
    assert(res.outcome.isInstanceOf[TransformationEngine.Failed])
    assert(res.errors.size === 2)
  }

  test("stage job end-to-end: raw strings → typed, deduped, merged parquet") {
    val root = tmpDir()
    val rawPath = s"$root/raw"
    val stagePath = s"$root/stage"
    // raw convention: all strings, with a duplicate Id (newer FechaActualizacion wins)
    Seq(
      ("1", "  Ana ", "2024-01-01 10:00:00"),
      ("1", "Ana v2", "2024-02-01 10:00:00"),
      ("2", "None", "2024-01-15 09:00:00")
    ).toDF("Id", "Nombre", "FechaActualizacion")
      .write.mode("overwrite").parquet(rawPath)

    val cols = Seq(
      ColumnMetadata("Id", 1, "int", "fn_transform_Integer(Id)", isId = true),
      ColumnMetadata("Nombre", 2, "string", "fn_transform_ClearString(Nombre)"),
      ColumnMetadata("FechaActualizacion", 3, "timestamp",
        "fn_transform_Datetime(FechaActualizacion)", isOrderBy = true))
    val table = TableConfig(stageTableName = "anio", sourceTable = "ANIO",
      loadType = "incremental")

    val res = StageJob.run(spark, table, cols, rawPath, stagePath)
    assert(res.status === StageJob.Success)
    val out = spark.read.parquet(stagePath).orderBy("Id").collect()
    assert(out.length === 2)
    assert(out(0).getInt(0) === 1)
    assert(out(0).getString(1) === "Ana v2") // keep-latest
    assert(out(1).isNullAt(1))               // "None" → null

    // incremental merge of a second batch: update Id=2, insert Id=3
    Seq(
      ("2", "Bob", "2024-03-01 08:00:00"),
      ("3", "Cara", "2024-03-02 08:00:00")
    ).toDF("Id", "Nombre", "FechaActualizacion")
      .write.mode("overwrite").parquet(rawPath)
    val res2 = StageJob.run(spark, table, cols, rawPath, stagePath)
    assert(res2.status === StageJob.Success)
    val out2 = spark.read.parquet(stagePath).orderBy("Id").collect()
    assert(out2.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(out2(1).getString(1) === "Bob")
  }

  test("stage write mode follows the reference's condition: between-date merges, days_off overwrites") {
    // light_transform.py:1554 merges for incremental AND between-date;
    // every other load type (full, days_off) overwrites the stage table
    val cols = Seq(
      ColumnMetadata("Id", 1, "int", "fn_transform_Integer(Id)", isId = true),
      ColumnMetadata("Nombre", 2, "string", "fn_transform_ClearString(Nombre)"))
    def runTwice(loadType: String): Seq[(Int, String)] = {
      val root = tmpDir()
      val table = TableConfig(stageTableName = "t", sourceTable = "T",
        loadType = loadType)
      Seq(("1", "a"), ("2", "b")).toDF("Id", "Nombre")
        .write.mode("overwrite").parquet(s"$root/raw")
      assert(StageJob.run(spark, table, cols, s"$root/raw",
        s"$root/stage").status === StageJob.Success)
      Seq(("2", "B2"), ("3", "c")).toDF("Id", "Nombre")
        .write.mode("overwrite").parquet(s"$root/raw")
      assert(StageJob.run(spark, table, cols, s"$root/raw",
        s"$root/stage").status === StageJob.Success)
      spark.read.parquet(s"$root/stage").orderBy("Id").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq
    }
    // between-date: batch 2 merges into batch 1 (update 2, insert 3)
    assert(runTwice("between-date") === Seq((1, "a"), (2, "B2"), (3, "c")))
    // time_range is the v2 extractor's between-date alias: this engine
    // window-extracts it identically, so it MUST merge — overwriting
    // would silently drop every row outside the current window
    assert(runTwice("time_range") === Seq((1, "a"), (2, "B2"), (3, "c")))
    // days_off: batch 2 REPLACES the table wholesale
    assert(runTwice("days_off") === Seq((2, "B2"), (3, "c")))
  }

  test("K8 empty raw input still materializes a typed empty table") {
    val root = tmpDir()
    val cols = Seq(
      ColumnMetadata("Id", 1, "int", "fn_transform_Integer(Id)", isId = true),
      ColumnMetadata("Nombre", 2, "string", ""))
    val table = TableConfig(stageTableName = "t", sourceTable = "T")
    val res = StageJob.run(spark, table, cols, s"$root/nonexistent", s"$root/stage")
    assert(res.status === StageJob.EmptyInput)
    val out = spark.read.parquet(s"$root/stage")
    assert(out.count() === 0)
    assert(out.schema.map(_.name) === Seq("Id", "Nombre"))
    assert(out.schema("Id").dataType.typeName === "integer")
  }

  test("K8 PARTITIONED empty bootstrap never poisons later partition layout") {
    // an empty partitioned table must not leave a root-level schema file:
    // the first real batch adds col=value/ dirs and a mixed layout breaks
    // partition discovery for every directory reader thereafter. Schema
    // lives in the delta log (the reference's empty Delta table is
    // metadata-only).
    val root = tmpDir()
    val cols = Seq(
      ColumnMetadata("Id", 1, "int", "fn_transform_Integer(Id)", isId = true),
      ColumnMetadata("Pt", 2, "string", "fn_transform_ClearString(Pt)",
        isPartition = true))
    val table = TableConfig(stageTableName = "t", sourceTable = "T",
      loadType = "incremental")
    val res = StageJob.run(spark, table, cols, s"$root/nonexistent", s"$root/stage")
    assert(res.status === StageJob.EmptyInput)
    // typed empty view through the log
    val empty = graft.sources.DeltaLog.read(spark, s"$root/stage")
    assert(empty.count() === 0)
    assert(empty.schema.map(_.name) === Seq("Id", "Pt"))
    val st0 = graft.sources.DeltaLog.replay(spark, s"$root/stage").get
    assert(st0.partitionColumns === Seq("Pt"))
    assert(st0.files.isEmpty, "metadata-only bootstrap: no root data file")
    // first real batch: partition dirs appear, directory reads still work
    Seq(("1", "a"), ("2", "b")).toDF("Id", "Pt")
      .write.mode("overwrite").parquet(s"$root/raw")
    assert(StageJob.run(spark, table, cols, s"$root/raw",
      s"$root/stage").status === StageJob.Success)
    val out = spark.read.parquet(s"$root/stage").orderBy("Id").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2))
    assert(graft.sources.DeltaLog.read(spark, s"$root/stage").count() === 2L)
  }

  test("miscased LOAD_TYPE still merges (effectiveLoadType lowercases)") {
    // reference parity (extract_data_spark.py:695 .strip().lower()): a
    // spreadsheet-cased 'Incremental' must not route to OVERWRITE and
    // destroy the accumulated table
    val root = tmpDir()
    val cols = Seq(
      ColumnMetadata("Id", 1, "int", "fn_transform_Integer(Id)", isId = true),
      ColumnMetadata("Nombre", 2, "string", "fn_transform_ClearString(Nombre)"))
    val table = TableConfig(stageTableName = "t", sourceTable = "T",
      loadType = " Incremental ")
    assert(table.effectiveLoadType === "incremental")
    Seq(("1", "a"), ("2", "b")).toDF("Id", "Nombre")
      .write.mode("overwrite").parquet(s"$root/raw")
    assert(StageJob.run(spark, table, cols, s"$root/raw",
      s"$root/stage").status === StageJob.Success)
    Seq(("3", "c")).toDF("Id", "Nombre")
      .write.mode("overwrite").parquet(s"$root/raw")
    assert(StageJob.run(spark, table, cols, s"$root/raw",
      s"$root/stage").status === StageJob.Success)
    assert(spark.read.parquet(s"$root/stage").count() === 3L,
      "merge, not overwrite: rows 1 and 2 survive")
  }

  test("transformation engine: analysis-time failure stays contained per column") {
    // a raw column literally named "a.b" compiles (name is in dfColumns)
    // but ANALYZES as struct access on a missing column — that must
    // convert to a typed NULL + tally, never fail the whole table
    val df = Seq(("1", "x")).toDF("a.b", "ok")
    val cols = Seq(
      ColumnMetadata("v", 1, "int", "fn_transform_Integer(a.b)"),
      ColumnMetadata("w", 2, "string", "fn_transform_ClearString(ok)"),
      ColumnMetadata("u", 3, "string", "fn_transform_ClearString(ok)"))
    val res = TransformationEngine.applyTransformations(df, cols)
    assert(res.errors.size === 1)
    val row = res.df.collect().head
    assert(row.isNullAt(0))
    assert(row.getString(1) === "x")
  }

  test("raw dir that exists but holds no parquet takes the K8 empty path") {
    val root = tmpDir()
    // dir with only a non-data file: extract died mid-write
    val raw = new java.io.File(s"$root/raw"); raw.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/raw/_temporary"), Array[Byte]())
    val cols = Seq(
      ColumnMetadata("Id", 1, "int", "fn_transform_Integer(Id)", isId = true))
    val table = TableConfig(stageTableName = "t", sourceTable = "T")
    val res = StageJob.run(spark, table, cols, s"$root/raw", s"$root/stage")
    assert(res.status === StageJob.EmptyInput)
    assert(spark.read.parquet(s"$root/stage").count() === 0L)
  }

  test("stage rowsWritten reports the deduped batch on the merge path") {
    val root = tmpDir()
    val cols = Seq(
      ColumnMetadata("Id", 1, "int", "fn_transform_Integer(Id)", isId = true),
      ColumnMetadata("Nombre", 2, "string", "fn_transform_ClearString(Nombre)"))
    val table = TableConfig(stageTableName = "t", sourceTable = "T",
      loadType = "incremental")
    // 3 raw rows, one full-row duplicate pair → 2 rows actually land
    Seq(("1", "a"), ("1", "a"), ("2", "b")).toDF("Id", "Nombre")
      .write.mode("overwrite").parquet(s"$root/raw")
    val res = StageJob.run(spark, table, cols, s"$root/raw", s"$root/stage")
    assert(res.status === StageJob.Success)
    assert(res.rowsWritten === 2L)
  }

  test("partition path formatter tokens + reverse parse") {
    import graft.partition.PartitionPathFormatter
    val ts = java.time.ZonedDateTime.of(2025, 10, 17, 14, 30, 45, 0,
      PartitionPathFormatter.Lima)
    val f = new PartitionPathFormatter("year={YYYY}/month={MM}/day={DD}/hour={HH}")
    assert(f.formatPath(ts) === "year=2025/month=10/day=17/hour=14")
    val q = new PartitionPathFormatter("q={QUARTER}/y={YY}")
    assert(q.formatPath(ts) === "q=Q4/y=25")
    assert(PartitionPathFormatter.extractPartitionValues("a/year=2025/month=10/b") ===
      Map("year" -> "2025", "month" -> "10"))
    assertThrows[IllegalArgumentException](new PartitionPathFormatter("x={BOGUS}"))
  }
}
