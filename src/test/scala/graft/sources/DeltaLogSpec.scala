package graft.sources

import graft.SparkTestBase
import graft.operators.{Maintenance, MergeUpsert}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.file.Files

/** The from-scratch Delta `_delta_log`: frozen log-layout goldens (the
  * sandbox has no Delta jars, so protocol conformance is asserted
  * against the public spec's shapes), replay/read parity with the data
  * actually on disk, version continuity across every write path, and
  * the refusal contracts.
  */
class DeltaLogSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-delta").toString + "/t"

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def logFiles(path: String): Seq[String] =
    new java.io.File(path, DeltaLog.LogDirName).listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq

  test("upsert creates a v0 log; the layout matches the Delta spec") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a"), (2, "b")).toDF("id", "v"), dir, Seq("id"))
    assert(logFiles(dir) === Seq("00000000000000000000.json"))
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, DeltaLog.LogDirName,
        "00000000000000000000.json")), "UTF-8")
      .split("\n").filter(_.nonEmpty)
    val actions = lines.map(graft.llmops.Json.parseObject)
    assert(actions.forall(_ != null), "every action line parses as JSON")
    val byKind = actions.groupBy(_.keys.head)
    // exactly one protocol and one metaData on the first commit
    assert(byKind("protocol").length === 1)
    assert(byKind("metaData").length === 1)
    assert(byKind.contains("add"))
    assert(!byKind.contains("remove"), "first commit removes nothing")
    val proto = byKind("protocol").head("protocol").asInstanceOf[Map[String, Any]]
    assert(proto("minReaderVersion") === 1L)
    assert(proto("minWriterVersion") === 2L)
    val md = byKind("metaData").head("metaData").asInstanceOf[Map[String, Any]]
    assert(md("format").asInstanceOf[Map[String, Any]]("provider") === "parquet")
    // schemaString is a parseable Spark StructType covering the columns
    val sch = DataType.fromJson(md("schemaString").toString).asInstanceOf[StructType]
    assert(sch.fieldNames.toSet === Set("id", "v"))
    val add = byKind("add").head("add").asInstanceOf[Map[String, Any]]
    assert(add.keySet === Set("path", "partitionValues", "size",
      "modificationTime", "dataChange"))
    assert(add("dataChange") === true)
    // the logged file exists with the logged size
    val f = new java.io.File(dir, add("path").toString)
    assert(f.isFile && f.length() === add("size"))
  }

  test("merge appends remove+add commits; read() matches the parquet table") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a"), (2, "b")).toDF("id", "v"), dir, Seq("id"))
    MergeUpsert.upsertParquet(spark,
      Seq((2, "B"), (3, "C")).toDF("id", "v"), dir, Seq("id"))
    assert(logFiles(dir) === Seq(
      "00000000000000000000.json", "00000000000000000001.json"))
    val v1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, DeltaLog.LogDirName,
        "00000000000000000001.json")), "UTF-8")
    assert(v1.contains("\"remove\""), "the whole-swap replaced the old file")
    assert(v1.contains("\"add\""))
    val got = DeltaLog.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq === Seq((1, "a"), (2, "B"), (3, "C")))
    // parity with the plain parquet view of the same table
    val plain = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq === plain.toSeq)
  }

  test("partitioned upsert logs partitionValues and only touched dirs") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a", "p1"), (2, "b", "p2")).toDF("id", "v", "part"),
      dir, Seq("id"), partitionCols = Seq("part"))
    val st0 = DeltaLog.replay(spark, dir).get
    assert(st0.partitionColumns === Seq("part"))
    assert(st0.files.values.map(_.partitionValues("part")).toSet ===
      Set("p1", "p2"))
    assert(st0.files.keys.forall(_.startsWith("part=")))
    // second batch touches only p2: p1's add entries must be untouched
    val p1Files = st0.files.keys.filter(_.startsWith("part=p1")).toSet
    MergeUpsert.upsertParquet(spark,
      Seq((2, "B", "p2"), (4, "d", "p2")).toDF("id", "v", "part"),
      dir, Seq("id"), partitionCols = Seq("part"))
    val st1 = DeltaLog.replay(spark, dir).get
    assert(st1.version === 1L)
    assert(st1.files.keys.filter(_.startsWith("part=p1")).toSet === p1Files,
      "untouched partition's log entries survive verbatim")
    val got = DeltaLog.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (1, "a", "p1"), (2, "B", "p2"), (4, "d", "p2")))
  }

  test("read() serves exactly the logged files — stray files are invisible") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    // an in-flight/stray parquet dropped next to the data
    Seq((99, "zz")).toDF("id", "v").coalesce(1)
      .write.parquet(dir + "_stray")
    val stray = new java.io.File(dir + "_stray").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(stray.toPath,
      java.nio.file.Paths.get(dir, "stray-not-committed.parquet"))
    assert(spark.read.parquet(dir).count() === 2L, "plain read sees both")
    assert(DeltaLog.read(spark, dir).count() === 1L, "delta read sees the log")
  }

  test("checkpoint every 10 commits + _last_checkpoint; replay unaffected") {
    val dir = tmp()
    (0 until 12).foreach { i =>
      MergeUpsert.upsertParquet(spark,
        Seq((i, s"v$i")).toDF("id", "v"), dir, Seq("id"))
    }
    val names = logFiles(dir)
    assert(names.contains("00000000000000000010.checkpoint.parquet"))
    assert(names.contains("_last_checkpoint"))
    val lc = graft.llmops.Json.parseObject(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        dir, DeltaLog.LogDirName, "_last_checkpoint")), "UTF-8"))
    assert(lc("version") === 10L)
    val st = DeltaLog.replay(spark, dir).get
    assert(st.version === 11L)
    val got = DeltaLog.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq === (0 until 12).map(i => (i, s"v$i")))
    // checkpoint alone (json tail removed up to it) still replays: the
    // spec's log-cleanup posture — history before a checkpoint may go
    (0 to 10).foreach { v =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        dir, DeltaLog.LogDirName, f"$v%020d.json"))
    }
    val st2 = DeltaLog.replay(spark, dir).get
    assert(st2.version === 11L)
    assert(DeltaLog.read(spark, dir).count() === 12L)
  }

  test("OPTIMIZE (compact) logs remove+add with dataChange=false") {
    val dir = tmp()
    (0 until 3).foreach { i =>
      MergeUpsert.upsertParquet(spark,
        Seq((i, s"v$i")).toDF("id", "v"), dir, Seq("id"))
    }
    val before = DeltaLog.replay(spark, dir).get
    Maintenance.compact(spark, dir, targetFileMB = 128)
    val after = DeltaLog.replay(spark, dir).get
    assert(after.version === before.version + 1)
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, DeltaLog.LogDirName,
        f"${after.version}%020d.json")), "UTF-8")
    assert(body.contains("\"operation\":\"OPTIMIZE\""))
    assert(body.contains("\"dataChange\":false"))
    assert(!body.contains("\"dataChange\":true"))
    val got = DeltaLog.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq === Seq((0, "v0"), (1, "v1"), (2, "v2")))
  }

  test("zorder rewrite keeps log continuity through Overwrite") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      (0 until 100).map(i => (i, i % 7)).toDF("a", "b"), dir, Seq("a"))
    val v0 = DeltaLog.replay(spark, dir).get.version
    // same logical rows, materialized (Spark refuses overwriting a path
    // that the written plan is also reading from)
    Maintenance.zorderWrite(spark,
      (0 until 100).map(i => (i, i % 7)).toDF("a", "b"), dir, "a", "b")
    val st = DeltaLog.replay(spark, dir).get
    assert(st.version === v0 + 1, "version numbering survives the Overwrite")
    assert(DeltaLog.read(spark, dir).count() === 100L)
    // the destroyed log restarted from a checkpoint carrying the history
    assert(logFiles(dir).exists(_.endsWith(".checkpoint.parquet")))
  }

  test("replay refuses gaps and future reader versions; heals when rebuilt") {
    val dir = tmp()
    (0 until 3).foreach { i =>
      MergeUpsert.upsertParquet(spark,
        Seq((i, s"v$i")).toDF("id", "v"), dir, Seq("id"))
    }
    // gap: remove the middle commit
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      dir, DeltaLog.LogDirName, "00000000000000000001.json"))
    val e = intercept[IllegalArgumentException] { DeltaLog.replay(spark, dir) }
    assert(e.getMessage.contains("gap"))
    // a lost log is rebuilt from scratch by the next writer's reconcile
    fs.delete(new Path(dir, DeltaLog.LogDirName), true)
    MergeUpsert.upsertParquet(spark,
      Seq((9, "v9")).toDF("id", "v"), dir, Seq("id"))
    val st = DeltaLog.replay(spark, dir).get
    assert(st.version === 0L, "fresh history after log loss")
    assert(DeltaLog.read(spark, dir).count() === 4L)
    // future reader version refuses
    val dir2 = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a")).toDF("id", "v"), dir2, Seq("id"))
    val p0 = java.nio.file.Paths.get(
      dir2, DeltaLog.LogDirName, "00000000000000000000.json")
    val swapped = new String(java.nio.file.Files.readAllBytes(p0), "UTF-8")
      .replace("\"minReaderVersion\":1", "\"minReaderVersion\":7")
    java.nio.file.Files.write(p0, swapped.getBytes("UTF-8"))
    // the out-of-band edit invalidates LocalFileSystem's checksum sidecar
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      dir2, DeltaLog.LogDirName, ".00000000000000000000.json.crc"))
    val e2 = intercept[IllegalArgumentException] { DeltaLog.replay(spark, dir2) }
    assert(e2.getMessage.contains("reader version 7"))
  }

  test("schema evolution surfaces in metaData; narrow batch does not regress it") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    MergeUpsert.upsertParquet(spark,
      Seq((2, "b", 5.0)).toDF("id", "v", "extra"), dir, Seq("id"))
    val widened = DeltaLog.replay(spark, dir).get
    val sch = DataType.fromJson(widened.schemaString).asInstanceOf[StructType]
    assert(sch.fieldNames.toSet === Set("id", "v", "extra"))
    // a later narrow batch must not drop `extra` from the logged schema
    MergeUpsert.upsertParquet(spark,
      Seq((3, "c")).toDF("id", "v"), dir, Seq("id"))
    val after = DeltaLog.replay(spark, dir).get
    val sch2 = DataType.fromJson(after.schemaString).asInstanceOf[StructType]
    assert(sch2.fieldNames.toSet === Set("id", "v", "extra"))
    val got = DeltaLog.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1),
        Option(r.get(2)).map(_.toString).orNull))
    assert(got.toSeq === Seq(
      (1, "a", null), (2, "b", "5.0"), (3, "c", null)))
  }

  test("underscore-named partition columns stay visible to the log") {
    // Spark's partition discovery exempts `_x=y` dirs from the
    // hidden-file rule; the log's listing must apply the same exemption
    // or a `_date=...` layout silently logs zero files
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a", "d1"), (2, "b", "d2")).toDF("id", "v", "_d"),
      dir, Seq("id"), partitionCols = Seq("_d"))
    val st = DeltaLog.replay(spark, dir).get
    assert(st.files.nonEmpty, "files under _d=... dirs must be logged")
    assert(st.files.values.map(_.partitionValues("_d")).toSet === Set("d1", "d2"))
    assert(DeltaLog.read(spark, dir).count() === 2L)
  }

  test("recovery restores _delta_log from __old even when the swap already landed") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a"), (2, "b")).toDF("id", "v"), dir, Seq("id"))
    MergeUpsert.upsertParquet(spark,
      Seq((3, "c")).toDF("id", "v"), dir, Seq("id"))
    val before = DeltaLog.replay(spark, dir).get
    // simulate a crash BETWEEN wholeSwap's rename(staging→table) and its
    // restoreDeltaLog: the log sits in __old, the marker is live, and the
    // staging dir is gone (already renamed into place)
    val f = fs
    f.mkdirs(new Path(dir + "__old"))
    f.rename(new Path(dir, DeltaLog.LogDirName),
      new Path(dir + "__old", DeltaLog.LogDirName))
    val marker = f.create(new Path(dir + "__commit"), true)
    marker.write("t__staging.deadtoken\nwhole\n".getBytes("UTF-8"))
    marker.close()
    assert(Maintenance.recover(spark, dir), "recovery must act on the marker")
    val after = DeltaLog.replay(spark, dir)
    assert(after.isDefined, "log history must survive the recovery")
    assert(after.get.version === before.version,
      "recovered log carries the full pre-crash history")
    assert(!f.exists(new Path(dir + "__old")))
    assert(!f.exists(new Path(dir + "__commit")))
  }

  test("time travel: VERSION AS OF re-serves old data while its files survive") {
    val dir = tmp()
    // append-shaped sequence: the second batch touches only NEW
    // partition values, so v0's files are never replaced and v0 remains
    // fully readable
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a", "p1"), (2, "b", "p1")).toDF("id", "v", "part"),
      dir, Seq("id"), partitionCols = Seq("part"))
    MergeUpsert.upsertParquet(spark,
      Seq((3, "c", "p2")).toDF("id", "v", "part"),
      dir, Seq("id"), partitionCols = Seq("part"))
    val v0 = DeltaLog.read(spark, dir, 0L).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(v0.toSeq === Seq((1, "a"), (2, "b")), "v0 = the first commit only")
    val head = DeltaLog.read(spark, dir, 1L).orderBy("id")
      .collect().map(_.getInt(0))
    assert(head.toSeq === Seq(1, 2, 3))
    // refusals: beyond head, and before reconstructable history
    val e = intercept[IllegalArgumentException] { DeltaLog.read(spark, dir, 9L) }
    assert(e.getMessage.contains("does not exist"))
    // clean history up to a checkpoint, then ask for a pre-checkpoint version
    (0 until 11).foreach { i =>
      MergeUpsert.upsertParquet(spark,
        Seq((100 + i, "x", "p3")).toDF("id", "v", "part"),
        dir, Seq("id"), partitionCols = Seq("part"))
    }
    (0 to 9).foreach { v =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        dir, DeltaLog.LogDirName, f"$v%020d.json"))
    }
    val e2 = intercept[IllegalArgumentException] { DeltaLog.read(spark, dir, 3L) }
    assert(e2.getMessage.contains("predates"),
      s"cleaned history must refuse, got: ${e2.getMessage}")
    // versions at/after the checkpoint still replay (metadata; their
    // DATA files were replaced by later merges into the same partition,
    // which read() refuses with PATH_NOT_FOUND rather than wrong rows)
    assert(DeltaLog.replay(spark, dir, 10L).get.version === 10L)
    assert(DeltaLog.read(spark, dir).count() >= 3L)
  }

  test("history(): one row per commit with operation and file-count deltas") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    // v1: the local Seq DF is non-nullable; the merge unions with the
    // read-back parquet schema (nullable) — a REAL schema evolution the
    // log must record
    MergeUpsert.upsertParquet(spark,
      Seq((2, "b")).toDF("id", "v"), dir, Seq("id"))
    // v2: schemas now agree (both read-back-shaped) — no metaData
    MergeUpsert.upsertParquet(spark,
      spark.read.parquet(dir).limit(0)
        .unionByName(Seq((3, "c")).toDF("id", "v")), dir, Seq("id"))
    Maintenance.compact(spark, dir)
    val h = DeltaLog.history(spark, dir).orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(h.map(_.getString(2)).toSeq ===
      Seq("WRITE", "MERGE", "MERGE", "OPTIMIZE"))
    assert(h(0).getBoolean(5), "v0 carries the initial metaData")
    assert(h(1).getBoolean(5), "nullability widening IS a schema change")
    assert(!h(2).getBoolean(5), "same-schema merge carries no metaData")
    assert(h(1).getLong(4) > 0, "the whole-swap merge removed files")
    assert(h(3).getBoolean(6) === false, "OPTIMIZE is dataChange=false")
    assert(h(0).getBoolean(6) && h(1).getBoolean(6) && h(2).getBoolean(6))
    assert(h.forall(r => !r.isNullAt(1)), "commit timestamps present")
  }

  test("multi-part checkpoints: write past the part threshold, replay exact") {
    val dir = tmp()
    // force tiny parts (floor is 3 rows/part) so a 12-partition table's
    // checkpoint must split into the protocol's multi-part form
    spark.conf.set(DeltaLog.CheckpointPartSizeConf, "3")
    try {
      (0 until 11).foreach { i =>
        MergeUpsert.upsertParquet(spark,
          Seq((i, s"v$i", s"p$i")).toDF("id", "v", "part"),
          dir, Seq("id"), partitionCols = Seq("part"))
      }
      val names = logFiles(dir)
      val parts = names.filter(_.matches(
        """00000000000000000010\.checkpoint\.\d{10}\.\d{10}\.parquet"""))
      assert(parts.nonEmpty, s"expected multi-part checkpoint, got: $names")
      assert(!names.contains("00000000000000000010.checkpoint.parquet"))
      val declared = parts.head.split("\\.")(3).toInt
      assert(parts.length === declared, "all declared parts written")
      val lc = graft.llmops.Json.parseObject(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          dir, DeltaLog.LogDirName, "_last_checkpoint")), "UTF-8"))
      assert(lc("parts") === declared.toLong)
      // replay from the multi-part checkpoint alone (pre-checkpoint
      // history cleaned) reconstructs the exact state
      (0 to 9).foreach { v =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
          dir, DeltaLog.LogDirName, f"$v%020d.json"))
      }
      val st = DeltaLog.replay(spark, dir).get
      assert(st.version === 10L)
      assert(st.files.size === 11)
      val got = DeltaLog.read(spark, dir).orderBy("id")
        .collect().map(r => (r.getInt(0), r.getString(1)))
      assert(got.toSeq === (0 until 11).map(i => (i, s"v$i")))
      // a TORN multi-part set (one part missing) must never be replayed:
      // with the pre-checkpoint commits cleaned there is no valid base
      java.nio.file.Files.delete(java.nio.file.Paths.get(
        dir, DeltaLog.LogDirName, parts.head))
      val e = intercept[IllegalArgumentException] { DeltaLog.replay(spark, dir) }
      assert(e.getMessage.contains("incomplete history"),
        s"torn checkpoint must refuse, got: ${e.getMessage}")
    } finally spark.conf.unset(DeltaLog.CheckpointPartSizeConf)
  }

  test("history() covers only RETAINED commit JSONs (log-retention posture)") {
    // DESCRIBE HISTORY reads the commit files; once pre-checkpoint JSONs
    // are cleaned (the protocol allows it), history shortens to the
    // retained tail — pinned here as the documented contract.
    // cleanExpiredLogs (run at every checkpoint) governs WHEN cleaning
    // happens — delta.logRetentionDuration, 30 days default, so nothing
    // auto-deletes in this test; the manual delete below simulates expiry
    val dir = tmp()
    (0 until 12).foreach { i =>
      MergeUpsert.upsertParquet(spark,
        Seq((i, s"v$i")).toDF("id", "v"), dir, Seq("id"))
    }
    assert(DeltaLog.history(spark, dir).count() === 12L)
    (0 to 9).foreach { v =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        dir, DeltaLog.LogDirName, f"$v%020d.json"))
    }
    val h = DeltaLog.history(spark, dir).orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(10L, 11L),
      "history = the retained commits only")
    // replay/read are unaffected (checkpoint carries the state)
    assert(DeltaLog.read(spark, dir).count() === 12L)
  }

  test("path percent-codec round-trips special characters") {
    for (s <- Seq("part-0001.parquet", "a=1/part x.parquet",
        "k=spa ce/π≈3.parquet", "p=%25already/f.parquet",
        "p=__HIVE_DEFAULT_PARTITION__/f.parquet")) {
      assert(DeltaLog.decodePath(DeltaLog.encodePath(s)) === s, s)
    }
    assert(DeltaLog.encodePath("a b") === "a%20b")
    assert(DeltaLog.encodePath("part=x/f.parquet") === "part=x/f.parquet",
      "unreserved chars and = stay literal")
  }

  test("interval parsing: Delta's duration-property syntax, refusals") {
    assert(DeltaLog.parseIntervalMs("interval 168 hours") ===
      168L * 3600 * 1000)
    assert(DeltaLog.parseIntervalMs("interval 30 days") ===
      30L * 24 * 3600 * 1000)
    assert(DeltaLog.parseIntervalMs("INTERVAL 1 week") ===
      7L * 24 * 3600 * 1000)
    assert(DeltaLog.parseIntervalMs("interval 90 seconds") === 90000L)
    assert(DeltaLog.parseIntervalMs("interval 5 minute") === 300000L)
    assert(DeltaLog.parseIntervalMs("interval 250 milliseconds") === 250L)
    assert(DeltaLog.parseIntervalMs("interval 0 hours") === 0L)
    for (bad <- Seq("168 hours", "interval hours", "interval 7 fortnights",
        "interval -1 days", "", "interval 99999999999999 weeks"))
      intercept[IllegalArgumentException] { DeltaLog.parseIntervalMs(bad) }
  }

  test("table properties: SET TBLPROPERTIES commits metaData; " +
      "retention resolves property > conf > default") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    assert(DeltaLog.replay(spark, dir).get.configuration === Map.empty)
    val v = DeltaLog.setTableProperties(spark, dir, Map(
      DeltaLog.TombstoneRetentionProp -> "interval 7 days",
      DeltaLog.LogRetentionProp -> "interval 30 days"))
    assert(v === 1L)
    val st = DeltaLog.replay(spark, dir).get
    assert(st.configuration === Map(
      DeltaLog.TombstoneRetentionProp -> "interval 7 days",
      DeltaLog.LogRetentionProp -> "interval 30 days"))
    // idempotent: unchanged props commit nothing
    assert(DeltaLog.setTableProperties(spark, dir, Map(
      DeltaLog.LogRetentionProp -> "interval 30 days")) === 1L)
    // null unsets
    assert(DeltaLog.setTableProperties(spark, dir, Map(
      DeltaLog.LogRetentionProp -> null)) === 2L)
    assert(DeltaLog.replay(spark, dir).get.configuration ===
      Map(DeltaLog.TombstoneRetentionProp -> "interval 7 days"))
    // configuration survives further writes (metaData rides unchanged)
    MergeUpsert.upsertParquet(spark,
      Seq((2, "b")).toDF("id", "v"), dir, Seq("id"))
    assert(DeltaLog.replay(spark, dir).get.configuration ===
      Map(DeltaLog.TombstoneRetentionProp -> "interval 7 days"))
    // resolution precedence: table property wins over the session conf
    spark.conf.set(DeltaLog.TombstoneRetentionConf, "1")
    try {
      assert(DeltaLog.tombstoneRetentionMs(spark,
        Map(DeltaLog.TombstoneRetentionProp -> "interval 7 days")) ===
        7L * 24 * 3600 * 1000)
      assert(DeltaLog.tombstoneRetentionMs(spark, Map.empty) === 3600000L)
    } finally spark.conf.unset(DeltaLog.TombstoneRetentionConf)
    assert(DeltaLog.tombstoneRetentionMs(spark, Map.empty) ===
      (DeltaLog.DefaultTombstoneRetentionHours * 3600 * 1000).toLong)
    // and configuration survives a checkpoint round-trip
    (0 until 10).foreach { i =>
      MergeUpsert.upsertParquet(spark,
        Seq((10 + i, "x")).toDF("id", "v"), dir, Seq("id"))
    }
    val names = new java.io.File(dir, DeltaLog.LogDirName).listFiles()
      .map(_.getName).filter(_.endsWith(".checkpoint.parquet"))
    assert(names.nonEmpty, "a checkpoint landed")
    val cpV = names.map(_.take(20).toLong).max
    assert(DeltaLog.replay(spark, dir, cpV).get.configuration ===
      Map(DeltaLog.TombstoneRetentionProp -> "interval 7 days"))
  }

  test("log retention: checkpoint-time cleanup bounds _delta_log; " +
      "replay and head reads survive") {
    val dir = tmp()
    (0 until 12).foreach { i =>
      MergeUpsert.upsertParquet(spark,
        Seq((i, s"v$i")).toDF("id", "v"), dir, Seq("id"))
    }
    // default 30-day retention: the automatic v10 checkpoint cleaned nothing
    assert(logFiles(dir).count(_.endsWith(".json")) === 12)
    DeltaLog.setTableProperties(spark, dir,
      Map(DeltaLog.LogRetentionProp -> "interval 0 hours")) // v12
    val cpV = DeltaLog.checkpoint(spark, dir)
    assert(cpV === 12L)
    // boundary = the fresh v12 checkpoint (everything expired at 0h):
    // all pre-boundary JSONs and checkpoints are gone
    val jsons = logFiles(dir).filter(_.endsWith(".json"))
    assert(jsons === Seq(f"$cpV%020d.json"))
    assert(!logFiles(dir).contains("00000000000000000010.checkpoint.parquet"),
      "the superseded v10 checkpoint is cleaned too")
    // the table is intact: replay from the boundary checkpoint
    assert(DeltaLog.read(spark, dir).count() === 12L)
    assert(DeltaLog.history(spark, dir).count() === 1L,
      "history covers only the retained tail")
    // pre-boundary versions refuse (history cleaned), never misread
    val e = intercept[IllegalArgumentException] { DeltaLog.replay(spark, dir, 5L) }
    assert(e.getMessage.contains("predates"))
    // and the table keeps working past the cleanup
    MergeUpsert.upsertParquet(spark,
      Seq((99, "z")).toDF("id", "v"), dir, Seq("id"))
    assert(DeltaLog.read(spark, dir).count() === 13L)
  }

  test("changes(): insert/delete rows from the file-level delta; " +
      "unchanged rewrites cancel; bad ranges refuse") {
    val dir = tmp()
    val init = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
      .withColumn("p", col("id") % 2)
    MergeUpsert.upsertParquet(spark, init, dir, Seq("id"), Seq("p"),
      retain = true) // WRITE + the retention-property pin
    val v0 = DeltaLog.replay(spark, dir).get.version
    // touches partition 1 only: updates id=1, inserts id=5
    val batch = Seq((1, "A"), (5, "e")).toDF("id", "v")
      .withColumn("p", col("id") % 2)
    MergeUpsert.upsertParquet(spark, batch, dir, Seq("id"), Seq("p"))
    val v1 = DeltaLog.replay(spark, dir).get.version
    val ch = DeltaLog.changes(spark, dir, v0, v1)
      .select("_change_type", "id", "v")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
    // id=3 lives in the touched partition but is unchanged -> cancels;
    // id=2 lives in the untouched partition -> its files never read
    assert(ch === Set(("insert", 1, "A"), ("insert", 5, "e"),
      ("delete", 1, "a")))
    // a dataChange=false OPTIMIZE rewrite produces an EMPTY change set
    val vBefore = DeltaLog.replay(spark, dir).get.version
    Maintenance.compact(spark, dir)
    val vAfter = DeltaLog.replay(spark, dir).get.version
    assert(vAfter > vBefore)
    assert(DeltaLog.changes(spark, dir, vBefore, vAfter).count() === 0L)
    // full-range CDF (v0 -> head) equals head rows as inserts plus
    // nothing deleted... minus nothing: v0's own files are the base
    val full = DeltaLog.changes(spark, dir, 0L)
    assert(full.filter(col("_change_type") === "insert").count() === 2L)
    // refusals
    intercept[IllegalArgumentException] {
      DeltaLog.changes(spark, dir, 3L, 1L)
    }
    intercept[IllegalArgumentException] {
      DeltaLog.changes(spark, dir, -1L)
    }
  }

  test("replayScoped/readPartitions: partition-pruned state from a " +
      "checkpointed log matches the full read's slice") {
    val dir = tmp()
    // enough commits to land an automatic checkpoint, partitioned by p;
    // retention from v0 (pinned property) so time travel serves data
    var vAfter5 = -1L
    (0 until 12).foreach { i =>
      MergeUpsert.upsertParquet(spark,
        Seq((i, s"v$i")).toDF("id", "v").withColumn("p", col("id") % 3),
        dir, Seq("id"), Seq("p"), retain = i == 0)
      if (i == 5) vAfter5 = DeltaLog.replay(spark, dir).get.version
    }
    assert(new java.io.File(dir, DeltaLog.LogDirName).listFiles()
      .exists(_.getName.endsWith(".checkpoint.parquet")), "checkpoint landed")
    val full = DeltaLog.replay(spark, dir).get
    val scoped = DeltaLog.replayScoped(spark, dir, Map("p" -> "1")).get
    assert(scoped.version === full.version)
    assert(scoped.schemaString === full.schemaString)
    assert(scoped.configuration === full.configuration)
    // scoped file map = exactly the full map's p=1 slice
    assert(scoped.files.keySet ===
      full.files.filter(_._2.partitionValues.get("p").contains("1")).keySet)
    assert(scoped.files.nonEmpty && scoped.files.size < full.files.size)
    // the pruned read returns exactly the partition's rows
    val rows = DeltaLog.readPartitions(spark, dir, Map("p" -> "1"))
      .select("id", "v").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows === (0 until 12).filter(_ % 3 == 1)
      .map(i => (i, s"v$i")).toSet)
    // an absent partition value reads empty, never throws
    assert(DeltaLog.readPartitions(spark, dir, Map("p" -> "9"))
      .count() === 0L)
    // time travel composes with the scope (retained files serve data)
    val atV5 = DeltaLog.readPartitions(spark, dir, Map("p" -> "1"), vAfter5)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(atV5 === (0 to 5).filter(_ % 3 == 1).toSet)
  }

  test("detail(): one-row DESCRIBE DETAIL off a single replay") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a", 0), (2, "b", 1)).toDF("id", "v", "p")
        .withColumn("p", col("p")), dir, Seq("id"), Seq("p"),
      retain = true)
    MergeUpsert.upsertParquet(spark,
      Seq((1, "A", 0)).toDF("id", "v", "p"), dir, Seq("id"), Seq("p"))
    val d = DeltaLog.detail(spark, dir).head()
    assert(d.getAs[String]("location") === dir)
    assert(d.getAs[Long]("version") ===
      DeltaLog.replay(spark, dir).get.version)
    assert(d.getAs[Long]("num_files") >= 2L)
    assert(d.getAs[Long]("size_in_bytes") > 0L)
    assert(d.getAs[Seq[String]]("partition_columns") === Seq("p"))
    assert(d.getAs[Map[String, String]]("configuration")
      .get(MergeUpsert.RetainProp).contains("true"))
    assert(d.getAs[Long]("num_tombstones") >= 1L)
    intercept[IllegalArgumentException] {
      DeltaLog.detail(spark, tmp())
    }
  }

  test("changesPerVersion attributes each row to its commit; " +
      "vacuumDryRun lists without deleting") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a")).toDF("id", "v"), dir, Seq("id"), retain = true)
    val v0 = DeltaLog.replay(spark, dir).get.version
    MergeUpsert.upsertParquet(spark,
      Seq((1, "b")).toDF("id", "v"), dir, Seq("id"))
    val v1 = DeltaLog.replay(spark, dir).get.version
    MergeUpsert.upsertParquet(spark,
      Seq((1, "c")).toDF("id", "v"), dir, Seq("id"))
    val v2 = DeltaLog.replay(spark, dir).get.version
    // the collapsed range cancels the intermediate hop...
    val collapsed = DeltaLog.changes(spark, dir, v0, v2)
      .select("_change_type", "v").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(collapsed === Set(("insert", "c"), ("delete", "a")))
    // ...per-version attribution keeps it, tagged with its commit
    val per = DeltaLog.changesPerVersion(spark, dir, v0, v2)
      .select("_commit_version", "_change_type", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(per === Set(
      (v1, "insert", "b"), (v1, "delete", "a"),
      (v2, "insert", "c"), (v2, "delete", "b")))
    // empty range: zero rows, schema intact
    assert(DeltaLog.changesPerVersion(spark, dir, v2, v2).count() === 0L)
    // dry run lists the expired tombstones and deletes NOTHING
    val wouldDelete = Maintenance.vacuumDryRun(spark, dir,
      retentionHours = 0.0)
    assert(wouldDelete.nonEmpty)
    wouldDelete.foreach(rel => assert(
      new java.io.File(dir, rel).exists(), s"dry run must not delete $rel"))
    assert(DeltaLog.read(spark, dir, v0).count() === 1L,
      "history still travelable after the dry run")
    // the real vacuum deletes exactly the dry run's set
    assert(Maintenance.vacuum(spark, dir, retentionHours = 0.0) ===
      wouldDelete.length.toLong)
  }

  test("restore: head returns to the target's file set; history and " +
      "later versions survive; vacuumed targets refuse") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a"), (2, "b")).toDF("id", "v"), dir, Seq("id"),
      retain = true)
    val v0 = DeltaLog.replay(spark, dir).get.version
    MergeUpsert.upsertParquet(spark,
      Seq((1, "A"), (3, "c")).toDF("id", "v"), dir, Seq("id"))
    val vMerged = DeltaLog.replay(spark, dir).get.version
    assert(DeltaLog.read(spark, dir).count() === 3L)
    val vRestored = Maintenance.restore(spark, dir, v0)
    assert(vRestored > vMerged, "restore APPENDS")
    // head == the v0 state
    assert(DeltaLog.read(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet ===
      Set((1, "a"), (2, "b")))
    // the merged version is still travelable (history preserved)
    assert(DeltaLog.read(spark, dir, vMerged).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet ===
      Set((1, "A"), (2, "b"), (3, "c")))
    // restore is itself restorable: go back to the merged state
    val v2 = Maintenance.restore(spark, dir, vMerged)
    assert(v2 > vRestored)
    assert(DeltaLog.read(spark, dir).count() === 3L)
    // idempotent: restoring to the current state commits nothing
    assert(Maintenance.restore(spark, dir, v2) === v2)
    // a merge after a restore still works (tombstone bookkeeping sound)
    MergeUpsert.upsertParquet(spark,
      Seq((4, "d")).toDF("id", "v"), dir, Seq("id"))
    assert(DeltaLog.read(spark, dir).count() === 4L)
    // CDF across the restore: v(merged-head) -> v(restored) shows the
    // merge's rows leaving and the originals returning
    val ch = DeltaLog.changes(spark, dir, vMerged, vRestored)
      .select("_change_type", "id", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(ch === Set(("delete", 1, "A"), ("delete", 3, "c"),
      ("insert", 1, "a")))
    // vacuum everything, then a restore into the vacuumed window refuses
    Maintenance.vacuum(spark, dir, retentionHours = 0.0)
    val e = intercept[IllegalArgumentException] {
      Maintenance.restore(spark, dir, vMerged)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("commit store: conditional put carries commits; racing writers " +
      "serialize to distinct versions") {
    spark.conf.set(DeltaLog.CommitStoreClassConf,
      "graft.sources.TestCommitStore")
    try {
      val dir = tmp()
      val before = TestCommitStore.puts.get()
      MergeUpsert.upsertParquet(spark,
        Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
      MergeUpsert.upsertParquet(spark,
        Seq((2, "b")).toDF("id", "v"), dir, Seq("id"))
      assert(DeltaLog.read(spark, dir).count() === 2L)
      assert(TestCommitStore.puts.get() - before >= 2,
        "commits routed through the conditional-put store")
      // race: concurrent metadata commits must each win a DISTINCT
      // version via the put-if-absent loop (no lost commits, no spins)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val futs = (0 until 4).map { i =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            override def call(): Long =
              DeltaLog.commitInfo(spark, dir, s"RACE_$i")
          })
        }
        val versions = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
        assert(versions.toSet.size === 4, s"distinct versions: $versions")
        assert(versions.toSet === (2L to 5L).toSet)
      } finally pool.shutdown()
      assert(DeltaLog.replay(spark, dir).get.version === 5L)
    } finally spark.conf.unset(DeltaLog.CommitStoreClassConf)
  }

  test("empty-table log (K8 empty materialization shape) reads as empty typed") {
    val dir = tmp()
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.parquet(dir)
    DeltaLog.reconcile(spark, dir, schema, Nil)
    val got = DeltaLog.read(spark, dir)
    assert(got.schema.fieldNames.toSeq === Seq("id", "v"))
    assert(got.count() === 0L)
  }
}
