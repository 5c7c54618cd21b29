package graft.operators

import graft.SparkTestBase
import graft.sources.DeltaLog
import org.apache.hadoop.fs.Path

import java.nio.file.Files

/** Tombstone retention + real VACUUM semantics — the reference's
  * `VACUUM delta_table RETAIN 168 HOURS` storage contract
  * (light_transform.py:1394-1409): retained writes keep replaced data
  * files on disk so `VERSION AS OF` serves historical DATA; vacuum
  * deletes only log-removed files older than the retention window and
  * never touches live files.
  */
class VacuumSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-vacuum").toString + "/t"

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def dataFiles(dir: String): Set[String] = {
    val out = Set.newBuilder[String]
    val root = fs.makeQualified(new Path(dir))
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val s = it.next()
      val rel = root.toUri.relativize(s.getPath.toUri).getPath
      if (!rel.split("/").exists(seg =>
          (seg.startsWith("_") || seg.startsWith(".")) && !seg.contains("=")))
        out += rel
    }
    out.result()
  }

  test("retained whole-table swap: VERSION AS OF serves the replaced DATA") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a"), (2, "b")).toDF("id", "v"), dir, Seq("id"))
    val v0Files = dataFiles(dir)
    MergeUpsert.upsertParquet(spark,
      Seq((2, "B"), (3, "C")).toDF("id", "v"), dir, Seq("id"),
      retain = true)
    // the whole-table swap replaced v0's files — retention kept them
    assert(v0Files.subsetOf(dataFiles(dir)),
      "replaced files stay on disk as tombstones")
    val st = DeltaLog.replay(spark, dir).get
    assert(st.tombstones.keySet === v0Files)
    assert(st.files.keySet.intersect(v0Files).isEmpty)
    // current read THROUGH the log: merged rows only, no duplicates
    val head = DeltaLog.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(head.toSeq === Seq((1, "a"), (2, "B"), (3, "C")))
    // THE contract: time travel to the pre-swap version serves real rows
    val v0 = DeltaLog.read(spark, dir, 0L).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(v0.toSeq === Seq((1, "a"), (2, "b")))
  }

  test("retained partitioned merge: only touched dirs tombstone; no stale rows") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"))
        .toDF("id", "v", "part"),
      dir, Seq("id"), partitionCols = Seq("part"))
    MergeUpsert.upsertParquet(spark,
      Seq((2, "B", "p1")).toDF("id", "v", "part"),
      dir, Seq("id"), partitionCols = Seq("part"), retain = true)
    val st = DeltaLog.replay(spark, dir).get
    assert(st.tombstones.keys.forall(_.startsWith("part=p1/")),
      "untouched p2 must not tombstone")
    // v0 time travel serves the pre-merge p1 rows
    val v0 = DeltaLog.read(spark, dir, 0L).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(v0.toSeq === Seq((1, "a"), (2, "b"), (3, "c")))
    // a THIRD merge into the retained partition must not resurrect the
    // tombstoned v0 rows (the merge input is listing minus tombstones)
    MergeUpsert.upsertParquet(spark,
      Seq((4, "d", "p1")).toDF("id", "v", "part"),
      dir, Seq("id"), partitionCols = Seq("part"), retain = true)
    val head = DeltaLog.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(head.toSeq === Seq((1, "a"), (2, "B"), (3, "c"), (4, "d")))
    // and v1 is STILL travelable (its files were retained by the v2 swap)
    val v1 = DeltaLog.read(spark, dir, 1L).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(v1.toSeq === Seq((1, "a"), (2, "B"), (3, "c")))
  }

  test("retained OPTIMIZE: pre-compact version stays data-travelable") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a"), (2, "b")).toDF("id", "v"), dir, Seq("id"))
    MergeUpsert.upsertParquet(spark,
      Seq((3, "c")).toDF("id", "v"), dir, Seq("id"), retain = true)
    Maintenance.compact(spark, dir, retain = true)
    val st = DeltaLog.replay(spark, dir).get
    // compact read = listing minus tombstones: no duplicated rows
    assert(DeltaLog.read(spark, dir).count() === 3L)
    assert(DeltaLog.read(spark, dir).orderBy("id")
      .collect().map(_.getString(1)).toSeq === Seq("a", "b", "c"))
    // the pre-OPTIMIZE version serves data
    val v1 = DeltaLog.read(spark, dir, st.version - 1).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(v1.toSeq === Seq((1, "a"), (2, "b"), (3, "c")))
    // and v0 too (retained by BOTH later operations)
    assert(DeltaLog.read(spark, dir, 0L).count() === 2L)
  }

  test("vacuum deletes only expired tombstones; live files never touched") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a"), (2, "b")).toDF("id", "v"), dir, Seq("id"))
    MergeUpsert.upsertParquet(spark,
      Seq((2, "B")).toDF("id", "v"), dir, Seq("id"), retain = true)
    val st = DeltaLog.replay(spark, dir).get
    val liveFiles = st.files.keySet
    val tombFiles = st.tombstones.keySet
    assert(tombFiles.nonEmpty)
    // inside the retention window: nothing is deleted
    assert(Maintenance.vacuum(spark, dir, retentionHours = 168.0) === 0L)
    assert(tombFiles.subsetOf(dataFiles(dir)))
    assert(DeltaLog.read(spark, dir, 0L).count() === 2L,
      "time travel still works inside the window")
    // past the window (retention 0): tombstoned files go, live files stay
    val n = Maintenance.vacuum(spark, dir, retentionHours = 0.0)
    assert(n === tombFiles.size.toLong)
    assert(dataFiles(dir).intersect(tombFiles).isEmpty)
    assert(liveFiles.subsetOf(dataFiles(dir)))
    assert(DeltaLog.read(spark, dir).orderBy("id")
      .collect().map(_.getString(1)).toSeq === Seq("a", "B"))
    // v0's data is gone: the scan refuses rather than serving wrong rows
    intercept[Exception] { DeltaLog.read(spark, dir, 0L).count() }
    // history records the VACUUM commit
    val ops = DeltaLog.history(spark, dir)
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.contains("VACUUM"))
    // idempotent: nothing left to delete
    assert(Maintenance.vacuum(spark, dir, retentionHours = 0.0) === 0L)
  }

  test("tombstones ride checkpoints and expire only after vacuum") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((0, "x")).toDF("id", "v"), dir, Seq("id"))
    (1 to 11).foreach { i =>
      MergeUpsert.upsertParquet(spark,
        Seq((i, s"v$i")).toDF("id", "v"), dir, Seq("id"), retain = true)
    }
    // checkpoint landed at v10; drop the pre-checkpoint commit JSONs —
    // the tombstone set must survive via the checkpoint's remove entries
    (0 to 9).foreach { v =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        dir, DeltaLog.LogDirName, f"$v%020d.json"))
    }
    val st = DeltaLog.replay(spark, dir).get
    assert(st.tombstones.nonEmpty, "checkpoint carries remove tombstones")
    assert(DeltaLog.read(spark, dir).count() === 12L)
    // a further merge must NOT re-adopt the tombstoned files (the
    // re-adoption guard is exactly the checkpointed tombstone set)
    MergeUpsert.upsertParquet(spark,
      Seq((99, "z")).toDF("id", "v"), dir, Seq("id"), retain = true)
    assert(DeltaLog.read(spark, dir).count() === 13L)
    // expiry: with retention 0, vacuum deletes the files; the NEXT
    // checkpoint drops the (expired + file-absent) entries
    spark.conf.set(DeltaLog.TombstoneRetentionConf, "0")
    try {
      assert(Maintenance.vacuum(spark, dir, retentionHours = 0.0) > 0L)
      // drive commits to the next checkpoint boundary
      (0 until 10).foreach { i =>
        MergeUpsert.upsertParquet(spark,
          Seq((200 + i, "y")).toDF("id", "v"), dir, Seq("id"))
      }
      val names = new java.io.File(dir, DeltaLog.LogDirName).listFiles()
        .map(_.getName).filter(_.endsWith(".checkpoint.parquet")).sorted
      assert(names.length >= 2)
      // the newest checkpoint's own state (replay pinned AT its version —
      // commits after it re-add their own fresh removes): none of the
      // vacuumed tombstones may survive into it
      val cpV = names.last.take(20).toLong
      val st2 = DeltaLog.replay(spark, dir, cpV).get
      assert(st2.tombstones.keySet.intersect(st.tombstones.keySet).isEmpty,
        "vacuumed + expired tombstones leave the checkpoint")
    } finally spark.conf.unset(DeltaLog.TombstoneRetentionConf)
  }

  test("a default-arg write on a retained table INHERITS retention") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    MergeUpsert.upsertParquet(spark,
      Seq((2, "b")).toDF("id", "v"), dir, Seq("id"), retain = true)
    // retain defaults to false here, but the table already carries
    // tombstones: effective retention derives from STATE (ADVICE r17) —
    // a routine write must not silently collapse the 168h window
    MergeUpsert.upsertParquet(spark,
      Seq((3, "c")).toDF("id", "v"), dir, Seq("id"))
    assert(DeltaLog.read(spark, dir).count() === 3L)
    val st = DeltaLog.replay(spark, dir).get
    assert(st.tombstones.nonEmpty, "inherited retention keeps tombstones")
    // every version is still data-travelable
    assert(DeltaLog.read(spark, dir, 0L).count() === 1L)
    assert(DeltaLog.read(spark, dir, 1L).count() === 2L)
    // same inheritance on OPTIMIZE with default args
    Maintenance.compact(spark, dir)
    assert(DeltaLog.read(spark, dir).count() === 3L)
    assert(DeltaLog.read(spark, dir, 1L).count() === 2L,
      "pre-compact versions survive a default-arg OPTIMIZE")
    // only VACUUM's retention pass actually deletes the files
    assert(Maintenance.vacuum(spark, dir, retentionHours = 0.0) > 0L)
    assert(spark.read.parquet(dir).count() === 3L,
      "post-vacuum the directory is clean of tombstoned files")
  }

  test("graft.retainDeletedFiles property turns retention on from v0") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    DeltaLog.setTableProperties(spark, dir,
      Map("graft.retainDeletedFiles" -> "true"))
    // no retain arg — the property alone keeps the replaced files
    MergeUpsert.upsertParquet(spark,
      Seq((1, "A")).toDF("id", "v"), dir, Seq("id"))
    assert(DeltaLog.replay(spark, dir).get.tombstones.nonEmpty)
    assert(DeltaLog.read(spark, dir, 0L).collect()
      .map(_.getString(1)).toSeq === Seq("a"))
  }

  test("two tables with different per-table retention vacuum differently " +
      "under ONE session (property beats conf)") {
    val dirA = tmp(); val dirB = tmp()
    for (d <- Seq(dirA, dirB)) {
      MergeUpsert.upsertParquet(spark,
        Seq((1, "a")).toDF("id", "v"), d, Seq("id"), retain = true)
      MergeUpsert.upsertParquet(spark,
        Seq((1, "A")).toDF("id", "v"), d, Seq("id"))
      assert(DeltaLog.replay(spark, d).get.tombstones.nonEmpty)
    }
    // A expires immediately; B holds for 1000h — same session, same call
    DeltaLog.setTableProperties(spark, dirA,
      Map(DeltaLog.TombstoneRetentionProp -> "interval 0 hours"))
    DeltaLog.setTableProperties(spark, dirB,
      Map(DeltaLog.TombstoneRetentionProp -> "interval 1000 hours"))
    assert(Maintenance.vacuumTable(spark, dirA) > 0L,
      "A's expired tombstones delete")
    assert(Maintenance.vacuumTable(spark, dirB) === 0L,
      "B's tombstones stay inside its own window")
    // both tables still read their heads correctly
    assert(DeltaLog.read(spark, dirA).collect().map(_.getString(1)).toSeq
      === Seq("A"))
    assert(DeltaLog.read(spark, dirB, 0L).collect().map(_.getString(1))
      .toSeq === Seq("a"), "B's history is still data-travelable")
  }

  test("retention vacuum refuses while a live writer holds the lease") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val lease = WriterLease.acquire(fs, dir,
      MergeUpsert.DefaultLeaseStaleMs)
    try {
      intercept[MergeUpsert.ConcurrentWriteException] {
        Maintenance.vacuum(spark, dir, retentionHours = 0.0)
      }
      // the sweep-only vacuum silently skips instead of eating the live
      // writer's staging/backup dirs
      Seq(9).toDF("x").write.parquet(dir + "__staging.sometoken")
      Maintenance.vacuum(spark, dir)
      assert(new java.io.File(dir + "__staging.sometoken").exists(),
        "live lease: in-flight staging is not residue")
    } finally lease.release()
    // lease released: the sweep proceeds
    Maintenance.vacuum(spark, dir)
    assert(!new java.io.File(dir + "__staging.sometoken").exists())
  }
}
