package graft.operators

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Partition-pruned MERGE: only batch-affected partitions are rewritten
  * (reference semantics: Delta MERGE touches only files with matched keys,
  * light_transform.py:1382-1409), plus Delta-autoMerge schema evolution
  * (light_transform.py:2013) and crash recovery of the marker protocol.
  */
class MergePartitionSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-merge").toString

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (path, modificationTime, length) of every data file under a dir. */
  private def fileState(dir: String): Set[(String, Long, Long)] = {
    val it = fs.listFiles(new Path(dir), true)
    val b = Set.newBuilder[(String, Long, Long)]
    while (it.hasNext) {
      val s = it.next()
      if (!s.getPath.getName.startsWith("_"))
        b += ((s.getPath.toString, s.getModificationTime, s.getLen))
    }
    b.result()
  }

  test("pruned upsert leaves untouched partitions' files byte-identical") {
    val dir = tmpDir() + "/t"
    val init = Seq(
      (1, "2024-01-01", "a"), (2, "2024-01-01", "b"),
      (3, "2024-01-02", "c"), (4, "2024-01-03", "d")
    ).toDF("id", "dt", "v")
    MergeUpsert.upsertParquet(spark, init, dir, Seq("id"), Seq("dt"))

    val before01 = fileState(s"$dir/dt=2024-01-01")
    val before03 = fileState(s"$dir/dt=2024-01-03")

    Thread.sleep(5) // ensure any rewrite would bump modification times
    val batch = Seq((3, "2024-01-02", "C2"), (5, "2024-01-02", "e"))
      .toDF("id", "dt", "v")
    MergeUpsert.upsertParquet(spark, batch, dir, Seq("id"), Seq("dt"))

    // untouched partitions: identical file paths, mtimes, sizes
    assert(fileState(s"$dir/dt=2024-01-01") === before01)
    assert(fileState(s"$dir/dt=2024-01-03") === before03)
    // merged content correct across all partitions
    val got = spark.read.parquet(dir).select("id", "v")
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "a"), (2, "b"), (3, "C2"), (4, "d"), (5, "e")))
    // no protocol leftovers
    assert(!fs.exists(new Path(dir + "__staging")))
    assert(!fs.exists(new Path(dir + "__old")))
    assert(!fs.exists(new Path(dir + "__commit")))
  }

  test("timestamp partition columns refuse loudly (driver dir rendering)") {
    // java.sql.Timestamp.toString carries ".0" where Spark's partitionBy
    // dir name does not — the existence probe would miss the live dir and
    // the commit would REPLACE the partition with batch-only rows. The
    // guard must fire before anything is staged or swapped.
    val dir = tmpDir() + "/ts"
    val init = Seq((1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a"))
      .toDF("id", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      MergeUpsert.upsertParquet(spark, init, dir, Seq("id"), Seq("ts"))
    }
    assert(e.getMessage.contains("timestamp"))
  }

  test("pruned upsert creates brand-new partitions") {
    val dir = tmpDir() + "/t"
    MergeUpsert.upsertParquet(spark,
      Seq((1, "p1", "a")).toDF("id", "pt", "v"), dir, Seq("id"), Seq("pt"))
    MergeUpsert.upsertParquet(spark,
      Seq((2, "p2", "b")).toDF("id", "pt", "v"), dir, Seq("id"), Seq("pt"))
    val got = spark.read.parquet(dir).select("id", "pt", "v").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq((1, "p1", "a"), (2, "p2", "b")))
  }

  test("autoMerge: batch-new columns appear, batch-missing columns fill null") {
    val dir = tmpDir() + "/t"
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a"), (2, "b")).toDF("id", "v"), dir, Seq("id"))
    // batch adds `extra`, drops `v`
    MergeUpsert.upsertParquet(spark,
      Seq((2, 20), (3, 30)).toDF("id", "extra"), dir, Seq("id"))
    val rows = spark.read.option("mergeSchema", "true").parquet(dir)
      .select("id", "v", "extra").orderBy("id").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getInt(2))))
    assert(rows.toSeq === Seq(
      (1, Some("a"), None),       // untouched old row: null extra
      (2, None, Some(20)),        // updated by batch: batch-missing v → null
      (3, None, Some(30))))       // inserted
  }

  test("autoMerge type conflict: table type wins, batch value cast") {
    val old = Seq((1, 10)).toDF("id", "x")
    val batch = Seq((2, "20"), (3, "junk")).toDF("id", "x")
    val got = MergeUpsert.merge(old, batch, Seq("id"), autoMerge = true)
      .orderBy("id").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    assert(got.toSeq === Seq((1, Some(10)), (2, Some(20)), (3, None)))
  }

  test("strict merge (autoMerge=false) still throws on a missing column") {
    val old = Seq((1, "a")).toDF("id", "v")
    val batch = Seq((2, 20)).toDF("id", "extra")
    intercept[org.apache.spark.sql.AnalysisException] {
      MergeUpsert.merge(old, batch, Seq("id")).collect()
    }
  }

  test("recover replays an interrupted partitioned commit (marker present)") {
    val dir = tmpDir() + "/t"
    val init = Seq((1, "p1", "a"), (2, "p2", "b")).toDF("id", "pt", "v")
    MergeUpsert.upsertParquet(spark, init, dir, Seq("id"), Seq("pt"))

    // simulate: staging written + marker created, then crash before swap
    val staged = Seq((1, "p1", "A2")).toDF("id", "pt", "v")
    staged.write.mode("overwrite").partitionBy("pt").parquet(dir + "__staging")
    fs.create(new Path(dir + "__commit"), true).close()

    assert(Maintenance.recover(spark, dir))
    val got = spark.read.parquet(dir).select("id", "v").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "A2"), (2, "b")))
    assert(!fs.exists(new Path(dir + "__commit")))
    assert(!fs.exists(new Path(dir + "__staging")))
    assert(!fs.exists(new Path(dir + "__old")))
    assert(!Maintenance.recover(spark, dir)) // idempotent no-op after
  }

  test("recover replays a commit interrupted mid-swap (partition half-moved)") {
    val dir = tmpDir() + "/t"
    MergeUpsert.upsertParquet(spark,
      Seq((1, "p1", "a"), (2, "p2", "b")).toDF("id", "pt", "v"),
      dir, Seq("id"), Seq("pt"))
    Seq((1, "p1", "A2"), (2, "p2", "B2")).toDF("id", "pt", "v")
      .write.mode("overwrite").partitionBy("pt").parquet(dir + "__staging")
    fs.create(new Path(dir + "__commit"), true).close()
    // half-complete swap: p1 backed up and moved in, p2 untouched
    fs.mkdirs(new Path(dir + "__old"))
    fs.rename(new Path(s"$dir/pt=p1"), new Path(dir + "__old/pt=p1"))
    fs.rename(new Path(dir + "__staging/pt=p1"), new Path(s"$dir/pt=p1"))

    assert(Maintenance.recover(spark, dir))
    val got = spark.read.parquet(dir).select("id", "v").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "A2"), (2, "B2")))
  }

  test("aborted staging without marker leaves the live table untouched") {
    val dir = tmpDir() + "/t"
    MergeUpsert.upsertParquet(spark,
      Seq((1, "p1", "a")).toDF("id", "pt", "v"), dir, Seq("id"), Seq("pt"))
    // crash during staging write: partial dir, no marker
    Seq((1, "p1", "PARTIAL")).toDF("id", "pt", "v")
      .write.mode("overwrite").partitionBy("pt").parquet(dir + "__staging")
    assert(!Maintenance.recover(spark, dir)) // nothing to repair
    val got = spark.read.parquet(dir).select("v").collect().map(_.getString(0)).toSeq
    assert(got === Seq("a"))
    // next upsert proceeds normally over the leftover
    MergeUpsert.upsertParquet(spark,
      Seq((2, "p1", "b")).toDF("id", "pt", "v"), dir, Seq("id"), Seq("pt"))
    assert(spark.read.parquet(dir).count() === 2)
  }

  test("pruned upsert with two-level partitioning") {
    val dir = tmpDir() + "/t"
    val init = Seq((1, "2024", "01", "a"), (2, "2024", "02", "b"))
      .toDF("id", "y", "m", "v")
    MergeUpsert.upsertParquet(spark, init, dir, Seq("id"), Seq("y", "m"))
    val before = fileState(s"$dir/y=2024/m=02")
    Thread.sleep(5)
    MergeUpsert.upsertParquet(spark,
      Seq((1, "2024", "01", "A2")).toDF("id", "y", "m", "v"),
      dir, Seq("id"), Seq("y", "m"))
    assert(fileState(s"$dir/y=2024/m=02") === before)
    val got = spark.read.parquet(dir).select("id", "v").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "A2"), (2, "b")))
  }

  private def noStagingLeftovers(dir: String): Unit = {
    val globbed = fs.globStatus(new Path(dir + "__staging*"))
    assert(globbed == null || globbed.isEmpty,
      s"staging leftovers: ${Option(globbed).toSeq.flatten.map(_.getPath).mkString(", ")}")
  }

  test("marker records the per-writer staging dir and recover resolves it (parts)") {
    val dir = tmpDir() + "/t"
    MergeUpsert.upsertParquet(spark,
      Seq((1, "p1", "a"), (2, "p2", "b")).toDF("id", "pt", "v"),
      dir, Seq("id"), Seq("pt"))
    // simulate a crash after marker publish: token-named staging + marker
    // whose content names it — exactly what prunedUpsert writes
    val staging = MergeUpsert.stagingPath(dir, "tok-crash-1")
    Seq((1, "p1", "A2")).toDF("id", "pt", "v")
      .write.mode("overwrite").partitionBy("pt").parquet(staging.toString)
    val out = fs.create(new Path(dir + "__commit"), true)
    out.write(s"${staging.getName}\n${MergeUpsert.ModeParts}\n".getBytes("UTF-8"))
    out.close()

    assert(Maintenance.recover(spark, dir))
    val got = spark.read.parquet(dir).select("id", "v").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "A2"), (2, "b")))
    assert(!fs.exists(new Path(dir + "__commit")))
    noStagingLeftovers(dir)
    assert(!Maintenance.recover(spark, dir))
  }

  test("whole-table swap is marker-protected and recover replays it") {
    val dir = tmpDir() + "/t"
    MergeUpsert.upsertParquet(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"),
      dir, Seq("id"))
    // crash right after the marker, before any rename: live + staging + marker
    val staging = MergeUpsert.stagingPath(dir, "tok-crash-2")
    Seq((1, "A2"), (2, "b"), (3, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(staging.toString)
    val out = fs.create(new Path(dir + "__commit"), true)
    out.write(s"${staging.getName}\n${MergeUpsert.ModeWhole}\n".getBytes("UTF-8"))
    out.close()

    assert(Maintenance.recover(spark, dir))
    val got = spark.read.parquet(dir).select("id", "v").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "A2"), (2, "b"), (3, "c")))
    assert(!fs.exists(new Path(dir + "__commit")))
    assert(!fs.exists(new Path(dir + "__old")))
    noStagingLeftovers(dir)
    assert(!Maintenance.recover(spark, dir))
  }

  test("whole-table recover finishes a swap interrupted between renames") {
    val dir = tmpDir() + "/t"
    MergeUpsert.upsertParquet(spark, Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    val staging = MergeUpsert.stagingPath(dir, "tok-crash-3")
    Seq((1, "A2")).toDF("id", "v").write.mode("overwrite").parquet(staging.toString)
    val out = fs.create(new Path(dir + "__commit"), true)
    out.write(s"${staging.getName}\n${MergeUpsert.ModeWhole}\n".getBytes("UTF-8"))
    out.close()
    // crash point: live already renamed to __old, staged not yet moved in
    fs.rename(new Path(dir), new Path(dir + "__old"))

    assert(Maintenance.recover(spark, dir))
    val got = spark.read.parquet(dir).select("v").collect().map(_.getString(0)).toSeq
    assert(got === Seq("A2"))
    assert(!fs.exists(new Path(dir + "__old")))
    noStagingLeftovers(dir)
  }

  test("next leaseholder sweeps a dead writer's orphaned staging dir") {
    val dir = tmpDir() + "/t"
    MergeUpsert.upsertParquet(spark,
      Seq((1, "p1", "a")).toDF("id", "pt", "v"), dir, Seq("id"), Seq("pt"))
    // a writer died mid-staging (no marker): its token-named dir remains
    val orphan = MergeUpsert.stagingPath(dir, "tok-dead")
    Seq((9, "p1", "GHOST")).toDF("id", "pt", "v")
      .write.mode("overwrite").partitionBy("pt").parquet(orphan.toString)

    MergeUpsert.upsertParquet(spark,
      Seq((2, "p1", "b")).toDF("id", "pt", "v"), dir, Seq("id"), Seq("pt"))
    noStagingLeftovers(dir)
    // the ghost batch never reached the table
    val got = spark.read.parquet(dir).select("id").orderBy("id")
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1, 2))
  }

  test("concurrent loser leaves no staging droppings under any token") {
    val dir = tmpDir() + "/t"
    MergeUpsert.upsertParquet(spark, Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    val held = WriterLease.acquire(fs, dir, staleMs = 60000)
    try {
      intercept[MergeUpsert.ConcurrentWriteException] {
        MergeUpsert.upsertParquet(spark, Seq((2, "b")).toDF("id", "v"),
          dir, Seq("id"), leaseStaleMs = 60000)
      }
      noStagingLeftovers(dir)
    } finally held.release()
  }

  test("upsert through a LockStore backend: serialized writers, correct merge") {
    val dir = tmpDir() + "/t"
    val store = new InMemoryLockStore
    val init = Seq((1, "2024-01-01", "a"), (2, "2024-01-02", "b"))
      .toDF("id", "dt", "v")
    MergeUpsert.upsertParquet(spark, init, dir, Seq("id"), Seq("dt"),
      lockStore = Some(store))
    val batch = Seq((2, "2024-01-02", "B2"), (3, "2024-01-03", "c"))
      .toDF("id", "dt", "v")
    MergeUpsert.upsertParquet(spark, batch, dir, Seq("id"), Seq("dt"),
      lockStore = Some(store))
    val out = spark.read.parquet(dir).select("id", "v").as[(Int, String)]
      .collect().toSet
    assert(out === Set((1, "a"), (2, "B2"), (3, "c")))
  }

  test("contending writers with retry all land: serialized multi-writer e2e") {
    val dir = tmpDir() + "/t"
    val store = new InMemoryLockStore
    val writers = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val latch = new java.util.concurrent.CountDownLatch(writers)
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val batch = Seq((w * 10 + 1, s"w$w-a"), (w * 10 + 2, s"w$w-b"))
            .toDF("id", "v")
          var done = false
          var attempts = 0
          while (!done && attempts < 60) {
            attempts += 1
            try {
              MergeUpsert.upsertParquet(spark, batch, dir, Seq("id"),
                lockStore = Some(store))
              done = true
            } catch {
              case _: MergeUpsert.ConcurrentWriteException => Thread.sleep(25)
              case t: Throwable => errors.add(t); done = true
            }
          }
          if (!done) errors.add(new RuntimeException(s"writer $w starved"))
          latch.countDown()
        }
      })
    }
    assert(latch.await(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(errors.isEmpty, errors.toString)
    val rows = spark.read.parquet(dir).select("id", "v").as[(Int, String)]
      .collect().toSet
    val expected = (0 until writers).flatMap(w =>
      Seq((w * 10 + 1, s"w$w-a"), (w * 10 + 2, s"w$w-b"))).toSet
    assert(rows === expected)
  }

  test("upsert through a LockStore backend fails fast when the lease is held") {
    val dir = tmpDir() + "/t"
    val store = new InMemoryLockStore
    val held = StoreLease.acquire(store, dir + "__lock", 60_000L)
    try {
      intercept[MergeUpsert.ConcurrentWriteException] {
        MergeUpsert.upsertParquet(spark,
          Seq((1, "x")).toDF("id", "v"), dir, Seq("id"),
          lockStore = Some(store))
      }
      // the live lease is untouched by the failed writer
      held.heartbeat()
    } finally held.release()
  }
}
