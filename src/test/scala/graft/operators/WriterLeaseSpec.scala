package graft.operators

import graft.SparkTestBase
import org.apache.hadoop.fs.Path

class WriterLeaseSpec extends SparkTestBase {
  import spark.implicits._

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def tmpTable(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_lease_$name").toString + "/t"

  test("a second concurrent upsert to the same path aborts cleanly") {
    val path = tmpTable("contend")
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    MergeUpsert.upsertParquet(spark, base, path, Seq("id"))

    // writer 1 holds the lease (as if mid-merge)
    val held = WriterLease.acquire(fs, path, staleMs = 60000)
    try {
      val batch = Seq((2L, "B2"), (3L, "c")).toDF("id", "v")
      intercept[MergeUpsert.ConcurrentWriteException] {
        MergeUpsert.upsertParquet(spark, batch, path, Seq("id"),
          leaseStaleMs = 60000)
      }
      // the loser never staged anything: no __staging/__commit droppings
      assert(!fs.exists(new Path(path + "__staging")))
      assert(!fs.exists(new Path(path + "__commit")))
      // and the table is untouched
      val rows = spark.read.parquet(path).orderBy("id")
        .as[(Long, String)].collect().toSeq
      assert(rows === Seq((1L, "a"), (2L, "b")))
    } finally held.release()
  }

  test("a stale lock (dead writer) is broken and the upsert proceeds") {
    val path = tmpTable("stale")
    MergeUpsert.upsertParquet(spark, Seq((1L, "a")).toDF("id", "v"), path, Seq("id"))
    // dead writer: lock exists, last heartbeat far in the past
    WriterLease.acquire(fs, path, staleMs = 60000) // acquired, never released
    val lock = new Path(path + "__lock")
    fs.setTimes(lock, System.currentTimeMillis() - 120000, -1)

    MergeUpsert.upsertParquet(spark, Seq((2L, "b")).toDF("id", "v"), path,
      Seq("id"), leaseStaleMs = 60000)
    val rows = spark.read.parquet(path).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(rows === Seq((1L, "a"), (2L, "b")))
    // the winning writer released its own lock on the way out
    assert(!fs.exists(lock))
  }

  test("release allows the next writer immediately") {
    val path = tmpTable("release")
    MergeUpsert.upsertParquet(spark, Seq((1L, "a")).toDF("id", "v"), path, Seq("id"))
    MergeUpsert.upsertParquet(spark, Seq((2L, "b")).toDF("id", "v"), path, Seq("id"))
    assert(spark.read.parquet(path).count() === 2)
    assert(!fs.exists(new Path(path + "__lock")))
  }

  test("heartbeat keeps a long merge from looking dead") {
    val path = tmpTable("beat")
    val held = WriterLease.acquire(fs, path, staleMs = 60000)
    val lock = new Path(path + "__lock")
    // simulate an old acquire whose owner is still alive and heartbeating
    fs.setTimes(lock, System.currentTimeMillis() - 120000, -1)
    held.heartbeat()
    intercept[MergeUpsert.ConcurrentWriteException] {
      WriterLease.acquire(fs, path, staleMs = 60000)
    }
    held.release()
  }

  /** POSIX contract under racing acquires: acquire() may transiently admit
    * more than one writer (the documented post-read-back overwrite window,
    * widened under machine load) — the protocol's real guarantee is that
    * the next heartbeat() arbitrates, leaving EXACTLY ONE live leaseholder
    * before anyone reaches a destructive phase. Count survivors that way,
    * once all contention has quiesced.
    */
  private def raceForStaleLock(path: String, racers: Int): Unit = {
    WriterLease.acquire(fs, path, staleMs = 60000)
    fs.setTimes(new Path(path + "__lock"), System.currentTimeMillis() - 120000, -1)

    val acquired = new java.util.concurrent.ConcurrentLinkedQueue[WriterLease]()
    val threads = (1 to racers).map { _ =>
      new Thread(() => {
        try acquired.add(WriterLease.acquire(fs, path, staleMs = 60000))
        catch { case _: MergeUpsert.ConcurrentWriteException => () }
      })
    }
    threads.foreach(_.start())
    // generous join: a full-suite sbt run loads all 32 cores and a racer
    // thread can stall far past what the file ops themselves need. A
    // timed-out join would silently race the survivor count below against
    // a still-live acquirer — assert quiescence instead of assuming it
    threads.foreach(_.join(120000))
    assert(threads.forall(!_.isAlive),
      "racer threads still running after 120 s — survivor count would race")
    def lockDump: String = {
      val p = new Path(path + "__lock")
      val content =
        try {
          val in = fs.open(p)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        } catch { case e: Throwable => s"<unreadable: $e>" }
      s"lock=$content acquirers=${acquired.toArray(Array.empty[WriterLease])
        .map(_.token).mkString(",")}"
    }
    assert(!acquired.isEmpty,
      s"zero acquires succeeded (the both-lose race should be retried " +
        s"away); $lockDump")
    // all acquire paths (including breakers) are done: the lock file is
    // stable and names exactly one owner; only that lease's heartbeat lives
    val survivors = acquired.toArray(Array.empty[WriterLease]).count { l =>
      try { l.heartbeat(); true }
      catch { case _: MergeUpsert.ConcurrentWriteException => false }
    }
    assert(survivors === 1,
      s"expected exactly one live leaseholder after arbitration, got $survivors " +
        s"of ${acquired.size} acquirers; $lockDump")
  }

  test("two racers after the same stale lock: exactly one survives heartbeat") {
    raceForStaleLock(tmpTable("race"), racers = 2)
  }

  test("many racers after the same stale lock: one survivor, never zero") {
    // the both-lose race (a breaker renames a fresh lock away before its
    // liveness check puts it back) used to strand the lease with no winner;
    // the bounded re-publish retry plus the own-lock reclaim (a restored
    // lock can name a racer that already looped past it) close it.
    // Repeat: the losing interleavings need tight timing that any single
    // pass usually misses
    for (i <- 1 to 10)
      raceForStaleLock(tmpTable(s"stampede$i"), racers = 8)
  }

  test("heartbeat throws ConcurrentWriteException when the lock was stolen") {
    val path = tmpTable("stolen")
    val held = WriterLease.acquire(fs, path, staleMs = 60000)
    // another writer's lock lands over ours (the POSIX rename-overwrite hole)
    val lock = new Path(path + "__lock")
    val out = fs.create(lock, true)
    out.write("thief-host:999:deadbeef\n0\n".getBytes("UTF-8"))
    out.close()
    val e = intercept[MergeUpsert.ConcurrentWriteException](held.heartbeat())
    assert(e.getMessage.contains("thief-host"))
  }

  test("heartbeat throws ConcurrentWriteException (not FileNotFound) when the lock vanished") {
    val path = tmpTable("vanish")
    val held = WriterLease.acquire(fs, path, staleMs = 60000)
    fs.delete(new Path(path + "__lock"), false)
    intercept[MergeUpsert.ConcurrentWriteException](held.heartbeat())
  }

  test("release leaves another writer's lock in place") {
    val path = tmpTable("releasesafe")
    val displaced = WriterLease.acquire(fs, path, staleMs = 60000)
    // usurper takes over (e.g. after a stale break); displaced writer's
    // cleanup must not free the usurper's live lease
    fs.delete(new Path(path + "__lock"), false)
    val usurper = WriterLease.acquire(fs, path, staleMs = 60000)
    displaced.release()
    assert(fs.exists(new Path(path + "__lock")))
    usurper.heartbeat() // still the owner
    usurper.release()
    assert(!fs.exists(new Path(path + "__lock")))
  }

  test("each acquisition carries a distinct filesystem-safe token") {
    val a = WriterLease.acquire(fs, tmpTable("tok1"), staleMs = 60000)
    val b = WriterLease.acquire(fs, tmpTable("tok2"), staleMs = 60000)
    assert(a.token !== b.token)
    assert(a.token.matches("[A-Za-z0-9-]+"))
    a.release(); b.release()
  }

  test("a multi-line lock file's owner line is read whole") {
    // readOwner must loop to EOF: a short first read would truncate the
    // owner id and misreport ownership. Exercise via heartbeat on a lock
    // whose owner line is followed by a large tail.
    val path = tmpTable("longlock")
    val held = WriterLease.acquire(fs, path, staleMs = 60000)
    // rewrite the lock preserving the owner line but padding the tail far
    // past one 4 KiB read
    val lock = new Path(path + "__lock")
    val in = fs.open(lock)
    val ownerLine = scala.io.Source.fromInputStream(in, "UTF-8").getLines().next()
    in.close()
    val out = fs.create(lock, true)
    out.write((ownerLine + "\n" + ("x" * 20000) + "\n").getBytes("UTF-8"))
    out.close()
    held.heartbeat() // would throw if the owner line were truncated
    held.release()
    assert(!fs.exists(lock))
  }
}
