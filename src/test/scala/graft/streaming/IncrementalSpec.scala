package graft.streaming

import graft.SparkTestBase
import graft.operators.WatermarkStore
import org.apache.spark.sql.functions._

import java.nio.file.Files

class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  test("runBatch: watermark advances; overlapping replay is idempotent") {
    val root = Files.createTempDirectory("graft-incr").toString
    val store = new WatermarkStore(spark, s"$root/wm")
    val key = store.key("p", "t", "ts")

    val b1 = Seq((1, 10, "a"), (2, 20, "b"), (1, 30, "a2"))
      .toDF("id", "ts", "v")
    val n1 = IncrementalRunner.runBatch(spark, b1, s"$root/stage",
      Seq("id"), Seq("ts"), "ts", store, key)
    assert(n1 === 2) // keep-latest collapsed id=1
    assert(store.get(key) === Some("30"))
    val s1 = spark.read.parquet(s"$root/stage").orderBy("id").collect()
    assert(s1.map(r => (r.getInt(0), r.getString(2))).toSeq === Seq((1, "a2"), (2, "b")))

    // overlapping batch: ts 25-50; rows ≤ 30 filtered by watermark
    val b2 = Seq((2, 25, "stale"), (2, 50, "b2"), (3, 40, "c"))
      .toDF("id", "ts", "v")
    val n2 = IncrementalRunner.runBatch(spark, b2, s"$root/stage",
      Seq("id"), Seq("ts"), "ts", store, key)
    assert(n2 === 2)
    assert(store.get(key) === Some("50"))
    val s2 = spark.read.parquet(s"$root/stage").orderBy("id").collect()
    assert(s2.map(r => (r.getInt(0), r.getString(2))).toSeq ===
      Seq((1, "a2"), (2, "b2"), (3, "c")))

    // replay of b2: only the BOUNDARY row (ts = watermark) re-merges —
    // the >= filter keeps it so a boundary row landing in a later batch
    // is never lost — and the merge is idempotent: stage unchanged
    val n3 = IncrementalRunner.runBatch(spark, b2, s"$root/stage",
      Seq("id"), Seq("ts"), "ts", store, key)
    assert(n3 === 1)
    assert(store.get(key) === Some("50"))
    val s3 = spark.read.parquet(s"$root/stage").orderBy("id").collect()
    assert(s3.map(r => (r.getInt(0), r.getString(2))).toSeq ===
      Seq((1, "a2"), (2, "b2"), (3, "c")))
    // a boundary-sharing row arriving late is captured, not dropped
    val b3 = Seq((9, 50, "late-boundary")).toDF("id", "ts", "v")
    val n4 = IncrementalRunner.runBatch(spark, b3, s"$root/stage",
      Seq("id"), Seq("ts"), "ts", store, key)
    assert(n4 === 1)
    assert(spark.read.parquet(s"$root/stage").count() === 4)
  }

  test("streaming wrapper: foreachBatch merge over a file stream") {
    val root = Files.createTempDirectory("graft-stream").toString
    val srcDir = s"$root/src"
    Seq((1, 10, "a"), (2, 20, "b")).toDF("id", "ts", "v")
      .write.mode("overwrite").parquet(srcDir)

    val store = new WatermarkStore(spark, s"$root/wm")
    val key = store.key("p", "t", "ts")
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
    val q = IncrementalRunner.runStream(spark, stream, s"$root/stage",
      Seq("id"), Seq("ts"), "ts", store, key, s"$root/ckpt")
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(s"$root/stage").count() === 2)
    assert(store.get(key) === Some("20"))
  }

  test("windowedCounts streaming form: watermark + tumbling window emits on close") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val src = mem.toDF().toDF("ts", "event_type", "value")
    val agg = IncrementalRunner.windowedCounts(src, "ts", "1 hour", Some("30 minutes"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("win_out").start()
    mem.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:50:00"), "click", 2.0))
    q.processAllAvailable()
    // advance the watermark past hour 0 so its window closes and emits
    mem.addData((java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), "view", 3.0))
    q.processAllAvailable()
    val out = spark.sql("SELECT event_type, n, total_value FROM win_out").collect()
    q.stop()
    assert(out.length === 1) // hour-0 click window closed; hour-2 still open
    assert(out.head.getString(0) === "click")
    assert(out.head.getLong(1) === 2L)
  }

  test("sessionize: batch form splits on gap; streaming form agrees on closed sessions") {
    import graft.streaming.Sessionize
    import graft.streaming.Sessionize.{SessionEvent, SessionOut}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode

    // user 1: two sessions (gap 2000s > 1800); user 2: one session
    val rows = Seq(
      SessionEvent(1L, 1000L, 1L), SessionEvent(1L, 1500L, 2L),
      SessionEvent(1L, 3600L, 3L), // 2100s gap → new session
      SessionEvent(2L, 100L, 4L))

    val batchGot = Sessionize.batch(rows.toDF(), "user_id", "ts_sec", "event_id", 1800)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(batchGot.toSeq === Seq(
      (1L, 1000L, 1500L, 2L), (1L, 3600L, 3600L, 1L), (2L, 100L, 100L, 1L)))

    // streaming: feed the same events. The watermark after the batch is
    // 3600 (max event time, delay 0): user 1's first session closes on the
    // gap, user 2's idle session flushes by event-time timeout
    // (100+1800 < 3600); user 1's open session (timeout 5400) stays in state
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = Sessionize.streaming(spark, mem.toDS(), 1800)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_out").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val emitted = spark.sql("SELECT * FROM sess_out").as[SessionOut].collect()
    q.stop()
    assert(emitted.toSeq.sortBy(_.user_id) === Seq(
      SessionOut(1L, 1000L, 1500L, 2L), SessionOut(2L, 100L, 100L, 1L)))
  }

  test("sessionize streaming: event-time timeout flushes idle sessions") {
    import graft.streaming.Sessionize
    import graft.streaming.Sessionize.{SessionEvent, SessionOut}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = Sessionize.streaming(spark, mem.toDS(), gapSec = 1800)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_idle").start()

    // batch 1: user 1's only session — no later user-1 events ever arrive
    mem.addData(SessionEvent(1L, 1000L, 1L), SessionEvent(1L, 1500L, 2L))
    q.processAllAvailable()
    assert(spark.sql("SELECT * FROM sess_idle").count() === 0) // still open

    // batch 2 advances the watermark past 1500+1800 via another user;
    // batch 3 evaluates timeouts against that watermark
    mem.addData(SessionEvent(2L, 10000L, 3L))
    q.processAllAvailable()
    mem.addData(SessionEvent(2L, 10001L, 4L))
    q.processAllAvailable()
    val emitted = spark.sql("SELECT * FROM sess_idle").as[SessionOut].collect()
    q.stop()
    // user 1's idle session was flushed by timeout, no further events needed
    assert(emitted.toSeq.contains(SessionOut(1L, 1000L, 1500L, 2L)))
  }

  test("sessionize streaming: ultra-late event re-tested against post-merge start") {
    import graft.streaming.Sessionize
    import graft.streaming.Sessionize.{SessionEvent, SessionOut}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    // generous watermark delay so deliberately-late events reach the state fn
    val out = Sessionize.streaming(spark, mem.toDS(), gapSec = 1800,
      watermarkDelaySec = 50000)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_late_merge").start()

    // batch 1: open session (10000, 10000)
    mem.addData(SessionEvent(1L, 10000L, 1L))
    q.processAllAvailable()
    // batch 2: ts=8500 merges live (start drops to 8500, cutoff 8200→6700);
    // ts=7000 sits between the batch-start cutoff (8200) and the post-merge
    // cutoff (6700) — it belongs to the open session, not a singleton
    mem.addData(SessionEvent(1L, 8500L, 2L), SessionEvent(1L, 7000L, 3L))
    q.processAllAvailable()
    // advance the watermark far enough to flush user 1 by timeout
    mem.addData(SessionEvent(2L, 200000L, 4L))
    q.processAllAvailable()
    mem.addData(SessionEvent(2L, 200001L, 5L))
    q.processAllAvailable()
    val emitted = spark.sql("SELECT * FROM sess_late_merge")
      .as[SessionOut].collect().toSeq
    q.stop()
    assert(emitted.contains(SessionOut(1L, 7000L, 10000L, 3L)),
      s"expected one merged session, got $emitted")
    assert(!emitted.contains(SessionOut(1L, 7000L, 7000L, 1L)),
      "ultra-late event must not split into a singleton session")
  }

  test("sessionize streaming: absorption completes before a later event closes the session") {
    import graft.streaming.Sessionize
    import graft.streaming.Sessionize.{SessionEvent, SessionOut}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = Sessionize.streaming(spark, mem.toDS(), gapSec = 1000,
      watermarkDelaySec = 100000)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_absorb_first").start()
    // batch 1: open session (10000, 11000)
    mem.addData(SessionEvent(1L, 10000L, 1L), SessionEvent(1L, 11000L, 2L))
    q.processAllAvailable()
    // batch 2 mixes: a live merge (9100), an event that closes the session
    // (20000), and an ultra-late event (8500) that belongs to the session
    // only via the 9100 merge. The close must not race the absorption: the
    // session emits as (8500, 11000, 4), never (9100, 11000, 3) plus a
    // spurious (8500, 8500, 1) singleton.
    mem.addData(SessionEvent(1L, 9100L, 3L), SessionEvent(1L, 20000L, 4L),
      SessionEvent(1L, 8500L, 5L))
    q.processAllAvailable()
    // advance the watermark past end+gap so the held session finalizes
    mem.addData(SessionEvent(2L, 200000L, 6L))
    q.processAllAvailable()
    mem.addData(SessionEvent(2L, 200001L, 7L))
    q.processAllAvailable()
    val emitted = spark.sql("SELECT * FROM sess_absorb_first")
      .as[SessionOut].collect().toSeq
    q.stop()
    assert(emitted.contains(SessionOut(1L, 8500L, 11000L, 4L)),
      s"expected the fully-absorbed session, got $emitted")
    assert(!emitted.exists(s => s.session_start == 8500L && s.n_events == 1L),
      "ultra-late event must not become a singleton")
    assert(!emitted.exists(s => s.session_start == 9100L),
      "session must not close before absorbing the ultra-late event")
  }

  test("sessionize streaming: in-delay late event merges into a session a newer event arrived after") {
    import graft.streaming.Sessionize
    import graft.streaming.Sessionize.{SessionEvent, SessionOut}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    // the lateness CONTRACT: any event within watermarkDelaySec must land
    // in the session it temporally belongs to — even when a much newer
    // event already arrived (the old shape emitted [50,50] eagerly on the
    // t=200 arrival, then mis-emitted the legal t=58 as a singleton)
    val out = Sessionize.streaming(spark, mem.toDS(), gapSec = 10,
      watermarkDelaySec = 150)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_holdback").start()
    mem.addData(SessionEvent(1L, 50L, 1L))
    q.processAllAvailable()
    mem.addData(SessionEvent(1L, 200L, 2L))
    q.processAllAvailable()
    mem.addData(SessionEvent(1L, 58L, 3L)) // legal: watermark is 50
    q.processAllAvailable()
    mem.addData(SessionEvent(2L, 500L, 4L)) // advance watermark to 350
    q.processAllAvailable()
    mem.addData(SessionEvent(2L, 501L, 5L)) // evaluate timeouts against it
    q.processAllAvailable()
    val emitted = spark.sql("SELECT * FROM sess_holdback")
      .as[SessionOut].collect().toSeq
    q.stop()
    assert(emitted.contains(SessionOut(1L, 50L, 58L, 2L)),
      s"t=58 must merge into the held [50,50] session, got $emitted")
    assert(emitted.contains(SessionOut(1L, 200L, 200L, 1L)))
    assert(!emitted.exists(s => s.user_id == 1L && s.session_start == 50L &&
      s.session_end == 50L), "the [50,50] session must not emit eagerly")
    assert(!emitted.exists(s => s.session_start == 58L),
      "the late event must not split into a singleton")
  }

  test("windowedCounts batch form groups by tumbling window") {
    val df = Seq(
      ("2024-01-01 00:10:00", "click", 1.0),
      ("2024-01-01 00:50:00", "click", 2.0),
      ("2024-01-01 01:10:00", "view", 3.0)
    ).toDF("ts_s", "event_type", "value")
      .withColumn("ts", $"ts_s".cast("timestamp"))
    val got = IncrementalRunner.windowedCounts(df, "ts", "1 hour")
      .select($"window.start".cast("string"), $"event_type", $"n", $"total_value")
      .orderBy("event_type")
      .collect()
    assert(got.length === 2)
    assert(got(0).getString(0) === "2024-01-01 00:00:00")
    assert(got(0).getLong(2) === 2L)
  }
}
