package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WindowAggSpec extends SparkTestBase {
  import spark.implicits._

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)

  test("tumbling batch form equals date_trunc groupBy") {
    val ev = Seq(
      (ts("2024-01-01 00:10:00"), "click", 1.0),
      (ts("2024-01-01 00:50:00"), "click", 2.0),
      (ts("2024-01-01 01:05:00"), "view", 3.0),
      (ts("2024-01-01 01:59:59"), "view", 4.0)
    ).toDF("ts", "event_type", "value")

    val got = WindowAgg.tumbling(ev, "ts", "1 hour",
        keys = Seq("event_type"),
        aggs = Seq(count(lit(1)).as("n"), sum(col("value")).as("total")))
      .select(col("window_start"), col("event_type"), col("n"), col("total"))
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))

    val want = ev.groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .orderBy("h", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))

    assert(got.toSeq === want.toSeq)
  }

  test("eventTime adapts to nanos-as-long, timestamp, and ntz layouts") {
    // same instant three ways: 2024-01-01 00:10:00 UTC
    val instantMicros = 1704067800000000L
    val longDf = Seq(instantMicros * 1000L).toDF("ts") // nanos-as-long
    val tsDf = Seq(ts("2024-01-01 00:10:00")).toDF("ts") // session tz UTC
    val ntzDf = tsDf.select(col("ts").cast("timestamp_ntz").as("ts"))

    val outs = Seq(longDf, tsDf, ntzDf).map { df =>
      df.select(WindowAgg.eventTime(df, "ts").as("t"))
        .collect().head.getTimestamp(0).getTime
    }
    assert(outs.distinct.size === 1, s"layouts disagree: $outs")

    val secs = Seq(longDf, tsDf, ntzDf).map { df =>
      df.select(WindowAgg.eventEpochSeconds(df, "ts").as("s"))
        .collect().head.getLong(0)
    }
    assert(secs.distinct === Seq(instantMicros / 1000000L))
  }

  test("sliding windows: each event lands in width/slide windows") {
    val ev = Seq((ts("2024-01-01 00:10:00"), "click", 1.0))
      .toDF("ts", "event_type", "value")
    val got = WindowAgg.sliding(ev, "ts", "1 hour", "30 minutes",
        keys = Seq("event_type"), aggs = Seq(count(lit(1)).as("n")))
      .orderBy("window_start")
      .select(col("window_start"), col("n"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)))
    // 00:10 is inside [23:30,00:30) and [00:00,01:00)
    assert(got.length === 2)
    assert(got.map(_._2).forall(_ === 1L))
  }

  test("streaming: watermark closes windows, late rows beyond lateness dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val src = mem.toDF().toDF("ts", "event_type", "value")
    val agg = WindowAgg.tumbling(src, "ts", "1 hour",
      keys = Seq("event_type"),
      aggs = Seq(count(lit(1)).as("n"), sum(col("value")).as("total_value")),
      lateness = Some("30 minutes"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("windowagg_out").start()
    mem.addData(
      (ts("2024-01-01 00:10:00"), "click", 1.0),
      (ts("2024-01-01 00:50:00"), "click", 2.0))
    q.processAllAvailable()
    // watermark → 02:00-00:30=01:30 > 01:00: hour-0 closes and emits
    mem.addData((ts("2024-01-01 02:00:00"), "view", 3.0))
    q.processAllAvailable()
    // this hour-0 row is later than the 30-min lateness bound → dropped
    mem.addData((ts("2024-01-01 00:20:00"), "click", 99.0))
    q.processAllAvailable()
    val out = spark.sql(
      "SELECT event_type, n, total_value FROM windowagg_out ORDER BY event_type")
      .collect()
    q.stop()
    assert(out.length === 1) // only the closed hour-0 click window
    assert(out.head.getString(0) === "click")
    assert(out.head.getLong(1) === 2L)
    assert(out.head.getDouble(2) === 3.0)
  }
}
