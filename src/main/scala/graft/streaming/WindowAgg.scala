package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.apache.spark.sql.{Column, DataFrame}

/** Event-time window aggregation — tumbling or sliding — with watermark
  * lateness, usable identically in batch and streaming form (`window()` is
  * just an expression; only the watermark needs the streaming engine).
  *
  * The reference runs its event analytics as scheduled Glue batch jobs
  * (reference: artifacts/aws-glue/code/stage/light_transform.py — the hourly
  * re-aggregation pattern); Structured Streaming subsumes that: the same
  * `WindowAgg.tumbling` plan runs over a bounded DataFrame today and a
  * `readStream` source tomorrow, with `lateness` bounding state retention.
  *
  * At 100 TB scale the aggregation is a single shuffle on
  * (window, keys...) with map-side partial aggregation — no per-window
  * repartition, no driver involvement; streaming state is bounded by
  * (#open windows × #keys) because the watermark closes windows.
  */
object WindowAgg {

  /** Normalize an event-time column to TimestampType regardless of how the
    * fixture shipped it: nanos-as-long (`spark.sql.legacy.parquet.nanosAsLong`
    * on a timestamp[ns] parquet), TIMESTAMP_NTZ (timestamp[us] parquet read
    * without timezone), or a plain timestamp. Session timezone is UTC
    * (GraftSession), so the NTZ→TZ cast is value-preserving.
    */
  def eventTime(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case LongType => expr(s"timestamp_micros(`$tsCol` div 1000)")
      case TimestampType => col(tsCol)
      case _ => col(tsCol).cast(TimestampType) // TIMESTAMP_NTZ et al.
    }

  /** Same normalization to epoch seconds (truncating), for second-granular
    * operators like Sessionize.
    */
  def eventEpochSeconds(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case LongType => expr(s"`$tsCol` div 1000000000")
      case _ => unix_seconds(eventTime(df, tsCol))
    }

  /** Tumbling event-time windows of `width`, grouped by `keys`, computing
    * `aggs`. On a streaming DataFrame, `lateness` installs a watermark so
    * windows finalize and state is dropped; on a batch DataFrame it is
    * ignored (all data is present by definition).
    */
  def tumbling(events: DataFrame, tsCol: String, width: String,
      keys: Seq[String], aggs: Seq[Column],
      lateness: Option[String] = None): DataFrame =
    windowed(events, tsCol, width, slide = None, keys, aggs, lateness)

  /** Sliding windows: width `width`, advancing every `slide`. */
  def sliding(events: DataFrame, tsCol: String, width: String, slide: String,
      keys: Seq[String], aggs: Seq[Column],
      lateness: Option[String] = None): DataFrame =
    windowed(events, tsCol, width, Some(slide), keys, aggs, lateness)

  private def windowed(events: DataFrame, tsCol: String, width: String,
      slide: Option[String], keys: Seq[String], aggs: Seq[Column],
      lateness: Option[String]): DataFrame = {
    require(aggs.nonEmpty, "WindowAgg needs at least one aggregate")
    // Normalize the event-time layout up front so watermark + window agree.
    val evCol = "__event_time"
    val normalized = events.withColumn(evCol, eventTime(events, tsCol))
    val src = lateness match {
      case Some(d) if normalized.isStreaming => normalized.withWatermark(evCol, d)
      case _ => normalized
    }
    val win = slide match {
      case Some(sl) => window(col(evCol), width, sl)
      case None => window(col(evCol), width)
    }
    src.groupBy(win.as("window") +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Streaming sink helper: run the windowed aggregation continuously,
    * appending finalized windows to a parquet path. Append output mode means
    * a window row is emitted exactly once — when the watermark passes its
    * end — so the sink is an idempotent event-time rollup.
    *
    * One-shot caveat (`Trigger.AvailableNow`, the default): windows the
    * FINAL watermark has not passed — at least the last window, plus the
    * lateness allowance — stay in state and are NOT in the sink when the
    * query terminates; they emit on the next run once newer data
    * advances the watermark. For a complete one-shot backfill, use the
    * batch plan ([[tumbling]]/[[sliding]] on a static frame) — it is
    * plan-identical and has no watermark holdback.
    */
  def run(agg: DataFrame, outPath: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    agg.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
