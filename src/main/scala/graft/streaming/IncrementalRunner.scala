package graft.streaming

import graft.operators.{Dedup, MergeUpsert, WatermarkStore}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental-load semantics (SURVEY §2.9), in both batch and streaming
  * form.
  *
  * The reference's contract (orchestrator.py:559-627 + light_transform.py
  * dedup/MERGE): extract rows past the watermark, track max(partition
  * column), two-phase-save the watermark, keep-latest dedup + key-merge so
  * replayed/overlapping extracts are idempotent. Lateness = bounded
  * reprocess window — the batch analogue of `withWatermark`.
  */
object IncrementalRunner {

  /** One micro-batch: filter past the watermark, merge, advance watermark.
    * `wmColumn` must be monotonically increasing (the reference uses
    * DATETIME2/int partition columns).
    */
  def runBatch(
      spark: SparkSession,
      batch: DataFrame,
      stagePath: String,
      idCols: Seq[String],
      orderCols: Seq[String],
      wmColumn: String,
      store: WatermarkStore,
      wmKey: String
  ): Long = {
    val since = store.get(wmKey)
    val fresh = since match {
      // >= not >: rows SHARING the boundary timestamp that arrive in a
      // later batch would be silently dropped forever by a strict
      // comparison (second-granularity timestamps routinely collide).
      // Re-processing the boundary rows is free — keepLatest + the
      // MERGE are idempotent. (The JDBC extract predicate stays the
      // reference's strict `>`; there the trailing delay-window
      // re-extract covers the boundary instead.)
      // The stored value is a STRING; cast it to the column's own type
      // before comparing — with ANSI off, col >= lit(string) coerces
      // BOTH sides to Double, which rounds BIGINTs above 2^53 and can
      // silently drop boundary rows. NULL-watermark rows follow SQL
      // semantics (ingested by the initial full load, excluded by every
      // incremental predicate) — the reference's `col > last` contract.
      case Some(v) =>
        batch.filter(col(wmColumn) >=
          lit(v).cast(batch.schema(batch.schema.fieldIndex(wmColumn)).dataType))
      case None    => batch
    }
    // persisted: watermark max, merge, and row count all read this — one
    // materialization instead of three plan re-executions
    val cached = fresh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // A3 chunk-max watermark candidate over the extracted data
      val maxRow = cached.agg(max(col(wmColumn)).cast("string")).collect().head
      if (maxRow.isNullAt(0)) return 0L

      store.saveProvisional(wmKey, maxRow.getString(0))
      // materialized once: the merge and the returned count would
      // otherwise each run the keep-latest shuffle (localCheckpoint —
      // this is the per-micro-batch path, a persist would pin blocks)
      val deduped = Dedup.keepLatest(cached, idCols, orderCols)
        .localCheckpoint(true)
      MergeUpsert.upsertParquet(spark, deduped, stagePath, idCols)
      store.confirm(wmKey)
      deduped.count()
    } finally cached.unpersist()
  }

  /** Structured-Streaming wrapper: the same transform+merge function as the
    * batch body, applied per micro-batch via foreachBatch (the standard
    * Delta-style late-data upsert pattern). State lives entirely in the
    * merged table + watermark store, not in Spark state stores — restarting
    * the query is safe.
    */
  def runStream(
      spark: SparkSession,
      stream: DataFrame,
      stagePath: String,
      idCols: Seq[String],
      orderCols: Seq[String],
      wmColumn: String,
      store: WatermarkStore,
      wmKey: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        runBatch(spark, batch, stagePath, idCols, orderCols, wmColumn, store, wmKey)
        ()
      }
      .start()

  /** Tumbling-window event aggregation with lateness handling — the
    * streaming-native analytics the reference lacks but a 100 TB event
    * pipeline needs. Usable identically on a batch DataFrame (window() is
    * just an expression). NOTE: expects a true timestamp `tsCol` and the
    * fixed (event_type, value) schema; for schema-adaptive timestamps
    * (nanos-as-long fixtures) and arbitrary dims/aggs use
    * [[WindowAgg.tumbling]], which normalizes the event-time layout.
    */
  def windowedCounts(events: DataFrame, tsCol: String, windowLen: String,
      watermarkDelay: Option[String] = None): DataFrame = {
    val src = watermarkDelay match {
      case Some(d) if events.isStreaming => events.withWatermark(tsCol, d)
      case _                             => events
    }
    src.groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).alias("n"), sum(col("value")).alias("total_value"))
  }
}
