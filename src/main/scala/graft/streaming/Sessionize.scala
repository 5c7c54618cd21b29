package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** Gap-based sessionization of an event stream — the canonical stateful
  * operator a 100 TB event pipeline needs (not present in the reference,
  * which has no streaming runtime; SURVEY §2.9).
  *
  * Two equivalent implementations:
  *   - [[batch]]: lag + cumulative-sum window functions — one shuffle on
  *     the user key; runs on any DataFrame and is SQL-oracle-checkable.
  *   - [[streaming]]: `flatMapGroupsWithState` with event-time timeout —
  *     true incremental state for unbounded streams; sessions are emitted
  *     when the gap timeout expires.
  */
object Sessionize {

  final case class SessionEvent(user_id: Long, ts_sec: Long, event_id: Long)
  final case class SessionEventTs(
      user_id: Long, ts_sec: Long, event_id: Long, event_ts: java.sql.Timestamp)
  final case class SessionOut(
      user_id: Long, session_start: Long, session_end: Long, n_events: Long)
  final case class SessionState(start: Long, end: Long, n: Long)
  /** Per-user state: ALL sessions the watermark has not finalized, kept
    * gap-separated and start-ordered. Holding every unfinalized session
    * (not just the newest) is what makes the Append output correct under
    * the configured lateness: an in-delay late event can still merge
    * into — or bridge — any held session; a session is emitted exactly
    * once, when the watermark passes `end + gap` and no legal event can
    * extend it. State size is bounded by the lateness window, not the
    * stream (sessions older than watermark − delay finalize and leave).
    */
  final case class SessionBuf(sessions: List[SessionState])

  /** Batch form: a new session starts when the gap to the previous event of
    * the same user exceeds `gapSec`. session_id = running count of session
    * starts; one hash shuffle on user_id, both windows share it.
    */
  def batch(events: DataFrame, userCol: String, tsSecCol: String,
      tieBreakCol: String, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsSecCol), col(tieBreakCol))
    val newSession = when(
      col(tsSecCol) - lag(col(tsSecCol), 1).over(byUser) > gapSec, 1)
      .otherwise(when(lag(col(tsSecCol), 1).over(byUser).isNull, 1).otherwise(0))
    events
      .withColumn("__new", newSession)
      .withColumn("session_id",
        sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsSecCol)).alias("session_start"),
        max(col(tsSecCol)).alias("session_end"),
        count(lit(1)).alias("n_events"))
  }

  /** Streaming form: per-user state holds every session the watermark
    * has not finalized ([[SessionBuf]]); each batch folds state sessions
    * and new events together in start order (one pass merges, extends,
    * and bridges — a late event within the lateness allowance lands in
    * the session it temporally belongs to, even one a newer event
    * arrived after). A session emits exactly once, when the event-time
    * watermark passes `session_end + gapSec` — either in the batch that
    * advanced the watermark or via event-time timeout for idle users.
    *
    * @param watermarkDelaySec allowed event lateness; the source must carry
    *        event time, derived here from `ts_sec`
    */
  def streaming(
      spark: SparkSession,
      events: Dataset[SessionEvent],
      gapSec: Long,
      watermarkDelaySec: Long = 0
  ): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withColumn("event_ts", col("ts_sec").cast("timestamp"))
      .withWatermark("event_ts", s"$watermarkDelaySec seconds")
      .as[SessionEventTs]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (userId: Long, rows: Iterator[SessionEventTs], state: GroupState[SessionBuf]) => {
          val held = state.getOption.map(_.sessions).getOrElse(Nil)
          // One sorted fold does all the session algebra: every new event
          // becomes a unit session, and adjacent entries within gapSec
          // merge — that simultaneously extends held sessions (either
          // direction), bridges two held sessions through a late event,
          // and sessionizes brand-new events among themselves. Held
          // sessions are gap-separated by invariant, so without events
          // the fold is the identity.
          val merged =
            if (state.hasTimedOut) held
            else {
              val evs = rows.toSeq.sortBy(e => (e.ts_sec, e.event_id))
                .map(e => SessionState(e.ts_sec, e.ts_sec, 1))
              (held ++ evs).sortBy(s => (s.start, s.end))
                .foldLeft(List.empty[SessionState]) { (acc, s) =>
                  acc match {
                    case h :: t if s.start - h.end <= gapSec =>
                      SessionState(h.start, math.max(h.end, s.end),
                        h.n + s.n) :: t
                    case _ => s :: acc
                  }
                }.reverse
            }
          // A session is FINAL once the watermark passes end + gap: any
          // future event close enough to extend it would be below the
          // watermark and dropped by Spark's late-row filter. Emitting on
          // watermark passage (never on "a newer event arrived") is what
          // honors watermarkDelaySec — the old single-open-session shape
          // emitted eagerly and split sessions on in-delay late events.
          val wm = state.getCurrentWatermarkMs()
          val (done, kept) = merged.partition(s => (s.end + gapSec) * 1000L < wm)
          if (kept.isEmpty) state.remove()
          else {
            state.update(SessionBuf(kept))
            // fire when the watermark passes the EARLIEST pending expiry;
            // must be strictly beyond the current watermark or Spark
            // rejects the timestamp (late-arriving replays)
            val horizon = kept.map(s => (s.end + gapSec) * 1000L).min
            state.setTimeoutTimestamp(math.max(horizon, wm + 1))
          }
          done.iterator.map(s => SessionOut(userId, s.start, s.end, s.n))
        })
  }

  /** End-of-replay reconciliation: recompute ALL sessions batch-side
    * (closed ones included). The result REPLACES a streaming query's
    * emitted output — unioning the two double-counts every closed
    * session. For draining only the open remainder, diff against the
    * streamed output on (user_id, session_start).
    */
  def flushOpenSessions(
      spark: SparkSession,
      events: Dataset[SessionEvent],
      gapSec: Long
  ): Dataset[SessionOut] = {
    import spark.implicits._
    val closed = batch(events.toDF(), "user_id", "ts_sec", "event_id", gapSec)
    closed.select(
      col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .as[SessionOut]
  }
}
