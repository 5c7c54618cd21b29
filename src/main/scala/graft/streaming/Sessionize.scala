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

  /** Streaming form: per-user state carries the open session; an event past
    * the gap closes it (emitting the finished session) and opens a new one.
    * Event-time timeout flushes an idle session once the watermark passes
    * `session_end + gapSec` — without it, each user's final session would
    * sit in state forever (and state would never expire) on an unbounded
    * stream.
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
        (userId: Long, rows: Iterator[SessionEventTs], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // watermark passed end+gap with no further events: the session
            // is final — emit and expire the state
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start, s.end, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts_sec, e.event_id))
            val out = Seq.newBuilder[SessionOut]
            var cur = state.getOption
            // single-open-session state: late events WITHIN the open
            // session's gap window merge into it (lowering start — the
            // naive `ts - end <= gap` alone would absorb arbitrarily old
            // events without moving start); events OLDER than the window
            // entirely sessionize among themselves and close within this
            // batch (they cannot extend across batches — the open slot
            // is taken; fully-unordered replays should use batch())
            val (ultraLate0, live) = cur match {
              case Some(s) => sorted.partition(_.ts_sec < s.start - gapSec)
              case None    => (Seq.empty[SessionEventTs], sorted)
            }
            live.foreach { e =>
              cur match {
                case Some(s) if e.ts_sec >= s.start - gapSec &&
                    e.ts_sec - s.end <= gapSec =>
                  cur = Some(s.copy(
                    start = math.min(s.start, e.ts_sec),
                    end = math.max(s.end, e.ts_sec), n = s.n + 1))
                case Some(s) =>
                  out += SessionOut(userId, s.start, s.end, s.n)
                  cur = Some(SessionState(e.ts_sec, e.ts_sec, 1))
                case None =>
                  cur = Some(SessionState(e.ts_sec, e.ts_sec, 1))
              }
            }
            // The partition above tested against the BATCH-START state,
            // but live merges can lower the open session's start by up to
            // gapSec per absorbed event — an "ultra-late" event inside the
            // final window belongs to the open session, not a synthetic
            // singleton. Re-test against the post-merge state; each
            // absorption lowers start further, so iterate to the fixpoint
            // (terminates: the bucket strictly shrinks each pass).
            var ultraLate = ultraLate0
            var absorbed = true
            while (absorbed) {
              absorbed = false
              cur.foreach { s =>
                val (abs, rest) =
                  ultraLate.partition(_.ts_sec >= s.start - gapSec)
                if (abs.nonEmpty) {
                  absorbed = true
                  // abs events all predate s.end, so end is unchanged
                  cur = Some(s.copy(
                    start = math.min(s.start, abs.head.ts_sec),
                    n = s.n + abs.size))
                  ultraLate = rest
                }
              }
            }
            var lateCur: Option[SessionState] = None
            ultraLate.foreach { e =>
              lateCur match {
                case Some(l) if e.ts_sec - l.end <= gapSec =>
                  lateCur = Some(l.copy(
                    end = math.max(l.end, e.ts_sec), n = l.n + 1))
                case Some(l) =>
                  out += SessionOut(userId, l.start, l.end, l.n)
                  lateCur = Some(SessionState(e.ts_sec, e.ts_sec, 1))
                case None =>
                  lateCur = Some(SessionState(e.ts_sec, e.ts_sec, 1))
              }
            }
            lateCur.foreach(l => out += SessionOut(userId, l.start, l.end, l.n))
            cur.foreach { s =>
              state.update(s)
              // fire once the event-time watermark passes the gap horizon;
              // must be strictly beyond the current watermark or Spark
              // rejects the timestamp (late-arriving replays)
              val horizon = (s.end + gapSec) * 1000L
              state.setTimeoutTimestamp(
                math.max(horizon, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
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
