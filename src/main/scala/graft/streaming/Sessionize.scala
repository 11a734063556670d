package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization over the event stream: gap-based sessions via the
  * built-in `session_window` (identical semantics in batch and
  * streaming), plus a custom-state `flatMapGroupsWithState`
  * implementation for session logic the declarative window can't express
  * (per-session derived state, early emission, custom merge rules).
  */
object Sessionize {

  /** Gap-based sessions, declarative: works unchanged on batch and
    * streaming DataFrames. A new session starts when the inter-event gap
    * is >= `gap`; session end = last event + gap.
    */
  def sessionWindows(events: DataFrame, tsCol: String, keyCol: String,
                     gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming variant: watermarked so state for closed sessions is
    * dropped; append mode emits a session only once it can no longer
    * grow.
    */
  def streamingSessions(events: DataFrame, tsCol: String, keyCol: String,
                        gap: String = "30 minutes",
                        watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("sum_value"))

  // ---- custom-state path ----

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, lastMicros: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long, sum_value: Double)

  /** flatMapGroupsWithState sessionizer: one state object per user, closed
    * sessions emitted on gap break or event-time timeout. The imperative
    * twin of [[sessionWindows]] for when per-session state must carry
    * custom structure.
    *
    * Timeouts are event-time, not processing-time: the session closes
    * once the watermark passes last-event + gap, which (a) emits the
    * final session per key and expires its state — unbounded state growth
    * otherwise — and (b) is deterministic under replay. (Processing-time
    * timeouts also make `shouldRunAnotherBatch` true on every batch,
    * which livelocks drain-style consumers like processAllAvailable.)
    */
  def statefulSessions(events: Dataset[SessionEvent],
                       gapMinutes: Long = 30,
                       watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L

    def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last-event + gap: close and emit the open
            // session, drop its state
            val s = state.get
            state.remove()
            Iterator.single(
              SessionOut(user, toTs(s.start), toTs(s.lastMicros + gapMicros), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var cur = state.getOption.orNull
            sorted.foreach { e =>
              val m = micros(e.ts)
              cur match {
                case null =>
                  cur = SessionState(m, m, 1, e.value)
                case s if m - s.lastMicros < gapMicros =>
                  cur = SessionState(s.start, m, s.n + 1, s.sum + e.value)
                case s =>
                  out += SessionOut(user, toTs(s.start), toTs(s.lastMicros + gapMicros), s.n, s.sum)
                  cur = SessionState(m, m, 1, e.value)
              }
            }
            if (cur != null) {
              state.update(cur)
              // close time must sit past the current watermark or Spark
              // rejects it; late stragglers can only push it forward
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs + 1, (cur.lastMicros + gapMicros) / 1000L))
            }
            out.iterator
          }
      }
  }

  /** [[statefulSessions]] on the modern `transformWithState` API
    * (Spark 4 StatefulProcessor + RocksDB state store): same gap
    * semantics, but state is a typed ValueState and session expiry is an
    * explicit event-time TIMER instead of a blanket group timeout — the
    * shape that scales to many state variables and per-key timers. The
    * query must run with the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`).
    */
  class GapSessionProcessor(gapMinutes: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, SessionEvent, SessionOut] {
    private val gapMicros = gapMinutes * 60L * 1000000L
    @transient private var session: org.apache.spark.sql.streaming.ValueState[SessionState] = _

    private def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
    private def toTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    private def closeMs(s: SessionState): Long = (s.lastMicros + gapMicros) / 1000L

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(e => micros(e.ts))
      val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
      var cur = if (session.exists()) session.get() else null
      sorted.foreach { e =>
        val m = micros(e.ts)
        cur match {
          case null =>
            cur = SessionState(m, m, 1, e.value)
          case s if m - s.lastMicros < gapMicros =>
            cur = SessionState(s.start, m, s.n + 1, s.sum + e.value)
          case s =>
            out += SessionOut(user, toTs(s.start), toTs(s.lastMicros + gapMicros), s.n, s.sum)
            cur = SessionState(m, m, 1, e.value)
        }
      }
      if (cur != null) {
        session.update(cur)
        getHandle.registerTimer(math.max(
          timerValues.getCurrentWatermarkInMs() + 1, closeMs(cur)))
      }
      out.iterator
    }

    override def handleExpiredTimer(user: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] = {
      // stale-timer guard: a session extended after this timer was set is
      // not closeable yet — re-arm at the true close time instead
      if (!session.exists()) Iterator.empty
      else {
        val s = session.get()
        if (timerValues.getCurrentWatermarkInMs() >= closeMs(s)) {
          session.clear()
          Iterator.single(SessionOut(user, toTs(s.start), toTs(s.lastMicros + gapMicros), s.n, s.sum))
        } else {
          getHandle.registerTimer(closeMs(s))
          Iterator.empty
        }
      }
    }
  }

  /** transformWithState driver for [[GapSessionProcessor]]. */
  def statefulSessionsTws(events: Dataset[SessionEvent],
                          gapMinutes: Long = 30,
                          watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new GapSessionProcessor(gapMinutes),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Flush helper for batch use of the stateful path: emits the final
    * (still-open) session per user so batch totals reconcile.
    */
  def statefulSessionsBatch(events: Dataset[SessionEvent],
                            gapMinutes: Long = 30): DataFrame = {
    // In batch mode flatMapGroupsWithState sees each group exactly once and
    // state dies with the job, so closed sessions come from the iterator
    // and the trailing open session must be emitted inline. Reuse the
    // declarative path as the batch answer; the stateful path is for
    // streams. (Kept for API symmetry.)
    sessionWindows(events.toDF(), "ts", "user_id", s"$gapMinutes minutes")
  }
}
