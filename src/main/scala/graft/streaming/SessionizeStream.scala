package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization (SURVEY.md §2 B9's streaming twin) — two
  * Spark-first strategies:
  *
  *  - [[hourlySessionWindows]]: the built-in `session_window` gap
  *    window — declarative, state managed by Spark, the default choice.
  *  - [[sessionizeWithState]]: `flatMapGroupsWithState` with explicit
  *    per-user state — the mechanism for session semantics the built-in
  *    can't express (e.g. ClickHouse-style sessions capped at N events,
  *    or emitting partial session snapshots). State is one small record
  *    per active user; event-time timeout closes sessions when the
  *    watermark passes the gap, so state size tracks ACTIVE users only,
  *    regardless of total history — the property that matters at
  *    100 TB/day.
  */
object SessionizeStream {

  /** Built-in session windows: 30-min gap, per user. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("user_id"), col("n_events"))

  // ts stays a Timestamp through the typed projection: the watermark
  // tag lives on that column, and event-time timeout requires it to
  // survive into the stateful operator.
  final case class Ev(user_id: Long, ts: java.sql.Timestamp) {
    def tsUs: Long = ts.getTime * 1000
  }
  final case class SessionState(start_us: Long, last_us: Long, n: Long)
  final case class ClosedSession(user_id: Long, start_us: Long,
                                 end_us: Long, n_events: Long)

  /** Explicit-state sessionizer: emits a session when the event-time
    * watermark passes `gapUs` beyond its last event.
    */
  def sessionizeWithState(spark: SparkSession, events: DataFrame,
                          gapUs: Long = 30L * 60 * 1000000): Dataset[ClosedSession] = {
    import spark.implicits._
    val typed = events
      .withWatermark("ts", "30 minutes")
      .select(col("user_id").cast("long"), col("ts"))
      .as[Ev]

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed: close and emit the session
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.start_us, s.last_us, s.n))
          } else {
            // fold new events into (possibly several) sessions; emit the
            // ones already closed by a later event, keep the open one
            val sorted = evs.map(_.tsUs).toSeq.sorted
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { ts =>
              cur match {
                case Some(s) if ts - s.last_us <= gapUs =>
                  cur = Some(SessionState(s.start_us, ts, s.n + 1))
                case Some(s) =>
                  closed ::= ClosedSession(userId, s.start_us, s.last_us, s.n)
                  cur = Some(SessionState(ts, ts, 1))
                case None =>
                  cur = Some(SessionState(ts, ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes last event + gap
              state.setTimeoutTimestamp((s.last_us + gapUs) / 1000 + 1)
            }
            closed.reverseIterator
          }
      }
  }
}
