package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming windowFunnel (SURVEY.md §2 B14's streaming twin):
  * ClickHouse's windowFunnel over an unbounded event stream via
  * `flatMapGroupsWithState`.
  *
  * Semantics match the batch operator
  * (graft.operators.ChAnalytics.windowFunnel — greedy-from-earliest):
  * step 1 anchors at the user's EARLIEST step-0 event; step i+1 is the
  * earliest step-i event strictly after step i and within `windowUs` of
  * the anchor. A user's funnel level is emitted exactly once, when the
  * event-time watermark passes `anchor + windowUs` (no later event can
  * change the greedy outcome after that point).
  *
  * State is BOUNDED: per tracked user we buffer only step events that
  * can still influence the outcome — once an anchor is known, events
  * outside (anchor, anchor+window] are pruned on arrival, so state per
  * user is O(step events inside one funnel window), and users leave
  * state entirely when their level is emitted. That is the property
  * that keeps the operator O(active windows), not O(history), at
  * 100 TB/day — the same bound ClickHouse's in-memory stateful scan
  * enjoys inside one block, made durable across a stream.
  */
object FunnelStream {

  /** (user, event-time, matched step index 0..k-1). Callers map their
    * condition columns to `step` (first matching condition wins, like
    * the batch operator's one-hot cond columns).
    */
  final case class StepEv(user_id: Long, ts: java.sql.Timestamp, step: Int) {
    def tsUs: Long = ts.getTime * 1000
  }

  /** Buffered step events + the known anchor (earliest step-0 seen). */
  final case class FunnelState(anchorUs: Long, firstUs: Long,
                               evs: List[(Long, Int)])

  final case class FunnelLevel(user_id: Long, level: Int)

  private val NoAnchor = Long.MaxValue

  /** Greedy level over the (pruned) buffer — identical recurrence to
    * the batch operator's stacked window-mins.
    */
  private[graft] def greedyLevel(evs: Seq[(Long, Int)], nSteps: Int,
                                     windowUs: Long): Int = {
    val sorted = evs.sortBy(identity)
    val t0 = sorted.collectFirst { case (ts, 0) => ts }
    t0 match {
      case None => 0
      case Some(anchor) =>
        var prev = anchor
        var level = 1
        var i = 1
        while (i < nSteps) {
          sorted.collectFirst {
            case (ts, s) if s == i && ts > prev && ts <= anchor + windowUs => ts
          } match {
            case Some(ts) => prev = ts; level = i + 1; i += 1
            case None => i = nSteps
          }
        }
        level
    }
  }

  /** Drop buffered events that can no longer matter given the anchor. */
  private def prune(anchorUs: Long, evs: List[(Long, Int)],
                    windowUs: Long): List[(Long, Int)] =
    if (anchorUs == NoAnchor) evs
    else evs.filter { case (ts, s) =>
      (s == 0 && ts == anchorUs) ||
        (ts > anchorUs && ts <= anchorUs + windowUs)
    }

  /** The stateful streaming funnel. `events` must stream (user_id, ts,
    * step) rows — pre-filtered to rows matching SOME condition; the
    * watermark horizon is how much event-time lateness is tolerated.
    */
  def funnelWithState(spark: SparkSession, events: DataFrame, nSteps: Int,
                      windowUs: Long,
                      lateness: String = "10 minutes"): Dataset[FunnelLevel] = {
    import spark.implicits._
    val typed = events
      .withWatermark("ts", lateness)
      .select(col("user_id").cast("long"), col("ts"), col("step").cast("int"))
      .as[StepEv]

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelLevel](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, evs, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(FunnelLevel(userId,
              greedyLevel(s.evs, nSteps, windowUs)))
          } else {
            val incoming = evs.map(e => (e.tsUs, e.step)).toList
            val old = state.getOption
              .getOrElse(FunnelState(NoAnchor, Long.MaxValue, Nil))
            val firstUs = math.min(old.firstUs, incoming.map(_._1).min)
            val anchorUs = (incoming.collect { case (ts, 0) => ts } ++
              (if (old.anchorUs == NoAnchor) Nil else List(old.anchorUs)))
              .minOption.getOrElse(NoAnchor)
            val buf = prune(anchorUs, old.evs ++ incoming, windowUs)
            state.update(FunnelState(anchorUs, firstUs, buf))
            // close when the watermark passes anchor+window (or, for
            // users whose step 0 never fired, first event + window —
            // a level-0 emission at the same horizon)
            val closeUs =
              (if (anchorUs == NoAnchor) firstUs else anchorUs) + windowUs
            // a timeout in the past (late data for an already-closable
            // funnel) is illegal — clamp to just past the watermark so
            // the emission happens on the next trigger instead
            state.setTimeoutTimestamp(
              math.max(closeUs / 1000 + 1, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Convenience: map an event_type column onto step indices. */
  def stepsOf(events: DataFrame, types: Seq[String]): DataFrame = {
    val step = types.zipWithIndex.foldRight(lit(-1)) {
      case ((t, i), other) => when(col("event_type") === t, lit(i)).otherwise(other)
    }
    events.withColumn("step", step).filter(col("step") >= 0)
  }
}
