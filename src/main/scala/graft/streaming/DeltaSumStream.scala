package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming deltaSum (round 12) — B37's streaming twin: the running
  * sum of positive deltas per counter series, maintained across
  * micro-batches with `mapGroupsWithState`.
  *
  * Counter scrapes arrive per-series in event order (that IS the
  * monitoring contract); rows that violate it (ts at or before the
  * last applied point) are NOT folded — they increment a per-series
  * `n_late` audit counter instead, because a late fold would
  * fabricate a reset (negative delta swallowed) or double-count an
  * increase. Within a batch, rows fold in (ts, tie) order, so batch
  * boundaries never change the result on ordered input — spec-pinned
  * equal to the batch [[graft.operators.ChAnalytics.deltaSum]] under
  * any batch split.
  *
  * State is FIVE longs per live series (last ts/tie/value, the
  * running sum, the late count) — size tracks series cardinality,
  * never stream length; CH counters are long-lived so no TTL is
  * applied (add a ProcessingTimeTimeout where series churn).
  */
object DeltaSumStream {

  final case class Pt(series: Long, ts_us: Long, tie: Long, v: Long)
  final case class St(last_ts: Long, last_tie: Long, last_v: Long,
                      delta_sum: Long, n_late: Long, started: Boolean)
  final case class Out(series: Long, delta_sum: Long, last_v: Long,
                       n_late: Long)

  /** Update-mode running deltaSum: one Out row per touched series per
    * micro-batch, carrying the series' current running state.
    */
  def deltaSumWithState(spark: SparkSession,
                        events: DataFrame): Dataset[Out] = {
    import spark.implicits._
    events.select(col("series").cast("long"), col("ts_us").cast("long"),
        col("tie").cast("long"), col("v").cast("long"))
      .as[Pt]
      .groupByKey(_.series)
      .mapGroupsWithState[St, Out](GroupStateTimeout.NoTimeout) {
        case (sid, pts, state) =>
          var st = state.getOption
            .getOrElse(St(0L, 0L, 0L, 0L, 0L, started = false))
          pts.toSeq.sortBy(p => (p.ts_us, p.tie)).foreach { p =>
            val late = st.started &&
              (p.ts_us < st.last_ts ||
                (p.ts_us == st.last_ts && p.tie <= st.last_tie))
            if (late) st = st.copy(n_late = st.n_late + 1)
            else {
              val d =
                if (!st.started) 0L
                else math.max(0L, p.v - st.last_v)
              st = St(p.ts_us, p.tie, p.v, st.delta_sum + d, st.n_late,
                started = true)
            }
          }
          state.update(st)
          Out(sid, st.delta_sum, st.last_v, st.n_late)
      }
  }
}
