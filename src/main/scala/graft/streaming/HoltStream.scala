package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming Holt linear-trend smoothing (round 14) — the
  * q_holt_linear recurrence maintained per series key across
  * micro-batches with `flatMapGroupsWithState`: level+trend state
  * advances one integer fold step per arriving day.
  *
  * Same arithmetic as the batch gate: α=1/4, β=1/8 dyadic, every
  * division the explicit FLOOR div ((a − pmod)/n) — so on an in-order
  * daily feed the stream settles to EXACTLY the batch fold (the
  * DeltaSumStream in-order contract; rows are sorted by day inside
  * each batch, late days behind the state's last day refuse loudly
  * rather than silently corrupting the recurrence). State is three
  * longs per live series — (lastDay, l, b) — regardless of stream
  * length; the pre-init phase buffers only the FIRST observation
  * (init needs y₁ and y₂).
  */
object HoltStream {

  final case class In(key: Long, day: Long, cents: Long)
  final case class St(lastDay: Long, l: Long, b: Long, n: Long)
  final case class Out(key: Long, n_days: Long, level_c: Long,
                       trend_c: Long, forecast7_c: Long)

  private def fd(a: Long, n: Long): Long = {
    val m = ((a % n) + n) % n
    (a - m) / n
  }

  /** One recurrence step — shared with the spec's reference fold. */
  def step(l: Long, b: Long, y: Long): (Long, Long) = {
    val lp = fd(y + 3 * l + 3 * b, 4)
    val bp = fd(lp - l + 7 * b, 8)
    (lp, bp)
  }

  /** Update-mode running state: per touched series per micro-batch,
    * the current (n_days, level, trend, 7-day forecast).
    */
  def holtWithState(spark: SparkSession, events: DataFrame)
      : Dataset[Out] = {
    import spark.implicits._
    events.select(col("key").cast("long"), col("day").cast("long"),
        col("cents").cast("long"))
      .as[In]
      .groupByKey(_.key)
      .flatMapGroupsWithState[St, Out](OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        case (k, rows, state) =>
          var st = state.getOption.getOrElse(St(Long.MinValue, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.day).foreach { r =>
            require(r.day > st.lastDay,
              s"holt stream key $k: day ${r.day} at-or-behind state day " +
                s"${st.lastDay} — out-of-order feed corrupts the recurrence")
            st =
              if (st.n == 0L) St(r.day, r.cents, 0L, 1L)
              else if (st.n == 1L) // init: l₁=y₁ then fold y₂ with b₁=y₂−y₁
                {
                  val b1 = r.cents - st.l
                  val (l2, b2) = step(st.l, b1, r.cents)
                  St(r.day, l2, b2, 2L)
                }
              else {
                val (lp, bp) = step(st.l, st.b, r.cents)
                St(r.day, lp, bp, st.n + 1L)
              }
          }
          state.update(st)
          if (st.n >= 2L)
            Iterator.single(Out(k, st.n, st.l, st.b, st.l + 7 * st.b))
          else Iterator.empty
      }
  }
}
