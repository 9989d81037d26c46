package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.functions.KmvSketch

/** Streaming KMV / theta sketch (round 14) — the k-minima distinct
  * sketch maintained per group across micro-batches with
  * `flatMapGroupsWithState`: the streaming twin of
  * [[graft.functions.KmvSketch]], completing the sketch family's
  * batch/stream pairing (HLL, CMS, grid quantiles, SpaceSaving,
  * Bloom — and now theta).
  *
  * State is AT MOST k sorted longs per live group (k=256 → 2 KB) —
  * size tracks group cardinality, never stream length. Inserting is
  * set-union of minima, which is associative and order-independent,
  * so batch boundaries can NEVER change the registers (stronger than
  * the fold twins' in-order contract — no seq column needed); the
  * spec pins stream state == the batch sketch under any split.
  * Downstream, per-group sketches from the stream merge with batch
  * sketches (union of minima, re-trim) — the lambda-architecture
  * rollup the KMV estimator was chosen for.
  */
object KmvStream {

  final case class In(grp: Long, h: Long)
  final case class St(mins: List[Long])
  final case class Out(grp: Long, n_mins: Int, theta: Long, est: Long)

  /** One group's estimate from its current minima — the same
    * integer-divide estimator as the batch side.
    */
  def estimate(mins: List[Long], k: Int): Long =
    if (mins.size < k) mins.size.toLong
    else ((k - 1).toLong * KmvSketch.Space) / mins.last

  /** Update-mode running sketch: per touched group per micro-batch,
    * the current (n_mins, theta, distinct estimate).
    */
  def kmvWithState(spark: SparkSession, events: DataFrame,
                   k: Int): Dataset[Out] = {
    import spark.implicits._
    events.select(col("grp").cast("long"), col("h").cast("long"))
      .as[In]
      .groupByKey(_.grp)
      .flatMapGroupsWithState[St, Out](OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        case (gid, rows, state) =>
          val prev = state.getOption.map(_.mins).getOrElse(Nil)
          val mins = (prev ++ rows.map(_.h)).distinct.sorted.take(k)
          state.update(St(mins))
          val theta =
            if (mins.size < k) KmvSketch.Space else mins.last
          Iterator.single(Out(gid, mins.size, theta, estimate(mins, k)))
      }
  }
}
