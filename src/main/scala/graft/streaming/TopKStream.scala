package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.functions.SpaceSaving

/** Streaming topK (round 13) — the SpaceSaving sketch maintained per
  * group across micro-batches with `flatMapGroupsWithState`: the
  * streaming twin of [[graft.functions.SpaceSaving.topKSketch]].
  *
  * Rows fold in (seq) order within each batch, so on an in-order feed
  * batch boundaries never change the registers (spec-pinned equal to
  * the plain-Scala fold of the same sequence under any batch split —
  * the DeltaSumStream discipline). State is AT MOST k counters per
  * live group — size tracks group cardinality, never stream length;
  * add a ProcessingTimeTimeout where groups churn.
  */
object TopKStream {

  final case class In(grp: Long, seq: Long, item: Long, w: Long)
  final case class St(regs: List[SpaceSaving.Ctr])
  final case class Out(grp: Long, item: Long, cnt_est: Long,
                       err_bound: Long)

  /** Update-mode running registers: the group's current top-k counters
    * (count desc, item asc) per touched group per micro-batch.
    */
  def topKWithState(spark: SparkSession, events: DataFrame,
                    k: Int): Dataset[Out] = {
    import spark.implicits._
    events.select(col("grp").cast("long"), col("seq").cast("long"),
        col("item").cast("long"), col("w").cast("long"))
      .as[In]
      .groupByKey(_.grp)
      .flatMapGroupsWithState[St, Out](OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        case (gid, rows, state) =>
          var regs = state.getOption.map(_.regs).getOrElse(Nil)
          rows.toSeq.sortBy(_.seq).foreach { r =>
            regs = SpaceSaving.insert(regs, r.item, r.w, k)
          }
          state.update(St(regs))
          regs.sortBy(r => (-r.c, r.v)).iterator
            .map(r => Out(gid, r.v, r.c, r.e))
      }
  }
}
