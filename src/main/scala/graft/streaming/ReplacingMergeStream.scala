package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ReplacingMergeTree (reference main.py:65,178): the
  * keep-latest-version-per-key semantic of the target engine's table,
  * maintained incrementally over an unbounded upsert stream instead of
  * settled by background merges + OPTIMIZE.
  *
  * Two Spark-first strategies, mirroring the batch operator
  * (graft.operators.ReplacingMerge):
  *
  *  - [[latestByKey]]: declarative — a streaming
  *    `groupBy(key).agg(max_by(row, version))` in update output mode.
  *    Spark manages the state; every micro-batch emits the keys it
  *    touched with their current winner. The default choice.
  *  - [[latestByKeyWithState]]: `flatMapGroupsWithState` — emits a key
  *    ONLY when its winner actually changes (an update-log / CDC shape
  *    the built-in aggregation can't express: max_by re-emits the
  *    winner even when a stale late row loses).
  *
  * State in both is one small record per key — exactly the cardinality
  * of the ReplacingMergeTree table itself, the floor for this semantic
  * at any scale.
  */
object ReplacingMergeStream {

  /** Declarative keep-latest: one row per key, update mode. Ties on
    * version resolve to max_by's struct comparison — deterministic for
    * a (version, payload) ordering; give version a total order (e.g.
    * ingest sequence) to match ClickHouse's last-write-wins exactly.
    */
  def latestByKey(updates: DataFrame, key: String,
                  version: String): DataFrame = {
    val payload = struct(
      col(version) +: updates.columns.filter(_ != key).filter(_ != version)
        .map(col).toSeq: _*)
    updates.groupBy(col(key))
      .agg(max_by(payload, col(version)).as("__row"))
      .select(col(key) +: Seq(col("__row.*")): _*)
  }

  final case class Up(key: Long, version: Long, payload: String)

  /** Change-log variant: emits (key, version, payload) only when the
    * stored winner changes. A late row with version <= stored emits
    * nothing (ClickHouse: the merge would discard it silently).
    */
  def latestByKeyWithState(spark: SparkSession,
                           updates: DataFrame): Dataset[Up] = {
    import spark.implicits._
    val typed = updates
      .select(col("key").cast("long"), col("version").cast("long"),
        col("payload").cast("string"))
      .as[Up]
    typed.groupByKey(_.key)
      .flatMapGroupsWithState[Up, Up](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (k, evs, state: GroupState[Up]) =>
          // deterministic winner: highest version; equal versions keep
          // the already-stored row (documented tie-break)
          val incoming = evs.maxBy(e => (e.version, e.payload))
          val stored = state.getOption
          if (stored.exists(_.version >= incoming.version)) Iterator.empty
          else {
            state.update(incoming)
            Iterator.single(incoming)
          }
      }
  }
}
