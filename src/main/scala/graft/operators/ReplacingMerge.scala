package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ReplacingMergeTree semantics (reference main.py:65: `ENGINE =
  * ReplacingMergeTree ORDER BY <key>`; main.py:178: `OPTIMIZE TABLE`
  * forces the merge): of all rows sharing the same ORDER BY key, keep
  * the one with the greatest version.
  *
  * Spark-first design: a single hash-partition on the key serves the
  * whole merge. Two interchangeable physical strategies:
  *
  *   - `latestByKey` — groupBy(key).agg(max_by(struct(*cols), version)).
  *     Partial aggregation (map-side combine) means only one surviving
  *     row per key per input partition crosses the shuffle — at 100 TB
  *     with heavy duplication this moves a fraction of the data a
  *     window-function plan would.
  *   - `latestByKeyWindow` — row_number() over (partition by key order
  *     by version desc). Shuffles every row but preserves the input
  *     schema/layout exactly; useful when the caller needs other window
  *     functions over the same partitioning anyway.
  *
  * Determinism: callers must make `version` a total order per key (pass
  * tie-breaker columns); otherwise survivors are arbitrary among ties,
  * exactly like ClickHouse's unversioned ReplacingMergeTree.
  */
object ReplacingMerge {

  /** max_by strategy: one shuffle, map-side partial agg. */
  def latestByKey(df: DataFrame, keys: Seq[String], version: Seq[Column]): DataFrame = {
    val cols = df.columns.toSeq
    val ver  = struct(version: _*)
    val row  = struct(cols.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(row, ver).as("_latest"))
      .select(cols.map(c => col(s"_latest.$c").as(c)): _*)
  }

  /** Window strategy: same result, input layout preserved. */
  def latestByKeyWindow(df: DataFrame, keys: Seq[String], version: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(version.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** ReplacingMergeTree(version, is_deleted) — the CH 23.2+ variant:
    * the merge keeps the latest row per key, then DROPS it entirely
    * when that latest row is flagged deleted (tombstone upserts). Same
    * single key shuffle; the tombstone filter is post-aggregation.
    */
  def latestByKeyWithDeletes(df: DataFrame, keys: Seq[String],
                             version: Seq[Column],
                             isDeleted: Column): DataFrame =
    latestByKey(df.withColumn("_is_deleted", isDeleted),
        keys, version)
      .filter(col("_is_deleted") === 0 || !col("_is_deleted").cast("boolean"))
      .drop("_is_deleted")

  /** CollapsingMergeTree(sign): +1 rows assert state, -1 rows cancel
    * the matching earlier +1. After a complete merge a key survives
    * iff it has more +1s than -1s, represented by its LATEST +1 row
    * (`version` orders rows within the key — CH uses insertion order,
    * which a distributed engine must make explicit). One groupBy pass:
    * partial sums and max_by cross the shuffle, never raw rows.
    */
  def collapse(df: DataFrame, keys: Seq[String], sign: Column,
               version: Seq[Column]): DataFrame = {
    val cols = df.columns.toSeq
    val ver  = struct(version: _*)
    val row  = struct(cols.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("_net"),
        max_by(row, when(sign > 0, ver)).as("_latest_pos"))
      .filter(col("_net") > 0)
      .select(cols.map(c => col(s"_latest_pos.$c").as(c)): _*)
  }

  /** VersionedCollapsingMergeTree (CH): a (sign=+1, version=v) row is
    * cancelled ONLY by a (sign=-1, version=v) row of the same key —
    * unlike plain CollapsingMergeTree, out-of-order delete/insert
    * replays cannot cancel the wrong generation. Per (key, version):
    * net = sum(sign); rows with net = 0 vanish, survivors keep the
    * latest row of the DOMINANT sign as representative. One partial-agg
    * shuffle on (key, version) — same scale shape as [[collapse]].
    */
  def collapseVersioned(df: DataFrame, keys: Seq[String], sign: Column,
                        versionCol: Column,
                        tiebreak: Seq[Column]): DataFrame = {
    val cols = df.columns.toSeq
    val tb  = struct(tiebreak: _*)
    val row = struct(cols.map(col): _*)
    df.groupBy((keys.map(col) :+ versionCol.as("_ver")): _*)
      .agg(sum(sign).as("net"),
        max_by(row, when(sign > 0, tb)).as("_latest_pos"),
        max_by(row, when(sign < 0, tb)).as("_latest_neg"))
      .filter(col("net") =!= 0)
      .select((keys.map(col) :+ col("_ver").as("version") :+
        col("net").cast("long").as("net")) ++
        cols.filterNot(keys.contains).map(c =>
          when(col("net") > 0, col(s"_latest_pos.$c"))
            .otherwise(col(s"_latest_neg.$c")).as(s"rep_$c")): _*)
  }

  /** SummingMergeTree: rows sharing the ORDER BY key collapse to one
    * row whose numeric `sumCols` are summed; every other column takes
    * an arbitrary-but-deterministic representative (CH: "any row";
    * here: the row with the greatest `version` for determinism). One
    * partial-agg shuffle.
    */
  def summingMerge(df: DataFrame, keys: Seq[String],
                   sumCols: Seq[String], version: Seq[Column]): DataFrame = {
    val others = df.columns.toSeq.filterNot(c =>
      keys.contains(c) || sumCols.contains(c))
    val ver = struct(version: _*)
    // No representative aggregate when every non-key column is summed —
    // struct() over zero columns is not a usable max_by payload.
    val repAgg =
      if (others.isEmpty) Nil
      else Seq(max_by(struct(others.map(col): _*), ver).as("_rep"))
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++ repAgg
    // keys-only frame: nothing to sum, no representative to pick —
    // the merge degenerates to key dedup (aggs.head would throw)
    if (aggs.isEmpty) df.dropDuplicates(keys)
    else df.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((keys.map(col) ++ sumCols.map(col) ++
        others.map(c => col(s"_rep.$c").as(c))): _*)
  }

  /** MergeTree TTL with GROUP BY rollup (`TTL t + INTERVAL n DAY
    * GROUP BY k SET s = sum(s)`): rows older than the TTL horizon are
    * not dropped but ROLLED UP — one aggregate row per TTL group —
    * while fresh rows pass through untouched. This is how a MergeTree
    * ages raw data into coarse aggregates in place.
    *
    * Determinism deviations, both documented: (1) CH evaluates the
    * horizon against now() at merge time; the batch twin uses
    * max(timeCol) − ttl, a pure function of the data (one broadcast
    * 1-row bound — the migrate_incremental watermark shape). (2) CH
    * sets non-aggregated columns from the group's first row in ORDER
    * BY order; here `timeCol` takes min(time) — the same rule stated
    * relationally.
    *
    * Input must be pre-projected to keys ++ timeCol ++ sumCols (the
    * summingMerge restriction made explicit — a representative rule
    * for arbitrary extra columns would hide the CH "first row"
    * ambiguity instead of resolving it).
    *
    * Scale shape: one scan + one bounded partial-agg shuffle of the
    * expired slice; the fresh slice is a pass-through filter. The
    * output carries `is_rolled` so downstream readers can tell
    * aged aggregates from raw rows.
    */
  def ttlRollup(df: DataFrame, timeCol: String, ttl: Long,
                keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    val expect = (keys :+ timeCol) ++ sumCols
    require(df.columns.toSet == expect.toSet,
      s"ttlRollup input must be exactly keys+time+sums ($expect), got ${df.columns.toSeq}")
    val outCols = (keys :+ timeCol) ++ sumCols
    val bound = df.agg((max(col(timeCol)) - ttl).as("_cut"))
    val marked = df.crossJoin(broadcast(bound))
    val fresh = marked.filter(col(timeCol) > col("_cut"))
      .select(outCols.map(col): _*)
      .withColumn("is_rolled", lit(false))
    val aggs = min(col(timeCol)).as(timeCol) +:
      sumCols.map(c => sum(col(c)).as(c))
    val rolled = marked.filter(col(timeCol) <= col("_cut"))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(outCols.map(col): _*)
      .withColumn("is_rolled", lit(true))
    fresh.unionByName(rolled)
  }

  /** OPTIMIZE TABLE analog (main.py:178): force the merge *and* leave
    * the data clustered by the ORDER BY key — repartition on the key
    * and sort within partitions, which is what a merged ClickHouse part
    * looks like and what makes downstream key-range scans cheap.
    */
  def optimize(df: DataFrame, keys: Seq[String], version: Seq[Column],
               numPartitions: Option[Int] = None): DataFrame = {
    val merged = latestByKey(df, keys, version)
    val parted = numPartitions
      .map(n => merged.repartition(n, keys.map(col): _*))
      .getOrElse(merged.repartition(keys.map(col): _*))
    parted.sortWithinPartitions(keys.map(col): _*)
  }
}
