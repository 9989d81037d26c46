package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF join (ClickHouse `ASOF JOIN`, kdb aj): for every left row, the
  * single right row with the greatest right.ts <= left.ts (or < when
  * `strict`) within the same key.
  *
  * Spark-first composition (SURVEY.md escalation ladder step (a) — no
  * custom physical operator needed): tag and union both inputs, then
  * one window pass per key ordered by (ts, side) carries the most
  * recent right payload forward into each left row. ONE shuffle on the
  * key, both inputs streamed once — versus the naive per-row subquery
  * or a range-condition join that explodes to |L|x|R| per key.
  *
  * At 100 TB: the union shuffles each side once on the key (the same
  * cost any keyed join pays), state per window is one right payload.
  */
object AsofJoin {

  /** Left as-of join.
    *
    * @param leftTs/rightTs event-time columns (same comparable type)
    * @param strict  false: match right.ts <= left.ts (CH default);
    *                true: right.ts strictly earlier
    * @param forward false: BACKWARD — the latest right at-or-before
    *                (CH `ASOF JOIN ... <=` family); true: FORWARD —
    *                the earliest right at-or-after (CH `>=`/`>`), the
    *                same scan with the time axis reversed
    * @return left columns + the matched right payload as nullable
    *         `asof` struct (null when no qualifying right row exists)
    */
  /** [[leftAsof]] with a MAXIMUM match distance (pandas merge_asof's
    * `tolerance`): a carried match farther than `tolerance` time units
    * from the left row is nulled out — the row survives unmatched,
    * exactly as if no right row existed in range. A post-window
    * projection on the same single-shuffle plan: the tolerance never
    * changes which row would have matched, only whether it counts.
    */
  def leftAsofTolerance(left: DataFrame, right: DataFrame, key: String,
                        leftTs: String, rightTs: String, tolerance: Long,
                        strict: Boolean = false,
                        forward: Boolean = false): DataFrame = {
    require(tolerance >= 0, "tolerance must be non-negative")
    val joined = leftAsof(left, right, key, leftTs, rightTs, strict, forward)
    val gap =
      if (forward) col(s"asof.$rightTs") - col(leftTs)
      else col(leftTs) - col(s"asof.$rightTs")
    joined.withColumn("asof",
      when(col(s"asof.$rightTs").isNotNull && gap <= tolerance, col("asof")))
  }

  def leftAsof(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               strict: Boolean = false,
               forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    // at equal ts the right row must sort before left exactly when the
    // non-strict bound makes it visible (<= backward, >= forward)
    val (leftTag, rightTag) = if (strict) (0, 1) else (1, 0)
    val l = left.select(
      col(key).as("_k"), col(leftTs).as("_ts"), lit(leftTag).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(rType).as("_r"))
    val r = right.select(
      col(key).as("_k"), col(rightTs).as("_ts"), lit(rightTag).as("_side"),
      lit(null).cast(lType).as("_l"),
      struct(right.columns.map(col).toSeq: _*).as("_r"))
    val order =
      if (forward) Seq(col("_ts").desc, col("_side").asc)
      else Seq(col("_ts").asc, col("_side").asc)
    val w = Window.partitionBy("_k")
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_l").isNotNull)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) :+ col("asof"): _*)
  }

  /** TIME-BUCKETED left as-of join — same output contract as
    * [[leftAsof]], different plan: windows partition by (key, bucket)
    * instead of key alone, so ONE INSTRUMENT WITH 10^9 TICKS spreads
    * over #buckets tasks instead of serializing on one core (the
    * round-5/6 scale-killer on [[leftAsof]]).
    *
    * Boundary carry-over makes the per-bucket windows exact: a left
    * row early in bucket B may need a right row from an earlier
    * bucket, so
    *   1. per (key, bucket): the edge right payload (latest for
    *      backward, earliest for forward) — one partial-agg shuffle,
    *      ONE ROW per populated cell;
    *   2. per key, over the TINY cell table (#buckets rows, not
    *      #ticks): running carry of the edge payload from
    *      earlier (later, when forward) buckets — the only
    *      key-partitioned window left, bounded by the bucket count;
    *   3. per (key, bucket): the usual tag-union-window scan, SEEDED
    *      with the carried payload as a row sorting before (after)
    *      everything in the bucket.
    * Cross-bucket matches are strictly earlier/later in time (bucket
    * fn is monotone), so strictness only matters inside a bucket,
    * where the [[leftAsof]] side-tag ordering is reused verbatim.
    *
    * @param bucket monotone non-decreasing mapping from the ts column
    *               to an orderable bucket id — e.g.
    *               `t => date_trunc("hour", t)` or
    *               `t => floor(unix_timestamp(t) / 86400)`. Coarser =
    *               fewer carry rows; finer = more parallelism on hot
    *               keys. Must be the SAME time scale for both sides.
    */
  def leftAsofBucketed(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       bucket: Column => Column,
                       strict: Boolean = false,
                       forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val (leftTag, rightTag) = if (strict) (0, 1) else (1, 0)

    val rB = right.select(col(key).as("_k"), bucket(col(rightTs)).as("_b"),
      col(rightTs).as("_ts"), struct(right.columns.map(col).toSeq: _*).as("_r"))
    // 1. edge payload per populated right cell
    val edgeAgg = if (forward) min_by(col("_r"), col("_ts")) else max_by(col("_r"), col("_ts"))
    val summary = rB.groupBy("_k", "_b").agg(edgeAgg.as("_edge"))
    // 2. carry per cell either side touches (left-only cells need one too)
    val cells = left.select(col(key).as("_k"), bucket(col(leftTs)).as("_b"))
      .union(rB.select(col("_k"), col("_b"))).distinct()
    val carryOrder = if (forward) col("_b").desc else col("_b").asc
    val wCarry = Window.partitionBy("_k").orderBy(carryOrder)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = cells.join(summary, Seq("_k", "_b"), "left")
      .withColumn("_carry", last(col("_edge"), ignoreNulls = true).over(wCarry))
      .filter(col("_carry").isNotNull)
      .select(col("_k"), col("_b"), col("_carry"))
    // 3. seeded in-bucket scan
    val l = left.select(col(key).as("_k"), bucket(col(leftTs)).as("_b"),
      lit(0).as("_seed"), col(leftTs).as("_ts"), lit(leftTag).as("_side"),
      struct(leftCols.map(col): _*).as("_l"), lit(null).cast(rType).as("_r"))
    val r = rB.select(col("_k"), col("_b"), lit(0).as("_seed"), col("_ts"),
      lit(rightTag).as("_side"), lit(null).cast(lType).as("_l"), col("_r"))
    val seeds = carries.select(col("_k"), col("_b"), lit(1).as("_seed"),
      lit(null).cast(l.schema("_ts").dataType).as("_ts"), lit(0).as("_side"),
      lit(null).cast(lType).as("_l"), col("_carry").as("_r"))
    val order =
      if (forward) Seq(col("_seed").desc, col("_ts").desc, col("_side").asc)
      else Seq(col("_seed").desc, col("_ts").asc, col("_side").asc)
    val w = Window.partitionBy("_k", "_b").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r).unionByName(seeds)
      .withColumn("asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_l").isNotNull)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) :+ col("asof"): _*)
  }

  /** NEAREST as-of join (pandas `merge_asof(direction='nearest')`,
    * which neither ClickHouse nor DuckDB expresses as one ASOF): for
    * every left row, the right row minimizing |right.ts - left.ts|
    * within the key; equal distance breaks toward the EARLIER right
    * row (deterministic, matching the backward-preferred convention).
    *
    * Same single-shuffle shape as [[leftAsof]]: one tag-union, one
    * sort — the backward carry (`last` over preceding rows) and the
    * forward carry (`first` over following rows) are two frames over
    * the SAME window ordering, so Spark computes both in one
    * WindowExec pass. At equal ts the right row sorts before the left
    * (non-strict backward), so a zero-distance match arrives via the
    * backward carry and the tie-break keeps it.
    *
    * `rightTs` must be a numeric epoch column (the distance subtract).
    */
  def leftAsofNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val l = left.select(
      col(key).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(rType).as("_r"))
    val r = right.select(
      col(key).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
      lit(null).cast(lType).as("_l"),
      struct(right.columns.map(col).toSeq: _*).as("_r"))
    val base = Window.partitionBy("_k").orderBy(col("_ts").asc, col("_side").asc)
    val wBack = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val back = last(col("_r"), ignoreNulls = true).over(wBack)
    val fwd = first(col("_r"), ignoreNulls = true).over(wFwd)
    val dBack = col("_ts") - col("_back").getField(rightTs)
    val dFwd = col("_fwd").getField(rightTs) - col("_ts")
    l.unionByName(r)
      .withColumn("_back", back)
      .withColumn("_fwd", fwd)
      .filter(col("_l").isNotNull)
      .withColumn("asof",
        when(col("_fwd").isNull, col("_back"))
          .when(col("_back").isNull, col("_fwd"))
          .when(dBack <= dFwd, col("_back"))
          .otherwise(col("_fwd")))
      .select(leftCols.map(c => col(s"_l.$c").as(c)) :+ col("asof"): _*)
  }
}
