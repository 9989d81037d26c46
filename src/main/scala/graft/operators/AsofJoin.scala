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
}
