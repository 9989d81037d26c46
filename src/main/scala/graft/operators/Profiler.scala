package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling — the stats pass every warehouse runs
  * after a load (and the one the reference's target system runs as
  * part of table maintenance): per column, row count, null count,
  * exact distinct count, min/max rendered canonically. One relational
  * answer, queryable and diffable across snapshots — the input to
  * schema-drift alerts, CBO statistics, and data-quality dashboards.
  *
  * Shape: ONE aggregation pass over the table computes every column's
  * aggregates together (Catalyst expands multi-distinct into one
  * Expand + partial-agg tree — still a single scan, map-side combined),
  * then a driver-free explode unpivots the 1-row result into the long
  * (column, stat...) relation. At 100 TB the exact distincts are the
  * honest-but-heavy path (the Expand multiplies rows by the distinct
  * column count); the HLL sketch family (uniq_merge_portable) is the
  * documented swap-in when ±2% suffices — same output schema, no
  * Expand, mergeable across partitions/days.
  *
  * Values render deterministically cross-engine: integers/strings
  * verbatim, timestamps in session-UTC ISO form, DOUBLE columns must
  * be profiled through an exact DECIMAL cast by the caller (the
  * float-aggregate rule — raw double-to-string rendering is not
  * portable).
  */
object Profiler {

  /** Profile `exprs` (name → column expression, pre-cast as needed).
    * Output: (column, n_rows, n_null, n_distinct, min_s, max_s),
    * one row per profiled column, ordered by column name.
    */
  def profile(df: DataFrame, exprs: Seq[(String, Column)]): DataFrame = {
    require(exprs.nonEmpty)
    val aggs = exprs.flatMap { case (n, c) => Seq(
      count(c).as(s"__${n}_nn"),
      countDistinct(c).as(s"__${n}_nd"),
      min(c).cast("string").as(s"__${n}_mn"),
      max(c).cast("string").as(s"__${n}_mx"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    row
      .select(explode(array(exprs.map { case (n, _) =>
        struct(
          lit(n).as("column"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__${n}_nn")).as("n_null"),
          col(s"__${n}_nd").as("n_distinct"),
          col(s"__${n}_mn").as("min_s"),
          col(s"__${n}_mx").as("max_s"))
      }: _*)).as("p"))
      .select("p.*")
      .orderBy("column")
  }
}
