package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Portable MERGEABLE quantile sketch (SURVEY.md §2 B29b) — the
  * ClickHouse `quantileState` / `quantileMerge` idiom for this engine,
  * the quantile twin of [[HllPortable]]'s distinct-count states.
  *
  * Sketch definition (fixed-grid histogram, B = 256 buckets of width
  * `Width` over [0, B·Width), under/overflow clamped to the edge
  * buckets):
  *  - state per group = one (bucket, count) row per populated bucket —
  *    ≤ B rows of 16 bytes REGARDLESS of input size;
  *  - merge = per-bucket integer SUM — associative, commutative and
  *    EXACT, so per-day partials roll up to any coarser grain
  *    bit-identically to a direct build (unlike t-digest/KLL, whose
  *    merges are order-sensitive — the reason this grid form is the
  *    portable one);
  *  - estimate for quantile q: target position p = q·(n−1) over the
  *    cumulative counts; the answer lives in the first bucket whose
  *    cumulative count exceeds p, linearly interpolated inside it:
  *    est = b·Width + Width·((p − cum_before) / cnt_b).
  *
  * Cross-engine determinism by construction: bucket ids and counts are
  * integers; the only floating arithmetic is the one fixed interpolation
  * formula over integer-derived doubles and the literal q — identical
  * IEEE operation order on both engines, hence bit-identical results
  * (the hash gate compares these doubles exactly).
  *
  * Scale shape: one shuffle of (group, bucket) partial counts (map-side
  * combine applies — at 100 TB each task emits ≤ B rows per group); the
  * estimate stage runs over ≤ #groups·B post-agg rows. Accuracy is
  * bounded by the grid resolution (±Width/2 worst case inside a
  * bucket), the classic histogram-quantile trade — exact quantiles stay
  * available via `q_quantiles` (Spark Percentile ≡ DuckDB
  * quantile_cont) for post-agg-sized inputs.
  */
object QuantileSketch {

  val B = 256
  val Width = 2.0

  /** The quantile set the gate ships (shared by query and oracle). */
  val gateQs: Seq[(String, Double)] =
    Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)

  /** The sketch STATE: one (groupCols..., _b, _cnt) row per populated
    * bucket. NULL and NaN values are ignored (NaN would otherwise ride
    * floor/greatest as NaN and least(NaN, B-1) clamps it into the TOP
    * bucket on both engines — silently inflating p99; ADVICE r10).
    * States from different partials of the same group may repeat a
    * bucket — [[estimateFromState]] (and any merge) sums them, which
    * is the whole merge rule.
    */
  def state(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame =
    df.where(value.isNotNull && !isnan(value))
      .groupBy(groupCols.map(col) :+
        least(greatest(floor(value / lit(Width)), lit(0.0)),
          lit((B - 1).toDouble)).cast("long").as("_b"): _*)
      .agg(count(lit(1)).as("_cnt"))

  /** Merge (possibly repeated-bucket) state rows to `groupCols` grain
    * and estimate the labelled quantiles. Output: (groupCols..., q_label,
    * est DOUBLE), one row per group × quantile.
    */
  def estimateFromState(state: DataFrame, groupCols: Seq[String],
                        qs: Seq[(String, Double)]): DataFrame =
    estimateFromGrid(state, groupCols, qs, 0.0, Width)

  /** [[estimateFromState]] generalized to any grid geometry: bucket b
    * covers [offset + b·width, offset + (b+1)·width). With the default
    * (0.0, [[Width]]) the estimate expression is LITERALLY the
    * gate-proven one (the offset term is only added when nonzero, so
    * the fixed-grid gates' IEEE operation order is untouched).
    */
  private def estimateFromGrid(state: DataFrame, groupCols: Seq[String],
                               qs: Seq[(String, Double)],
                               offset: Double, width: Double): DataFrame = {
    val gc = groupCols.map(col)
    val merged = state.groupBy(gc :+ col("_b"): _*)
      .agg(sum(col("_cnt")).as("_cnt"))
    val wCum = Window.partitionBy(gc: _*).orderBy("_b")
    val wAll = Window.partitionBy(gc: _*)
    val cum = merged
      .withColumn("_cum", sum(col("_cnt")).over(wCum))
      .withColumn("_n", sum(col("_cnt")).over(wAll))
    val qlit = explode(array(qs.map { case (lbl, q) =>
      struct(lit(lbl).as("q_label"), lit(q).as("_q"))
    }: _*))
    val tgt = cum.select(gc ++ Seq(col("_b"), col("_cnt"), col("_cum"),
        qlit.as("_qs"), col("_n")): _*)
      .select(gc ++ Seq(col("_b"), col("_cnt"), col("_cum"),
        col("_qs.q_label").as("q_label"),
        (col("_qs._q") * (col("_n") - lit(1L)).cast("double")).as("_p")): _*)
      .where(col("_cum").cast("double") > col("_p"))
    // the answer bucket is the smallest qualifying b; est mirrors the
    // oracle's min_by(b*W + W*((p - (cum-cnt))/cnt), b) term for term
    val base = col("_b").cast("double") * lit(width) + lit(width) *
      ((col("_p") - (col("_cum") - col("_cnt")).cast("double")) /
        col("_cnt").cast("double"))
    val est = if (offset == 0.0) base else lit(offset) + base
    tgt.groupBy(gc :+ col("q_label"): _*)
      .agg(min_by(est, col("_b")).as("est"))
  }

  /** Default resolution of [[adaptiveQuantiles]]' data-fitted grid. */
  val AdaptiveB = 1024

  /** BOUNDED-STATE global quantile estimation over an ADAPTIVE grid:
    * `nBuckets` buckets spanning the measured [min, max] of `value`
    * (vs the fixed [0, B·Width) gate grid — scores with unknown range
    * need the grid fitted to the data). Cost: two bounded
    * aggregations — a 2-double bounds row, then ≤nBuckets (bucket,
    * count) rows — so the aggregation state is ≤nBuckets rows on any
    * corpus, the property Spark's exact `Percentile` (one O(distinct)
    * buffer on ONE task) loses at corpus scale. Estimation reuses the
    * gate-proven cumulative-interpolation rule. Error contract
    * (ADVICE r11): the estimate always lies inside the grid cell
    * containing the target RANK, so rank error is ≤ one cell of mass —
    * but VALUE drift vs exact interpolation is bounded by the local
    * inter-bucket gap, not the cell width: when the target rank falls
    * between a populated bucket and a distant populated bucket, exact
    * `percentile` interpolates across the empty span while the grid
    * stays inside its bucket. Dense score distributions (the ccnet
    * gate corpus, which CcnetBoundarySpec's drift bounds assume) make
    * the gap ≈ the cell width; sparse/spiky ones may not.
    *
    * NULL/NaN values are excluded (the [[state]] rule). Returns one
    * (q_label, est) row per requested quantile; empty (or all-NULL)
    * input returns an EMPTY frame — callers aggregating the result
    * (min/when pivots) then see NULLs, exactly like exact `percentile`
    * over empty input. Runs two driver actions: `df` should be
    * persisted by the caller when it is expensive to recompute.
    */
  def adaptiveQuantiles(df: DataFrame, value: Column,
                        qs: Seq[(String, Double)],
                        nBuckets: Int = AdaptiveB): DataFrame = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    val clean = df.where(value.isNotNull && !isnan(value))
    val mm = clean.agg(min(value).cast("double"), max(value).cast("double")).head()
    if (mm.isNullAt(0)) return Seq.empty[(String, Double)].toDF("q_label", "est")
    val mn = mm.getDouble(0); val mx = mm.getDouble(1)
    // ±Infinity input (or finite extremes whose span overflows) would
    // make width Infinity and silently clamp every row into bucket 0 —
    // refuse loudly instead (ADVICE r11)
    require(java.lang.Double.isFinite(mn) && java.lang.Double.isFinite(mx)
        && java.lang.Double.isFinite(mx - mn),
      s"adaptiveQuantiles: non-finite value range [$mn, $mx] - " +
        "filter infinite values (or rescale) before sketching")
    // degenerate range: every quantile IS that value (a 1-bucket grid
    // would interpolate inside a fictitious cell instead)
    if (mn == mx || (mx - mn) / nBuckets == 0.0)
      return qs.map { case (lbl, _) => (lbl, mn) }.toDF("q_label", "est")
    val width = (mx - mn) / nBuckets
    val st = clean.groupBy(
        least(greatest(floor((value.cast("double") - lit(mn)) / lit(width)),
          lit(0.0)), lit((nBuckets - 1).toDouble)).cast("long").as("_b"))
      .agg(count(lit(1)).as("_cnt"))
    estimateFromGrid(st, Seq.empty, qs, mn, width)
  }

  /** Direct (state → estimate in one go) — what the oracle recomputes;
    * a gate pass over a MERGED-partials Spark side proves
    * merge-of-partials == direct bit-exactly.
    */
  def estimate(df: DataFrame, groupCols: Seq[String], value: Column,
               qs: Seq[(String, Double)]): DataFrame =
    estimateFromState(state(df, groupCols, value), groupCols, qs)

  /** The identical direct sketch as DuckDB SQL: same grid, same
    * cumulative rule, same single interpolation formula (term-for-term
    * operation order), quantiles forced to DOUBLE so no decimal
    * arithmetic sneaks in.
    */
  def oracleSql(table: String, groupCol: String, valueCol: String,
                qs: Seq[(String, Double)]): String = {
    val qRows = qs.map { case (lbl, q) =>
      s"('$lbl', CAST($q AS DOUBLE))"
    }.mkString(", ")
    s"""WITH st AS (
       | SELECT $groupCol,
       |  CAST(least(greatest(floor($valueCol / $Width), 0), ${B - 1}) AS BIGINT) AS b,
       |  count(*) AS cnt
       | FROM $table WHERE $valueCol IS NOT NULL AND NOT isnan($valueCol)
       | GROUP BY 1, 2
       |), cum AS (
       | SELECT $groupCol, b, cnt,
       |  sum(cnt) OVER (PARTITION BY $groupCol ORDER BY b) AS cum,
       |  sum(cnt) OVER (PARTITION BY $groupCol) AS n
       | FROM st
       |), qs AS (SELECT * FROM (VALUES $qRows) q(q_label, q)),
       |tgt AS (
       | SELECT c.$groupCol, q.q_label, q.q * CAST(c.n - 1 AS DOUBLE) AS p,
       |  c.b, c.cnt, c.cum
       | FROM cum c CROSS JOIN qs q
       | WHERE CAST(c.cum AS DOUBLE) > q.q * CAST(c.n - 1 AS DOUBLE)
       |)
       |SELECT $groupCol, q_label,
       | min_by(CAST(b AS DOUBLE) * $Width + $Width *
       |   ((p - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)), b) AS est
       |FROM tgt GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
  }
}
