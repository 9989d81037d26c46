package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analysis over per-key daily series — the ClickHouse
  * `seriesDecomposeSTL` / `seriesPeriodDetectFFT` niche, re-expressed
  * deterministically (SURVEY §11 discipline).
  *
  * Both CH functions are approximate/iterative (STL runs loess fits,
  * FFT period detection rides libm trig) — neither replays bit-exactly
  * across engines, so the batch engine ships the CLASSICAL forms whose
  * arithmetic is exact:
  *
  *  - `decompose`: classical additive decomposition. Trend = centered
  *    moving average over one full period (exact integer sum kept at
  *    ×period scale; defined only where the window is complete — the
  *    textbook rule, no half-window extrapolation). Seasonal = per-
  *    phase mean of the detrended values (the detrended values stay
  *    exact integers at ×period scale; ONE IEEE divide makes the
  *    mean). Residual = value − trend − seasonal as a fixed double
  *    tree. Every divide is replayed operand-for-operand by the
  *    oracle.
  *  - `periodDetect`: autocorrelation argmax over a candidate lag
  *    range. Values are mean-centered with the FLOOR mean (integer
  *    division of non-negative sums — identical trunc/floor on both
  *    engines), so every product and sum is an exact BIGINT; the
  *    normalized score is ONE IEEE divide num/cnt per lag; the peak
  *    is row_number over (score DESC, lag ASC) — total order, no
  *    float ties left to chance.
  *
  * Scale shape (100 TB, 1000 executors): the raw table collapses to
  * per-(key, day) exact partial aggregates in ONE map-side-combined
  * shuffle — everything after runs on a #keys × #days relation that
  * the calendar bounds (3650 rows/key/decade). The decompose windows
  * partition BY KEY (never a global window); the seasonal means are a
  * #keys × period relation, broadcast back. periodDetect's lag self-
  * join is #keys × #days × #lags on the pre-aggregated relation —
  * bounded the same way, never touching raw rows.
  *
  * Envelope (documented, the covar lesson): decompose keeps
  * period·cents and 7·cents−trendSum in longs — safe while
  * period·maxDailyCents < 2⁶³ (period 7: daily sums to ~10¹⁷ cents).
  * periodDetect sums (cents−mean)² products — safe while
  * #days·maxDev² < 2⁶³ (a decade of days: |dev| up to ~5·10⁷ cents,
  * i.e. ~$500k/day amplitude; bigger series should pre-scale to
  * dollars, same rule as the ACF oracle).
  */
object Series {

  /** Classical additive decomposition of a per-(key, day) exact-cents
    * series. Input: (key, day, cents). Output: (key, day, cents,
    * trend, seasonal, resid) — trend/seasonal/resid DOUBLE, NULL on
    * the half-window head/tail rows where the centered MA is
    * undefined.
    */
  def decompose(daily: DataFrame, key: String, day: String,
                cents: String, period: Int): DataFrame = {
    require(period % 2 == 1, s"centered MA needs an odd period, got $period")
    val half = (period - 1) / 2
    // RANGE frame (value-based): a missing calendar day leaves the
    // window incomplete and the trend NULL, instead of silently
    // sliding a ROWS frame across the gap.
    val w = Window.partitionBy(col(key)).orderBy(col(day))
      .rangeBetween(-half, half)
    val withTrend = daily
      .withColumn("_tsum", sum(col(cents)).over(w))
      .withColumn("_tn", count(lit(1)).over(w))
      .withColumn("_tsum",
        when(col("_tn") === period, col("_tsum"))) // else NULL
      // detrended at ×period scale: period·cents − trendSum, exact long
      .withColumn("_d", lit(period.toLong) * col(cents) - col("_tsum"))
      .withColumn("_phase", pmod(col(day), lit(period.toLong)))
    // per-(key, phase) mean of detrended — bounded #keys × period rows
    val seas = withTrend.filter(col("_d").isNotNull)
      .groupBy(col(key), col("_phase"))
      .agg(sum(col("_d")).as("_sn"), count(lit(1)).as("_sc"))
      .withColumn("seasonal",
        col("_sn").cast("double") /
          (lit(period.toLong) * col("_sc")).cast("double"))
      .select(col(key), col("_phase"), col("seasonal"))
    withTrend
      .join(broadcast(seas), Seq(key, "_phase"), "left")
      .withColumn("trend", col("_tsum").cast("double") / lit(period.toDouble))
      .withColumn("seasonal",
        when(col("trend").isNotNull, col("seasonal"))) // align definedness
      .withColumn("resid",
        col(cents).cast("double") - col("trend") - col("seasonal"))
      .select(col(key), col(day), col(cents),
        col("trend"), col("seasonal"), col("resid"))
  }

  /** Integer-ACF period detection over a per-(key, day) exact-cents
    * series. Output one row per (key, lag): (key, lag, acf_num,
    * n_pairs, score, is_best). Peak rule: max score, smallest lag on
    * ties, at least 2 overlapping pairs.
    */
  def periodDetect(daily: DataFrame, key: String, day: String,
                   cents: String, minLag: Int, maxLag: Int): DataFrame = {
    require(0 < minLag && minLag <= maxLag, s"bad lag range [$minLag, $maxLag]")
    // FLOOR-mean centering: sums and counts are non-negative, so
    // Spark's `div` (trunc) and DuckDB's `//` (floor) agree.
    val stats = daily.groupBy(col(key))
      .agg(expr(s"sum($cents) div count(1)").as("_mean"))
    val centered = daily.join(broadcast(stats), key)
      .select(col(key), col(day), (col(cents) - col("_mean")).as("_y"))
    val lags = (minLag to maxLag).map(_.toLong)
    val withLag = centered
      .withColumn("lag", explode(typedlit(lags)))
      .withColumn("_dayAhead", col(day) + col("lag"))
    val acf = withLag.alias("a")
      .join(centered.alias("b"),
        col(s"a.$key") === col(s"b.$key") &&
          col("a._dayAhead") === col(s"b.$day"))
      .groupBy(col(s"a.$key").as(key), col("a.lag").as("lag"))
      .agg(sum(col("a._y") * col("b._y")).as("acf_num"),
        count(lit(1)).as("n_pairs"))
      .withColumn("score",
        col("acf_num").cast("double") / col("n_pairs").cast("double"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("score").desc, col("lag").asc)
    acf.withColumn("_rn",
        when(col("n_pairs") >= 2, row_number().over(w)))
      .withColumn("is_best", coalesce(col("_rn") === 1, lit(false)))
      .select(col(key), col("lag"), col("acf_num"), col("n_pairs"),
        col("score"), col("is_best"))
  }
}
