package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse statistical aggregates (round 12): simpleLinearRegression,
  * welchTTest, kolmogorovSmirnovTest, mannWhitneyUTest,
  * quantileExactWeighted — the A/B-testing / monitoring family
  * (reference main.py:65 — the ReplacingMergeTree tables exist to serve
  * exactly this kind of analytics downstream).
  *
  * Portability discipline, shared by all five: every MOMENT is an exact
  * 64-bit integer aggregate (callers pass integer-valued columns —
  * cents, whole units, counts), and only the FINAL scalar formula runs
  * in doubles. long→double conversion is a single correctly-rounded
  * hardware cast on every engine (unlike decimal→double, whose two-step
  * unscaled/10^s rounding can differ in the last ulp), and a fixed
  * IEEE expression tree over identical double inputs is deterministic
  * cross-engine — so each statistic replays bit-exactly in DuckDB.
  * `sqrt` is the one transcendental used (correctly rounded per IEEE
  * 754 on both engines); no pow/exp/ln anywhere.
  *
  * Envelope: long moments hold while |n·Σxy| < 2^63 — ~10⁶ rows/group
  * at cents-scale magnitudes (Spark 4 runs ANSI mode by default, so an
  * overflow fails loudly rather than wrapping). At 100 TB you regress
  * within finer groups (the standard pattern — these are per-group
  * statistics, not corpus-wide ones); a corpus-wide fit would switch
  * the moments to DECIMAL(38,0) and accept the documented 1-ulp
  * decimal→double cast risk.
  */
object StatTests {

  /** ClickHouse `simpleLinearRegression(x, y)`: per group, the
    * least-squares slope k and intercept b of y on x.
    * k = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), b = (Σy − k·Σx)/n.
    * `x`/`y` must be integer-valued (long) columns. One
    * map-side-combinable aggregate — 5 longs of state per group.
    * Vertical-x groups (zero denominator) return NULL slope/intercept.
    */
  def simpleLinearRegression(df: DataFrame, group: Column, x: Column,
                             y: Column): DataFrame = {
    val m = df.select(group.as("grp"), x.as("__x"), y.as("__y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
    val num = col("n") * col("__sxy") - col("__sx") * col("__sy")
    val den = col("n") * col("__sxx") - col("__sx") * col("__sx")
    m.withColumn("slope",
        when(den === 0, lit(null))
          .otherwise(num.cast("double") / den.cast("double")))
      .withColumn("intercept",
        when(col("slope").isNull, lit(null))
          .otherwise((col("__sy").cast("double") -
            col("slope") * col("__sx").cast("double")) /
            col("n").cast("double")))
      .select(col("grp"), col("slope"), col("intercept"), col("n"))
  }

  /** ClickHouse `corrMatrix(x1, x2, x3)`: all pairwise Pearson
    * correlations in ONE aggregation pass — 10 longs of state per
    * group (n + 3 sums + 3 squares + 3 cross-products) regardless of
    * input size, the same moments discipline as the t-test family.
    * Each correlation is the fixed IEEE tree
    * (n·Σxy − ΣxΣy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²)) on
    * double-CAST moments — √ is the one portable power function
    * (IEEE correctly-rounded on both engines), so the oracle replays
    * it term-for-term. Zero-variance pairs → NULL. Callers integerize
    * inputs (the overflow envelope is the caller's units choice —
    * whole units, not cents, for ~1e5-magnitude values over ~1e6-row
    * groups).
    */
  def corrMatrix3(df: DataFrame, group: Column, x1: Column, x2: Column,
                  x3: Column): DataFrame = {
    val m = df.select(group.as("grp"), x1.as("__x1"), x2.as("__x2"),
        x3.as("__x3"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x1")).as("__s1"), sum(col("__x2")).as("__s2"),
        sum(col("__x3")).as("__s3"),
        sum(col("__x1") * col("__x1")).as("__s11"),
        sum(col("__x2") * col("__x2")).as("__s22"),
        sum(col("__x3") * col("__x3")).as("__s33"),
        sum(col("__x1") * col("__x2")).as("__s12"),
        sum(col("__x1") * col("__x3")).as("__s13"),
        sum(col("__x2") * col("__x3")).as("__s23"))
    def d(c: String) = col(c).cast("double")
    val nn = d("n")
    def corr(si: Column, sj: Column, sij: Column, sii: Column,
             sjj: Column): Column = {
      val num = nn * sij - si * sj
      val den = sqrt(nn * sii - si * si) * sqrt(nn * sjj - sj * sj)
      when(den === 0d, lit(null)).otherwise(num / den)
    }
    m.select(col("grp"), col("n"),
      corr(d("__s1"), d("__s2"), d("__s12"), d("__s11"), d("__s22"))
        .as("corr_12"),
      corr(d("__s1"), d("__s3"), d("__s13"), d("__s11"), d("__s33"))
        .as("corr_13"),
      corr(d("__s2"), d("__s3"), d("__s23"), d("__s22"), d("__s33"))
        .as("corr_23"))
  }

  /** Deterministic batch OLS with two features + intercept — the
    * reproducible equivalent of ClickHouse's
    * `stochasticLinearRegression` (SGD is sample-order-dependent, so
    * a distributed replay cannot reproduce it bit-for-bit; a batch
    * engine solves the SAME linear model exactly via the 3×3 normal
    * equations instead — the deviation is documented, not hidden).
    * Moments are exact integer sums (callers integerize features,
    * the q_linreg discipline) in ONE partial-agg shuffle — 9 longs of
    * state per group regardless of input size; the solve is Cramer's
    * rule as one fixed IEEE tree on double-CAST moments (each moment
    * cast before any product — the covar overflow-envelope lesson),
    * replayed term-for-term in the oracle. Singular systems
    * (collinear features, degenerate groups) yield NULL coefficients
    * rather than a pseudo-inverse guess.
    */
  def multipleLinearRegression2(df: DataFrame, group: Column, x1: Column,
                                x2: Column, y: Column): DataFrame = {
    val m = df.select(group.as("grp"), x1.as("__x1"), x2.as("__x2"),
        y.as("__y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x1")).as("__s1"), sum(col("__x2")).as("__s2"),
        sum(col("__y")).as("__sy"),
        sum(col("__x1") * col("__x1")).as("__s11"),
        sum(col("__x2") * col("__x2")).as("__s22"),
        sum(col("__x1") * col("__x2")).as("__s12"),
        sum(col("__x1") * col("__y")).as("__s1y"),
        sum(col("__x2") * col("__y")).as("__s2y"))
    def d(c: String) = col(c).cast("double")
    val (nn, s1, s2, sy) = (d("n"), d("__s1"), d("__s2"), d("__sy"))
    val (s11, s22, s12, s1y, s2y) =
      (d("__s11"), d("__s22"), d("__s12"), d("__s1y"), d("__s2y"))
    // 3×3 determinant, first-row cofactor expansion — the EXACT tree
    // the oracle SQL writes (left-assoc a*(ei−fh) − b*(di−fg) +
    // c*(dh−eg); every multiply/subtract in the same order)
    def det3(a: Column, b: Column, c: Column, dd: Column, e: Column,
             f: Column, g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (dd * i - f * g) + c * (dd * h - e * g)
    // normal equations M·β = r with M = [[n,s1,s2],[s1,s11,s12],
    // [s2,s12,s22]], r = [sy,s1y,s2y]; βᵢ = det(M with col i := r)/det(M)
    val det = det3(nn, s1, s2, s1, s11, s12, s2, s12, s22)
    val det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val det1 = det3(nn, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val det2 = det3(nn, s1, sy, s1, s11, s1y, s2, s12, s2y)
    m.select(col("grp"), col("n"),
      when(det === 0d, lit(null)).otherwise(det0 / det).as("intercept"),
      when(det === 0d, lit(null)).otherwise(det1 / det).as("beta1"),
      when(det === 0d, lit(null)).otherwise(det2 / det).as("beta2"))
  }

  /** ClickHouse `welchTTest(v, idx)`: per group, Welch's unequal-
    * variance t statistic between sample 0 and sample 1, plus the
    * Welch–Satterthwaite degrees of freedom (CH returns (t, p); the
    * p-value needs the incomplete beta — not IEEE-portable — so the
    * caller thresholds on t/df instead).
    *
    * t = (m₁−m₂)/√(v₁/n₁ + v₂/n₂);
    * df = (v₁/n₁ + v₂/n₂)² / ((v₁/n₁)²/(n₁−1) + (v₂/n₂)²/(n₂−1)).
    * Moments (n, Σv, Σv²) per sample are exact longs; groups lacking
    * two points per sample are dropped. One aggregate, 6 longs of
    * state per group.
    */
  def welchTTest(df: DataFrame, group: Column, idx: Column,
                 value: Column): DataFrame = {
    val m = twoSampleMoments(df, group, idx, value)
      .where(col("n1") > 1 && col("n2") > 1)
    m.withColumn("__n1d", col("n1").cast("double"))
      .withColumn("__n2d", col("n2").cast("double"))
      .withColumn("__m1", col("__s1").cast("double") / col("__n1d"))
      .withColumn("__m2", col("__s2").cast("double") / col("__n2d"))
      .withColumn("__v1",
        (col("__q1").cast("double") -
          col("__s1").cast("double") * col("__s1").cast("double") /
            col("__n1d")) / (col("__n1d") - 1))
      .withColumn("__v2",
        (col("__q2").cast("double") -
          col("__s2").cast("double") * col("__s2").cast("double") /
            col("__n2d")) / (col("__n2d") - 1))
      .withColumn("__e1", col("__v1") / col("__n1d"))
      .withColumn("__e2", col("__v2") / col("__n2d"))
      .withColumn("__se", col("__e1") + col("__e2"))
      .withColumn("t_stat",
        (col("__m1") - col("__m2")) / sqrt(col("__se")))
      .withColumn("df_ws",
        col("__se") * col("__se") /
          (col("__e1") * col("__e1") / (col("__n1d") - 1) +
            col("__e2") * col("__e2") / (col("__n2d") - 1)))
      .select(col("grp"), col("t_stat"), col("df_ws"), col("n1"), col("n2"))
  }

  /** ClickHouse `covarPop(x, y)` / `covarSamp(x, y)` (round 13): per
    * group, population and sample covariance from the same exact long
    * moments as [[simpleLinearRegression]] (n, Σx, Σy, Σxy — 4 longs,
    * map-side combinable): cov_p = (n·Σxy − Σx·Σy)/n², cov_s = (n·Σxy
    * − Σx·Σy)/(n·(n−1)). The MOMENTS are exact longs; the numerator is
    * combined in DOUBLES (each moment cast first), trading one IEEE
    * rounding per term for an overflow envelope that no longer shrinks
    * by a factor of n — the all-long numerator multiplied Σxy by the
    * group count before any cast, so large groups hit ANSI overflow
    * refusal where ClickHouse covarPop succeeds (r13 advice). Same
    * double-first moment discipline as the sibling t-test aggregates.
    * Single-row groups → NULL covarSamp (undefined), 0 covarPop.
    */
  def covariance(df: DataFrame, group: Column, x: Column,
                 y: Column): DataFrame = {
    val m = df.select(group.as("grp"), x.as("__x"), y.as("__y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"))
    val nd = col("n").cast("double")
    val num = nd * col("__sxy").cast("double") -
      col("__sx").cast("double") * col("__sy").cast("double")
    m.select(col("grp"),
      (num / (nd * nd)).as("covar_pop"),
      when(col("n") < 2, lit(null))
        .otherwise(num / (nd * (nd - 1))).as("covar_samp"),
      col("n"))
  }

  /** ClickHouse `studentTTest(v, idx)` (round 13): per group, the
    * POOLED-variance two-sample t statistic between sample 0 and
    * sample 1 — the equal-variance flavor of [[welchTTest]], reusing
    * the identical 6-long moment state.
    *
    * sp² = ((n₁−1)v₁ + (n₂−1)v₂)/(n₁+n₂−2);
    * t = (m₁−m₂)/√(sp²·(1/n₁ + 1/n₂)); df = n₁+n₂−2 (exact long —
    * unlike Welch's fractional df). Groups lacking two points per
    * sample are dropped; CH returns (t, p) — the p-value needs the
    * incomplete beta (not IEEE-portable), callers threshold on t/df.
    */
  def studentTTest(df: DataFrame, group: Column, idx: Column,
                   value: Column): DataFrame = {
    val m = twoSampleMoments(df, group, idx, value)
      .where(col("n1") > 1 && col("n2") > 1)
    m.withColumn("__n1d", col("n1").cast("double"))
      .withColumn("__n2d", col("n2").cast("double"))
      .withColumn("__m1", col("__s1").cast("double") / col("__n1d"))
      .withColumn("__m2", col("__s2").cast("double") / col("__n2d"))
      .withColumn("__v1",
        (col("__q1").cast("double") -
          col("__s1").cast("double") * col("__s1").cast("double") /
            col("__n1d")) / (col("__n1d") - 1))
      .withColumn("__v2",
        (col("__q2").cast("double") -
          col("__s2").cast("double") * col("__s2").cast("double") /
            col("__n2d")) / (col("__n2d") - 1))
      .withColumn("__sp2",
        ((col("__n1d") - 1) * col("__v1") +
          (col("__n2d") - 1) * col("__v2")) /
          (col("__n1d") + col("__n2d") - 2))
      .withColumn("t_stat",
        (col("__m1") - col("__m2")) /
          sqrt(col("__sp2") * (lit(1.0) / col("__n1d") +
            lit(1.0) / col("__n2d"))))
      .select(col("grp"), col("t_stat"),
        (col("n1") + col("n2") - 2L).as("df_p"), col("n1"), col("n2"))
  }

  /** ClickHouse `meanZTest(σ₁², σ₂², conf)(v, idx)` (round 13): the
    * two-sample z test with KNOWN population variances (caller-
    * supplied, as in CH) — z = (m₁−m₂)/√(σ₁²/n₁ + σ₂²/n₂). Means come
    * from exact long sums; the z formula is one fixed IEEE tree (one
    * sqrt). CH returns the confidence interval too — that needs the
    * inverse normal CDF (not IEEE-portable), so callers threshold on
    * z directly. Groups missing either sample are dropped. 4 longs of
    * state per group, map-side combinable.
    */
  def meanZTest(df: DataFrame, group: Column, idx: Column, value: Column,
                popVar1: Double, popVar2: Double): DataFrame = {
    require(popVar1 > 0 && popVar2 > 0,
      s"population variances must be positive, got ($popVar1, $popVar2)")
    val m = twoSampleMoments(df, group, idx, value)
      .where(col("n1") > 0 && col("n2") > 0)
    m.withColumn("__n1d", col("n1").cast("double"))
      .withColumn("__n2d", col("n2").cast("double"))
      .withColumn("__m1", col("__s1").cast("double") / col("__n1d"))
      .withColumn("__m2", col("__s2").cast("double") / col("__n2d"))
      .withColumn("z_stat",
        (col("__m1") - col("__m2")) /
          sqrt(lit(popVar1) / col("__n1d") + lit(popVar2) / col("__n2d")))
      .select(col("grp"), col("z_stat"), col("n1"), col("n2"))
  }

  /** The exact-long two-sample moment state shared by [[welchTTest]] /
    * [[studentTTest]] / [[meanZTest]]: per group, (n, Σv, Σv²) for
    * sample 0 and sample 1 — one map-side-combinable aggregate,
    * 6 longs of state.
    */
  private def twoSampleMoments(df: DataFrame, group: Column, idx: Column,
                               value: Column): DataFrame =
    df.select(group.as("grp"), idx.as("__i"), value.as("__v"))
      .groupBy(col("grp"))
      .agg(
        sum(when(col("__i") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("__i") === 0, col("__v")).otherwise(0L)).as("__s1"),
        sum(when(col("__i") === 0, col("__v") * col("__v")).otherwise(0L))
          .as("__q1"),
        sum(when(col("__i") =!= 0, 1L).otherwise(0L)).as("n2"),
        sum(when(col("__i") =!= 0, col("__v")).otherwise(0L)).as("__s2"),
        sum(when(col("__i") =!= 0, col("__v") * col("__v")).otherwise(0L))
          .as("__q2"))

  /** ClickHouse `kolmogorovSmirnovTest(v, idx)`: per group, the
    * two-sample KS statistic D = max|F₁(x) − F₂(x)| between samples
    * 0 and 1 — computed ENTIRELY in integers (max over distinct values
    * of |c₁·n₂ − c₂·n₁|, where cᵢ are the running sample counts) with
    * ONE final divide by n₁·n₂, so D replays bit-exactly.
    *
    * Shape: one groupBy on (grp, v) collapses duplicates (distinct-
    * value-bounded state), then one grp-partitioned window for the
    * running ECDFs — value ties are impossible after the collapse, so
    * the default RANGE frame is unambiguous. Groups missing either
    * sample are dropped (D undefined).
    */
  def ksTest(df: DataFrame, group: Column, idx: Column,
             value: Column): DataFrame = {
    val counts = df
      .select(group.as("grp"), idx.as("__i"), value.as("__v"))
      .groupBy(col("grp"), col("__v"))
      .agg(sum(when(col("__i") === 0, 1L).otherwise(0L)).as("__c1"),
        sum(when(col("__i") =!= 0, 1L).otherwise(0L)).as("__c2"))
    val w = Window.partitionBy("grp").orderBy("__v")
    val tot = Window.partitionBy("grp")
    counts
      .withColumn("__f1", sum(col("__c1")).over(w))
      .withColumn("__f2", sum(col("__c2")).over(w))
      .withColumn("__n1", sum(col("__c1")).over(tot))
      .withColumn("__n2", sum(col("__c2")).over(tot))
      .withColumn("__diff",
        abs(col("__f1") * col("__n2") - col("__f2") * col("__n1")))
      .groupBy(col("grp"))
      .agg(max(col("__diff")).as("__dmax"),
        max(col("__n1")).as("n1"), max(col("__n2")).as("n2"))
      .where(col("n1") > 0 && col("n2") > 0)
      .select(col("grp"),
        (col("__dmax").cast("double") /
          (col("n1") * col("n2")).cast("double")).as("d_stat"),
        col("n1"), col("n2"))
  }

  /** ClickHouse `mannWhitneyUTest(v, idx)`: per group, the rank-sum
    * U statistic of sample 0 vs sample 1 and the tie-corrected normal
    * approximation z (CH returns (u, p); the p-value needs erf — not
    * IEEE-portable — so callers threshold on z).
    *
    * Average ranks are rationals with denominator 2, so the whole rank
    * sum is carried as the INTEGER 2·R₁ = Σ c₁·(2·cum − c + 1) over
    * distinct values (cum = running total count, c = tie-class size);
    * 2·U₁ = 2·R₁ − n₁(n₁+1). The tie correction Σ(c³−c) is integer
    * too; only z's final formula runs in doubles (one sqrt).
    * Same (grp, v)-collapse + one-window shape as [[ksTest]].
    */
  def mannWhitneyU(df: DataFrame, group: Column, idx: Column,
                   value: Column): DataFrame = {
    val counts = df
      .select(group.as("grp"), idx.as("__i"), value.as("__v"))
      .groupBy(col("grp"), col("__v"))
      .agg(sum(when(col("__i") === 0, 1L).otherwise(0L)).as("__c1"),
        sum(when(col("__i") =!= 0, 1L).otherwise(0L)).as("__c2"))
      .withColumn("__c", col("__c1") + col("__c2"))
    val w = Window.partitionBy("grp").orderBy("__v")
    val agg = counts
      .withColumn("__cum", sum(col("__c")).over(w))
      .groupBy(col("grp"))
      .agg(
        sum(col("__c1") * (lit(2L) * col("__cum") - col("__c") + 1L))
          .as("__tr1"),
        sum(col("__c1")).as("n1"), sum(col("__c2")).as("n2"),
        sum(col("__c") * col("__c") * col("__c") - col("__c"))
          .as("__ties"))
      .where(col("n1") > 0 && col("n2") > 0)
    agg
      .withColumn("__tu1",
        col("__tr1") - col("n1") * (col("n1") + 1L))
      .withColumn("u1", col("__tu1").cast("double") / 2.0)
      .withColumn("__n1d", col("n1").cast("double"))
      .withColumn("__n2d", col("n2").cast("double"))
      .withColumn("__nd", (col("n1") + col("n2")).cast("double"))
      .withColumn("__var",
        col("__n1d") * col("__n2d") / 12.0 *
          ((col("__nd") + 1) -
            col("__ties").cast("double") /
              (col("__nd") * (col("__nd") - 1))))
      .withColumn("z",
        when(col("__var") === 0, lit(null)).otherwise(
          (col("u1") - col("__n1d") * col("__n2d") / 2.0) /
            sqrt(col("__var"))))
      .select(col("grp"), col("u1"), col("z"), col("n1"), col("n2"))
  }

  /** ClickHouse `arrayAUC(scores, labels)` as a grouped aggregate
    * (round 12): the ROC area of `score` predicting `positive`. AUC
    * IS the normalized Mann–Whitney U — U₁/(n₁·n₂) with average-rank
    * tie handling — so this reuses [[mannWhitneyU]]'s integer 2·R₁
    * machinery verbatim (positives = sample 0) and spends exactly one
    * divide: AUC = (2·U₁)/(2·n₁·n₂). Groups missing a class are
    * dropped (AUC undefined).
    */
  def auc(df: DataFrame, group: Column, positive: Column,
          score: Column): DataFrame =
    mannWhitneyU(df, group, when(positive, 0L).otherwise(1L), score)
      .select(col("grp"),
        (col("u1") / (col("n1") * col("n2")).cast("double")).as("auc"),
        col("n1").as("n_pos"), col("n2").as("n_neg"))

  /** ClickHouse `rankCorr(x, y)` (round 12): Spearman rank
    * correlation — Pearson over average ranks, ties getting the
    * midpoint rank. Average ranks are rationals with denominator 2,
    * so the moments run over the INTEGER doubled ranks 2·r (the
    * factor cancels in the correlation); per dimension the doubled
    * rank of a tie class is 2·cum − c + 1, broadcast to all members.
    * Only the final (nΣxy−ΣxΣy)/√(…)·√(…) runs in doubles — one
    * fixed tree, two sqrts. Degenerate (constant) dimensions → NULL.
    *
    * Shape: two (grp, v)-collapsed rank windows (one per dimension)
    * joined back on the row id, then one moment aggregate — all on
    * the group partitioning.
    */
  def rankCorr(df: DataFrame, group: Column, x: Column,
               y: Column): DataFrame = {
    val base = df.select(group.as("grp"), x.as("__x"), y.as("__y"))
    def ranks(valCol: String, out: String) = {
      val counts = base.groupBy(col("grp"), col(valCol))
        .agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy("grp").orderBy(valCol)
      counts.withColumn("__cum", sum(col("__c")).over(w))
        .select(col("grp"), col(valCol),
          (lit(2L) * col("__cum") - col("__c") + 1L).as(out))
    }
    val withRanks = base
      .join(ranks("__x", "__rx"), Seq("grp", "__x"))
      .join(ranks("__y", "__ry"), Seq("grp", "__y"))
    val m = withRanks.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("__rx")).as("__sx"), sum(col("__ry")).as("__sy"),
        sum(col("__rx") * col("__ry")).as("__sxy"),
        sum(col("__rx") * col("__rx")).as("__sxx"),
        sum(col("__ry") * col("__ry")).as("__syy"))
    val num = (col("n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val dx = (col("n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val dy = (col("n") * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    m.select(col("grp"),
      when(dx === 0.0 || dy === 0.0, lit(null))
        .otherwise(num / (sqrt(dx) * sqrt(dy))).as("rank_corr"),
      col("n"))
  }

  /** ClickHouse `cramersV(a, b)` (round 12): the χ²-based association
    * measure between two categoricals — V = √(χ²/n/min(r−1, c−1)),
    * χ² = Σ_cells (o·n − r·c)²/(r·c·n) (the e = r·c/n form cleared of
    * one denominator).
    *
    * The χ² SUM of doubles would normally be reduction-order-dependent
    * — the one nondeterminism every other aggregate here avoids by
    * staying integer. Here the per-cell terms are genuinely fractional,
    * so the sum runs as an ORDERED SEQUENTIAL FOLD instead: cells are
    * collected (bounded by r·c, e.g. 120 for 5 types × 24 hours —
    * contingency tables are small BY DEFINITION), sorted by (a, b),
    * and folded left-to-right with the `aggregate` HOF; DuckDB replays
    * with list_reduce over list(term ORDER BY a, b) — same order, same
    * IEEE adds, bit-identical χ².
    *
    * Every term input (o, r, c, n) is an exact long < 2^53 cast once;
    * marginals come from three windows over the CELL table (r·c rows,
    * not the corpus — the known benign unpartitioned-window-on-rollup
    * pattern). One corpus shuffle total (the cell groupBy).
    */
  def cramersV(df: DataFrame, a: Column, b: Column): DataFrame =
    chi2Agg(df, a, b)
      .select(col("chi2"),
        sqrt(col("chi2") / col("n").cast("double") /
          least(col("ra") - 1, col("cb") - 1).cast("double"))
          .as("cramers_v"),
        col("n"), col("ra"), col("cb"))

  /** ClickHouse `contingency(a, b)` (round 13): Pearson's contingency
    * coefficient C = √(χ²/(χ²+n)) — the same zero-densified χ² fold
    * as [[cramersV]] (shared kernel, see [[chi2Agg]]), normalized
    * against χ²+n instead of n·min(r−1,c−1). One corpus shuffle.
    */
  def contingency(df: DataFrame, a: Column, b: Column): DataFrame =
    chi2Agg(df, a, b)
      .select(col("chi2"),
        sqrt(col("chi2") / (col("chi2") + col("n").cast("double")))
          .as("contingency_coeff"),
        col("n"), col("ra"), col("cb"))

  /** ClickHouse `cramersVBiasCorrected(a, b)` (round 13): the
    * Bergsma-Wicher 2013 small-sample correction — φ² loses its
    * expected-under-independence part, r and c shrink accordingly:
    * φ²₊ = max(0, χ²/n − (r−1)(c−1)/(n−1)), r̃ = r − (r−1)²/(n−1),
    * c̃ = c − (c−1)²/(n−1), Ṽ = √(φ²₊ / min(r̃−1, c̃−1)). Same shared
    * [[chi2Agg]] kernel, one more fixed double tree (degenerate
    * min(r̃,c̃) ≤ 1 → NULL; a 1×1 table has no association to correct).
    */
  def cramersVBiasCorrected(df: DataFrame, a: Column, b: Column): DataFrame = {
    val nd = col("n").cast("double")
    val rad = col("ra").cast("double")
    val cbd = col("cb").cast("double")
    val phi2 = col("chi2") / nd
    val phi2bc = greatest(lit(0.0),
      phi2 - (rad - 1) * (cbd - 1) / (nd - 1))
    val rbc = rad - (rad - 1) * (rad - 1) / (nd - 1)
    val cbc = cbd - (cbd - 1) * (cbd - 1) / (nd - 1)
    val den = least(rbc, cbc) - 1
    chi2Agg(df, a, b)
      .select(col("chi2"),
        when(den <= 0.0, lit(null))
          .otherwise(sqrt(phi2bc / den)).as("cramers_v_bc"),
        col("n"), col("ra"), col("cb"))
  }

  /** Shared χ² kernel for [[cramersV]] / [[contingency]] (round 13
    * refactor): one row (chi2, ra, cb, n) from the zero-densified
    * contingency cell table, the χ² sum running as the ordered
    * sequential fold documented at [[cramersV]].
    */
  private def chi2Agg(df: DataFrame, a: Column, b: Column): DataFrame = {
    val seen = df.select(a.as("__a"), b.as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__o"))
    // densify: ZERO cells contribute (r·c/n) to χ² — dropping them
    // (the natural groupBy output) understates association
    val cells = seen.select(col("__a")).distinct()
      .crossJoin(seen.select(col("__b")).distinct())
      .join(seen, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
    val wa = Window.partitionBy("__a")
    val wb = Window.partitionBy("__b")
    val wn = Window.partitionBy()
    val terms = cells
      .withColumn("__r", sum(col("__o")).over(wa))
      .withColumn("__c", sum(col("__o")).over(wb))
      .withColumn("__n", sum(col("__o")).over(wn))
      .withColumn("__d",
        col("__o").cast("double") * col("__n").cast("double") -
          col("__r").cast("double") * col("__c").cast("double"))
      .withColumn("__term",
        col("__d") * col("__d") /
          (col("__r").cast("double") * col("__c").cast("double") *
            col("__n").cast("double")))
    terms
      .agg(
        aggregate(
          array_sort(collect_list(
            struct(col("__a"), col("__b"), col("__term")))),
          lit(0.0), (acc, s) => acc + s.getField("__term")).as("chi2"),
        countDistinct(col("__a")).as("ra"),
        countDistinct(col("__b")).as("cb"),
        max(col("__n")).as("n"))
  }

  /** ClickHouse `skewPop` / `kurtPop` (round 12): population skewness
    * and kurtosis from EXACT integer power sums — m_k = Σ(x−μ)^k/n
    * expanded into raw moments (Σx, Σx², Σx³, Σx⁴ as longs; callers
    * pass unit-scaled integer values — whole units, not cents, because
    * Σx⁴ is the binding envelope: |Σx⁴| < 2^63 ⇒ |x| ≲ 10³ at 10⁶
    * rows/group, ANSI-loud beyond). Only the final central-moment
    * algebra runs in doubles (one sqrt for skew's σ³ via σ·σ·σ);
    * skew = m₃/σ³, kurt = m₄/σ² /σ² (CH's non-excess kurtPop).
    * Constant groups (σ = 0) → NULL. One map-side-combinable
    * aggregate — 5 longs of state per group.
    */
  def skewKurt(df: DataFrame, group: Column, x: Column): DataFrame = {
    val m = df.select(group.as("grp"), x.as("__x"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__s1"),
        sum(col("__x") * col("__x")).as("__s2"),
        sum(col("__x") * col("__x") * col("__x")).as("__s3"),
        sum(col("__x") * col("__x") * col("__x") * col("__x")).as("__s4"))
    m.withColumn("__nd", col("n").cast("double"))
      .withColumn("__mu", col("__s1").cast("double") / col("__nd"))
      .withColumn("__m2",
        col("__s2").cast("double") / col("__nd") - col("__mu") * col("__mu"))
      .withColumn("__m3",
        col("__s3").cast("double") / col("__nd") -
          lit(3.0) * col("__mu") * (col("__s2").cast("double") / col("__nd")) +
          lit(2.0) * col("__mu") * col("__mu") * col("__mu"))
      .withColumn("__m4",
        col("__s4").cast("double") / col("__nd") -
          lit(4.0) * col("__mu") * (col("__s3").cast("double") / col("__nd")) +
          lit(6.0) * col("__mu") * col("__mu") *
            (col("__s2").cast("double") / col("__nd")) -
          lit(3.0) * col("__mu") * col("__mu") * col("__mu") * col("__mu"))
      .withColumn("__sig", sqrt(col("__m2")))
      .select(col("grp"),
        when(col("__m2") <= 0.0, lit(null))
          .otherwise(col("__m3") /
            (col("__sig") * col("__sig") * col("__sig"))).as("skew_pop"),
        when(col("__m2") <= 0.0, lit(null))
          .otherwise(col("__m4") / col("__m2") / col("__m2")).as("kurt_pop"),
        col("n"))
  }

  /** ClickHouse `quantileExactWeighted(level)(v, w)` (lower flavor):
    * per group, the smallest v whose cumulative weight reaches
    * level = `levelNum`/`levelDen` of the total — decided by the
    * INTEGER comparison cum·levelDen ≥ total·levelNum, so the pick is
    * exact on both engines (no double threshold anywhere).
    *
    * Shape: (grp, v)-collapse bounds state by distinct values, one
    * grp window for the running weight, one final min — the same
    * two-shuffle plan as [[ksTest]].
    */
  /** ClickHouse `analysisOfVariance(v, sample)` (round 13): one-way
    * ANOVA per group — the F statistic testing whether the samples'
    * means differ. From exact long moments per (group, sample)
    * (n_s, Σv, Σv²):
    *   SSB = Σ_s s_s²/n_s − S²/N,  SSW = Σ_s q_s − Σ_s s_s²/n_s,
    *   F = (SSB/(k−1)) / (SSW/(N−k)).
    * The per-sample s²/n terms are genuinely fractional, so their sum
    * runs as the ORDERED SEQUENTIAL FOLD over the sample cells
    * (bounded by k — the cramersV rule); everything else is exact
    * integers until the final fixed tree. Groups with k < 2 samples
    * or zero within-variance → NULL F (CH returns NaN; NULL is this
    * library's NaN discipline). CH returns (F, p); the p-value needs
    * the incomplete beta (not IEEE-portable) — threshold on F with
    * the returned integer dfs.
    */
  def anova(df: DataFrame, group: Column, sample: Column,
            value: Column): DataFrame = {
    val cells = df.select(group.as("grp"), sample.as("__s"),
        value.as("__v"))
      .groupBy(col("grp"), col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__sv"),
        sum(col("__v") * col("__v")).as("__qv"))
      .withColumn("__t",
        col("__sv").cast("double") * col("__sv").cast("double") /
          col("__n").cast("double"))
    val agg = cells.groupBy(col("grp"))
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("__s"), col("__t")))),
          lit(0.0), (acc, s) => acc + s.getField("__t")).as("__st"),
        count(lit(1)).as("k"), sum(col("__n")).as("n"),
        sum(col("__sv")).as("__ss"), sum(col("__qv")).as("__sq"))
    val nd = col("n").cast("double")
    val ssb = col("__st") -
      col("__ss").cast("double") * col("__ss").cast("double") / nd
    val ssw = col("__sq").cast("double") - col("__st")
    val f = (ssb / (col("k") - 1).cast("double")) /
      (ssw / (col("n") - col("k")).cast("double"))
    agg.select(col("grp"),
      when(col("k") < 2 || col("n") <= col("k") || ssw <= 0.0, lit(null))
        .otherwise(f).as("f_stat"),
      (col("k") - 1).as("df_between"),
      (col("n") - col("k")).as("df_within"),
      col("k"), col("n"))
  }

  /** Deterministic base-2 logarithm of a POSITIVE integer column, to
    * 30 fractional bits (round 13) — the portability escape for the
    * entropy family: libm log/log2 is NOT cross-engine reproducible
    * (not correctly rounded; JVM and DuckDB differ in the last ulp),
    * so this computes log2 by the classic bit-squaring expansion
    * instead, using ONLY operations IEEE defines exactly:
    *
    *   e = ⌊log2 c⌋ = length(bin(c)) − 1   (pure integer),
    *   m = c / 2^e ∈ [1,2)                 (exact power-of-2 scaling),
    *   30×: m ← m², and if m ≥ 2 { m ← m/2 (exact), emit bit 2⁻ⁱ }.
    *
    * Each iteration spends exactly one rounding (the square); halving,
    * the comparison, and the dyadic bit accumulation are exact — so
    * the result is bit-identical on any IEEE-754 engine (DuckDB
    * replays it as a recursive CTE). |result − log2 c| < 2⁻³⁰ +
    * 30·2⁻⁵² — a DOCUMENTED DEVIATION from CH's libm log2, traded for
    * determinism. c beyond 2⁵³ stays deterministic (the initial cast
    * is correctly rounded on both engines). Expression shape: one
    * `aggregate` HOF over sequence(1,30) with a 3-double struct state
    * — constant size, no per-stage column blowup.
    */
  def log2Dyadic(c: Column): Column = {
    val e = (length(bin(c)) - 1).cast("long")
    val m = c.cast("double") /
      call_function("shiftleft", lit(1L), e.cast("int")).cast("double")
    val frac = aggregate(
      sequence(lit(1), lit(30)),
      struct(m.as("m"), lit(0.0).as("acc"), lit(0.5).as("w")),
      (s, _) => {
        val sq = s.getField("m") * s.getField("m")
        struct(
          when(sq >= 2.0, sq / 2.0).otherwise(sq).as("m"),
          when(sq >= 2.0, s.getField("acc") + s.getField("w"))
            .otherwise(s.getField("acc")).as("acc"),
          (s.getField("w") / 2.0).as("w"))
      },
      s => s.getField("acc"))
    e.cast("double") + frac
  }

  /** ClickHouse `entropy(v)` (round 13): per group, the Shannon
    * entropy (in bits) of the value distribution, via the count form
    * H = log2(n) − (Σ c·log2 c)/n over the (grp, v)-collapsed cell
    * table — distinct-value-bounded state, one corpus shuffle.
    * log2 is [[log2Dyadic]] (deterministic, 30 fractional bits); the
    * genuinely-fractional Σ c·log2 c runs as the ordered sequential
    * fold (sorted by v) so it replays bit-exactly, like [[cramersV]].
    */
  def entropy(df: DataFrame, group: Column, value: Column): DataFrame = {
    val cells = df.select(group.as("grp"), value.as("__v"))
      .groupBy(col("grp"), col("__v")).agg(count(lit(1)).as("__c"))
    val terms = cells.withColumn("__term",
      col("__c").cast("double") * log2Dyadic(col("__c")))
    terms.groupBy(col("grp"))
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("__v"), col("__term")))),
          lit(0.0), (acc, s) => acc + s.getField("__term")).as("__s"),
        sum(col("__c")).as("n"))
      .select(col("grp"),
        (log2Dyadic(col("n")) - col("__s") / col("n").cast("double"))
          .as("entropy_bits"),
        col("n"))
  }

  /** ClickHouse `theilsU(a, b)` (round 13): the uncertainty
    * coefficient U(a|b) = (H(a) − H(a|b))/H(a) — how much of a's
    * entropy b explains (asymmetric, ∈ [0,1]). Via H(a|b) = H(a,b) −
    * H(b): U = (H(a) + H(b) − H(a,b))/H(a), all three entropies from
    * the joint cell table's marginals in the [[entropy]] count form —
    * three ordered folds (by a / by b / by (a,b)) over tables bounded
    * by r, c, r·c, one [[log2Dyadic]] of n, one fixed final tree.
    * Degenerate a (H(a) = 0, single value) → NULL. One corpus shuffle
    * (the cell groupBy); everything downstream is cell-scale.
    */
  def theilsU(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.select(a.as("__a"), b.as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__c"))
    def foldTerms(t: DataFrame, ord: Column, out: String): DataFrame =
      t.withColumn("__term",
          col("__c").cast("double") * log2Dyadic(col("__c")))
        .agg(aggregate(
          array_sort(collect_list(struct(ord.as("__k"), col("__term")))),
          lit(0.0), (acc, s) => acc + s.getField("__term")).as(out))
    val sa = foldTerms(
      cells.groupBy(col("__a")).agg(sum(col("__c")).as("__c")),
      col("__a"), "__sa")
    val sb = foldTerms(
      cells.groupBy(col("__b")).agg(sum(col("__c")).as("__c")),
      col("__b"), "__sb")
    val sab = foldTerms(cells, struct(col("__a"), col("__b")), "__sab")
    val tot = cells.agg(sum(col("__c")).as("n"))
    val nd = col("n").cast("double")
    val ln2 = log2Dyadic(col("n"))
    val ha = ln2 - col("__sa") / nd
    val hb = ln2 - col("__sb") / nd
    val hab = ln2 - col("__sab") / nd
    tot.crossJoin(sa).crossJoin(sb).crossJoin(sab)
      .select(
        when(ha <= 0.0, lit(null)).otherwise((ha + hb - hab) / ha)
          .as("theils_u"),
        ha.as("h_a"), hb.as("h_b"), hab.as("h_ab"), col("n"))
  }

  def quantileExactWeighted(df: DataFrame, group: Column, value: Column,
                            weight: Column, levelNum: Long = 1L,
                            levelDen: Long = 2L): DataFrame = {
    require(levelNum > 0 && levelDen > 0 && levelNum <= levelDen)
    val g = df.select(group.as("grp"), value.as("__v"), weight.as("__w"))
      .groupBy(col("grp"), col("__v"))
      .agg(sum(col("__w")).as("__w"))
    val w = Window.partitionBy("grp").orderBy("__v")
    val tot = Window.partitionBy("grp")
    g.withColumn("__cum", sum(col("__w")).over(w))
      .withColumn("__total", sum(col("__w")).over(tot))
      .where(col("__cum") * levelDen >= col("__total") * levelNum)
      .groupBy(col("grp"))
      .agg(min(col("__v")).as("wq"))
  }
}
