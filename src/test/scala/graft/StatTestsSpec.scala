package graft

import org.apache.spark.sql.functions._
import graft.operators.StatTests

class StatTestsSpec extends SparkFunSuite {
  import spark.implicits._

  test("simpleLinearRegression: exact fit, vertical group is NULL") {
    val df = Seq(
      // g=a: y = 2x + 3 exactly
      ("a", 1L, 5L), ("a", 2L, 7L), ("a", 3L, 9L), ("a", 10L, 23L),
      // g=b: all x equal -> zero denominator -> NULL slope/intercept
      ("b", 4L, 1L), ("b", 4L, 9L)
    ).toDF("g", "x", "y")
    val out = StatTests.simpleLinearRegression(df, col("g"), col("x"),
      col("y")).orderBy("grp").collect()
    assert(out(0).getDouble(1) == 2.0 && out(0).getDouble(2) == 3.0)
    assert(out(0).getLong(3) == 4L)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("multipleLinearRegression2: exact plane recovery, collinear " +
      "group is NULL, reduces to simple OLS when x2 is informative-free") {
    val plane = for (x1 <- 1L to 5L; x2 <- 0L to 3L)
      yield ("a", x1, x2, 3L + 2L * x1 + 5L * x2) // y = 3 + 2·x1 + 5·x2
    // g=b: x2 constant -> collinear with the intercept -> singular
    val sing = Seq(("b", 1L, 7L, 10L), ("b", 2L, 7L, 12L),
      ("b", 3L, 7L, 14L))
    val df = (plane ++ sing).toDF("g", "x1", "x2", "y")
    val out = StatTests.multipleLinearRegression2(df, col("g"),
      col("x1"), col("x2"), col("y")).orderBy("grp").collect()
    assert(out(0).getString(0) == "a" && out(0).getLong(1) == 20L)
    // the plane is exact in the integer moments: Cramer recovers it
    // to double round-off
    assert(math.abs(out(0).getDouble(2) - 3.0) < 1e-9)
    assert(math.abs(out(0).getDouble(3) - 2.0) < 1e-9)
    assert(math.abs(out(0).getDouble(4) - 5.0) < 1e-9)
    assert(out(1).getString(0) == "b")
    assert(out(1).isNullAt(2) && out(1).isNullAt(3) && out(1).isNullAt(4))
  }

  test("corrMatrix3: matches plain-Scala Pearson; zero-variance pair NULL; " +
      "perfect linear pair = ±1 to round-off") {
    val xs = Seq(1L, 2L, 3L, 4L, 5L, 9L)
    val rows = xs.map(x => ("a", x, 10L - 2L * x, (x * x) % 7L))
    val zv = Seq(("b", 1L, 5L, 2L), ("b", 2L, 5L, 3L)) // x2 constant
    val df = (rows ++ zv).toDF("g", "x1", "x2", "x3")
    val out = StatTests.corrMatrix3(df, col("g"), col("x1"), col("x2"),
      col("x3")).orderBy("grp").collect()
    // g=a: x2 = 10 - 2·x1 exactly -> corr_12 = -1 (to round-off)
    assert(math.abs(out(0).getDouble(2) - (-1.0)) < 1e-12)
    // plain-Scala replay of corr_13 with the same moment tree
    def pearson(u: Seq[Long], v: Seq[Long]): Double = {
      val n = u.size.toDouble
      val (su, sv) = (u.sum.toDouble, v.sum.toDouble)
      val suu = u.map(a => a * a).sum.toDouble
      val svv = v.map(a => a * a).sum.toDouble
      val suv = u.zip(v).map { case (a, b) => a * b }.sum.toDouble
      (n * suv - su * sv) /
        (math.sqrt(n * suu - su * su) * math.sqrt(n * svv - sv * sv))
    }
    val x3s = xs.map(x => (x * x) % 7L)
    assert(out(0).getDouble(3) == pearson(xs, x3s))
    // g=b: x2 has zero variance -> its pairs are NULL, the x1-x3 pair
    // is still defined
    assert(out(1).isNullAt(2) && out(1).isNullAt(4))
    assert(!out(1).isNullAt(3))
  }

  test("welchTTest: matches the plain-Scala Welch formula; tiny groups dropped") {
    val s0 = Seq(10L, 12L, 14L, 16L)
    val s1 = Seq(20L, 21L, 19L, 30L, 25L)
    val df = (s0.map(("d1", 0L, _)) ++ s1.map(("d1", 1L, _)) ++
      Seq(("d2", 0L, 5L), ("d2", 1L, 6L))) // n=1 per sample -> dropped
      .toDF("g", "i", "v")
    val out = StatTests.welchTTest(df, col("g"), col("i"), col("v"))
      .collect()
    assert(out.length == 1 && out(0).getString(0) == "d1")
    // plain-Scala replay of the exact same tree
    val (n1d, n2d) = (s0.size.toDouble, s1.size.toDouble)
    val (s1d, s2d) = (s0.sum.toDouble, s1.sum.toDouble)
    val (q1d, q2d) = (s0.map(v => v * v).sum.toDouble,
      s1.map(v => v * v).sum.toDouble)
    val m1 = s1d / n1d; val m2 = s2d / n2d
    val v1 = (q1d - s1d * s1d / n1d) / (n1d - 1)
    val v2 = (q2d - s2d * s2d / n2d) / (n2d - 1)
    val e1 = v1 / n1d; val e2 = v2 / n2d; val se = e1 + e2
    val t = (m1 - m2) / math.sqrt(se)
    val dfw = se * se / (e1 * e1 / (n1d - 1) + e2 * e2 / (n2d - 1))
    assert(out(0).getDouble(1) == t)
    assert(out(0).getDouble(2) == dfw)
    assert(out(0).getLong(3) == 4L && out(0).getLong(4) == 5L)
  }

  test("ksTest: hand-built two-sample D") {
    // s0={1,2}, s1={2,3}: D = max(|.5-0|, |1-.5|, |1-1|) = 0.5
    val df = Seq(("g", 0L, 1L), ("g", 0L, 2L), ("g", 1L, 2L), ("g", 1L, 3L))
      .toDF("g", "i", "v")
    val out = StatTests.ksTest(df, col("g"), col("i"), col("v")).collect()
    assert(out(0).getDouble(1) == 0.5)
    assert(out(0).getLong(2) == 2L && out(0).getLong(3) == 2L)
  }

  test("mannWhitneyU: separated samples give U=0 and the known z") {
    // s0={1,2}, s1={3,4}: R1=3, U1=0; no ties -> var = (4/12)*5
    val df = Seq(("g", 0L, 1L), ("g", 0L, 2L), ("g", 1L, 3L), ("g", 1L, 4L))
      .toDF("g", "i", "v")
    val out = StatTests.mannWhitneyU(df, col("g"), col("i"), col("v"))
      .collect()
    assert(out(0).getDouble(1) == 0.0)
    val varExp = 2.0 * 2.0 / 12.0 * ((4.0 + 1) - 0.0 / (4.0 * 3.0))
    assert(out(0).getDouble(2) == (0.0 - 2.0 * 2.0 / 2.0) / math.sqrt(varExp))
  }

  test("mannWhitneyU: all-tied values give half-rank U and NULL z") {
    // every value equal: U1 = n1*n2/2; tie correction kills the variance
    val df = Seq(("g", 0L, 7L), ("g", 0L, 7L), ("g", 1L, 7L), ("g", 1L, 7L))
      .toDF("g", "i", "v")
    val out = StatTests.mannWhitneyU(df, col("g"), col("i"), col("v"))
      .collect()
    assert(out(0).getDouble(1) == 2.0) // 2*2/2
    assert(out(0).isNullAt(2))         // var == 0 -> NULL
  }

  test("auc: perfect separation 1, reversed 0, random-with-ties half") {
    // positives score higher -> AUC 1
    val perf = Seq(("g", true, 10L), ("g", true, 9L),
      ("g", false, 2L), ("g", false, 1L)).toDF("g", "p", "v")
    assert(StatTests.auc(perf, col("g"), col("p"), col("v"))
      .collect()(0).getDouble(1) == 1.0)
    // all scores equal -> average-rank ties give exactly 0.5
    val tied = Seq(("g", true, 5L), ("g", true, 5L),
      ("g", false, 5L), ("g", false, 5L)).toDF("g", "p", "v")
    assert(StatTests.auc(tied, col("g"), col("p"), col("v"))
      .collect()(0).getDouble(1) == 0.5)
    // positives score LOWER -> 0
    val rev = Seq(("g", true, 1L), ("g", false, 9L)).toDF("g", "p", "v")
    assert(StatTests.auc(rev, col("g"), col("p"), col("v"))
      .collect()(0).getDouble(1) == 0.0)
  }

  test("rankCorr: monotone ±1 up to the sqrt·sqrt ulp, constant NULL") {
    // n=3 distinct ranks: the exact tree gives 24/(√24·√24) — one ulp
    // off ±1 because sqrt(d)·sqrt(d) ≠ d; the spec pins the exact
    // formula value, not the idealized one (what the oracle replays)
    val one = 24.0 / (math.sqrt(24.0) * math.sqrt(24.0))
    val up = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 35L))
      .toDF("g", "x", "y")
    assert(StatTests.rankCorr(up, col("g"), col("x"), col("y"))
      .collect()(0).getDouble(1) == one)
    val down = Seq(("g", 1L, 30L), ("g", 2L, 20L), ("g", 3L, 10L))
      .toDF("g", "x", "y")
    assert(StatTests.rankCorr(down, col("g"), col("x"), col("y"))
      .collect()(0).getDouble(1) == -one)
    val const = Seq(("g", 1L, 7L), ("g", 2L, 7L)).toDF("g", "x", "y")
    assert(StatTests.rankCorr(const, col("g"), col("x"), col("y"))
      .collect()(0).isNullAt(1))
  }

  test("skewKurt: symmetric data skew 0; plain-Scala moment replay; constant NULL") {
    // symmetric around 5: skew exactly 0 (integer symmetry survives
    // the double algebra here), kurtosis = m4/m2²
    val sym = Seq(("g", 2L), ("g", 4L), ("g", 6L), ("g", 8L))
      .toDF("g", "x")
    val r = StatTests.skewKurt(sym, col("g"), col("x")).collect()(0)
    assert(r.getDouble(1) == 0.0)
    // plain-Scala replay of the same tree
    val xs = Seq(2.0, 4.0, 6.0, 8.0); val nd = 4.0
    val mu = xs.sum / nd
    val m2 = xs.map(v => v * v).sum / nd - mu * mu
    val m4 = xs.map(v => v * v * v * v).sum / nd -
      4.0 * mu * (xs.map(v => v * v * v).sum / nd) +
      6.0 * mu * mu * (xs.map(v => v * v).sum / nd) -
      3.0 * mu * mu * mu * mu
    assert(r.getDouble(2) == m4 / m2 / m2)
    val const = Seq(("c", 7L), ("c", 7L)).toDF("g", "x")
    val c = StatTests.skewKurt(const, col("g"), col("x")).collect()(0)
    assert(c.isNullAt(1) && c.isNullAt(2))
  }

  test("cramersV: perfect association is 1, independence is exactly 0") {
    val perfect = Seq(("x", 1L), ("x", 1L), ("y", 2L), ("y", 2L))
      .toDF("a", "b")
    val p = StatTests.cramersV(perfect, col("a"), col("b")).collect()(0)
    assert(p.getDouble(1) == 1.0)
    // balanced 2x2: o*n == r*c in every cell -> chi2 == 0 exactly
    val indep = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L))
      .toDF("a", "b")
    val i = StatTests.cramersV(indep, col("a"), col("b")).collect()(0)
    assert(i.getDouble(0) == 0.0 && i.getDouble(1) == 0.0)
  }

  test("studentTTest: matches the plain-Scala pooled formula, df exact") {
    val s0 = Seq(10L, 12L, 14L, 16L)
    val s1 = Seq(20L, 21L, 19L, 30L, 25L)
    val df = (s0.map(("d1", 0L, _)) ++ s1.map(("d1", 1L, _)))
      .toDF("g", "i", "v")
    val out = StatTests.studentTTest(df, col("g"), col("i"), col("v"))
      .collect()
    val (n1d, n2d) = (s0.size.toDouble, s1.size.toDouble)
    val (s1d, s2d) = (s0.sum.toDouble, s1.sum.toDouble)
    val (q1d, q2d) = (s0.map(v => v * v).sum.toDouble,
      s1.map(v => v * v).sum.toDouble)
    val m1 = s1d / n1d; val m2 = s2d / n2d
    val v1 = (q1d - s1d * s1d / n1d) / (n1d - 1)
    val v2 = (q2d - s2d * s2d / n2d) / (n2d - 1)
    val sp2 = ((n1d - 1) * v1 + (n2d - 1) * v2) / (n1d + n2d - 2)
    val t = (m1 - m2) / math.sqrt(sp2 * (1.0 / n1d + 1.0 / n2d))
    assert(out(0).getDouble(1) == t)
    assert(out(0).getLong(2) == 7L) // df = 4 + 5 - 2, exact long
  }

  test("meanZTest: known-variance z, equal means give exactly 0") {
    val df = Seq(("g", 0L, 10L), ("g", 0L, 20L),
      ("g", 1L, 14L), ("g", 1L, 16L)).toDF("g", "i", "v")
    // means both 15 -> z = 0 exactly regardless of variances
    val z0 = StatTests.meanZTest(df, col("g"), col("i"), col("v"),
      4.0, 9.0).collect()
    assert(z0(0).getDouble(1) == 0.0)
    // shifted: z = (15 - 25)/sqrt(4/2 + 9/2)
    val df2 = Seq(("g", 0L, 10L), ("g", 0L, 20L),
      ("g", 1L, 24L), ("g", 1L, 26L)).toDF("g", "i", "v")
    val z = StatTests.meanZTest(df2, col("g"), col("i"), col("v"),
      4.0, 9.0).collect()
    assert(z(0).getDouble(1) == (15.0 - 25.0) / math.sqrt(2.0 + 4.5))
    val e = intercept[IllegalArgumentException] {
      StatTests.meanZTest(df, col("g"), col("i"), col("v"), -1.0, 1.0)
    }
    assert(e.getMessage.contains("positive"))
  }

  test("contingency: shares cramersV's chi2; perfect 2x2 gives sqrt(n/(n+n))") {
    // perfect association, 2x2, n=4: chi2 = n -> C = sqrt(1/2)
    val perfect = Seq(("x", 1L), ("x", 1L), ("y", 2L), ("y", 2L))
      .toDF("a", "b")
    val p = StatTests.contingency(perfect, col("a"), col("b")).collect()(0)
    assert(p.getDouble(0) == 4.0) // chi2 == n on perfect 2x2
    assert(p.getDouble(1) == math.sqrt(4.0 / 8.0))
    // independence -> chi2 = 0 -> C = 0
    val indep = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L))
      .toDF("a", "b")
    val i = StatTests.contingency(indep, col("a"), col("b")).collect()(0)
    assert(i.getDouble(1) == 0.0)
  }

  test("anova: plain-Scala F replay; degenerate groups NULL") {
    // g1: samples a={1,2,3}, b={5,6,7}: clear mean separation
    val df = (Seq(1L, 2L, 3L).map(("g1", "a", _)) ++
      Seq(5L, 6L, 7L).map(("g1", "b", _)) ++
      Seq(("g2", "a", 4L), ("g2", "a", 9L)) ++ // single sample -> NULL
      Seq(("g3", "a", 2L), ("g3", "a", 2L), ("g3", "b", 2L))) // ssw=0
      .toDF("g", "s", "v")
    val out = StatTests.anova(df, col("g"), col("s"), col("v"))
      .orderBy("grp").collect()
    // plain replay for g1: st = 36/3 + 324/3 = 120; ss=24, n=6
    // ssb = 120 - 576/6 = 24; ssw = (14 + 110) - 120 = 4
    // F = (24/1)/(4/4) = 24
    assert(out(0).getDouble(1) == 24.0)
    assert(out(0).getLong(2) == 1L && out(0).getLong(3) == 4L)
    assert(out(1).isNullAt(1)) // k=1
    assert(out(2).isNullAt(1)) // zero within-variance
  }

  test("covariance: exact long moments, double-first numerator, both " +
      "flavors, n=1 NULL samp") {
    // x = (1,2,3), y = (2,4,7): n=3, sx=6, sy=13, sxy=31
    // num = 3*31 - 6*13 = 15 (double-exact at these magnitudes — the
    // r14 double-first combine widens the overflow envelope without
    // moving any value below 2^53); covar_pop = 15/9, covar_samp = 15/6
    val df = Seq(("g", 1L, 2L), ("g", 2L, 4L), ("g", 3L, 7L),
      ("h", 5L, 5L)).toDF("g", "x", "y")
    val out = StatTests.covariance(df, col("g"), col("x"), col("y"))
      .orderBy("grp").collect()
    assert(out(0).getDouble(1) == 15.0 / 9.0)
    assert(out(0).getDouble(2) == 15.0 / 6.0)
    assert(out(1).getDouble(1) == 0.0 && out(1).isNullAt(2)) // n=1
  }

  test("cramersVBiasCorrected: shrinks V on small tables, clamps to 0 " +
      "at independence, degenerate 1xk is NULL") {
    // noisy 2x2 at n=8 (3/1 vs 1/3): chi2 = 2, V = 0.5; the correction
    // genuinely shrinks (phi2+ = 0.25 - 1/7, den = 6/7 -> ~0.354).
    // (On a PERFECT 2x2 the correction cancels exactly - V_bc = 1 too,
    // verified the hard way writing this test.)
    val noisy = Seq.fill(3)(("x", 1L)) ++ Seq(("x", 2L)) ++
      Seq.fill(3)(("y", 2L)) ++ Seq(("y", 1L))
    val ndf = noisy.toDF("a", "b")
    val v = StatTests.cramersV(ndf, col("a"), col("b"))
      .collect()(0).getDouble(1)
    val vbc = StatTests.cramersVBiasCorrected(ndf, col("a"), col("b"))
      .collect()(0).getDouble(1)
    assert(v == 0.5 && vbc < v && vbc > 0.0)
    // independence: chi2 = 0 -> phi2bc clamps at 0 -> V_bc = 0
    val indep = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L))
      .toDF("a", "b")
    val i = StatTests.cramersVBiasCorrected(indep, col("a"), col("b"))
      .collect()(0)
    assert(i.getDouble(1) == 0.0)
    // 1xk: corrected min dimension collapses -> NULL
    val degen = Seq(("x", 1L), ("x", 2L), ("x", 3L)).toDF("a", "b")
    val dRow = StatTests.cramersVBiasCorrected(degen, col("a"), col("b"))
      .collect()(0)
    assert(dRow.isNullAt(1))
  }

  test("log2Dyadic: within 2^-30 of libm log2 across magnitudes; exact on powers of 2") {
    val vals = Seq(1L, 2L, 3L, 7L, 10L, 100L, 1023L, 1024L, 1025L,
      999983L, (1L << 40) + 12345L, (1L << 52) + 1L)
    val out = vals.toDF("c")
      .select(col("c"), StatTests.log2Dyadic(col("c")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vals.foreach { c =>
      val err = math.abs(out(c) - math.log(c.toDouble) / math.log(2.0))
      assert(err < 1.1 * math.pow(2.0, -30),
        s"log2Dyadic($c) = ${out(c)}, err $err")
    }
    assert(out(1L) == 0.0 && out(2L) == 1.0 && out(1024L) == 10.0)
  }

  test("entropy: uniform k-way is exactly log2Dyadic(k); constant column is 0") {
    // 4 values x 8 rows each: H = log2(4) = 2 exactly (uniform counts
    // make the fold terms c*log2(c) cancel against log2(n) dyadically)
    val uni = (1 to 4).flatMap(v => Seq.fill(8)(("g", v.toLong)))
      .toDF("g", "v")
    val h = StatTests.entropy(uni, col("g"), col("v")).collect()(0)
    assert(h.getDouble(1) == 2.0 && h.getLong(2) == 32L)
    val const = Seq.fill(5)(("g", 9L)).toDF("g", "v")
    val h0 = StatTests.entropy(const, col("g"), col("v")).collect()(0)
    assert(h0.getDouble(1) == 0.0)
  }

  test("theilsU: determined mapping gives 1, independence gives ~0, constant a NULL") {
    // a fully determined by b: H(a|b) = 0 -> U = 1 (exactly: H(ab) == H(b))
    val det = Seq(("x", 1L), ("x", 1L), ("y", 2L), ("y", 2L), ("z", 3L))
      .toDF("a", "b")
    val u1 = StatTests.theilsU(det, col("a"), col("b")).collect()(0)
    assert(u1.getDouble(0) == 1.0)
    // balanced independent 2x2: H(ab) = H(a) + H(b) -> U = 0
    val indep = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L))
      .toDF("a", "b")
    val u0 = StatTests.theilsU(indep, col("a"), col("b")).collect()(0)
    assert(math.abs(u0.getDouble(0)) < 1e-9)
    // constant a: H(a) = 0 -> NULL
    val consta = Seq(("x", 1L), ("x", 2L)).toDF("a", "b")
    val un = StatTests.theilsU(consta, col("a"), col("b")).collect()(0)
    assert(un.isNullAt(0))
  }

  test("quantileExactWeighted: integer cumulative pick at two levels") {
    val df = Seq(("g", 10L, 3L), ("g", 20L, 2L), ("g", 30L, 7L))
      .toDF("g", "v", "w")
    val med = StatTests.quantileExactWeighted(df, col("g"), col("v"),
      col("w")).collect()
    assert(med(0).getLong(1) == 30L) // cum(20)=5 < 6 = total/2
    val q1 = StatTests.quantileExactWeighted(df, col("g"), col("v"),
      col("w"), 1L, 4L).collect()
    assert(q1(0).getLong(1) == 10L) // cum(10)=3 >= 12/4
  }
}
