package graft

import org.apache.spark.sql.functions._
import graft.operators.ChAnalytics

class ChAnalyticsSpec extends SparkFunSuite {
  import spark.implicits._

  // (user, ts, type) — a funnel playground:
  //  u1: full view->click->purchase chain inside the window
  //  u2: view then click AFTER the window (level stays 1)
  //  u3: click/purchase but never a view (level 0)
  //  u4: out-of-order purchase before click (purchase must be re-found
  //      after the click to count; here it isn't -> level 2)
  private val ev = Seq(
    (1L, 100L, "view"), (1L, 150L, "click"), (1L, 200L, "purchase"),
    (2L, 100L, "view"), (2L, 5000L, "click"),
    (3L, 100L, "click"), (3L, 150L, "purchase"),
    (4L, 100L, "view"), (4L, 120L, "purchase"), (4L, 150L, "click")
  ).toDF("user_id", "ts", "event_type")

  private val conds = Seq(
    col("event_type") === "view",
    col("event_type") === "click",
    col("event_type") === "purchase")

  test("windowFunnel levels: chain, window cutoff, no-anchor, ordering") {
    val got = ChAnalytics
      .windowFunnel(ev, col("user_id"), col("ts"), 1000L, conds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) == 3) // full chain within window
    assert(got(2L) == 1) // click outside window of anchor view
    assert(got(3L) == 0) // never viewed
    assert(got(4L) == 2) // purchase BEFORE click doesn't complete chain
  }

  test("windowFunnel: strictly-after steps (same-ts does not chain)") {
    val same = Seq((9L, 100L, "view"), (9L, 100L, "click"))
      .toDF("user_id", "ts", "event_type")
    val got = ChAnalytics
      .windowFunnel(same, col("user_id"), col("ts"), 1000L, conds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(9L) == 1)
  }

  test("retention flags per entity") {
    val got = ChAnalytics.retention(ev, col("user_id"),
      Seq(col("event_type") === "view", col("event_type") === "purchase"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2)))
      .toMap
    assert(got(1L) == (true, true))
    assert(got(2L) == (true, false))
    assert(got(3L) == (false, false)) // purchase without the base cond
    assert(got(4L) == (true, true))
  }

  test("limitBy keeps first n per key in order") {
    val got = ChAnalytics.limitBy(ev, Seq(col("user_id")), 2,
      Seq(col("ts"), col("event_type")))
      .groupBy("user_id").agg(count(lit(1)).as("n"), min("ts").as("t0"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.values.forall(_._1 <= 2))
    assert(got(1L) == (2L, 100L))
    assert(got(3L) == (2L, 100L))
  }

  test("limitBy plans a WindowGroupLimit (partial top-n before shuffle)") {
    val plan = ChAnalytics.limitBy(ev, Seq(col("user_id")), 2,
      Seq(col("ts"))).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("sequenceMatch: ordered pattern over per-user event codes") {
    def matchOf(pattern: String): Map[Long, Boolean] =
      ChAnalytics.sequenceMatch(ev, col("user_id"), Seq(col("ts")),
          conds, pattern)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // u1 view<click<purchase matches; u4 purchase BEFORE click doesn't
    assert(matchOf("1.*2.*3") ==
      Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    // view then click, any gap — u1, u2, and u4 (1..3..2 contains 1.*2)
    assert(matchOf("1.*2") ==
      Map(1L -> true, 2L -> true, 3L -> false, 4L -> true))
    // adjacency beyond CH: view IMMEDIATELY followed by purchase
    assert(matchOf("13") ==
      Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
  }

  test("sequenceCount: non-overlapping lazy-gap occurrence counts") {
    // u5 has two full view->click hops: 1 2 1 x 2 -> lazy '1.*?2' = 2
    val ev5 = ev.union(Seq(
      (5L, 100L, "view"), (5L, 110L, "click"),
      (5L, 120L, "view"), (5L, 130L, "other"), (5L, 140L, "click")
    ).toDF("user_id", "ts", "event_type"))
    val got = ChAnalytics.sequenceCount(ev5, col("user_id"),
        Seq(col("ts")), conds, "1.*?2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 2L))
  }

  // strict_order playground: (user, event_id, ts, type)
  //  u1: contiguous view->click->purchase            -> strict 3
  //  u2: view, OTHER, click, purchase (early break)  -> strict 1
  //  u3: view, click, OTHER, purchase (CH's A→B→D→C) -> strict 2
  //  u4: no view                                     -> 0
  //  u5: contiguous but click outside the window     -> 1
  private val evs = Seq(
    (1L, 1L, 100L, "view"), (1L, 2L, 150L, "click"), (1L, 3L, 200L, "purchase"),
    (2L, 4L, 100L, "view"), (2L, 5L, 120L, "other"), (2L, 6L, 150L, "click"),
    (2L, 7L, 200L, "purchase"),
    (3L, 8L, 100L, "view"), (3L, 9L, 150L, "click"), (3L, 10L, 170L, "other"),
    (3L, 11L, 200L, "purchase"),
    (4L, 12L, 100L, "click"), (4L, 13L, 150L, "purchase"),
    (5L, 14L, 100L, "view"), (5L, 15L, 5000L, "click")
  ).toDF("user_id", "event_id", "ts", "event_type")

  test("windowFunnelStrictOrder: interventions break the chain") {
    val got = ChAnalytics.windowFunnelStrictOrder(evs, col("user_id"),
        col("ts"), col("event_id"), 1000L, conds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0, 5L -> 1))
  }

  test("strict_order never exceeds the loose funnel level (real events)") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts_us", "event_type")
    val loose = ChAnalytics.windowFunnel(ev, col("user_id"), col("ts_us"),
        86400000000L, conds)
      .withColumnRenamed("level", "loose")
    val strict = ChAnalytics.windowFunnelStrictOrder(ev, col("user_id"),
        col("ts_us"), col("event_id"), 86400000000L, conds)
      .withColumnRenamed("level", "strict")
    val joined = loose.join(strict, "entity")
    assert(joined.where(col("strict") > col("loose")).count() == 0)
    // anchors agree: level==0 on one side iff 0 on the other
    assert(joined.where((col("strict") === 0) =!= (col("loose") === 0))
      .count() == 0)
  }

  test("sumMap: per-group key-sorted merge of parallel arrays, aligned, exact") {
    val df = Seq(
      (1L, Seq("b", "a"), Seq(1.0, 2.0)),
      (1L, Seq("a", "c"), Seq(10.0, 0.5)),
      (2L, Seq("z"), Seq(7.0)),
      (2L, Seq.empty[String], Seq.empty[Double])
    ).toDF("g", "ks", "vs")
    val out = ChAnalytics.sumMap(df, col("g"), col("ks"), col("vs"))
      .orderBy("grp").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L)
    assert(out(0).getSeq[String](1) == Seq("a", "b", "c"))
    assert(out(0).getSeq[Double](2) == Seq(12.0, 1.0, 0.5))
    assert(out(1).getLong(0) == 2L)
    assert(out(1).getSeq[String](1) == Seq("z"))
    assert(out(1).getSeq[Double](2) == Seq(7.0))
  }

  test("maxIntersections: half-open semantics, peak concurrency per group") {
    val iv = Seq(
      // g=1: [0,10) [5,15) [14,20) -> peak 2 (at t in [5,10) and [14,15))
      (1L, 0L, 10L), (1L, 5L, 15L), (1L, 14L, 20L),
      // g=2: touching endpoints [0,5) [5,9) never overlap -> peak 1
      (2L, 0L, 5L), (2L, 5L, 9L),
      // g=3: three nested -> peak 3
      (3L, 0L, 100L), (3L, 10L, 90L), (3L, 20L, 80L)
    ).toDF("g", "s", "e")
    val out = ChAnalytics.maxIntersections(iv, col("g"), col("s"), col("e"))
      .orderBy("grp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 2L), (2L, 1L), (3L, 3L)))
  }

  test("intervalLengthSum: union length — overlaps once, touching merge, gaps excluded") {
    val iv = Seq(
      // g=1: [0,10) ∪ [5,15) ∪ [20,25) -> 15 + 5 = 20 (overlap once, gap excluded)
      (1L, 0L, 10L), (1L, 5L, 15L), (1L, 20L, 25L),
      // g=2: touching [0,5) ∪ [5,9) merge seamlessly -> 9
      (2L, 0L, 5L), (2L, 5L, 9L),
      // g=3: nested [0,100) ⊇ [10,90) -> 100, counted once
      (3L, 0L, 100L), (3L, 10L, 90L),
      // g=4: duplicate identical intervals -> 7, counted once
      (4L, 3L, 10L), (4L, 3L, 10L)
    ).toDF("g", "s", "e")
    val out = ChAnalytics.intervalLengthSum(iv, col("g"), col("s"), col("e"))
      .orderBy("grp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 20L), (2L, 9L), (3L, 100L), (4L, 7L)))
  }

  test("minMaxMap: per-key extrema, key-sorted, aligned arrays") {
    val df = Seq(
      (1L, Seq("b", "a"), Seq(1.0, 2.0)),
      (1L, Seq("a", "c"), Seq(10.0, 0.5)),
      (2L, Seq("z"), Seq(7.0))
    ).toDF("g", "ks", "vs")
    val out = ChAnalytics.minMaxMap(df, col("g"), col("ks"), col("vs"))
      .orderBy("grp").collect()
    assert(out(0).getLong(0) == 1L)
    assert(out(0).getSeq[String](1) == Seq("a", "b", "c"))
    assert(out(0).getSeq[Double](2) == Seq(2.0, 1.0, 0.5))  // mins
    assert(out(0).getSeq[Double](3) == Seq(10.0, 1.0, 0.5)) // maxs
    assert(out(1).getSeq[Double](2) == Seq(7.0))
  }

  test("argMinMax: extremes with the deterministic (v, tie, arg) rule") {
    val df = Seq(
      // g=1: min v=1.0 is tied (tie 10 vs 20) -> arg of tie 10 wins min;
      //       max v=9.0 tied -> arg of the LARGER tie wins max
      (1L, 1.0, 10L, 100L), (1L, 1.0, 20L, 200L),
      (1L, 9.0, 30L, 300L), (1L, 9.0, 40L, 400L),
      (2L, 5.0, 1L, 11L)
    ).toDF("g", "v", "t", "a")
    val out = ChAnalytics.argMinMax(df, col("g"), col("v"), col("t"), col("a"))
      .orderBy("grp").collect()
    assert(out(0).getDouble(1) == 1.0 && out(0).getLong(2) == 100L)
    assert(out(0).getDouble(3) == 9.0 && out(0).getLong(4) == 400L)
    // single-row group: both extremes are that row
    assert(out(1).getLong(2) == 11L && out(1).getLong(4) == 11L)
  }

  test("deltaSum: positive deltas only, resets ignored, first row free") {
    val df = Seq(
      // series 1: 10 -> 12 -> 3 (reset) -> 8: deltas +2, -9, +5 => 7
      (1L, 100L, BigDecimal(10)), (1L, 200L, BigDecimal(12)),
      (1L, 300L, BigDecimal(3)), (1L, 400L, BigDecimal(8)),
      // series 2: single row => 0 (not NULL)
      (2L, 100L, BigDecimal(42)),
      // series 3: strictly decreasing => 0
      (3L, 100L, BigDecimal(9)), (3L, 200L, BigDecimal(1))
    ).toDF("s", "ts", "v")
    val out = ChAnalytics.deltaSum(df, col("s"),
      Seq(col("ts")), col("v")).orderBy("series").collect()
      .map(r => (r.getLong(0), r.getDecimal(1).doubleValue())).toSeq
    assert(out == Seq((1L, 7.0), (2L, 0.0), (3L, 0.0)))
  }

  test("sparkbar: ceil(8n/max) glyphs, empty buckets are spaces") {
    // counts per bucket: b0=1, b1=8, b2 missing, b3=4 (max 8)
    val rows = Seq.fill(1)(("g", 0L)) ++ Seq.fill(8)(("g", 1L)) ++
      Seq.fill(4)(("g", 3L))
    val out = ChAnalytics.sparkbar(rows.toDF("g", "b"), col("g"),
      col("b"), 4).collect()
    assert(out(0).getString(1) == "▁█ ▄") // ▁█ ▄
  }

  test("expDecayedAvg: exact power-of-2 weights, one final divide") {
    // (t=0,v=10) w=1, (t=1,v=20) w=2 -> (10+40)/3
    val df = Seq(("g", 0L, 10L), ("g", 1L, 20L)).toDF("g", "t", "v")
    val out = ChAnalytics.expDecayedAvg(df, col("g"), col("t"), col("v"))
      .collect()
    assert(out(0).getDouble(1) == 50.0 / 3.0)
  }

  test("withFillInterpolate: gaps interpolate linearly, known rows exact") {
    // series: (0,10), (3,40) -> hours 1,2 interpolate to 20, 30
    val df = Seq(("g", 0L, 10L), ("g", 3L, 40L)).toDF("g", "o", "v")
    val out = ChAnalytics.withFillInterpolate(df, col("g"), col("o"),
      col("v")).orderBy("o").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((0L, 10.0), (1L, 20.0), (2L, 30.0), (3L, 40.0)))
  }

  test("withFillLocf: staircase carry, leading edge NULL") {
    val df = Seq(("g", 1L, 10L), ("g", 4L, 40L)).toDF("g", "o", "v")
    val out = ChAnalytics.withFillLocf(df, col("g"), col("o"), col("v"))
      .orderBy("o").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 40L)))
  }

  test("withFill grid guard: a span past maxRowsPerSeries refuses LOUDLY") {
    // one series spanning 10^7 order units at step 1 would densify to
    // a 10M-element sequence() array — the envelope guard must refuse
    // before any grid is built, naming the knob
    val df = Seq(("g", 0L, 1L), ("g", 10000000L, 2L)).toDF("g", "o", "v")
    val e = intercept[IllegalStateException] {
      ChAnalytics.withFillInterpolate(df, col("g"), col("o"), col("v"))
    }
    assert(e.getMessage.contains("maxRowsPerSeries"))
    val e2 = intercept[IllegalStateException] {
      ChAnalytics.withFillLocf(df, col("g"), col("o"), col("v"))
    }
    assert(e2.getMessage.contains("maxRowsPerSeries"))
    // and a raised cap lets the same shape through
    assert(ChAnalytics.withFillLocf(df, col("g"), col("o"), col("v"),
      maxRowsPerSeries = 20000000L).count() == 10000001L)
  }

  test("withFillInterpolate: interior gap between two known islands") {
    val df = Seq(("g", 0L, 0L), ("g", 4L, 8L), ("g", 6L, 0L))
      .toDF("g", "o", "v")
    val out = ChAnalytics.withFillInterpolate(df, col("g"), col("o"),
      col("v")).orderBy("o").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // 0..4 slope 2, 4..6 slope -4
    assert(out == Seq((0L, 0.0), (1L, 2.0), (2L, 4.0), (3L, 6.0),
      (4L, 8.0), (5L, 4.0), (6L, 0.0)))
  }

  test("expDecayedAvg: span past the 64-bit weight envelope fails LOUDLY") {
    // Java shifts wrap mod 64 silently — the guard must fire instead
    val df = Seq(("g", 0L, 1L), ("g", 70L, 1L)).toDF("g", "t", "v")
    val e = intercept[Exception] {
      ChAnalytics.expDecayedAvg(df, col("g"), col("t"), col("v")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("weight envelope")))
  }

  test("sequenceNextNode: node after the FIRST adjacent chain; NULLs at edges") {
    val ev = Seq(
      // u1: view,click,purchase -> purchase
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      // u2: view,X,click (not adjacent) -> NULL
      (2L, 1L, "view"), (2L, 2L, "error"), (2L, 3L, "click"),
      // u3: chain at stream end -> NULL
      (3L, 1L, "view"), (3L, 2L, "click"),
      // u4: TWO chains — the FIRST anchors (next = 'error'), not the second
      (4L, 1L, "view"), (4L, 2L, "click"), (4L, 3L, "error"),
      (4L, 4L, "view"), (4L, 5L, "click"), (4L, 6L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = ChAnalytics.sequenceNextNode(ev, col("user_id"), col("ts"),
      col("ts"), Seq(col("event_type") === "view",
        col("event_type") === "click"), col("event_type"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) == Some("purchase"))
    assert(got(2L) == None)
    assert(got(3L) == None)
    assert(got(4L) == Some("error"))
  }

  test("nonNegativeDerivative: rate per unit t, resets clamp to 0, first NULL") {
    val df = Seq(
      (1L, 100L, 1L, 10L), (1L, 102L, 2L, 16L), // +6 over 2 -> 3.0
      (1L, 106L, 3L, 4L),                       // reset -> 0.0
      (1L, 108L, 4L, 5L)                        // +1 over 2 -> 0.5
    ).toDF("s", "t", "e", "v")
    val out = ChAnalytics.nonNegativeDerivative(df, col("s"),
      Seq(col("t"), col("e")), col("t"), col("v"))
      .orderBy("t").collect()
    assert(out(0).isNullAt(2))
    assert(out(1).getDouble(2) == 3.0)
    assert(out(2).getDouble(2) == 0.0)
    assert(out(3).getDouble(2) == 0.5)
  }

  test("boundingRatio: first-to-last slope; single-x group is NULL") {
    val df = Seq(
      (1L, 0L, 1L, 10.0), (1L, 5L, 2L, 20.0), (1L, 10L, 3L, 40.0),
      (2L, 7L, 1L, 5.0), (2L, 7L, 2L, 9.0) // same x twice -> NULL
    ).toDF("g", "x", "t", "y")
    val out = ChAnalytics.boundingRatio(df, col("g"), col("x"), col("t"),
      col("y")).orderBy("grp").collect()
    assert(out(0).getDouble(1) == 3.0) // (40-10)/(10-0)
    assert(out(1).isNullAt(1))
  }
}
