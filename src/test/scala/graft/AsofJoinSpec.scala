package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private val quotes = Seq(
    (1L, 10L, 100.0), (1L, 20L, 101.0), (1L, 30L, 102.0),
    (2L, 15L, 50.0)
  ).toDF("k", "ts", "px")
  private val trades = Seq(
    (1L, 5L), (1L, 10L), (1L, 25L), (2L, 10L), (3L, 99L)
  ).toDF("k", "ts")

  test("<= semantics: equal timestamps match") {
    val got = AsofJoin.leftAsof(trades, quotes, "k", "ts", "ts")
      .select($"k", $"ts", $"asof.px".as("px"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got((1L, 5L)).isEmpty)          // nothing at or before 5
    assert(got((1L, 10L)).contains(100.0)) // equal ts matches
    assert(got((1L, 25L)).contains(101.0)) // latest <= 25 is ts=20
    assert(got((2L, 10L)).isEmpty)
    assert(got((3L, 99L)).isEmpty)         // key with no right rows
  }

  test("strict semantics: equal timestamps do NOT match") {
    val got = AsofJoin.leftAsof(trades, quotes, "k", "ts", "ts", strict = true)
      .select($"k", $"ts", $"asof.px".as("px"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got((1L, 10L)).isEmpty)         // equal ts excluded
    assert(got((1L, 25L)).contains(101.0))
  }

  test("nearest: closest side wins, equal distance prefers the earlier right") {
    val got = AsofJoin.leftAsofNearest(trades, quotes, "k", "ts", "ts")
      .select($"k", $"ts", $"asof.px".as("px"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got((1L, 5L)).contains(100.0))  // only forward exists (ts=10)
    assert(got((1L, 10L)).contains(100.0)) // zero-distance exact match
    assert(got((1L, 25L)).contains(101.0)) // |25-20|=5 = |30-25|: tie -> earlier
    assert(got((2L, 10L)).contains(50.0))  // forward to ts=15
    assert(got((3L, 99L)).isEmpty)         // key with no right rows
    assert(got.size == 5)                  // left join: every left row once
  }

  test("forward >= semantics: earliest right at-or-after") {
    val got = AsofJoin.leftAsof(trades, quotes, "k", "ts", "ts",
        forward = true)
      .select($"k", $"ts", $"asof.px".as("px"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got((1L, 5L)).contains(100.0))  // earliest >= 5 is ts=10
    assert(got((1L, 10L)).contains(100.0)) // equal ts matches
    assert(got((1L, 25L)).contains(102.0)) // earliest >= 25 is ts=30
    assert(got((2L, 10L)).contains(50.0))
    assert(got((3L, 99L)).isEmpty)
  }

  test("forward strict > semantics: equal timestamps do NOT match") {
    val got = AsofJoin.leftAsof(trades, quotes, "k", "ts", "ts",
        strict = true, forward = true)
      .select($"k", $"ts", $"asof.px".as("px"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got((1L, 10L)).contains(101.0)) // equal ts excluded -> ts=20
    assert(got((1L, 25L)).contains(102.0))
  }

  test("every left row survives (left join), one output row each") {
    val out = AsofJoin.leftAsof(trades, quotes, "k", "ts", "ts")
    assert(out.count() == trades.count())
  }

  private def collectAsof(df: org.apache.spark.sql.DataFrame) =
    df.select($"k", $"ts", $"asof.px".as("px"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

  test("bucketed variant agrees with leftAsof on all four semantics at a boundary-heavy width") {
    // width 8 puts quote ts=10/20/30 and trade ts=5/10/25 in distinct
    // buckets with matches crossing every boundary (5->none, 10->10,
    // 25->20), exercising the carry path on each combination
    for (strict <- Seq(false, true); forward <- Seq(false, true)) {
      val base = collectAsof(
        AsofJoin.leftAsof(trades, quotes, "k", "ts", "ts", strict, forward))
      val buck = collectAsof(AsofJoin.leftAsofBucketed(
        trades, quotes, "k", "ts", "ts", t => floor(t / 8), strict, forward))
      assert(buck == base, s"strict=$strict forward=$forward")
    }
  }

  test("bucketed variant agrees on a skewed corpus across bucket widths") {
    // one hot key carrying 85% of the rows — the shape that serializes
    // leftAsof's per-key window; right timestamps are made unique per
    // key so both plans' tie-breaks can't diverge
    var s = 0x9E3779B97F4A7C15L
    def next(m: Long): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33) % m
    }
    val left = (1 to 3000).map { _ =>
      val k = if (next(100) < 85) 0L else 1 + next(40)
      (k, next(100000))
    }
    val right = (1 to 1200).map { _ =>
      val k = if (next(100) < 85) 0L else 1 + next(40)
      (k, next(100000))
    }.distinct.groupBy(identity).keys.toSeq // unique (k, ts)
    val lDf = left.toDF("k", "ts")
    val rDf = right.map { case (k, t) => (k, t, k * 1e6 + t) }.toDF("k", "ts", "px")
    // no-match is None, NOT Double.NaN — NaN != NaN under Scala's
    // numeric ==, which would make every unmatched row "disagree"
    def collectMulti(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"ts", $"asof.px").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .groupBy(identity).view.mapValues(_.size).toMap
    for (width <- Seq(1L, 64L, 4096L, 1000000L);
         strict <- Seq(false, true); forward <- Seq(false, true)) {
      val base = collectMulti(
        AsofJoin.leftAsof(lDf, rDf, "k", "ts", "ts", strict, forward))
      val buck = collectMulti(AsofJoin.leftAsofBucketed(lDf, rDf, "k", "ts", "ts",
        t => floor(t / width), strict, forward))
      assert(buck == base, s"width=$width strict=$strict forward=$forward")
    }
  }

  test("tolerance nulls distant matches, keeps rows, both directions") {
    import spark.implicits._
    val l = Seq((1L, 100L), (1L, 200L), (1L, 1000L)).toDF("k", "ts")
    val r = Seq((1L, 90L), (1L, 950L)).toDF("k", "ts")
    def got(tol: Long, forward: Boolean): Seq[(Long, Option[Long])] =
      AsofJoin.leftAsofTolerance(l, r, "k", "ts", "ts", tol,
          strict = true, forward = forward)
        .select($"ts", $"asof.ts")
        .collect()
        .map(row => (row.getLong(0),
          if (row.isNullAt(1)) None else Some(row.getLong(1))))
        .sortBy(_._1).toSeq
    // backward, tol 50: 100<-90 (gap 10 ok), 200<-90 (gap 110 nulled),
    // 1000<-950 (gap 50 ok, boundary INCLUSIVE)
    assert(got(50L, forward = false) ==
      Seq((100L, Some(90L)), (200L, None), (1000L, Some(950L))))
    // forward, tol 100: 100->950 nulled (850), 200->950 nulled,
    // 1000 has no later row
    assert(got(100L, forward = true) ==
      Seq((100L, None), (200L, None), (1000L, None)))
    // forward, generous tol: matches reappear
    assert(got(1000L, forward = true) ==
      Seq((100L, Some(950L)), (200L, Some(950L)), (1000L, None)))
  }
}
