package graft

import org.apache.spark.sql.functions._
import graft.operators.Series

/** B76/B77: classical decomposition recovers an exactly-additive
  * series (linear trend + zero-sum weekly seasonal → residual 0.0,
  * seasonal == planted offsets); calendar gaps leave the centered MA
  * NULL instead of sliding across; ACF period detection finds a
  * planted period and breaks the harmonic tie (lag 2p scores
  * identically on a pure periodic signal) toward the fundamental.
  */
class SeriesSpec extends SparkFunSuite {

  import spark.implicits._

  private val seasonal7 = Array(0L, 70L, -70L, 140L, -140L, 210L, -210L)

  test("decompose recovers a linear trend + zero-sum weekly seasonal " +
      "exactly: resid 0.0, seasonal == planted offsets") {
    val rows = (0L until 28L).map { t =>
      ("a", t, 1000L + 10L * t + seasonal7((t % 7).toInt))
    }
    val out = Series.decompose(rows.toDF("k", "day", "cents"),
        "k", "day", "cents", 7)
      .orderBy("day").collect()
    out.foreach { r =>
      val day = r.getLong(1)
      if (day >= 3 && day <= 24) { // full centered window
        assert(r.getDouble(3) == 1000.0 + 10.0 * day, s"trend at $day")
        assert(r.getDouble(4) == seasonal7((day % 7).toInt).toDouble,
          s"seasonal at $day")
        assert(r.getDouble(5) == 0.0, s"resid at $day")
      } else { // half-window head/tail: undefined, never extrapolated
        assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
      }
    }
  }

  test("a calendar gap leaves every window touching it incomplete " +
      "(RANGE frame, not ROWS)") {
    val rows = (0L until 21L).filterNot(_ == 10L).map { t =>
      ("a", t, 500L + seasonal7((t % 7).toInt))
    }
    val out = Series.decompose(rows.toDF("k", "day", "cents"),
        "k", "day", "cents", 7)
      .select("day", "trend").collect()
      .map(r => r.getLong(0) -> !r.isNullAt(1)).toMap
    // days 7..13 have the missing day 10 inside their ±3 range
    (7L to 13L).filterNot(_ == 10L).foreach(d =>
      assert(!out(d), s"day $d should straddle the gap"))
    assert(out(6L) && out(14L)) // first full windows on either side
  }

  test("periodDetect finds a planted period-5 signal and breaks the " +
      "2x-harmonic tie toward the fundamental") {
    val pattern = Array(100L, 300L, 50L, 800L, 200L) // mean 290, exact
    val rows = (0L until 25L).map(t => ("a", t, pattern((t % 5).toInt)))
    val out = Series.periodDetect(rows.toDF("k", "day", "cents"),
        "k", "day", "cents", 2, 10)
      .orderBy("lag").collect()
    val byLag = out.map(r => r.getLong(1) ->
      (r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(byLag(5L)._4, "lag 5 should be the peak")
    assert(!byLag(10L)._4, "the 2x harmonic ties but loses on lag asc")
    assert(byLag(5L)._3 == byLag(10L)._3,
      "pure periodic signal: lag 5 and lag 10 per-pair products equal")
    // per-pair product at the period = mean square of centered pattern
    val c = pattern.map(_ - 290L)
    val meanSq = c.map(x => x * x).sum.toDouble / 5.0
    assert(byLag(5L)._3 == meanSq)
    assert(byLag(5L)._2 == 20L, "25 days, lag 5 -> 20 overlapping pairs")
  }

  test("n_pairs below 2 is never crowned best") {
    val rows = Seq(("a", 0L, 10L), ("a", 9L, 30L))
    val out = Series.periodDetect(rows.toDF("k", "day", "cents"),
        "k", "day", "cents", 8, 10)
      .collect()
    assert(out.forall(!_.getBoolean(5)),
      "single-pair lags (9) and empty lags must not be is_best")
  }
}
