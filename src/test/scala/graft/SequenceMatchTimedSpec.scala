package graft

import org.apache.spark.sql.functions._
import graft.operators.ChAnalytics

/** sequenceMatch with time constraints (round 15, CH `(?t<=n)`):
  * hand-built sequences pin the latest-completion greedy's exact
  * semantics — including the case where the EARLIEST stage-1 anchor
  * would fail and only a later one matches (the "backtracking" case a
  * naive first-match scan gets wrong).
  */
class SequenceMatchTimedSpec extends SparkFunSuite {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, String)],
                  gaps: Seq[Long]): Map[String, (Boolean, Option[Long])] = {
    val df = rows.toDF("u", "ts", "id", "et")
    ChAnalytics.sequenceMatchTimed(df, col("u"), col("ts"), col("id"),
      Seq(col("et") === "a", col("et") === "b", col("et") === "c"),
      gaps)
      .collect().map { r =>
        r.getString(0) -> (r.getBoolean(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))
      }.toMap
  }

  private def run2(rows: Seq[(String, Long, Long, String)],
                   gap: Long): Map[String, Boolean] = {
    val df = rows.toDF("u", "ts", "id", "et")
    ChAnalytics.sequenceMatchTimed(df, col("u"), col("ts"), col("id"),
      Seq(col("et") === "a", col("et") === "b"), Seq(gap))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
  }

  test("simple in-window chain matches; out-of-window does not") {
    val m = run(Seq(
      ("u1", 0L, 1L, "a"), ("u1", 50L, 2L, "b"), ("u1", 120L, 3L, "c"),
      ("u2", 0L, 1L, "a"), ("u2", 500L, 2L, "b"), ("u2", 600L, 3L, "c")),
      gaps = Seq(100L, 100L))
    assert(m("u1") == (true, Some(120L)))
    assert(m("u2") == (false, None)) // a->b gap 500 > 100
  }

  test("backtracking case: the earliest anchor fails, a later one " +
      "matches — the latest-completion state finds it") {
    // a@0 (too early for b@100 with gap 50), a@60 works
    val m = run2(Seq(
      ("u", 0L, 1L, "a"), ("u", 60L, 2L, "a"), ("u", 100L, 3L, "b")),
      gap = 50L)
    assert(m("u"))
  }

  test("stage completions must be strictly ordered (a row cannot " +
      "complete two stages at once)") {
    // b@10 arrives BEFORE any a: no match even within gaps
    val m = run2(Seq(("u", 10L, 1L, "b"), ("u", 20L, 2L, "a")), gap = 100L)
    assert(!m("u"))
    // same timestamp, tie-break id orders a before b -> match
    val m2 = run2(Seq(("u", 10L, 1L, "a"), ("u", 10L, 2L, "b")), gap = 100L)
    assert(m2("u"))
  }

  test("first_done is the EARLIEST final-stage completion") {
    val m = run(Seq(
      ("u", 0L, 1L, "a"), ("u", 10L, 2L, "b"), ("u", 20L, 3L, "c"),
      ("u", 30L, 4L, "c")), gaps = Seq(100L, 100L))
    assert(m("u") == (true, Some(20L)))
  }

  test("per-step gaps are independent: tight first gap, loose second") {
    val m = run(Seq(
      ("u", 0L, 1L, "a"), ("u", 5L, 2L, "b"), ("u", 900L, 3L, "c")),
      gaps = Seq(10L, 1000L))
    assert(m("u")._1)
    val m2 = run(Seq(
      ("u", 0L, 1L, "a"), ("u", 5L, 2L, "b"), ("u", 1200L, 3L, "c")),
      gaps = Seq(10L, 1000L))
    assert(!m2("u")._1)
  }

  test("plan shape: ONE exchange feeds the chained window passes") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts_us", "event_id", "event_type")
    val out = ChAnalytics.sequenceMatchTimed(ev, col("user_id"),
      col("ts_us"), col("event_id"),
      Seq(col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase"),
      Seq(3600000000L, 7200000000L))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    // entity-hash exchange for the windows + the groupBy reuses it;
    // AQE may add one for the final agg — never one per window pass
    assert(exchanges <= 2, s"window chain re-shuffled:\n$plan")
  }
}
