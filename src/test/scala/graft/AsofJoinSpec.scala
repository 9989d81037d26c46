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
}
