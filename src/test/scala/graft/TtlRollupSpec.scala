package graft

import graft.operators.ReplacingMerge

/** A13: MergeTree TTL GROUP BY rollup — the horizon boundary is
  * inclusive on the expired side (day <= max − ttl rolls), sums are
  * exact, the rolled representative day is the group minimum, fresh
  * rows pass through untouched, and mis-projected input refuses.
  */
class TtlRollupSpec extends SparkFunSuite {

  import spark.implicits._

  private val df = Seq(
    ("a", 100L, 1L, 10L),
    ("a", 105L, 2L, 20L), // = cut when max=125, ttl=20 -> expired
    ("a", 106L, 4L, 40L), // cut+1 -> fresh
    ("a", 125L, 8L, 80L),
    ("b", 90L, 16L, 160L),
    ("b", 120L, 32L, 320L)
  ).toDF("k", "day", "n", "cents")

  test("boundary: day <= max - ttl rolls up; day = cut + 1 stays") {
    val out = ReplacingMerge.ttlRollup(df, "day", 20L, Seq("k"),
        Seq("n", "cents"))
      .orderBy("k", "day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("a", 100L, 3L, 30L, true),  // 100+105 rolled, rep day = min
      ("a", 106L, 4L, 40L, false),
      ("a", 125L, 8L, 80L, false),
      ("b", 90L, 16L, 160L, true), // single expired row still rolls
      ("b", 120L, 32L, 320L, false)))
  }

  test("no expired rows -> pure pass-through; no fresh rows -> one " +
      "aggregate per group") {
    val allFresh = ReplacingMerge.ttlRollup(df, "day", 1000L, Seq("k"),
      Seq("n", "cents"))
    assert(allFresh.filter("is_rolled").count() == 0)
    assert(allFresh.count() == 6)
    val allRolled = ReplacingMerge.ttlRollup(df, "day", 0L, Seq("k"),
      Seq("n", "cents"))
    // ttl 0: cut = max(day); only day > max is fresh, i.e. nothing
    assert(allRolled.filter("NOT is_rolled").count() == 0)
    assert(allRolled.count() == 2)
  }

  test("input not projected to keys+time+sums refuses loudly") {
    val extra = df.withColumn("junk",
      org.apache.spark.sql.functions.lit(1))
    val e = intercept[IllegalArgumentException] {
      ReplacingMerge.ttlRollup(extra, "day", 20L, Seq("k"), Seq("n", "cents"))
    }
    assert(e.getMessage.contains("keys+time+sums"))
  }
}
