package graft

import org.apache.spark.sql.functions._
import graft.functions.UniqUpTo

class UniqUpToSpec extends SparkFunSuite {
  import spark.implicits._

  test("exact below the cap, sentinel above, duplicates free") {
    val df = (Seq.fill(50)(1L to 3L).flatten.map(("a", _)) ++ // 3 distinct
      (1L to 5L).map(("b", _)) ++                             // exactly n
      (1L to 9L).map(("c", _)))                               // > n
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(UniqUpTo.uniqUpTo(5)(col("v")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 5L, "c" -> 6L))
  }

  test("matches least(countDistinct, n+1) on a wide key range") {
    val df = (1L to 5000L).map(i => (i % 37, i % (1 + (i % 211))))
      .toDF("g", "v")
    val a = df.groupBy("g")
      .agg(UniqUpTo.uniqUpTo(20)(col("v")).as("u"))
    val b = df.groupBy("g")
      .agg(least(countDistinct(col("v")), lit(21L)).as("u"))
    assert(a.join(b.withColumnRenamed("u", "w"), "g")
      .where(col("u") =!= col("w")).count() == 0)
  }

  test("saturated buffers drop their value lists (the state bound)") {
    // merge of a saturated buffer with a fresh one must stay saturated
    val agg = new UniqUpTo.UniqUpToAgg(2)
    val a = agg.reduce(agg.reduce(agg.reduce(agg.zero, 1L), 2L), 3L)
    assert(a.saturated && a.seen.isEmpty) // list released at saturation
    val merged = agg.merge(a, agg.reduce(agg.zero, 9L))
    assert(agg.finish(merged) == 3L)
    // fresh + fresh crossing the cap during merge also saturates
    val m2 = agg.merge(agg.reduce(agg.reduce(agg.zero, 1L), 2L),
      agg.reduce(agg.zero, 3L))
    assert(agg.finish(m2) == 3L)
  }
}
