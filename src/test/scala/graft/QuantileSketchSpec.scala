package graft

import org.apache.spark.sql.functions._
import graft.functions.QuantileSketch

/** QuantileSketch beyond the gate (the gate bit-compares the merged-
  * partials estimate against DuckDB's direct build): the reaggregation
  * law under arbitrary partial splits, the bounded-state guarantee,
  * and grid-resolution accuracy against the exact quantile.
  */
class QuantileSketchSpec extends SparkFunSuite {
  import spark.implicits._

  private val qs = QuantileSketch.gateQs

  test("merge-of-partials == direct, bit-exactly, for any split") {
    val ev = Tables.events(spark, sf)
    val direct = QuantileSketch
      .estimate(ev, Seq("event_type"), col("value"), qs)
      .orderBy("event_type", "q_label").collect().toSeq
    // split into 7 arbitrary partials by a hash, build states per
    // partial, union, merge at estimate time
    val split = ev.withColumn("_part", pmod(xxhash64(col("event_id")), lit(7)))
    val partials = QuantileSketch.state(split,
      Seq("event_type", "_part"), col("value"))
    val merged = QuantileSketch
      .estimateFromState(partials, Seq("event_type"), qs)
      .orderBy("event_type", "q_label").collect().toSeq
    assert(merged == direct)
  }

  test("estimate stays invariant under repartitioning") {
    val ev = Tables.events(spark, sf)
    val a = QuantileSketch.estimate(ev, Seq("event_type"), col("value"), qs)
      .orderBy("event_type", "q_label").collect().toSeq
    val b = QuantileSketch.estimate(ev.repartition(13),
        Seq("event_type"), col("value"), qs)
      .orderBy("event_type", "q_label").collect().toSeq
    assert(a == b)
  }

  test("state is bounded at B rows per group regardless of input size") {
    val ev = Tables.events(spark, sf)
    val perGroup = QuantileSketch.state(ev, Seq("event_type"), col("value"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(perGroup.nonEmpty && perGroup.forall(_ <= QuantileSketch.B))
  }

  test("grid accuracy: within one bucket width of the rank statistic") {
    // the estimate lands in the bucket holding the order statistic at
    // rank floor(q*(n-1))+1 — so it is within Width of THAT element
    // (quantile_cont's interpolated value can sit farther away when
    // the two straddling elements span a sparse region)
    val ev = Tables.events(spark, sf)
    val est = QuantileSketch
      .estimate(ev, Seq("event_type"), col("value"), qs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val byType = ev.select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    for ((t, vs) <- byType; (lbl, q) <- qs) {
      val k = math.floor(q * (vs.length - 1)).toInt + 1 // 1-based rank
      val x = vs(math.min(k, vs.length) - 1)
      val e = est((t, lbl))
      assert(math.abs(e - x) <= QuantileSketch.Width,
        s"$t/$lbl est $e vs rank-$k statistic $x")
    }
  }

  test("under/overflow clamp to the edge buckets") {
    val df = Seq(("g", -5.0), ("g", -1.0), ("g", 1e9), ("g", 3.0))
      .toDF("g", "v")
    val st = QuantileSketch.state(df, Seq("g"), col("v"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(st(0L) == 2L)                          // both negatives
    assert(st((QuantileSketch.B - 1).toLong) == 1L) // the 1e9 overflow
    assert(st(1L) == 1L)                          // 3.0 -> bucket 1
  }
}
