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

  test("streaming state settles to the batch sketch (bounded rows)") {
    // the grid state is ONE update-mode streaming aggregation (the
    // same additive relation CmsStream uses): state never exceeds
    // #groups × B rows regardless of stream length, and the settled
    // relation estimates exactly like the batch build
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(String, Double)]
    val sq = QuantileSketch.state(
        stream.toDF().toDF("g", "v"), Seq("g"), col("v"))
      .writeStream.format("memory").queryName("qsk_state")
      .outputMode("complete").start()
    val batch1 = (0 until 400).map(i => ("a", (i % 97).toDouble))
    val batch2 = (0 until 300).map(i => ("a", (i % 53) + 100.0)) ++
      (0 until 100).map(i => ("b", i.toDouble))
    try {
      stream.addData(batch1); sq.processAllAvailable()
      stream.addData(batch2); sq.processAllAvailable()
      val settled = spark.table("qsk_state")
      assert(settled.count() <= 2L * QuantileSketch.B)
      val streamEst = QuantileSketch
        .estimateFromState(settled, Seq("g"), qs)
        .orderBy("g", "q_label").collect().toSeq
      val batchEst = QuantileSketch
        .estimate((batch1 ++ batch2).toDF("g", "v"), Seq("g"), col("v"), qs)
        .orderBy("g", "q_label").collect().toSeq
      assert(streamEst == batchEst)
    } finally sq.stop()
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
