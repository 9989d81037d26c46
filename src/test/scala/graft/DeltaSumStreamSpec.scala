package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.DeltaSumStream
import graft.operators.ChAnalytics

class DeltaSumStreamSpec extends SparkFunSuite {
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, Long, Long, Long)]],
                  name: String): Map[Long, (Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long, Long)]
    val sq = DeltaSumStream.deltaSumWithState(spark,
        stream.toDF().toDF("series", "ts_us", "tie", "v"))
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => stream.addData(b); sq.processAllAvailable() }
      // update mode appends one row per touched series per batch —
      // the LAST row per series is its settled state
      spark.table(name).groupBy("series")
        .agg(last("delta_sum").as("d"), last("last_v").as("lv"),
          last("n_late").as("nl"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    } finally sq.stop()
  }

  test("running deltaSum across batches: resets ignored, first row free") {
    // series 1: 10 -> 12 | -> 3 (reset) -> 8  => 2 + 5 = 7
    val got = run(Seq(
      Seq((1L, 100L, 1L, 10L), (1L, 200L, 2L, 12L)),
      Seq((1L, 300L, 3L, 3L), (1L, 400L, 4L, 8L))), "ds_basic")
    assert(got(1L) == (7L, 8L, 0L))
  }

  test("batch split never changes the result on ordered input") {
    val pts = (1L to 12L).map(i => (5L, i * 100L, i, (i * 7) % 30))
    val oneBatch = run(Seq(pts), "ds_one")
    val fourBatches = run(pts.grouped(3).toSeq, "ds_four")
    assert(oneBatch == fourBatches)
    // and equals the batch operator on the same (ordered) rows
    val batch = ChAnalytics.deltaSum(
      pts.toDF("s", "ts", "tie", "v"), col("s"),
      Seq(col("ts"), col("tie")), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oneBatch(5L)._1 == batch(5L))
  }

  test("out-of-order rows are counted late, never folded") {
    val got = run(Seq(
      Seq((9L, 100L, 1L, 10L), (9L, 300L, 3L, 20L)),
      Seq((9L, 200L, 2L, 500L)) // late: would fabricate +480
    ), "ds_late")
    assert(got(9L) == (10L, 20L, 1L))
  }
}
