package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.HoltStream

class HoltStreamSpec extends SparkFunSuite {

  import spark.implicits._

  /** The batch fold (HoltTextMatchSpec's replica, via the shared
    * step): l₁=y₁, b₁=y₂−y₁, fold t=2..n consuming y₂..y_n.
    */
  private def batchFold(ys: Seq[Long]): (Long, Long) = {
    var l = ys.head
    var b = ys(1) - ys.head
    var first = true
    for (y <- ys.drop(1)) {
      if (first) { // fold y₂ against the (l₁, b₁) init
        val (lp, bp) = HoltStream.step(l, b, y)
        l = lp; b = bp; first = false
      } else {
        val (lp, bp) = HoltStream.step(l, b, y)
        l = lp; b = bp
      }
    }
    (l, b)
  }

  test("stream settles to the batch fold under uneven batch splits") {
    val ys = Seq(1000L, 1150L, 900L, 1300L, 1280L, 1410L, 990L, 1505L)
    val feed = ys.zipWithIndex.map { case (y, i) =>
      HoltStream.In(5L, i.toLong, y)
    }
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[HoltStream.In]
    val q = HoltStream.holtWithState(spark, mem.toDF())
      .writeStream.format("memory").queryName("holt_stream")
      .outputMode("update").start()
    try {
      mem.addData(feed.take(1)); q.processAllAvailable() // pre-init
      mem.addData(feed.slice(1, 5)); q.processAllAvailable()
      mem.addData(feed.drop(5)); q.processAllAvailable()
      val rows = spark.table("holt_stream").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val (l, b) = batchFold(ys)
      assert(rows.last == ((ys.size.toLong, l, b, l + 7 * b)),
        s"${rows.last} != batch ($l, $b)")
      // the intermediate emission after 5 days matches that prefix
      val (l5, b5) = batchFold(ys.take(5))
      assert(rows.contains((5L, l5, b5, l5 + 7 * b5)))
    } finally q.stop()
  }

  test("out-of-order day refuses loudly instead of corrupting state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[HoltStream.In]
    val q = HoltStream.holtWithState(spark, mem.toDF())
      .writeStream.format("memory").queryName("holt_ooo")
      .outputMode("update").start()
    try {
      mem.addData(Seq(HoltStream.In(1L, 10L, 100L),
        HoltStream.In(1L, 11L, 120L)))
      q.processAllAvailable()
      mem.addData(Seq(HoltStream.In(1L, 9L, 80L))) // behind the state
      val ex = intercept[Exception](q.processAllAvailable())
      assert(ex.getMessage != null)
    } finally q.stop()
  }

  test("stream recurrence equals the gate's on the sf0.001 fixture") {
    // same per-type daily cents series as q_holt_linear, fed in order
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
      .collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(r => (r.getLong(1), r.getLong(2))).toSeq)
      .toMap
    val gate = AnalyticsQueries.queries("q_holt_linear")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("level_c"),
        r.getAs[Long]("trend_c"))).toMap
    for ((tpe, series) <- daily if series.size >= 2) {
      val (l, b) = batchFold(series.map(_._2))
      assert(gate(tpe) == ((l, b)), s"$tpe: shared step drifted off gate")
    }
  }
}
