package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import graft.streaming.EventsStream

class StreamJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("stream-stream join matches within the window, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Timestamp, Long)]
    val views = MemoryStream[(Timestamp, Long)]
    val joined = EventsStream.joinWithin(
      purchases.toDF().toDF("ts", "user_id"),
      views.toDF().toDF("ts", "user_id"),
      key = "user_id", within = "30 minutes")
    val sq = joined.selectExpr("user_id", "ts", "r_ts")
      .writeStream.format("memory").queryName("sj").outputMode("append")
      .start()
    try {
      // user 1: view at :00, purchase at :20  -> inside 30-min window
      // user 2: view at :00, purchase at :45  -> outside window
      // user 3: purchase with no view         -> no match (inner join)
      // user 4: view AFTER the purchase       -> excluded (right <= left)
      views.addData((ts(0), 1L), (ts(0), 2L), (ts(50), 4L))
      purchases.addData((ts(20), 1L), (ts(45), 2L), (ts(20), 3L), (ts(20), 4L))
      sq.processAllAvailable()
      val got = spark.table("sj").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      assert(got == Set((1L, ts(20), ts(0))))

      // a late-arriving view for user 2 at :40 (next micro-batch) joins
      // BOTH buffered purchases still in state: :45 (5 min gap) and the
      // new :55 (15 min gap) — exactly the cross-batch buffering the
      // join state exists for.
      views.addData((ts(40), 2L))
      purchases.addData((ts(55), 2L))
      sq.processAllAvailable()
      val got2 = spark.table("sj").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      assert(got2 == Set((1L, ts(20), ts(0)),
        (2L, ts(45), ts(40)), (2L, ts(55), ts(40))))
    } finally sq.stop()
  }
}
