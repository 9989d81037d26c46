package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.EventsStream

class StreamingSpec extends SparkFunSuite {
  import spark.implicits._

  test("streaming hourly rollup equals the batch-equivalent query") {
    implicit val sqlCtx = spark.sqlContext
    val batchDf = Tables.events(spark, sf)
      .select(timestamp_micros($"ts_us").as("ts"), $"event_type", $"value")
      .limit(2000)
    val rows = batchDf.as[(Timestamp, String, Double)].collect().toSeq

    val stream = MemoryStream[(Timestamp, String, Double)]
    val sq = EventsStream.hourlyRollup(
        stream.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      // two micro-batches to exercise incremental state
      stream.addData(rows.take(1000))
      sq.processAllAvailable()
      stream.addData(rows.drop(1000))
      sq.processAllAvailable()

      val got = spark.table("hourly")
        .orderBy("hour_start_us", "event_type").collect().toSeq
      val want = EventsStream.hourlyRollup(batchDf)
        .orderBy("hour_start_us", "event_type").collect().toSeq
      assert(got == want)
    } finally sq.stop()
  }

  test("watermark drops state for closed windows (append mode emits)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val sq = EventsStream.hourlyRollup(
        stream.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hourly_append")
      .outputMode("append").start()
    try {
      def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
      stream.addData(Seq((ts(0), "click", 1.0), (ts(0), "click", 2.0)))
      sq.processAllAvailable()
      // advance event time far past the watermark -> hour-0 window closes
      stream.addData(Seq((ts(9), "click", 5.0)))
      sq.processAllAvailable()
      stream.addData(Seq((ts(10), "view", 1.0)))
      sq.processAllAvailable()
      val emitted = spark.table("hourly_append").collect()
      assert(emitted.exists(r => r.getLong(2) == 2L &&
        r.getString(1) == "click"), "closed hour-0 window was emitted")
    } finally sq.stop()
  }
}
