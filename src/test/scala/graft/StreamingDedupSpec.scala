package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import graft.streaming.EventsStream

class StreamingDedupSpec extends SparkFunSuite {
  import spark.implicits._

  test("stream-static enrichment joins the dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val stream = MemoryStream[(Long, Double)]
    val sq = EventsStream.enrich(
        stream.toDF().toDF("user_id", "value"), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      stream.addData(Seq((1L, 10.0), (3L, 30.0)))
      sq.processAllAvailable()
      stream.addData(Seq((2L, 20.0)))
      sq.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
      assert(rows == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
    } finally sq.stop()
  }

  test("streaming dedup drops duplicate event ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val sq = EventsStream.dedupStream(
        stream.toDF().toDF("event_id", "ts", "value"), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      stream.addData(Seq((1L, ts(0), 1.0), (2L, ts(1), 2.0), (1L, ts(2), 1.0)))
      sq.processAllAvailable()
      // same ids again in a later micro-batch (within the watermark)
      stream.addData(Seq((1L, ts(3), 1.0), (3L, ts(4), 3.0), (2L, ts(5), 2.0)))
      sq.processAllAvailable()
      val ids = spark.table("dedup_stream")
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L), s"got $ids")
    } finally sq.stop()
  }
}
