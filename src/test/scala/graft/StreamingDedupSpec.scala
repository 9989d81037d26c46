package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import graft.streaming.EventsStream

class StreamingDedupSpec extends SparkFunSuite {
  import spark.implicits._

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
