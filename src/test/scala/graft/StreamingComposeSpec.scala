package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.EventsStream

/** The streaming operators must STACK — an ingest pipeline is
  * dedup -> dimension enrich -> windowed rollup in ONE streaming query,
  * not three. Watermark state for dedup and rollup coexist; the static
  * join adds no stream state at all.
  */
class StreamingComposeSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(min: Int) =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("dedup -> static enrich -> hourly rollup as one streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", 2.0), ("view", 1.0))
      .toDF("event_type", "weight")
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val events = stream.toDF().toDF("event_id", "ts", "event_type", "value")

    val piped = EventsStream.hourlyRollup(
      EventsStream.enrich(
        EventsStream.dedupStream(events, Seq("event_id")),
        dim, "event_type"))

    val sq = piped.writeStream.format("memory").queryName("composed")
      .outputMode("complete").start()
    try {
      stream.addData(Seq(
        (1L, ts(0), "click", 10.0), (2L, ts(10), "view", 5.0),
        (1L, ts(0), "click", 10.0))) // exact duplicate of event 1
      sq.processAllAvailable()
      stream.addData(Seq(
        (2L, ts(10), "view", 5.0),   // cross-micro-batch duplicate
        (3L, ts(70), "click", 7.0))) // second hour window
      sq.processAllAvailable()

      val got = spark.table("composed")
        .select("hour_start_us", "event_type", "n_events", "sum_value")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val h0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000
      val h1 = Timestamp.valueOf("2024-01-01 01:00:00").getTime * 1000
      // duplicates dropped exactly once each; windows split on the hour
      assert(got == Set(
        (h0, "click", 1L, 10.0), (h0, "view", 1L, 5.0),
        (h1, "click", 1L, 7.0)), s"got $got")
    } finally sq.stop()
  }
}
