package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.FunnelStream
import graft.operators.ChAnalytics

class FunnelStreamSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(min: Int) =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private val hourUs = 60L * 60 * 1000000

  // (user, minute, step): the funnel is view(0) -> click(1) -> purchase(2)
  private val fixture: Seq[(Long, Int, Int)] = Seq(
    (1L, 0, 0), (1L, 10, 1), (1L, 20, 2),   // full funnel  -> 3
    (2L, 0, 0), (2L, 5, 2),                 // skips click  -> 1
    (3L, 0, 1), (3L, 10, 2),                // no anchor    -> 0
    (4L, 0, 0), (4L, 90, 1),                // click late   -> 1
    (5L, 30, 0), (5L, 0, 1), (5L, 40, 1))   // pre-anchor click ignored -> 2

  test("greedyLevel matches the batch windowFunnel on the fixture") {
    val batch = fixture.toDF("user_id", "minute", "step")
      .withColumn("ts_us", col("minute").cast("long") * 60000000L)
    val want = ChAnalytics.windowFunnel(
        batch, col("user_id"), col("ts_us"), hourUs,
        Seq(col("step") === 0, col("step") === 1, col("step") === 2))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = fixture.groupBy(_._1).map { case (u, evs) =>
      u -> FunnelStream.greedyLevel(
        evs.map(e => (e._2.toLong * 60000000L, e._3)), 3, hourUs)
    }
    assert(got == want, s"streaming greedy=$got batch=$want")
    assert(want == Map(1L -> 3, 2L -> 1, 3L -> 0, 4L -> 1, 5L -> 2))
  }

  test("funnelWithState emits each user's level once the watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Int)]
    val sq = FunnelStream.funnelWithState(spark,
        stream.toDF().toDF("user_id", "ts", "step"), nSteps = 3,
        windowUs = hourUs)
      .writeStream.format("memory").queryName("funnel_state")
      .outputMode("append").start()
    try {
      // deliver out of order across micro-batches
      val (b1, b2) = fixture.partition(_._2 < 15)
      stream.addData(b1.map(e => (e._1, ts(e._2), e._3)))
      sq.processAllAvailable()
      stream.addData(b2.map(e => (e._1, ts(e._2), e._3)))
      sq.processAllAvailable()
      // push the watermark past every anchor+window (+lateness)
      stream.addData(Seq((99L, ts(600), 0)))
      sq.processAllAvailable()
      stream.addData(Seq((99L, ts(610), 1)))
      sq.processAllAvailable()

      val got = spark.table("funnel_state").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == Map(1L -> 3, 2L -> 1, 3L -> 0, 4L -> 1, 5L -> 2),
        s"got $got")
    } finally sq.stop()
  }

  test("stepsOf maps event types to steps and drops non-funnel events") {
    val df = Seq((1L, "view"), (1L, "scroll"), (1L, "purchase"))
      .toDF("user_id", "event_type")
    val got = FunnelStream.stepsOf(df, Seq("view", "click", "purchase"))
      .select("event_type", "step").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == Set(("view", 0), ("purchase", 2)))
  }
}
