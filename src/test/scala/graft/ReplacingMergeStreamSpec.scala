package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.ReplacingMergeStream

class ReplacingMergeStreamSpec extends SparkFunSuite {
  import spark.implicits._

  test("streaming latestByKey keeps the max-version row per key") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String)]
    val sq = ReplacingMergeStream.latestByKey(
        stream.toDF().toDF("key", "version", "payload"), "key", "version")
      .writeStream.format("memory").queryName("rmt_builtin")
      .outputMode("complete").start()
    try {
      stream.addData(Seq((1L, 1L, "a1"), (2L, 5L, "b5"), (1L, 3L, "a3")))
      sq.processAllAvailable()
      // late, stale update for key 2; fresh update for key 1
      stream.addData(Seq((2L, 2L, "b2-late"), (1L, 7L, "a7")))
      sq.processAllAvailable()
      val got = spark.table("rmt_builtin").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got == Map(1L -> (7L, "a7"), 2L -> (5L, "b5")), s"got $got")
    } finally sq.stop()
  }

  test("change-log variant emits only on winner change") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String)]
    val sq = ReplacingMergeStream.latestByKeyWithState(spark,
        stream.toDF().toDF("key", "version", "payload"))
      .writeStream.format("memory").queryName("rmt_state")
      .outputMode("update").start()
    try {
      stream.addData(Seq((1L, 1L, "a1"), (2L, 5L, "b5")))
      sq.processAllAvailable()
      stream.addData(Seq((2L, 2L, "b2-late"), (1L, 7L, "a7")))
      sq.processAllAvailable()
      // batch 1 emits both keys; batch 2 emits ONLY key 1 (key 2's late
      // row lost) — 3 change-log rows total, not 4
      val rows = spark.table("rmt_state").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(rows.length == 3, s"got ${rows.mkString(",")}")
      assert(rows.count(_._1 == 2L) == 1)
      assert(rows.contains((1L, 7L, "a7")))
    } finally sq.stop()
  }

  test("streaming result settles to the batch ReplacingMerge result") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq((1L, 3L, "x3"), (1L, 9L, "x9"), (2L, 4L, "y4"),
      (3L, 1L, "z1"), (2L, 8L, "y8"))
    val stream = MemoryStream[(Long, Long, String)]
    val sq = ReplacingMergeStream.latestByKey(
        stream.toDF().toDF("key", "version", "payload"), "key", "version")
      .writeStream.format("memory").queryName("rmt_settle")
      .outputMode("complete").start()
    try {
      data.grouped(2).foreach { b => stream.addData(b); sq.processAllAvailable() }
      val streamed = spark.table("rmt_settle").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val batch = graft.operators.ReplacingMerge.latestByKey(
          data.toDF("key", "version", "payload"), Seq("key"),
          Seq(org.apache.spark.sql.functions.col("version")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally sq.stop()
  }
}
