package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.KmvSketch
import graft.streaming.KmvStream

class KmvStreamSpec extends SparkFunSuite {

  import spark.implicits._

  test("batch-split invariance: stream state settles to the batch sketch") {
    val k = 16
    // hashes with duplicates, out of order — minima union is
    // order-independent, so ANY split must land on the same state
    val rnd = new scala.util.Random(7)
    val feed = Seq.fill(300)(KmvStream.In(1L, rnd.nextInt(1000).toLong))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KmvStream.In]
    val q = KmvStream.kmvWithState(spark, mem.toDF(), k)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    try {
      mem.addData(feed.take(11)); q.processAllAvailable()
      mem.addData(feed.slice(11, 170)); q.processAllAvailable()
      mem.addData(feed.drop(170)); q.processAllAvailable()
      val rows = spark.table("kmv_stream").collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
      // batch truth: k smallest distinct + the same integer estimator
      val mins = feed.map(_.h).distinct.sorted.take(k).toList
      val theta = if (mins.size < k) KmvSketch.Space else mins.last
      val est = KmvStream.estimate(mins, k)
      assert(rows.last == ((mins.size, theta, est)),
        s"final ${rows.last} != batch (${mins.size}, $theta, $est)")
      // and the non-full prefix batch was exact
      assert(rows.head._3 == feed.take(11).map(_.h).distinct.size ||
        rows.head._1 == k)
    } finally q.stop()
  }

  test("state is bounded at k minima regardless of stream length") {
    val k = 8
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KmvStream.In]
    val q = KmvStream.kmvWithState(spark, mem.toDF(), k)
      .writeStream.format("memory").queryName("kmv_bounded")
      .outputMode("update").start()
    try {
      // 5000 distinct hashes spread evenly over the 2^40 space (the
      // estimator's uniformity assumption, made literal)
      val step = KmvSketch.Space / 5000L
      mem.addData((0L until 5000L).map(i => KmvStream.In(9L, i * step)))
      q.processAllAvailable()
      val r = spark.table("kmv_bounded").orderBy(col("n_mins").desc)
        .head()
      assert(r.getInt(1) == k, "state capped at k")
      val est = r.getLong(3)
      assert(est > 4500 && est < 5500, s"est $est off 5000")
    } finally q.stop()
  }

  test("stream estimator is the batch estimator (same divides)") {
    val k = 4
    val mins = List(10L, 20L, 30L, 40L)
    val expected = (3L * KmvSketch.Space) / 40L
    assert(KmvStream.estimate(mins, k) == expected)
    assert(KmvStream.estimate(List(5L, 7L), k) == 2L)
  }
}
