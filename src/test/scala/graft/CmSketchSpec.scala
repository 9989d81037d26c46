package graft

import org.apache.spark.sql.functions._
import graft.operators.CmSketch

class CmSketchSpec extends SparkFunSuite {

  import spark.implicits._

  test("estimates never undercount, and are exact sans collisions") {
    val df = (1L to 500L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k))
      .toDF("k")
    val sk = CmSketch.sketch(df, "k")
    val est = CmSketch.estimate(sk, df.select("k").distinct(), "k")
    val truth = df.groupBy("k").agg(count(lit(1)).as("t"))
    val joined = est.join(truth, "k").cache()
    assert(joined.where(col("est_cnt") < col("t")).count() == 0,
      "CMS undercounted")
    // d=4, w=512, 500 keys: P(collision-free in >=1 of 4 rows)
    // = 1 - (1 - (1-1/512)^499)^4 ≈ 0.85 → expect ~425 exact.
    // Degenerate hash rows (everything in few buckets) would sit
    // near 0 — the bound separates those regimes, not luck.
    val exact = joined.where(col("est_cnt") === col("t")).count()
    assert(exact >= 350, s"only $exact/500 exact — hash rows broken?")
    joined.unpersist()
  }

  test("streaming sketch settles to the batch sketch of all data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Long]
    val sq = graft.streaming.CmsStream
      .sketchStream(stream.toDF().toDF("k"), "k")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      stream.addData(1L to 200L)
      sq.processAllAvailable()
      stream.addData(50L to 300L)
      sq.processAllAvailable()
      val streamed = spark.table("cms_stream")
      val batch = CmSketch.sketch(
        ((1L to 200L) ++ (50L to 300L)).toDF("k"), "k")
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0)
    } finally sq.stop()
  }

  test("merge of partials equals the sketch of the union") {
    val df = (1L to 300L).toDF("k")
    val merged = CmSketch.merge(
      CmSketch.sketch(df.where(col("k") % 2 === 0), "k"),
      CmSketch.sketch(df.where(col("k") % 2 =!= 0), "k"))
    val direct = CmSketch.sketch(df, "k")
    assert(merged.exceptAll(direct).count() == 0 &&
      direct.exceptAll(merged).count() == 0)
  }
}
