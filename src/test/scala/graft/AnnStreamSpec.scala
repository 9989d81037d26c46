package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.operators.IvfIndex
import graft.streaming.AnnStream

/** Streaming IVF serving must return exactly what the batch IVF query
  * returns for the same probes, model, and corpus — the stream adds
  * ingestion mechanics (windows, watermark, state), not semantics.
  */
class AnnStreamSpec extends SparkFunSuite {
  import spark.implicits._

  test("streamed probes settle to the batch IvfIndex.topK answers") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.embeddings(spark, sf)
    val probes = corpus.filter(col("vec_id") % 50 === 0)
    val model = IvfIndex.train(corpus, nList = 8)

    val expected = IvfIndex.topK(corpus, probes, model, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet

    val probeRows = probes.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val t0 = Timestamp.valueOf("2024-01-01 00:10:00")
    val flush = Timestamp.valueOf("2024-01-02 00:00:00")

    val stream = MemoryStream[(Long, Timestamp, Array[Float])]
    val in = stream.toDF().toDF("vec_id", "ts", "embedding")
    val sq = AnnStream.ivfTopK(in, corpus, model, k = 5, nProbe = 3)
      .writeStream.format("memory").queryName("ann_stream")
      .outputMode("append").start()
    try {
      stream.addData(probeRows.map { case (id, v) => (id, t0, v) })
      sq.processAllAvailable()
      stream.addData(Seq((-1L, flush, probeRows.head._2))) // advance watermark
      sq.processAllAvailable()

      val got = spark.table("ann_stream")
        .filter(col("probe_id") >= 0)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
      assert(got == expected,
        s"stream=${got.size} batch=${expected.size} diff=${(got diff expected).take(3)}")
    } finally sq.stop()
  }

  test("ivfServeRetrain follows a growing corpus; retrain refreshes the model") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ann_retrain").toString
    val all = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val v1 = all.filter(col("vec_id") < 300)
    v1.write.mode("overwrite").parquet(dir)

    val probes = all.filter(col("vec_id") % 50 === 0).filter(col("vec_id") < 300)
    val probeRows = probes.as[(Long, Array[Float])].collect().toSeq

    val answers = scala.collection.mutable.Map[Long, Set[(Long, Long, Long)]]()
    val stream = MemoryStream[(Long, Array[Float])]
    val sq = AnnStream.ivfServeRetrain(
      stream.toDF().toDF("vec_id", "embedding"), dir,
      (out, id) => answers(id) =
        out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet,
      k = 5, nProbe = 3, nList = 8, retrainEvery = 1)
    try {
      // batch 0: model trained on v1, answers == batch topK over v1
      stream.addData(probeRows)
      sq.processAllAvailable()
      val m1 = IvfIndex.train(v1, nList = 8)
      val exp1 = IvfIndex.topK(v1, probes, m1, k = 5, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(answers(0L) == exp1)

      // corpus grows; retrainEvery=1 -> batch 1 re-trains on v2 and
      // the new vectors are candidates
      all.write.mode("overwrite").parquet(dir)
      stream.addData(probeRows)
      sq.processAllAvailable()
      val m2 = IvfIndex.train(all, nList = 8)
      val exp2 = IvfIndex.topK(all, probes, m2, k = 5, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(answers(1L) == exp2)
      assert(exp1 != exp2, "growing the corpus should change some answer")
    } finally sq.stop()
  }

  test("a stale model still serves vectors inserted after training") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ann_stale").toString
    val all = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val v1 = all.filter(col("vec_id") < 300)
    v1.write.mode("overwrite").parquet(dir)

    val probes = all.filter(col("vec_id") % 50 === 0).filter(col("vec_id") < 300)
    val probeRows = probes.as[(Long, Array[Float])].collect().toSeq

    val answers = scala.collection.mutable.Map[Long, Set[(Long, Long, Long)]]()
    val stream = MemoryStream[(Long, Array[Float])]
    // retrainEvery huge -> model stays the batch-0 one forever
    val sq = AnnStream.ivfServeRetrain(
      stream.toDF().toDF("vec_id", "embedding"), dir,
      (out, id) => answers(id) =
        out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet,
      k = 5, nProbe = 3, nList = 8, retrainEvery = 1000)
    try {
      stream.addData(probeRows)
      sq.processAllAvailable()
      all.write.mode("overwrite").parquet(dir)
      stream.addData(probeRows)
      sq.processAllAvailable()
      // batch 1: OLD model, NEW corpus — the IVF insert path: new
      // vectors are assigned cells by the stale quantizer and served
      val m1 = IvfIndex.train(v1, nList = 8)
      val exp = IvfIndex.topK(all, probes, m1, k = 5, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(answers(1L) == exp)
    } finally sq.stop()
  }
}
