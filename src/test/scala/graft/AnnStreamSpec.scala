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
}
