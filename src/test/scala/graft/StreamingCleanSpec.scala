package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import graft.streaming.PipelineStream

/** PipelineStream must equal the batch pipeline_clean on the same
  * documents: same scrub/score/filter/sample (shared column tree via
  * CleanPipeline), dedup by content hash with watermark-bounded state
  * instead of the keeper window. Batch-1 docs have unique texts, so
  * first-arrival and min-doc_id keepers coincide; batch 2 replays
  * duplicates that must all be absorbed by state from batch 1.
  */
class StreamingCleanSpec extends SparkFunSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming clean settles to the batch pipeline_clean result") {
    implicit val sqlCtx = spark.sqlContext

    val expected = TextQueries.queries("pipeline_clean")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    // all texts unique -> the dedup keeper rule can't differ between
    // engines; the duplicate-drop path is exercised by batch 2 below
    assert(docs.map(_._2).distinct.length == docs.length)

    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val stream = MemoryStream[(Long, Timestamp, String)]
    val in = stream.toDF().toDF("doc_id", "ts", "text")

    val sq = PipelineStream.clean(in).writeStream
      .format("memory").queryName("stream_clean")
      .outputMode("append").start()
    try {
      stream.addData(docs.map { case (id, tx) => (id, t0, tx) }.toSeq)
      sq.processAllAvailable()
      // replayed content: same texts under new ids, within the horizon —
      // every one is a known hash and must be dropped by dedup state
      stream.addData(docs.take(10).map { case (id, tx) =>
        (id + 1000000L, t0, tx) }.toSeq)
      sq.processAllAvailable()

      val got = spark.table("stream_clean")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"stream=${got.size} batch=${expected.size}")
    } finally sq.stop()
  }
}
