package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TrainExport
import graft.streaming.ExportStream

/** Streaming export must deliver the same auditable corpus as the
  * batch writer: after any number of micro-batches, the stored
  * manifest equals the batch manifest of everything streamed so far,
  * and verify() finds no discrepancies.
  */
class ExportStreamSpec extends SparkFunSuite {
  import spark.implicits._

  test("micro-batch manifests merge to the batch manifest; audit stays clean") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (1L to 300L).map(i => (i, 3L + (i % 5))).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_export").toString

    val stream = MemoryStream[(Long, Long)]
    val in = stream.toDF().toDF("doc_id", "n_tokens")
    val sq = ExportStream.appendShards(in, "doc_id", "n_tokens", dir, nShards = 4)
    try {
      docs.grouped(100).foreach { chunk =>
        stream.addData(chunk)
        sq.processAllAvailable()
      }
    } finally sq.stop()

    // stored manifest == batch manifest of the full input
    val expected = TrainExport.manifest(
        docs.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", 4)
      .orderBy("shard").collect().toSeq
    val stored = TrainExport.readManifest(spark, dir)
      .orderBy("shard").collect().toSeq
    assert(stored == expected)

    // the written shards audit clean against the stored manifest
    assert(TrainExport.verify(spark, dir, "doc_id", "n_tokens").count() == 0)

    // and the data itself is complete
    assert(spark.read.parquet(dir).count() == 300L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("a retried micro-batch replaces its delivery — no duplicates, audit clean") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_retry").toString
    val b0 = (1L to 80L).map(i => (i, i % 7)).toDF("doc_id", "n_tokens")
    val b1 = (81L to 150L).map(i => (i, i % 7)).toDF("doc_id", "n_tokens")
    ExportStream.deliverBatch(b0, 0L, "doc_id", "n_tokens", dir, nShards = 4)
    ExportStream.deliverBatch(b1, 1L, "doc_id", "n_tokens", dir, nShards = 4)
    // simulate a foreachBatch retry: batch 1 re-runs with the SAME id
    ExportStream.deliverBatch(b1, 1L, "doc_id", "n_tokens", dir, nShards = 4)

    assert(spark.read.parquet(dir).count() == 150L)
    val expected = TrainExport.manifest(
        b0.unionByName(b1), "doc_id", "n_tokens", 4)
      .orderBy("shard").collect().toSeq
    val stored = TrainExport.readManifest(spark, dir)
      .orderBy("shard").collect().toSeq
    assert(stored == expected)
    assert(TrainExport.verify(spark, dir, "doc_id", "n_tokens").count() == 0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("manifest merge law: any grouping of disjoint parts composes") {
    val parts = Seq((1L to 100L), (101L to 180L), (181L to 260L)).map { r =>
      TrainExport.manifest(
        r.map(i => (i, i % 7)).toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", 4)
    }
    val direct = TrainExport.manifest(
        (1L to 260L).map(i => (i, i % 7)).toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", 4)
      .orderBy("shard").collect().toSeq
    // merge all three at once
    val allAtOnce = TrainExport.mergeManifests(
        parts.reduce(_ unionByName _))
      .orderBy("shard").collect().toSeq
    // merge left-fold pairwise
    val pairwise = parts.reduce((a, b) =>
        TrainExport.mergeManifests(a.unionByName(b)))
      .orderBy("shard").collect().toSeq
    assert(allAtOnce == direct)
    assert(pairwise == direct)
  }
}
