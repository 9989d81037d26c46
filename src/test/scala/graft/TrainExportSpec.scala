package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainExport

class TrainExportSpec extends SparkFunSuite {
  import spark.implicits._

  private def corpus() = (1L to 400L)
    .map(i => (i, s"doc number $i with some text", 4L + (i % 7)))
    .toDF("doc_id", "text", "n_tokens")

  test("write/verify roundtrip: manifest matches the written shards exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_export").toString
    try {
      val m = TrainExport.writeShards(corpus(), "doc_id", "n_tokens", dir, 8)
      assert(m.count() == 8)
      assert(m.agg(sum("n_rows")).as[Long].head() == 400L)
      // audit passes on intact data
      assert(TrainExport.verify(spark, dir, "doc_id", "n_tokens").count() == 0)
      // every shard dir holds exactly its manifest's rows
      val byShard = m.as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r._2).toMap
      byShard.foreach { case (s, n) =>
        assert(spark.read.parquet(s"$dir/shard=$s").count() == n)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("audit catches a lost shard and a corrupted row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_export2").toString
    try {
      TrainExport.writeShards(corpus(), "doc_id", "n_tokens", dir, 4)
      // corrupt: remove one shard directory wholesale
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(s"$dir/shard=2"))
      val bad = TrainExport.verify(spark, dir, "doc_id", "n_tokens")
      assert(bad.filter(col("shard") === 2L).count() > 0,
        "lost shard must surface in the audit diff")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("training order within a shard is the seeded hash order (rerun-stable)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_export3").toString
    try {
      TrainExport.writeShards(corpus(), "doc_id", "n_tokens", dir, 4)
      val got = spark.read.parquet(s"$dir/shard=1").select("doc_id")
        .as[Long].collect().toSeq
      // expected order: xxhash64(id, 42) ascending (signed, matching
      // Spark's sort of the LongType hash column)
      val expected = corpus()
        .withColumn("s", TrainExport.shardAssign(col("doc_id"), 4))
        .filter(col("s") === 1L)
        .withColumn("o", xxhash64(col("doc_id"), lit(42L)))
        .orderBy("o").select("doc_id").as[Long].collect().toSeq
      assert(got == expected)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
