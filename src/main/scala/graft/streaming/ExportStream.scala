package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TrainExport

/** Streaming training-corpus export: append each micro-batch into the
  * sharded layout and keep `dir/_manifest` current by MERGING the
  * batch's manifest into the stored one (counts add, checksums XOR —
  * [[TrainExport.mergeManifests]]'s composition law). A consumer can
  * audit the growing corpus at ANY point with [[TrainExport.verify]]:
  * the stored manifest always equals the manifest of everything
  * delivered so far.
  *
  * foreachBatch is the right seam (same reasoning as AnnStream's
  * re-train loop): the shard write is an idempotent-append side effect
  * and the manifest roll-up needs batch boundaries. The merged
  * manifest is #shards rows — collecting it on the driver is bounded
  * and justified (the IvfIndex.train precedent), and avoids
  * read-overwrite races on the manifest path.
  */
object ExportStream {

  def appendShards(stream: DataFrame, idCol: String, tokenCol: String,
                   dir: String, nShards: Int, seed: Long = 42L,
                   queryName: String = "graft_export"): StreamingQuery = {
    stream.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          batch
            .withColumn("shard",
              TrainExport.shardAssign(col(idCol), nShards, seed))
            .withColumn("_ord", xxhash64(col(idCol), lit(seed)))
            .repartition(nShards, col("shard"))
            .sortWithinPartitions("shard", "_ord")
            .drop("_ord")
            .write.mode("append").partitionBy("shard").parquet(dir)
          val batchManifest =
            TrainExport.manifest(batch, idCol, tokenCol, nShards, seed)
          val manifestPath = s"$dir/_manifest"
          val stored =
            try Some(spark.read.parquet(manifestPath))
            catch { case _: org.apache.spark.sql.AnalysisException => None }
          val merged = stored match {
            case Some(m) =>
              TrainExport.mergeManifests(m.unionByName(batchManifest))
            case None => batchManifest
          }
          // bounded driver materialization (#shards rows) — decouples
          // the rewrite from the lazy read of the same path
          val rows = merged.collect().toSeq
          val schema = merged.schema
          spark.createDataFrame(
              spark.sparkContext.parallelize(rows, 1), schema)
            .write.mode("overwrite").parquet(manifestPath)
        }
      }
      .start()
  }
}
