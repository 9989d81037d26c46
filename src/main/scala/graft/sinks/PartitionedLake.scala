package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet layout — the Spark analog of
  * ClickHouse's `PARTITION BY` clause (the reference's tables carry a
  * partition-key idiom like toYYYYMM; reference main.py:65 creates the
  * MergeTree those queries run against).
  *
  * The contract that matters at 100 TB: a query filtering on the
  * partition column must plan PartitionFilters (directory pruning, no
  * file even opened), not PushedFilters (row-group skipping after the
  * file is listed). The spec asserts exactly that on the physical plan.
  */
object PartitionedLake {

  /** Write `df` partitioned by `cols` (low-cardinality keys only —
    * each distinct tuple is a directory). `maxRecordsPerFile` bounds
    * file size exactly like the reference's chunk_size bounds insert
    * batches (main.py:106-116).
    */
  def write(df: DataFrame, path: String, cols: Seq[String],
            maxRecordsPerFile: Long = 1000000L): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(cols: _*)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Month-partitioned event layout: the CH `PARTITION BY toYYYYMM`
    * idiom. Adds the derived partition column, writes, returns reader.
    */
  def writeEventsByMonth(events: DataFrame, path: String): Unit =
    write(
      events.withColumn("yyyymm",
        date_format(timestamp_micros(col("ts_us")), "yyyyMM").cast("int")),
      path, Seq("yyyymm"))

  /** `OPTIMIZE TABLE … PARTITION p` analog (reference main.py:178
    * forces the whole-table merge; ClickHouse scopes it per partition):
    * ReplacingMerge-dedup ONE partition and compact its files, leaving
    * every other partition's bytes untouched.
    *
    * At 100 TB this is the only affordable shape — compaction work is
    * proportional to the partition, not the lake. The rewrite stages to
    * a sibling temp directory and swaps via rename, so the job never
    * reads and overwrites the same files (Spark refuses that plan, for
    * good reason).
    */
  def optimizePartition(spark: SparkSession, path: String,
                        partCol: String, partValue: Any,
                        keys: Seq[String], version: Seq[String],
                        maxRecordsPerFile: Long = 1000000L,
                        numPartitions: Option[Int] = None): Unit = {
    val partDir = s"$path/$partCol=$partValue"
    val merged = graft.operators.ReplacingMerge.optimize(
      spark.read.parquet(partDir), keys, version.map(col), numPartitions)
    val tmpDir = s"$path/.optimize_tmp_$partCol=$partValue"
    merged.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(tmpDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(partDir)
    fs.delete(dst, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmpDir), dst))
      throw new java.io.IOException(s"rename $tmpDir -> $dst failed")
  }
}
