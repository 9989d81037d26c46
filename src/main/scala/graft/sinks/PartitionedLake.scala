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
}
