package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed, sorted table writes (SURVEY.md §5): pre-shuffling fact
  * tables into the same bucket layout makes every future equi-join on
  * the bucket key exchange-free — at 100 TB this converts the dominant
  * per-query shuffle into a one-time write cost.
  *
  * Spark's native (Hive-compatible) bucketing: `bucketBy(n, key)` +
  * `sortBy(key)` through `saveAsTable`; readers get bucket-aware scans
  * and Catalyst drops the Exchange when both sides share the layout.
  */
object BucketedWarehouse {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key — plan contains
    * no shuffle for the join (spec-asserted).
    */
  def cobucketedJoin(spark: SparkSession, left: String, right: String,
                     key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
