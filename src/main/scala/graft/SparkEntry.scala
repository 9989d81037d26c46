package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query registry is assembled from the per-group objects (SURVEY.md §2):
  * EtlQueries (A), OlapQueries (B), TextQueries/DedupQueries (C-text),
  * VectorQueries/MultimodalQueries (C-vector).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EtlQueries.queries("replacing_merge")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EtlQueries.queries ++ OlapQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ VectorQueries.queries ++
      MultimodalQueries.queries ++ AnalyticsQueries.queries ++
      RelationalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EtlQueries.oracles ++ OlapQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ VectorQueries.oracles ++
      MultimodalQueries.oracles ++ AnalyticsQueries.oracles ++
      RelationalQueries.oracles
}
