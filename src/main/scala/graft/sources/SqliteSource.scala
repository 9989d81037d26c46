package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQLite extract side of the migration (reference main.py:138-145,
  * 167), re-expressed as Spark's JDBC source so the read is partitioned
  * and predicate-pushdown-capable instead of a single cursor.
  *
  * This container has no SQLite JDBC driver on the classpath (zero
  * egress), so these paths are exercised against parquet in tests via
  * `CatalogDiscovery`; the JDBC wiring itself follows the stock
  * `spark.read.jdbc` contract and needs only `org.sqlite.JDBC` on the
  * executor classpath to run against a real file.
  */
object SqliteSource {
  def url(dbPath: String): String = s"jdbc:sqlite:$dbPath"

  /** All user tables — the sqlite_master scan (main.py:144). */
  def listTables(spark: SparkSession, dbPath: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url(dbPath))
      .option("query", "SELECT name FROM sqlite_master WHERE type='table'")
      .load()

  /** Declared-primary-key discovery statement (main.py:124): SQLite
    * reports pk membership in `PRAGMA table_info` column `pk` (1-based
    * position within the key, 0 = not part of it). Runnable through the
    * same JDBC `query` option as [[listTables]]; the caller orders by
    * `pk` and feeds the names to ClickHouseDdl.createTable — the
    * DECLARED tier of [[PrimaryKeyInference]].
    */
  def primaryKeyPragma(table: String): String =
    s"SELECT name, pk FROM pragma_table_info('$table') WHERE pk > 0 ORDER BY pk"

  /** One table, optionally split into `numPartitions` ranges of
    * `partitionColumn` so executors read in parallel — the distributed
    * analog of the reference's chunked cursor (main.py:106-116).
    */
  def readTable(spark: SparkSession, dbPath: String, table: String,
                partitionColumn: Option[String] = None,
                bounds: Option[(Long, Long)] = None,
                numPartitions: Int = 1): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url(dbPath))
      .option("dbtable", table)
    (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) =>
        base.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", numPartitions)
          .load()
      case _ => base.load()
    }
  }
}

/** Catalog discovery over a directory of parquet tables — the
  * sqlite_master analog for file-based sources (main.py:144), used by
  * MigrationJob and the test harness.
  */
object CatalogDiscovery {
  def listTables(spark: SparkSession, dir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .sorted
  }
}
