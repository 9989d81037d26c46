package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.{CatalogDiscovery, SchemaMapper}
import graft.functions.Coercions
import graft.sinks.ClickHouseDdl

/** Whole-catalog migration pipeline — the reference's main loop
  * (main.py:138-182) re-expressed as one declarative Spark job per
  * table:
  *
  *   discover tables -> map schema -> coerce columns -> chunked write
  *
  * Chunking (main.py:106-116, chunk_size=10000 default) maps to
  * `maxRecordsPerFile` on the write: output files are bounded-size
  * batches, produced in parallel by every executor, instead of a single
  * driver-side cursor loop. DDL for the target engine comes from
  * ClickHouseDdl; the data lands as parquet (or through any Spark
  * writer) already conforming to the mapped schema.
  */
object MigrationJob {

  final case class TableReport(table: String, rows: Long, ddl: String)

  /** Coerce every column of `df` to its mapped target type with
    * null-as-default semantics (main.py:81-104).
    */
  def conform(df: DataFrame): DataFrame = {
    val mapped = SchemaMapper.mapSchema(df.schema)
    df.select(Coercions.coerceRow(mapped): _*)
  }

  /** Migrate one table: conform + bounded-batch write (main.py:157-179).
    *
    * ORDER BY resolution (main.py:124): an explicit `primaryKey` wins
    * (the declared-pk path — PRAGMA via JDBC); otherwise, when
    * `inferPk`, [[graft.sources.PrimaryKeyInference]] derives a
    * data-confirmed key from the schema naming convention; otherwise
    * the DDL falls back to `tuple()` like the reference with a pk-less
    * table. Composite keys render as `(a, b)`.
    */
  def migrateTable(df: DataFrame, database: String, table: String,
                   outDir: String, chunkSize: Long = 10000L,
                   primaryKey: Option[String] = None,
                   inferPk: Boolean = true): TableReport = {
    val conformed = conform(df)
    conformed.write
      .mode("overwrite")
      .option("maxRecordsPerFile", chunkSize)
      .parquet(s"$outDir/$table")
    val orderBy = primaryKey.orElse {
      if (inferPk)
        graft.sources.PrimaryKeyInference.infer(df, table).map {
          case Seq(one) => one
          case many     => many.mkString("(", ", ", ")")
        }
      else None
    }
    val ddl = ClickHouseDdl.createTable(database, table, df.schema, orderBy)
    TableReport(table, conformed.count(), ddl)
  }

  /** Full catalog migration (main.py:157: for table in tables). Tables
    * are independent — at cluster scale each is its own job and they
    * can be submitted concurrently; rows stream through executors, the
    * driver only sees per-table counts.
    */
  def migrateAll(spark: SparkSession, srcDir: String, database: String,
                 outDir: String, chunkSize: Long = 10000L): Seq[TableReport] =
    CatalogDiscovery.listTables(spark, srcDir).map { t =>
      val df = spark.read.parquet(s"$srcDir/$t.parquet")
      migrateTable(df, database, t, outDir, chunkSize)
    }

  /** The reference's ACTUAL loop, end-to-end over a live JDBC source
    * (main.py:138-182): discover tables, read each partitioned on its
    * declared key, conform, chunk-write, emit pk-driven DDL. The
    * declared pk (DatabaseMetaData) takes precedence; tables without
    * one fall through to [[graft.sources.PrimaryKeyInference]]'s
    * heuristic inside migrateTable. Proven in-sandbox against embedded
    * Derby (JdbcMigrationSpec); identical calls serve SQLite once its
    * driver is on the classpath.
    */
  /** The reference's loop over a REAL SQLite FILE with no JDBC driver
    * at all (round 12): [[graft.sources.SqliteFile]] reads the
    * database bytes directly (main.py:140-145 without the sqlite3
    * module), the declared pk comes from the parsed CREATE TABLE (the
    * PRAGMA-table_info equivalent, main.py:124), each table reads
    * partitioned by b-tree subtree, and everything flows through the
    * same conform → chunked write → DDL path as every other source.
    */
  def migrateSqliteFile(spark: SparkSession, dbPath: String,
                        database: String, outDir: String,
                        chunkSize: Long = 10000L,
                        maxPartitions: Int = 32): Seq[TableReport] =
    graft.sources.SqliteFile.listTables(dbPath).map { t =>
      val df = graft.sources.SqliteFile.read(spark, dbPath, t, maxPartitions)
      val declared = t.primaryKey match {
        case Seq()    => None
        case Seq(one) => Some(one)
        case many     => Some(many.mkString("(", ", ", ")"))
      }
      migrateTable(df, database, t.name.toLowerCase, outDir, chunkSize,
        declared)
    }

  def migrateJdbc(spark: SparkSession, url: String, database: String,
                  outDir: String, chunkSize: Long = 10000L,
                  numPartitions: Int = 8): Seq[TableReport] = {
    import graft.sources.JdbcCatalog
    JdbcCatalog.listTables(url).map { t =>
      val pk = JdbcCatalog.primaryKey(url, t)
      val df = JdbcCatalog.readTable(spark, url, t,
        JdbcCatalog.partitionKey(spark, url, t), numPartitions)
      val declared = if (pk.isEmpty) None
        else Some(if (pk.size == 1) pk.head else pk.mkString("(", ", ", ")"))
      migrateTable(df, database, t.toLowerCase, outDir, chunkSize, declared)
    }
  }

  /** LIVE JDBC→JDBC migration (round 14 — the write half of the loop
    * with BOTH ends live, reference main.py:138-179): discover +
    * pk-partitioned read from the source catalog, conform each table
    * (null-as-default, wraparound, temporal parsing — exactly what the
    * staging path runs), then CHUNKED-batch write into the target over
    * JDBC (`batchsize` = the reference's chunk_size: every executor
    * flushes bounded INSERT batches in parallel — the distributed
    * fetchmany loop). Returns the same TableReports as the staging
    * path: the ClickHouse DDL carried in each report is what the
    * identical plan executes against a real cluster; an offline JDBC
    * engine stands in for ClickHouse exactly as in the dry-run story,
    * with Spark's target dialect supplying the local CREATE TABLE.
    */
  def migrateJdbcLive(spark: SparkSession, srcUrl: String, dstUrl: String,
                      dstProps: java.util.Properties, database: String,
                      chunkSize: Long = 10000L,
                      numPartitions: Int = 8): Seq[TableReport] = {
    import graft.sources.JdbcCatalog
    JdbcCatalog.listTables(srcUrl).map { t =>
      val pk = JdbcCatalog.primaryKey(srcUrl, t)
      val df = JdbcCatalog.readTable(spark, srcUrl, t,
        JdbcCatalog.partitionKey(spark, srcUrl, t), numPartitions)
      val conformed = conform(df)
      conformed.write.mode("overwrite")
        .option("batchsize", chunkSize)
        .jdbc(dstUrl, t.toLowerCase, dstProps)
      val declared = if (pk.isEmpty) None
        else Some(if (pk.size == 1) pk.head else pk.mkString("(", ", ", ")"))
      TableReport(t.toLowerCase, conformed.count(),
        ClickHouseDdl.createTable(database, t.toLowerCase,
          conformed.schema, declared))
    }
  }
}
