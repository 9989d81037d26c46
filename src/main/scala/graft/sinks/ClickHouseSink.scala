package graft.sinks

import org.apache.spark.sql.DataFrame
import graft.operators.MigrationJob

/** The load side of the migration as a Spark JDBC write (reference
  * main.py:147-179: connect, create table, chunked INSERT, OPTIMIZE).
  *
  * This environment has no ClickHouse server or JDBC driver (zero
  * egress), so `write` is exercised in specs only down to the options
  * it would pass; the statement generation (`plan`) is fully tested.
  * Against a real cluster the same call runs verbatim with
  * `com.clickhouse.jdbc.ClickHouseDriver` on the classpath.
  */
object ClickHouseSink {

  final case class LoadPlan(ddl: String, insert: String, optimize: String,
                            url: String, batchSize: Long)

  def url(host: String, port: Int, database: String): String =
    s"jdbc:clickhouse://$host:$port/$database"

  /** Everything the load will execute, precomputed and inspectable —
    * the idempotent-create + insert + optimize sequence of the
    * reference, minus the connection.
    */
  def plan(df: DataFrame, host: String, port: Int, database: String,
           table: String, primaryKey: Option[String] = None,
           chunkSize: Long = 10000L): LoadPlan = LoadPlan(
    ddl = ClickHouseDdl.createTable(database, table, df.schema, primaryKey),
    insert = ClickHouseDdl.insertInto(database, table, df.schema),
    optimize = ClickHouseDdl.optimizeTable(database, table),
    url = url(host, port, database),
    batchSize = chunkSize)

  /** Conform types (null-as-default, wraparound, temporal parsing) and
    * write over JDBC. `batchsize` is the chunk_size analog: each
    * executor flushes bounded INSERT batches, in parallel — the
    * distributed version of the reference's single fetchmany loop.
    */
  def write(df: DataFrame, host: String, port: Int, database: String,
            table: String, user: String, password: String,
            chunkSize: Long = 10000L): Unit =
    MigrationJob.conform(df).write
      .format("jdbc")
      .option("url", url(host, port, database))
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", chunkSize)
      .option("isolationLevel", "NONE") // ClickHouse has no txns
      .option("driver", "com.clickhouse.jdbc.ClickHouseDriver")
      .mode("append")
      .save()
}
