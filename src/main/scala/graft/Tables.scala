package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's µs timestamps
  * cannot hold — we read it as a raw Long (`spark.sql.legacy.parquet.
  * nanosAsLong`) and expose it as `ts_ns`. DuckDB (the oracle) truncates
  * the same column to µs on read, so gate queries compare on exact
  * integers (`ts_us` = ts_ns / 1000 = DuckDB `epoch_us(ts)`) or on
  * second-level truncations, never on raw sub-second timestamps.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  /** events with `ts_ns` (raw int64 nanos) and `ts_us` (µs, = DuckDB's
    * on-read truncation) replacing the unreadable ns timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    apply(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns div 1000")) // integer div: double would lose ns bits
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
