package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * `events.ts` has shipped in two encodings across data drops:
  * TIMESTAMP(NANOS) (read as a raw Long via `spark.sql.legacy.parquet.
  * nanosAsLong`) and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Both
  * normalize to the same internal surface — `ts_us` (epoch µs, = DuckDB
  * `epoch_us(ts)` under the UTC session timezone every entry point
  * sets) and `ts_ns` (int64 nanos) — so every downstream query and
  * oracle compares on exact integers, never on raw sub-second
  * timestamps.
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
  /** events with `ts_ns` (int64 nanos) and `ts_us` (epoch µs, = DuckDB's
    * `epoch_us(ts)`) replacing the raw `ts` column, whichever parquet
    * encoding the data drop used.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = apply(s, d, "events")
    val normalized = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) drop
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000")) // integer div: double would lose ns bits
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        // TIMESTAMP(MICROS) drop: NTZ→LTZ cast is exact under the UTC session tz
        raw.withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("ts_ns", col("ts_us") * lit(1000L))
          .drop("ts")
      case other =>
        // fail loudly: a future drop with a different encoding (string,
        // INT96, nanos without the nanosAsLong conf) would otherwise be
        // silently mis-normalized into wrong µs values everywhere
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected INT64 nanos " +
            "or TIMESTAMP/TIMESTAMP_NTZ micros — extend Tables.events deliberately")
    }
    normalized.select("event_id", "ts_ns", "user_id", "event_type",
      "value", "props", "ts_us")
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
