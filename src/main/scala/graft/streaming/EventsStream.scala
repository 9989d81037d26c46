package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured Streaming rollup (SURVEY.md §2 B10): the q_time_bucket /
  * events_stream_hourly aggregation as an incremental streaming query.
  *
  * Works on any streaming DataFrame with (ts: timestamp, event_type,
  * value, user_id) — file source, Kafka, or MemoryStream in tests. The
  * 2-hour watermark bounds state: at 100 TB/day ingest the state store
  * holds only the open windows, and late events beyond the watermark
  * are dropped exactly like ClickHouse's materialized-view rollups
  * would settle after merges.
  */
object EventsStream {

  /** Set the event-time watermark only when the plan does not already
    * carry one: Spark disallows REdefining a watermark, and requiring
    * callers to know which operator in a composed pipeline owns it
    * would make these combinators non-stackable (see
    * StreamingComposeSpec: dedup -> enrich -> rollup in one query).
    */
  private[streaming] def watermarked(df: DataFrame, tsCol: String,
                                     delay: String): DataFrame = {
    val has = df.queryExecution.logical.collectFirst {
      case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
    }.isDefined
    if (has) df else df.withWatermark(tsCol, delay)
  }

  /** Streaming dedup by event id: state bounded by the watermark —
    * duplicates arriving within the horizon are dropped exactly; later
    * ones age out of state (the at-least-once ingest companion of
    * ReplacingMerge, which settles whatever still gets through).
    */
  def dedupStream(events: DataFrame, idCols: Seq[String]): DataFrame =
    watermarked(events, "ts", "2 hours")
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-static enrichment: join the event stream against a static
    * (or slowly-refreshed) dimension. Spark broadcasts/rescans the
    * static side per micro-batch — no stream-side state at all, the
    * cheapest join shape in Structured Streaming and the right one for
    * dimension lookups at any scale.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, Seq(key), "left")

  /** Windowed stream-stream INNER join: each left event matched to
    * right events with the same key whose timestamp falls in
    * [left.ts - within, left.ts]. Right columns come back prefixed
    * `r_`. Both sides carry a `within` watermark, so Spark bounds each
    * side's join state to the window — the only shape that stays
    * O(window) memory on an unbounded 100 TB/day pair of streams.
    * Matches emit immediately (inner join); the watermark exists for
    * state eviction, not emission.
    */
  def joinWithin(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String = "ts", rightTs: String = "ts",
                 within: String = "1 hour"): DataFrame = {
    val r = right.toDF(right.columns.map("r_" + _): _*)
    val l2 = left.withWatermark(leftTs, within)
    val r2 = r.withWatermark(s"r_$rightTs", within)
    l2.join(r2,
      col(key) === col(s"r_$key") &&
        col(s"r_$rightTs") >= col(leftTs) - expr(s"INTERVAL $within") &&
        col(s"r_$rightTs") <= col(leftTs))
  }

  /** Tumbling 1-hour rollup per event_type. */
  def hourlyRollup(events: DataFrame): DataFrame =
    watermarked(events, "ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(18, 4)).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("hour_start_us"),
        col("event_type"), col("n_events"),
        // Aggregate exactly in DECIMAL, emit DOUBLE: the driver's hash
        // canonicalizes DuckDB decimals to float64 but keeps Spark parquet
        // decimals as java Decimals, so any trailing-zero decimal value
        // (here: sums of 2-dp values at scale 4) hash-mismatches. A final
        // decimal->double conversion is correctly rounded and identical on
        // both engines (r03 root cause; see tools/hashgate.py).
        col("sum_value").cast(DoubleType).as("sum_value"))
}
