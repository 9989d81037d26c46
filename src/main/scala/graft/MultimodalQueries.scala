package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.streaming.EventsStream

/** SURVEY.md §2 C12 (multimodal binary plumbing) + B10 (streaming
  * rollup, gated through its batch-equivalent query).
  */
object MultimodalQueries {

  private def Q(f: (SparkSession, String) => DataFrame) = f

  /** documents.text reinterpreted as an opaque binary payload column —
    * the schema shape a media table would have.
    */
  def payloads(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C12 (oracle): binary payload metadata — size, sha256, stubbed
    // decode dimensions (deterministic fake; see Multimodal.decodeStub).
    "multimodal_meta" -> Q { (s, d) =>
      Multimodal.extractMeta(payloads(s, d)).orderBy("doc_id")
    },

    // C12b (oracle): per-frame work items via explode fan-out.
    "multimodal_frames" -> Q { (s, d) =>
      Multimodal.sampleFrames(Multimodal.extractMeta(payloads(s, d)), 7)
        .orderBy("doc_id", "frame_idx")
    },

    // B10 (oracle): the streaming rollup's batch-equivalent answer —
    // identical logical aggregation, so the gate checks the same
    // semantics the streaming spec exercises incrementally.
    "events_stream_hourly" -> Q { (s, d) =>
      EventsStream.hourlyRollup(
        Tables.events(s, d)
          .select(timestamp_micros(col("ts_us")).as("ts"),
            col("event_type"), col("value")))
        .orderBy("hour_start_us", "event_type")
    }
  )

  val oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        | octet_length(CAST(text AS BLOB)) AS n_bytes,
        | sha256(text) AS sha_hex,
        | 64 + (doc_id * 7919 + octet_length(CAST(text AS BLOB))) % 1856 AS width,
        | 64 + (doc_id * 104729 + octet_length(CAST(text AS BLOB))) % 1016 AS height,
        | 1 + octet_length(CAST(text AS BLOB)) % 240 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_frames" ->
      """SELECT doc_id, sha256(text) AS sha_hex,
        | unnest(range(0, 1 + octet_length(CAST(text AS BLOB)) % 240, 7)) AS frame_idx
        |FROM documents ORDER BY doc_id, frame_idx""".stripMargin,

    "events_stream_hourly" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
        | count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY hour_start_us, event_type
        |ORDER BY hour_start_us, event_type""".stripMargin
  )
}
