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

    // C12c (oracle): the decode→embed stage — deterministic fake
    // feature vectors from the payload fingerprint; plumbing, per-dim
    // schema, and the norm fold are the real pipeline shape.
    "multimodal_embed" -> Q { (s, d) =>
      Multimodal.extractFeatures(payloads(s, d)).orderBy("doc_id")
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
    // independent FNV-1a recompute (the text_fingerprint technique)
    // feeding the per-dim pmod stubs; norm sums left-to-right like the
    // Spark reduce
    "multimodal_embed" -> {
      val dims = (0 until 8).map { j =>
        val m = 1000003L + j
        s"CAST(((fp64 % $m) + $m) % $m AS DOUBLE) / $m.0 AS e$j"
      }.mkString(",\n        | ")
      val norm = (0 until 8).map(j => s"e$j*e$j").mkString(" + ")
      s"""WITH h AS (
         | SELECT doc_id, lower(to_hex(encode(text))) AS hx,
         |   CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents
         |), b AS (
         | SELECT doc_id, list_transform(range(1, n + 1),
         |   i -> CAST((strpos('0123456789abcdef', substring(hx, CAST(2*i-1 AS BIGINT), 1)) - 1) * 16
         |        + (strpos('0123456789abcdef', substring(hx, CAST(2*i AS BIGINT), 1)) - 1) AS HUGEINT)) AS bytes
         | FROM h
         |), f AS (
         | SELECT doc_id,
         |   list_reduce(list_prepend(CAST('14695981039346656037' AS HUGEINT), bytes),
         |     (acc, x) -> (xor(acc, x) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT)) AS u
         | FROM b
         |), fp AS (
         | SELECT doc_id,
         |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
         |       THEN u - CAST('18446744073709551616' AS HUGEINT)
         |       ELSE u END AS BIGINT) AS fp64
         | FROM f
         |), e AS (
         | SELECT doc_id,
         | $dims
         | FROM fp)
         |SELECT doc_id, e0, e1, e2, e3, e4, e5, e6, e7,
         | sqrt($norm) AS l2_norm
         |FROM e ORDER BY doc_id""".stripMargin
    },

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
