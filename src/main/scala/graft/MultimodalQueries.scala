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

  /** The planted-image-payload hex transport (round 14): REAL format
    * bytes derivably constructed from each document (the dedup_url
    * planting pattern) — six classes by doc_id % 6:
    *   0 PNG: magic + IHDR with planted dims, bit depth ∈ {1,2,4,8,16}
    *   1 GIF89a: LE16 dims, color-resolution packed byte
    *   2 BMP: BITMAPINFOHEADER, LE32 dims, bpp ∈ {1,4,8,16,24,32}
    *   3 JPEG: the SOF0/SOF2 frame header sits BEHIND a JFIF APP0 and
    *     a VARIABLE-length COM segment (doc_id % 13 filler bytes), so
    *     the parser's segment walk is genuinely load-bearing
    *   4 raw text bytes — the 'unknown' refusal (and, if a text
    *     happens to start with 'BM'/'GIF8xa', BOTH engines parse the
    *     same bytes the same way, so the gate stays exact)
    *   5 a PNG cut at 20 bytes — the 'truncated' refusal
    * Body bytes from the document text follow each header (parse must
    * ignore them). Selector moduli are chosen to VARY within each
    * class: doc_id%6 fixes the class, so per-class knobs use coprime
    * moduli (%5, %8, %13) or (doc_id div 6) so planted depths/markers
    * aren't constants. Expects columns doc_id, text, w, h, k; the two
    * dialects emit the IDENTICAL string (hex ↔ upper(to_hex),
    * div ↔ //, cast-as-binary ↔ encode).
    */
  private def plantHxSql(spark: Boolean): String = {
    def hx(x: String, n: Int): String =
      if (spark) s"lpad(hex($x), $n, '0')"
      else s"lpad(upper(to_hex($x)), $n, '0')"
    def dv(a: String, b: String): String =
      if (spark) s"($a div $b)" else s"($a // $b)"
    def bin(x: String): String =
      if (spark) s"hex(cast($x as binary))"
      else s"upper(to_hex(encode($x)))"
    val body = bin("substring(text, 1, 16)")
    s"""CASE CAST(doc_id % 6 AS INT)
       | WHEN 0 THEN '89504E470D0A1A0A0000000D49484452'
       |  || ${hx("w", 8)} || ${hx("h", 8)}
       |  || CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN '01'
       |     WHEN 1 THEN '02' WHEN 2 THEN '04' WHEN 3 THEN '08'
       |     ELSE '10' END
       |  || '00000000DEADBEEF'
       |  || $body
       | WHEN 1 THEN '474946383961'
       |  || ${hx("w % 256", 2)} || ${hx(dv("w", "256"), 2)}
       |  || ${hx("h % 256", 2)} || ${hx(dv("h", "256"), 2)}
       |  || ${hx("(doc_id % 8) * 16 + 7", 2)} || '0000'
       |  || $body
       | WHEN 2 THEN '424D3E000000000000003600000028000000'
       |  || ${hx("w % 256", 2)} || ${hx(dv("w", "256"), 2)} || '0000'
       |  || ${hx("h % 256", 2)} || ${hx(dv("h", "256"), 2)} || '0000'
       |  || '0100'
       |  || CASE CAST(${dv("doc_id", "6")} % 6 AS INT) WHEN 0 THEN '01'
       |     WHEN 1 THEN '04' WHEN 2 THEN '08' WHEN 3 THEN '10'
       |     WHEN 4 THEN '18' ELSE '20' END || '00'
       |  || $body
       | WHEN 3 THEN 'FFD8FFE000104A46494600010100000100010000'
       |  || 'FFFE' || ${hx("k + 2", 4)} || repeat('41', CAST(k AS INT))
       |  || CASE CAST(${dv("doc_id", "6")} % 2 AS INT)
       |     WHEN 0 THEN 'FFC0' ELSE 'FFC2' END
       |  || '001108' || ${hx("h", 4)} || ${hx("w", 4)}
       |  || '03011100021101031101'
       |  || $body
       | WHEN 4 THEN ${bin("substring(text, 1, 32)")}
       | ELSE '89504E470D0A1A0A0000000D49484452' || ${hx("w", 8)}
       |END""".stripMargin
      // single-line so embedding inside another .stripMargin template
      // (the oracle) can't re-strip a leading '||' continuation to '|'
      .replace("\n", " ")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C12 (oracle, round 14 — REAL decode): planted real-format image
    // payloads parsed by the pure-byte ImageHeader expression; the
    // oracle re-parses the same bytes independently (nibble arithmetic
    // + a recursive-CTE JPEG segment walk). 'unknown'/'truncated' rows
    // prove the named in-band refusals.
    "multimodal_meta" -> Q { (s, d) =>
      val planted = Tables.documents(s, d)
        .selectExpr("doc_id", "text",
          "16 + (doc_id * 31) % 4000 AS w",
          "16 + (doc_id * 17) % 3000 AS h",
          "doc_id % 13 AS k")
        .selectExpr("doc_id", plantHxSql(spark = true) + " AS hx")
        .selectExpr("doc_id", "unhex(hx) AS payload")
      Multimodal.extractImageMeta(planted)
        .drop("sha_hex") // DuckDB 1.0 lacks sha256(BLOB); spec-covered
        .orderBy("doc_id")
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

    // Round 14: the oracle RE-PARSES the planted bytes independently —
    // nibble arithmetic (strpos over the hex alphabet) at the fixed
    // offsets each format spec defines, plus a recursive-CTE JPEG
    // segment walk that mirrors ImageHeader's loop byte for byte
    // (fill bytes, standalone markers, EOI/SOS cuts, length hops).
    "multimodal_meta" -> {
      // hex-char extraction helpers over column `hx`, 1-based position
      // expressed as a SQL expression string
      def h2(p: String): String =
        "CAST((strpos('0123456789ABCDEF', substring(hx, " + p +
          ", 1)) - 1) * 16 + strpos('0123456789ABCDEF', substring(hx, (" +
          p + ") + 1, 1)) - 1 AS BIGINT)"
      def h4(p: String): String = s"(${h2(p)} * 256 + ${h2(s"($p) + 2")})"
      def h8(p: String): String = s"(${h4(p)} * 65536 + ${h4(s"($p) + 4")})"
      val sofs = Seq("C0", "C1", "C2", "C3", "C5", "C6", "C7", "C9",
        "CA", "CB", "CD", "CE", "CF").map(m => s"'$m'").mkString(", ")
      val mk = "substring(hx, pos + 2, 2)"
      val bmpHraw = s"(${h2("45")} + 256 * ${h2("47")} + 65536 * " +
        s"${h2("49")} + 16777216 * ${h2("51")})"
      s"""WITH RECURSIVE src AS (
         | SELECT doc_id, text,
         |  16 + (doc_id * 31) % 4000 AS w,
         |  16 + (doc_id * 17) % 3000 AS h,
         |  doc_id % 13 AS k
         | FROM documents),
         |hp AS (
         | SELECT doc_id, ${plantHxSql(spark = false)} AS hx FROM src),
         |p AS (
         | SELECT doc_id, hx, CAST(length(hx) // 2 AS BIGINT) AS n_bytes,
         |  CASE
         |   WHEN substring(hx, 1, 16) = '89504E470D0A1A0A' THEN
         |    CASE WHEN length(hx) < 52
         |          OR substring(hx, 25, 8) <> '49484452'
         |         THEN 'truncated' ELSE 'png' END
         |   WHEN substring(hx, 1, 12) IN ('474946383761', '474946383961')
         |   THEN CASE WHEN length(hx) < 22 THEN 'truncated' ELSE 'gif' END
         |   WHEN substring(hx, 1, 4) = '424D' THEN
         |    CASE WHEN length(hx) < 60 THEN 'truncated' ELSE 'bmp' END
         |   WHEN substring(hx, 1, 4) = 'FFD8' THEN 'jpeg'
         |   ELSE 'unknown'
         |  END AS cls
         | FROM hp),
         |jw(doc_id, hx, n_bytes, pos, res, jw_w, jw_h, jw_d) AS (
         | SELECT doc_id, hx, n_bytes, CAST(5 AS BIGINT),
         |        CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
         |        CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
         | FROM p WHERE cls = 'jpeg'
         | UNION ALL
         | SELECT doc_id, hx, n_bytes,
         |  CASE
         |   WHEN pos + 3 > length(hx) THEN pos
         |   WHEN substring(hx, pos, 2) <> 'FF' THEN pos
         |   WHEN $mk = 'FF' THEN pos + 2
         |   WHEN $mk IN ('01','D0','D1','D2','D3','D4','D5','D6','D7')
         |    THEN pos + 4
         |   WHEN $mk IN ('D9', 'DA') THEN pos
         |   WHEN $mk IN ($sofs) THEN pos
         |   WHEN length(hx) < pos + 7 THEN pos
         |   ELSE pos + 4 + 2 * ${h4("pos + 4")}
         |  END,
         |  CASE
         |   WHEN pos + 3 > length(hx) THEN 'truncated'
         |   WHEN substring(hx, pos, 2) <> 'FF' THEN 'truncated'
         |   WHEN $mk = 'FF' THEN NULL
         |   WHEN $mk IN ('01','D0','D1','D2','D3','D4','D5','D6','D7')
         |    THEN NULL
         |   WHEN $mk IN ('D9', 'DA') THEN 'truncated'
         |   WHEN $mk IN ($sofs) THEN
         |    CASE WHEN length(hx) < pos + 17 THEN 'truncated'
         |         ELSE 'jpeg' END
         |   WHEN length(hx) < pos + 7 THEN 'truncated'
         |   WHEN ${h4("pos + 4")} < 2 THEN 'truncated'
         |   ELSE NULL
         |  END,
         |  CASE WHEN $mk IN ($sofs) AND length(hx) >= pos + 17
         |       THEN ${h4("pos + 14")} END,
         |  CASE WHEN $mk IN ($sofs) AND length(hx) >= pos + 17
         |       THEN ${h4("pos + 10")} END,
         |  CASE WHEN $mk IN ($sofs) AND length(hx) >= pos + 17
         |       THEN ${h2("pos + 8")} END
         | FROM jw WHERE res IS NULL),
         |base AS (
         | SELECT doc_id, n_bytes,
         |  CASE WHEN cls IN ('png','gif','bmp','unknown') THEN cls
         |       ELSE 'truncated' END AS format,
         |  CASE cls
         |   WHEN 'png' THEN ${h8("33")}
         |   WHEN 'gif' THEN ${h2("13")} + 256 * ${h2("15")}
         |   WHEN 'bmp' THEN ${h2("37")} + 256 * ${h2("39")} +
         |    65536 * ${h2("41")} + 16777216 * ${h2("43")}
         |  END AS width,
         |  CASE cls
         |   WHEN 'png' THEN ${h8("41")}
         |   WHEN 'gif' THEN ${h2("17")} + 256 * ${h2("19")}
         |   WHEN 'bmp' THEN abs(CASE WHEN $bmpHraw >= 2147483648
         |    THEN $bmpHraw - 4294967296 ELSE $bmpHraw END)
         |  END AS height,
         |  CASE cls
         |   WHEN 'png' THEN ${h2("49")}
         |   WHEN 'gif' THEN ((${h2("21")} // 16) % 8) + 1
         |   WHEN 'bmp' THEN ${h2("57")} + 256 * ${h2("59")}
         |  END AS bit_depth
         | FROM p WHERE cls <> 'jpeg')
         |SELECT doc_id, n_bytes, format, width, height, bit_depth
         |FROM base
         |UNION ALL
         |SELECT doc_id, n_bytes, res AS format, jw_w AS width,
         | jw_h AS height, jw_d AS bit_depth
         |FROM jw WHERE res IS NOT NULL
         |ORDER BY doc_id""".stripMargin
    },

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
