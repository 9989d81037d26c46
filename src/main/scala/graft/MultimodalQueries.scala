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

  /** Planted AUDIO/VIDEO container payloads (round 14, the time-based
    * sibling of [[plantHxSql]]) — six classes by doc_id % 6:
    *   0 WAV: a junk 'LIST' chunk of VARIABLE length k (odd sizes take
    *     the RIFF pad byte) sits BEFORE 'fmt ', so the chunk walk is
    *     genuinely load-bearing; 'data' declares dsz bytes but only a
    *     16-byte snippet follows — the header-prefix sample shape an
    *     object-store range-read produces.
    *   1 FLAC: STREAMINFO with the 20/3/5/36-bit packed group; both
    *     last-metadata-block flag values; doc_id % 7 == 0 plants
    *     total-samples 0 (= "unknown" per spec → NULL duration).
    *   2 MP4 mvhd v0: a VARIABLE-size 'free' box between 'ftyp' and
    *     'moov'; tn ∈ 0..3 empty 'trak' stubs counted as streams.
    *   3 MP4 mvhd v1: 64-bit creation/modification/duration offsets.
    *   4 raw text bytes — the 'unknown' refusal (prefix-classified, so
    *     a text that happens to start with a real magic parses the
    *     same way in BOTH engines).
    *   5 truncated: WAVE with no chunks / a 5-byte FLAC stub.
    *   6 MP3: an ID3v2 tag of VARIABLE syncsafe size k precedes the
    *     frame header (the skip is load-bearing); MPEG1/MPEG2 version
    *     bit, all 14 bitrate indices, all 3 sample-rate indices, all 4
    *     channel modes planted.
    *   7 OGG: one-page BOS header + the codec identification packet —
    *     Vorbis (0x01'vorbis') and OpusHead alternating.
    * Expects columns doc_id, text + the planted params (dialect-neutral
    * arithmetic, % and * only). The two dialects emit the IDENTICAL
    * string.
    */
  private val avParams = Seq(
    "8000 + (doc_id * 7) % 40000 AS srw",
    "1 + doc_id % 8 AS chw",
    "8 * (1 + doc_id % 4) AS bpw",
    "1 + doc_id % 4 AS bpb",
    "1000 + (doc_id * 11) % 100000 AS dsz",
    "doc_id % 13 AS k",
    "8000 + (doc_id * 13) % 180000 AS srf",
    "1 + (doc_id * 5) % 8 AS chf",
    "8 + (doc_id % 3) * 8 AS bpf",
    "CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 100000 + (doc_id * 977) % 100000000 END AS tot",
    "600 + (doc_id % 5) * 100 AS tsm",
    "10000 + (doc_id * 37) % 10000000 AS durm",
    "doc_id % 4 AS tn",
    "1 + doc_id % 14 AS brm",
    "doc_id % 3 AS srm",
    "doc_id % 4 AS mdm",
    "8000 + (doc_id * 3) % 88000 AS sro",
    "1 + doc_id % 8 AS cho")

  /** The planted A/V payload frame (doc_id, payload) — shared by the
    * C12d meta gate and the C12e manifest composition.
    */
  private def plantedAv(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr(Seq("doc_id", "text") ++ avParams: _*)
      .selectExpr("doc_id", plantAvHxSql(spark = true) + " AS hx")
      .selectExpr("doc_id", "unhex(hx) AS payload")

  private def plantAvHxSql(spark: Boolean): String = {
    def hx(x: String, n: Int): String =
      if (spark) s"lpad(hex($x), $n, '0')"
      else s"lpad(upper(to_hex($x)), $n, '0')"
    def dv(a: String, b: String): String =
      if (spark) s"($a div $b)" else s"($a // $b)"
    def bin(x: String): String =
      if (spark) s"hex(cast($x as binary))"
      else s"upper(to_hex(encode($x)))"
    def le2(x: String): String =
      hx(s"($x) % 256", 2) + " || " + hx(s"${dv(s"($x)", "256")} % 256", 2)
    def le4(x: String): String = Seq(
      hx(s"($x) % 256", 2),
      hx(s"${dv(s"($x)", "256")} % 256", 2),
      hx(s"${dv(s"($x)", "65536")} % 256", 2),
      hx(s"${dv(s"($x)", "16777216")} % 256", 2)).mkString(" || ")
    val body = bin("substring(text, 1, 16)")
    // mvhd payload after the duration field: rate/volume/reserved,
    // unity matrix, 6 predefined u32s, next-track-id — constant bytes
    val rest80 = "00010000" + "0100" + "0000" + "00000000" * 2 +
      ("00010000" + "00000000" * 3) * 2 + "40000000" +
      "00" * 24 + "00000002"
    val flacV = "srf * 17592186044416 + (chf - 1) * 2199023255552 + " +
      "(bpf - 1) * 68719476736 + tot"
    s"""CASE CAST(doc_id % 8 AS INT)
       | WHEN 0 THEN '52494646'
       |  || ${le4("44 + k + k % 2 + dsz")} || '57415645'
       |  || '4C495354' || ${le4("k")} || repeat('4A', CAST(k AS INT))
       |  || CASE WHEN k % 2 = 1 THEN '00' ELSE '' END
       |  || '666D7420' || '10000000' || '0100' || ${le2("chw")}
       |  || ${le4("srw")} || ${le4("srw * chw * bpb")}
       |  || ${le2("chw * bpb")} || ${le2("bpw")}
       |  || '64617461' || ${le4("dsz")}
       |  || $body
       | WHEN 1 THEN '664C6143'
       |  || CASE WHEN ${dv("doc_id", "8")} % 2 = 0 THEN '00' ELSE '80' END || '000022'
       |  || '10001000' || '000000' || '000000'
       |  || ${hx(flacV, 16)}
       |  || '${"00" * 16}'
       |  || $body
       | WHEN 2 THEN '0000001066747970' || '69736F6D' || '00000200'
       |  || ${hx("8 + k", 8)} || '66726565' || repeat('4B', CAST(k AS INT))
       |  || ${hx("116 + 8 * tn", 8)} || '6D6F6F76'
       |  || '0000006C6D766864' || '00000000' || '00000000' || '00000000'
       |  || ${hx("tsm", 8)} || ${hx("durm", 8)} || '$rest80'
       |  || repeat('000000087472616B', CAST(tn AS INT))
       |  || '000000186D646174' || $body
       | WHEN 3 THEN '0000001066747970' || '69736F6D' || '00000200'
       |  || ${hx("128 + 8 * tn", 8)} || '6D6F6F76'
       |  || '000000786D766864' || '01000000' || '${"00" * 16}'
       |  || ${hx("tsm", 8)} || ${hx("durm * 1000003", 16)} || '$rest80'
       |  || repeat('000000087472616B', CAST(tn AS INT))
       |  || '000000186D646174' || $body
       | WHEN 4 THEN ${bin("substring(text, 1, 32)")}
       | WHEN 5 THEN CASE WHEN ${dv("doc_id", "8")} % 2 = 0
       |  THEN '52494646' || ${le4("36")} || '57415645'
       |  ELSE '664C614300' END
       | WHEN 6 THEN '494433' || '0400' || '00' || '000000' || ${hx("k", 2)}
       |  || repeat('4D', CAST(k AS INT))
       |  || 'FF' || CASE WHEN ${dv("doc_id", "8")} % 2 = 0 THEN 'FB' ELSE 'F3' END
       |  || ${hx("brm * 16 + srm * 4", 2)} || ${hx("mdm * 64", 2)}
       |  || $body
       | ELSE '4F676753' || '00' || '02' || '${"00" * 8}'
       |  || '00000001' || '00000000' || '00000000' || '01' || '1E'
       |  || CASE WHEN ${dv("doc_id", "8")} % 2 = 0
       |   THEN '01766F72626973' || '00000000' || ${hx("cho", 2)} || ${le4("sro")}
       |   ELSE '4F70757348656164' || '01' || ${hx("cho", 2)} || '0000' || ${le4("sro")}
       |  END
       |  || $body
       |END""".stripMargin
      // single-line so embedding inside the oracle's .stripMargin can't
      // re-strip a leading '||' continuation to '|'
      .replace("\n", " ")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C12d (oracle, round 14 — REAL audio/video decode): planted real
    // WAV/FLAC/MP4 container bytes parsed by the pure-byte MediaHeader
    // expression; the oracle re-parses the same bytes independently
    // (recursive-CTE RIFF chunk walk + ISO-BMFF box walks, FLAC
    // bit-unpack via integer division). 'unknown'/'truncated' rows
    // prove the named in-band refusals.
    "multimodal_av_meta" -> Q { (s, d) =>
      Multimodal.extractAvMeta(plantedAv(s, d))
        .drop("sha_hex") // DuckDB 1.0 lacks sha256(BLOB); spec-covered
        .orderBy("doc_id")
    },

    // C12e (oracle): the media decode COMPOSED with the export
    // machinery — per decodable-audio format: doc count, byte total,
    // xor checksum (TrainExport's 60-bit md5 fold; counts add,
    // checksums xor, so per-format manifests merge like shard
    // manifests). Proves the C12d decode drives a real delivery
    // decision, not just a metadata column.
    "multimodal_export_manifest" -> Q { (s, d) =>
      Multimodal.extractAvMeta(plantedAv(s, d))
        .filter(col("format").isin("wav", "flac", "mp3", "vorbis", "opus"))
        .select(col("format"), col("n_bytes"),
          graft.operators.TrainExport.checksum60(col("doc_id")).as("_ck"))
        .groupBy("format")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_bytes").as("total_bytes"),
          expr("bit_xor(_ck)").as("checksum"))
        .orderBy("format")
    },

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

    // Round 14 (C12d): the oracle RE-PARSES the planted audio/video
    // container bytes independently — the hex payload is decomposed
    // once into a byte LIST (the multimodal_embed technique), then a
    // recursive-CTE RIFF chunk walk (honoring the odd-size pad byte), a
    // fixed-offset FLAC STREAMINFO bit-unpack via integer division, and
    // two recursive-CTE ISO-BMFF box walks (top-level to 'moov' with
    // largesize/size-0 handling, then moov's children for mvhd v0/v1 +
    // trak count) mirror MediaHeader's loops byte for byte.
    "multimodal_av_meta" -> avMetaOracleSql,

    // C12e: per decodable-audio format — doc count, byte total, xor
    // checksum (the export_manifest 60-bit md5 fold). The format
    // derivation here is a LINEAR re-parse (no recursive CTEs): the
    // audio classifications are closed-form, and the one walk (WAV's
    // chunk hop to 'fmt ') is UNROLLED to 4 hops — double the planted
    // corpus's maximum — because DuckDB 1.0 mis-plans a second copy of
    // the full recursive re-parse in the same connection into an OOM
    // (reproduced + recorded); the unbounded walk remains C12d's job.
    "multimodal_export_manifest" -> {
      def hb(o: String) = s"bt[($o)+1]"
      def le32(o: String) = s"(${hb(o)} + 256 * ${hb(s"($o)+1")} + " +
        s"65536 * ${hb(s"($o)+2")} + 16777216 * ${hb(s"($o)+3")})"
      def be64(o: String): String = {
        val be16 = (p: String) => s"(256 * ${hb(p)} + ${hb(s"($p)+1")})"
        val be32 = (p: String) => s"(${be16(p)} * 65536 + ${be16(s"($p)+2")})"
        s"(${be32(o)} * 4294967296 + ${be32(s"($o)+4")})"
      }
      def cc(o: String) = s"substring(hx, 2*($o)+1, 8)"
      // WAV: is there a valid 'fmt ' chunk at hop offset o? The hop
      // offsets are staged as CTE COLUMNS (h0..h3) so each chunk-size
      // le32 evaluates once — a nested-string unroll would duplicate
      // the byte-index expressions ~5× per level.
      def fmtAt(o: String) =
        s"(($o) + 8 <= nb AND ${cc(o)} = '666D7420' AND " +
          s"${le32(s"($o) + 4")} >= 16 AND ($o) + 24 <= nb)"
      def nxt(o: String) =
        s"coalesce(($o) + 8 + ${le32(s"($o) + 4")} + ${le32(s"($o) + 4")} % 2, nb + 1)"
      val wavOk = s"(${fmtAt("h0")} OR ${fmtAt("h1")} OR ${fmtAt("h2")} OR ${fmtAt("h3")})"
      // MP3: frame-header validity at offset expression `o` (column mo)
      val mp3Ok = s"(mo + 4 <= nb AND ${hb("mo")} = 255 AND " +
        s"${hb("mo + 1")} // 32 = 7 AND (${hb("mo + 1")} // 8) % 4 <> 1 " +
        s"AND (${hb("mo + 1")} // 2) % 4 <> 0 AND ${hb("mo + 2")} // 16 <> 15 " +
        s"AND (${hb("mo + 2")} // 4) % 4 <> 3)"
      val key = "CAST(doc_id AS VARCHAR)"
      val h = s"md5($key || ':42')"
      val ck = (1 to 15).map { i =>
        val p = BigInt(16).pow(15 - i)
        s"(strpos('0123456789abcdef', substring($h,$i,1))-1)*$p"
      }.mkString("(", " + ", ")")
      s"""WITH src AS (
         | SELECT doc_id, text, ${avParams.mkString(", ")} FROM documents),
         |hp AS MATERIALIZED (
         | SELECT doc_id, ${plantAvHxSql(spark = false)} AS hx FROM src),
         |hb0 AS MATERIALIZED (
         | SELECT doc_id, hx, CAST(length(hx) // 2 AS BIGINT) AS nb,
         |  list_transform(range(1, CAST(length(hx) // 2 AS BIGINT) + 1),
         |   i -> CAST((strpos('0123456789ABCDEF', substring(hx, 2*i-1, 1)) - 1) * 16
         |        + strpos('0123456789ABCDEF', substring(hx, 2*i, 1)) - 1 AS BIGINT)) AS bt
         | FROM hp),
         |mo0 AS MATERIALIZED (
         | SELECT *, CASE WHEN substring(hx, 1, 6) = '494433' AND nb >= 10
         |   THEN 10 + (${hb("6")} % 128) * 2097152 + (${hb("7")} % 128) * 16384
         |      + (${hb("8")} % 128) * 128 + (${hb("9")} % 128)
         |  ELSE CAST(0 AS BIGINT) END AS mo,
         |  27 + ${hb("26")} AS po, CAST(12 AS BIGINT) AS h0
         | FROM hb0),
         |w1 AS MATERIALIZED (SELECT *, ${nxt("h0")} AS h1 FROM mo0),
         |w2 AS MATERIALIZED (SELECT *, ${nxt("h1")} AS h2 FROM w1),
         |w3 AS MATERIALIZED (SELECT *, ${nxt("h2")} AS h3 FROM w2),
         |cls AS MATERIALIZED (
         | SELECT doc_id, nb,
         |  CASE
         |   WHEN substring(hx, 1, 8) = '52494646' AND length(hx) >= 24
         |    AND substring(hx, 17, 8) = '57415645' AND $wavOk THEN 'wav'
         |   WHEN substring(hx, 1, 8) = '664C6143' AND length(hx) >= 52
         |    AND ${hb("4")} % 128 = 0 AND ${be64("18")} // 17592186044416 > 0
         |    THEN 'flac'
         |   WHEN (substring(hx, 1, 6) = '494433' AND nb >= 10
         |         OR substring(hx, 1, 2) = 'FF' AND ${hb("1")} // 32 = 7)
         |    AND $mp3Ok THEN 'mp3'
         |   WHEN substring(hx, 1, 8) = '4F676753' AND nb >= 27
         |    AND po + 16 <= nb THEN
         |    CASE WHEN ${hb("po")} = 1
         |          AND substring(hx, 2 * po + 3, 12) = '766F72626973'
         |          AND ${le32("po + 12")} > 0 AND ${hb("po + 11")} > 0
         |         THEN 'vorbis'
         |         WHEN substring(hx, 2 * po + 1, 16) = '4F70757348656164'
         |          AND ${hb("po + 9")} > 0
         |         THEN 'opus'
         |         ELSE 'other' END
         |   ELSE 'other'
         |  END AS format
         | FROM w3)
         |SELECT format, count(*) AS n_docs,
         | CAST(sum(nb) AS BIGINT) AS total_bytes,
         | bit_xor(CAST($ck AS BIGINT)) AS checksum
         |FROM cls
         |WHERE format IN ('wav', 'flac', 'mp3', 'vorbis', 'opus')
         |GROUP BY format ORDER BY format""".stripMargin
    }
  ) ++ imageOracles

  /** The full C12d re-parse, shared by the av_meta gate and the C12e
    * manifest composition (which wraps it as a subquery).
    */
  private lazy val avMetaOracleSql: String = {
      def hb(o: String) = s"bt[($o)+1]"
      def le16(o: String) = s"(${hb(o)} + 256 * ${hb(s"($o)+1")})"
      def le32(o: String) = s"(${hb(o)} + 256 * ${hb(s"($o)+1")} + " +
        s"65536 * ${hb(s"($o)+2")} + 16777216 * ${hb(s"($o)+3")})"
      def be16(o: String) = s"(256 * ${hb(o)} + ${hb(s"($o)+1")})"
      def be32(o: String) = s"(${be16(o)} * 65536 + ${be16(s"($o)+2")})"
      def be64(o: String) = s"(${be32(o)} * 4294967296 + ${be32(s"($o)+4")})"
      def cc(o: String) = s"substring(hx, 2*($o)+1, 8)" // 4CC as hex
      val p44 = "17592186044416"   // 2^44
      val p41 = "2199023255552"    // 2^41
      val p36 = "68719476736"      // 2^36
      // WAV chunk fields at chunk offset `pos`
      val cid = cc("pos")
      val csz = le32("pos + 4")
      val fmtOk = s"pos + 8 <= nb AND $cid = '666D7420' AND $csz >= 16 AND pos + 24 <= nb"
      // ISO-BMFF box size/header at `pos` (largesize + to-EOF), bounded
      // by `lim` — shared between the two box walks
      def sz0(lim: String) = be32("pos")
      def esz(lim: String) =
        s"(CASE WHEN ${sz0(lim)} = 1 THEN ${be64("pos + 8")} " +
          s"WHEN ${sz0(lim)} = 0 THEN $lim - pos ELSE ${sz0(lim)} END)"
      def ehdr(lim: String) = s"(CASE WHEN ${sz0(lim)} = 1 THEN 16 ELSE 8 END)"
      val typ = cc("pos + 4")
      val m3base = s"(CASE (${hb("o + 2")} // 4) % 4 WHEN 0 THEN 44100 " +
        "WHEN 1 THEN 48000 ELSE 32000 END)"
      s"""WITH RECURSIVE src AS (
         | SELECT doc_id, text, ${avParams.mkString(", ")} FROM documents),
         |hp AS MATERIALIZED (
         | SELECT doc_id, ${plantAvHxSql(spark = false)} AS hx FROM src),
         |hb0 AS MATERIALIZED (
         | SELECT doc_id, hx, CAST(length(hx) // 2 AS BIGINT) AS nb,
         |  list_transform(range(1, CAST(length(hx) // 2 AS BIGINT) + 1),
         |   i -> CAST((strpos('0123456789ABCDEF', substring(hx, 2*i-1, 1)) - 1) * 16
         |        + strpos('0123456789ABCDEF', substring(hx, 2*i, 1)) - 1 AS BIGINT)) AS bt
         | FROM hp),
         |p AS MATERIALIZED (
         | SELECT doc_id, hx, nb, bt,
         |  CASE
         |   WHEN substring(hx, 1, 8) = '52494646' THEN
         |    CASE WHEN length(hx) < 24 THEN 'trunc'
         |         WHEN substring(hx, 17, 8) <> '57415645' THEN 'unknown'
         |         ELSE 'wav' END
         |   WHEN substring(hx, 1, 8) = '664C6143' THEN
         |    CASE WHEN length(hx) < 52 THEN 'trunc'
         |         WHEN ${hb("4")} % 128 <> 0 THEN 'trunc'
         |         WHEN ${be64("18")} // $p44 = 0 THEN 'trunc'
         |         ELSE 'flac' END
         |   WHEN length(hx) >= 16 AND substring(hx, 9, 8) = '66747970'
         |    THEN 'mp4'
         |   WHEN substring(hx, 1, 6) = '494433' THEN 'mp3'
         |   WHEN substring(hx, 1, 2) = 'FF' AND ${hb("1")} // 32 = 7
         |    THEN 'mp3raw'
         |   WHEN substring(hx, 1, 8) = '4F676753' THEN 'ogg'
         |   ELSE 'unknown'
         |  END AS cls
         | FROM hb0),
         |ww(doc_id, hx, nb, bt, pos, sr, ch, bps, brate, dsz, res) AS (
         | SELECT doc_id, hx, nb, bt, CAST(12 AS BIGINT),
         |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
         | FROM p WHERE cls = 'wav'
         | UNION ALL
         | SELECT doc_id, hx, nb, bt,
         |  coalesce(pos + 8 + $csz + $csz % 2, nb + 1),
         |  CASE WHEN $fmtOk THEN ${le32("pos + 12")} ELSE sr END,
         |  CASE WHEN $fmtOk THEN ${le16("pos + 10")} ELSE ch END,
         |  CASE WHEN $fmtOk THEN ${le16("pos + 22")} ELSE bps END,
         |  CASE WHEN $fmtOk THEN ${le32("pos + 16")} ELSE brate END,
         |  CASE WHEN pos + 8 <= nb AND $cid = '64617461' THEN $csz ELSE dsz END,
         |  CASE
         |   WHEN pos + 8 > nb THEN
         |    CASE WHEN sr IS NOT NULL THEN 'wav' ELSE 'truncated' END
         |   WHEN $cid = '666D7420' AND ($csz < 16 OR pos + 24 > nb)
         |    THEN 'truncated'
         |   WHEN ($cid = '666D7420' OR sr IS NOT NULL)
         |    AND ($cid = '64617461' OR dsz IS NOT NULL) THEN 'wav'
         |   ELSE NULL
         |  END
         | FROM ww WHERE res IS NULL),
         |tw(doc_id, hx, nb, bt, pos, mo, me, res) AS (
         | SELECT doc_id, hx, nb, bt, CAST(0 AS BIGINT),
         |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
         | FROM p WHERE cls = 'mp4'
         | UNION ALL
         | SELECT doc_id, hx, nb, bt,
         |  coalesce(pos + ${esz("nb")}, nb + 1),
         |  CASE WHEN $typ = '6D6F6F76' THEN pos + ${ehdr("nb")} END,
         |  CASE WHEN $typ = '6D6F6F76' THEN least(pos + ${esz("nb")}, nb) END,
         |  CASE
         |   WHEN pos + 8 > nb THEN 'truncated'
         |   WHEN ${sz0("nb")} = 1 AND pos + 16 > nb THEN 'truncated'
         |   WHEN ${esz("nb")} < ${ehdr("nb")} THEN 'truncated'
         |   WHEN $typ = '6D6F6F76' THEN 'moov'
         |   ELSE NULL
         |  END
         | FROM tw WHERE res IS NULL),
         |mw(doc_id, hx, nb, bt, pos, me, ts, dur, traks, res) AS (
         | SELECT doc_id, hx, nb, bt, mo, me,
         |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(0 AS BIGINT),
         |  CAST(NULL AS VARCHAR)
         | FROM tw WHERE res = 'moov'
         | UNION ALL
         | SELECT doc_id, hx, nb, bt,
         |  coalesce(pos + ${esz("me")}, me + 1), me,
         |  CASE WHEN pos + 8 <= me AND $typ = '6D766864' THEN
         |   CASE WHEN ${hb(s"pos + ${ehdr("me")}")} = 1
         |    AND pos + ${ehdr("me")} + 32 <= me
         |    THEN ${be32(s"pos + ${ehdr("me")} + 20")}
         |    WHEN ${hb(s"pos + ${ehdr("me")}")} <> 1
         |    AND pos + ${ehdr("me")} + 20 <= me
         |    THEN ${be32(s"pos + ${ehdr("me")} + 12")} ELSE ts END
         |   ELSE ts END,
         |  CASE WHEN pos + 8 <= me AND $typ = '6D766864' THEN
         |   CASE WHEN ${hb(s"pos + ${ehdr("me")}")} = 1
         |    AND pos + ${ehdr("me")} + 32 <= me
         |    THEN ${be64(s"pos + ${ehdr("me")} + 24")}
         |    WHEN ${hb(s"pos + ${ehdr("me")}")} <> 1
         |    AND pos + ${ehdr("me")} + 20 <= me
         |    THEN ${be32(s"pos + ${ehdr("me")} + 16")} ELSE dur END
         |   ELSE dur END,
         |  CASE WHEN pos + 8 <= me AND $typ = '7472616B'
         |   THEN traks + 1 ELSE traks END,
         |  CASE
         |   WHEN pos + 8 > me THEN
         |    CASE WHEN ts IS NOT NULL AND ts > 0 THEN 'mp4'
         |         ELSE 'truncated' END
         |   WHEN ${sz0("me")} = 1 AND pos + 16 > me THEN 'truncated'
         |   WHEN ${esz("me")} < ${ehdr("me")} THEN 'truncated'
         |   WHEN $typ = '6D766864' AND ${hb(s"pos + ${ehdr("me")}")} = 1
         |    AND pos + ${ehdr("me")} + 32 > me THEN 'truncated'
         |   WHEN $typ = '6D766864' AND ${hb(s"pos + ${ehdr("me")}")} <> 1
         |    AND pos + ${ehdr("me")} + 20 > me THEN 'truncated'
         |   ELSE NULL
         |  END
         | FROM mw WHERE res IS NULL),
         |fl AS MATERIALIZED (
         | SELECT doc_id, nb, ${be64("18")} AS v FROM p WHERE cls = 'flac'),
         |m3 AS (
         | SELECT doc_id, nb, bt, cls,
         |  CASE WHEN cls = 'mp3' THEN
         |   10 + (${hb("6")} % 128) * 2097152 + (${hb("7")} % 128) * 16384
         |      + (${hb("8")} % 128) * 128 + (${hb("9")} % 128)
         |  ELSE CAST(0 AS BIGINT) END AS o
         | FROM p WHERE cls IN ('mp3', 'mp3raw')),
         |m3f AS (
         | SELECT doc_id, nb, bt, cls, o,
         |  CASE
         |   WHEN cls = 'mp3' AND nb < 10 THEN 'bad'
         |   WHEN o + 4 > nb THEN 'bad'
         |   WHEN ${hb("o")} <> 255 OR ${hb("o + 1")} // 32 <> 7 THEN 'bad'
         |   WHEN (${hb("o + 1")} // 8) % 4 = 1
         |     OR (${hb("o + 1")} // 2) % 4 = 0 THEN 'bad'
         |   WHEN ${hb("o + 2")} // 16 = 15
         |     OR (${hb("o + 2")} // 4) % 4 = 3 THEN 'bad'
         |   ELSE 'ok' END AS st
         | FROM m3),
         |m3r AS (
         | SELECT doc_id, nb,
         |  CASE WHEN st = 'ok' THEN 'mp3'
         |       WHEN cls = 'mp3' THEN 'truncated' ELSE 'unknown' END AS format,
         |  CASE WHEN st = 'ok' THEN
         |   CASE (${hb("o + 1")} // 8) % 4
         |    WHEN 3 THEN ${m3base}
         |    WHEN 2 THEN ${m3base} // 2
         |    ELSE ${m3base} // 4 END
         |  END AS sample_rate,
         |  CASE WHEN st = 'ok' THEN
         |   CASE WHEN ${hb("o + 3")} // 64 = 3 THEN 1 ELSE 2 END
         |  END AS channels
         | FROM m3f),
         |og AS (
         | SELECT doc_id, nb, bt, hx, 27 + ${hb("26")} AS po
         | FROM p WHERE cls = 'ogg'),
         |ogr AS (
         | SELECT doc_id, nb,
         |  CASE
         |   WHEN nb < 27 THEN 'truncated'
         |   WHEN po + 7 > nb THEN 'truncated'
         |   WHEN ${hb("po")} = 1
         |    AND substring(hx, 2 * po + 3, 12) = '766F72626973' THEN
         |    CASE WHEN po + 16 > nb THEN 'truncated'
         |         WHEN ${le32("po + 12")} = 0 OR ${hb("po + 11")} = 0
         |          THEN 'truncated'
         |         ELSE 'vorbis' END
         |   WHEN po + 8 <= nb
         |    AND substring(hx, 2 * po + 1, 16) = '4F70757348656164' THEN
         |    CASE WHEN po + 16 > nb THEN 'truncated'
         |         WHEN ${hb("po + 9")} = 0 THEN 'truncated'
         |         ELSE 'opus' END
         |   ELSE 'ogg' END AS format,
         |  ${le32("po + 12")} AS sr_raw,
         |  ${hb("po + 11")} AS ch_vorbis, ${hb("po + 9")} AS ch_opus
         | FROM og)
         |SELECT doc_id, nb AS n_bytes,
         | CASE cls WHEN 'unknown' THEN 'unknown' ELSE 'truncated' END AS format,
         | CAST(NULL AS BIGINT) AS duration_ms, CAST(NULL AS BIGINT) AS sample_rate,
         | CAST(NULL AS BIGINT) AS channels, CAST(NULL AS BIGINT) AS bit_depth,
         | CAST(NULL AS BIGINT) AS streams
         |FROM p WHERE cls IN ('unknown', 'trunc')
         |UNION ALL
         |SELECT doc_id, nb, 'flac',
         | CASE WHEN v % $p36 > 0 THEN ((v % $p36) * 1000) // (v // $p44) END,
         | v // $p44, (v // $p41) % 8 + 1, (v // $p36) % 32 + 1,
         | CAST(1 AS BIGINT)
         |FROM fl
         |UNION ALL
         |SELECT doc_id, nb,
         | CASE WHEN res = 'wav' THEN 'wav' ELSE 'truncated' END,
         | CASE WHEN res = 'wav' AND dsz IS NOT NULL AND brate > 0
         |      THEN dsz * 1000 // brate END,
         | CASE WHEN res = 'wav' THEN sr END,
         | CASE WHEN res = 'wav' THEN ch END,
         | CASE WHEN res = 'wav' THEN bps END,
         | CASE WHEN res = 'wav' THEN CAST(1 AS BIGINT) END
         |FROM ww WHERE res IS NOT NULL
         |UNION ALL
         |SELECT doc_id, nb, 'truncated', CAST(NULL AS BIGINT),
         | CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         | CAST(NULL AS BIGINT)
         |FROM tw WHERE res = 'truncated'
         |UNION ALL
         |SELECT doc_id, nb,
         | CASE WHEN res = 'mp4' THEN 'mp4' ELSE 'truncated' END,
         | CASE WHEN res = 'mp4' THEN dur * 1000 // ts END,
         | CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         | CASE WHEN res = 'mp4' THEN traks END
         |FROM mw WHERE res IS NOT NULL
         |UNION ALL
         |SELECT doc_id, nb, format, CAST(NULL AS BIGINT),
         | sample_rate, channels, CAST(NULL AS BIGINT),
         | CASE WHEN format = 'mp3' THEN CAST(1 AS BIGINT) END
         |FROM m3r
         |UNION ALL
         |SELECT doc_id, nb, format, CAST(NULL AS BIGINT),
         | CASE WHEN format IN ('vorbis', 'opus') THEN sr_raw END,
         | CASE WHEN format = 'vorbis' THEN ch_vorbis
         |      WHEN format = 'opus' THEN ch_opus END,
         | CAST(NULL AS BIGINT),
         | CASE WHEN format IN ('vorbis', 'opus') THEN CAST(1 AS BIGINT) END
         |FROM ogr
         |ORDER BY doc_id""".stripMargin
  }

  private lazy val imageOracles: Map[String, String] = Map(
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
