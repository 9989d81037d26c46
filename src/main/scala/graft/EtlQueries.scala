package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{ChType, SchemaMapper}
import graft.functions.Coercions._
import graft.operators.ReplacingMerge

/** SURVEY.md §2.A — the reference's ETL core as gate queries.
  * Each key has a DuckDB oracle in `oracles` unless marked rows-only.
  * NULLs are injected deterministically (modulo arithmetic on keys) so
  * the coercion paths are actually exercised on the clean test data.
  */
object EtlQueries {

  private def Q(f: (SparkSession, String) => DataFrame) = f

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1 (oracle): ClickHouse schema mapping of every test table.
    "schema_infer" -> Q { (s, d) =>
      val rows = Tables.all.flatMap { t =>
        SchemaMapper.mapSchema(Tables(s, d, t).schema).map {
          case (c, ch) => (t, c, ch.sql)
        }
      }
      import s.implicits._
      rows.toDF("table_name", "column_name", "ch_type")
        .orderBy("table_name", "column_name")
    },

    // A2: input_format_null_as_default coercion per target type.
    "coerce_null_default" -> Q { (s, d) =>
      val li = Tables.lineitem(s, d)
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        nullAsDefault(when(col("l_linenumber") % 3 === 0, lit(null))
          .otherwise(col("l_quantity")), ChType.Float64).as("qty_d"),
        nullAsDefault(when(col("l_linenumber") % 2 === 0, lit(null))
          .otherwise(col("l_returnflag")), ChType.Str).as("flag_d"),
        nullAsDefault(when(col("l_partkey") % 5 === 0, lit(null))
          .otherwise(col("l_partkey")), ChType.Int64).as("part_d"),
        nullAsDefault(when(col("l_suppkey") % 7 === 0, lit(null))
          .otherwise(col("l_suppkey") % 2 === 1), ChType.Bool).as("odd_supp_d")
      ).orderBy("l_orderkey", "l_linenumber")
    },

    // A3: UInt32/UInt64 wraparound masking.
    "uint_wraparound" -> Q { (s, d) =>
      val li = Tables.lineitem(s, d)
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        toUInt32(-col("l_orderkey") * col("l_partkey")).as("u32_neg"),
        toUInt32(col("l_orderkey") * lit(1000003L) + col("l_suppkey")).as("u32_big"),
        toUInt64(col("l_orderkey") * lit(2654435761L)).as("u64")
      ).orderBy("l_orderkey", "l_linenumber")
    },

    // A4: lenient DateTime parsing (fractional seconds dropped,
    // malformed/blank -> NULL).
    "parse_datetime" -> Q { (s, d) =>
      val ev = Tables.events(s, d)
      val raw = when(col("event_id") % 97 === 0, lit("not a datetime"))
        .when(col("event_id") % 89 === 0, lit("  "))
        .otherwise(concat(
          from_unixtime(expr("ts_ns div 1000000000"), "yyyy-MM-dd HH:mm:ss"),
          lit("."), lpad(expr("(ts_ns div 1000000) % 1000").cast("string"), 3, "0")))
      ev.select(col("event_id"), parseDateTime(raw).as("parsed_ts"))
        .orderBy("event_id")
    },

    // A5: lenient Date parsing.
    "parse_date" -> Q { (s, d) =>
      val o = Tables.orders(s, d)
      val raw = when(col("o_orderkey") % 101 === 0, lit("2024-13-45"))
        .when(col("o_orderkey") % 103 === 0, lit(""))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
      o.select(col("o_orderkey"), parseDate(raw).as("parsed_date"))
        .orderBy("o_orderkey")
    },

    // A6: ReplacingMergeTree — latest row per (user_id, event_type).
    // Version order on ts_us (µs) to match the oracle's on-read
    // truncation; event_id breaks ties deterministically.
    "replacing_merge" -> Q { (s, d) =>
      ReplacingMerge.latestByKey(
        Tables.events(s, d),
        Seq("user_id", "event_type"),
        Seq(col("ts_us"), col("event_id"))
      ).select("event_id", "ts_us", "user_id", "event_type", "value", "props")
        .orderBy("user_id", "event_type")
    },

    // A7: re-ingest + OPTIMIZE: second insert wins after the merge.
    "optimize_compact" -> Q { (s, d) =>
      val ev = Tables.events(s, d)
        .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
      val reinsert = ev
        .withColumn("value", col("value") * 2)
        .withColumn("ts_us", col("ts_us") + lit(3600000000L))
      ReplacingMerge.optimize(
        ev.unionByName(reinsert),
        Seq("user_id", "event_type"),
        Seq(col("ts_us"), col("event_id"))
      ).orderBy("user_id", "event_type")
    },

    // A6b: ReplacingMergeTree(version, is_deleted) — tombstone upserts:
    // the latest row per key wins, and a deleted-flagged winner removes
    // the key entirely. Flag injected deterministically (event_id%7).
    "q_replacing_deletes" -> Q { (s, d) =>
      ReplacingMerge.latestByKeyWithDeletes(
        Tables.events(s, d)
          .select("event_id", "ts_us", "user_id", "event_type", "value"),
        Seq("user_id", "event_type"),
        Seq(col("ts_us"), col("event_id")),
        (col("event_id") % 7 === 0).cast(IntegerType)
      ).orderBy("user_id", "event_type")
    },

    // A6c: CollapsingMergeTree(sign) — +1 asserts, -1 cancels; a key
    // survives iff net sign > 0, represented by its latest +1 row.
    "q_collapsing_merge" -> Q { (s, d) =>
      ReplacingMerge.collapse(
        Tables.events(s, d)
          .select("event_id", "ts_us", "user_id", "event_type", "value"),
        Seq("user_id", "event_type"),
        when(col("event_id") % 3 === 0, -1).otherwise(1),
        Seq(col("ts_us"), col("event_id"))
      ).orderBy("user_id", "event_type")
    },

    // A6e (oracle, round 9): VersionedCollapsingMergeTree — cancel
    // pairs must MATCH ON VERSION, so replayed/out-of-order
    // delete+insert cycles collapse generation-by-generation instead
    // of a late -1 eating the wrong +1. version = event_id div 3
    // groups consecutive events; the %3 sign plant leaves mixed-sign
    // versions to cancel and single-sign versions to survive.
    "q_versioned_collapsing" -> Q { (s, d) =>
      ReplacingMerge.collapseVersioned(
        Tables.events(s, d)
          .select("event_id", "ts_us", "user_id", "event_type", "value"),
        Seq("user_id", "event_type"),
        when(col("event_id") % 3 === 0, -1).otherwise(1),
        expr("event_id DIV 3"),
        Seq(col("ts_us"), col("event_id"))
      ).orderBy("user_id", "event_type", "version")
    },

    // A6d: SummingMergeTree — keys collapse to one row with summed
    // numerics (exact DECIMAL internally, DOUBLE out) and the latest
    // row as the representative for everything else.
    "q_summing_merge" -> Q { (s, d) =>
      val prepared = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts_us"), col("value").cast(DecimalType(18, 2)).as("value"))
      ReplacingMerge.summingMerge(prepared,
          Seq("user_id", "event_type"), Seq("value"),
          Seq(col("ts_us"), col("event_id")))
        .select(col("user_id"), col("event_type"),
          col("value").cast(DecimalType(18, 4)).cast(DoubleType).as("sum_value"),
          col("event_id").as("rep_event_id"))
        .orderBy("user_id", "event_type")
    },

    // A8: whole-catalog migration row counts.
    "migrate_counts" -> Q { (s, d) =>
      Tables.all.map { t =>
        Tables(s, d, t).groupBy()
          .agg(count(lit(1)).as("n_rows"))
          .select(lit(t).as("table_name"), col("n_rows"))
      }.reduce(_ unionByName _).orderBy("table_name")
    },

    // A9: chunk math — bounded-batch counts at chunk_size=10000.
    "chunked_ingest" -> Q { (s, d) =>
      Tables.all.map { t =>
        Tables(s, d, t).groupBy()
          .agg(ceil(count(lit(1)) / 10000.0).cast(LongType).as("n_chunks"))
          .select(lit(t).as("table_name"), col("n_chunks"))
      }.reduce(_ unionByName _).orderBy("table_name")
    },

    // A10 (oracle, round 14): ANALYZE-style table profiling — per
    // column: rows, nulls, EXACT distincts, canonical min/max. One
    // aggregation pass (Catalyst's Expand handles the multi-distinct),
    // unpivoted executor-side. The double column routes through exact
    // DECIMAL (raw double rendering is not cross-engine portable); the
    // HLL sketch family is the documented 100 TB distinct swap-in.
    "q_profile" -> Q { (s, d) =>
      // spread: the Expand×6 multi-distinct aggregation otherwise eats
      // the whole table through one scan task (r17; identity at scale)
      graft.operators.Profiler.profile(Tables.spread(Tables.orders(s, d)), Seq(
        "o_orderkey" -> col("o_orderkey"),
        "o_custkey" -> col("o_custkey"),
        "o_orderstatus" -> col("o_orderstatus"),
        "o_orderdate" -> col("o_orderdate"),
        "o_totalprice" -> col("o_totalprice").cast("decimal(18,2)")))
    },

    // A11 (round 14, the batch twin of the SqliteCdcStream source):
    // incremental-migration audit law. An incremental sync ships only
    // key > watermark; the auditable question is "does already-loaded
    // ⊕ delta reconstruct the full table?". Per priority group:
    // counts and 60-bit XOR checksums (the export_manifest kernel —
    // order-independent, so ANY engine recomputes them) for the
    // already/delta split at watermark = max(key) div 2, plus the
    // full-table checksum the merge must equal. One scan + one
    // broadcast 1-row watermark; checksums merge by XOR exactly like
    // TrainExport.mergeManifests.
    "migrate_incremental" -> Q { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val wm = o.agg(expr("max(o_orderkey) div 2").as("watermark"))
      val ck = graft.operators.TrainExport.checksum60(col("o_orderkey"))
      o.crossJoin(broadcast(wm))
        .select(col("o_orderpriority"), col("watermark"),
          (col("o_orderkey") > col("watermark")).as("is_delta"),
          ck.as("_ck"))
        .groupBy("o_orderpriority", "watermark")
        .agg(
          sum(when(col("is_delta"), 0L).otherwise(1L)).as("n_already"),
          sum(when(col("is_delta"), 1L).otherwise(0L)).as("n_delta"),
          expr("bit_xor(CASE WHEN is_delta THEN CAST(0 AS BIGINT) " +
            "ELSE _ck END)").as("ck_already"),
          expr("bit_xor(CASE WHEN is_delta THEN _ck " +
            "ELSE CAST(0 AS BIGINT) END)").as("ck_delta"),
          expr("bit_xor(_ck)").as("ck_full"))
        .orderBy("o_orderpriority")
    },

    // A13 (round 14): MergeTree TTL with GROUP BY rollup — `TTL day +
    // INTERVAL 20 DAY GROUP BY event_type SET n = sum(n), cents =
    // sum(cents)`: rows past the horizon age into ONE aggregate row
    // per group instead of being dropped; fresh rows pass through.
    // The horizon is max(day) − 20 (a pure function of the data — CH
    // evaluates now() at merge time, the documented deviation), the
    // rolled row's day is min(day) (CH's "first row in ORDER BY
    // order" rule stated relationally). One scan + one bounded
    // partial-agg shuffle; daily exact-cents pre-agg first, so the
    // rollup never touches raw rows.
    "q_ttl_expire" -> Q { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("n_rows"),
          sum((col("value").cast(DecimalType(18, 2)) * 100)
            .cast(LongType)).as("cents"))
      ReplacingMerge.ttlRollup(daily, "day", 20L,
          Seq("event_type"), Seq("n_rows", "cents"))
        .orderBy("event_type", "day")
    }
  )

  private val tableList = Tables.all.sorted

  // def, not val: schema_infer reads graft.oracle.sfDir, which Verify
  // sets at startup — a val would bake in whatever the property held
  // the first time anything touched EtlQueries (ADVICE r6).
  def oracles: Map[String, String] = Map(
    // A1: independently re-derive the ClickHouse schema mapping from
    // DuckDB's own view of the same parquet. DESCRIBE flattens
    // ns-timestamps to TIMESTAMP, so the one Spark-visible distinction
    // (ns surfaces as Int64 — Spark reads NANOS as LongType) comes
    // from parquet_schema() logical types; that table function needs
    // file paths, taken from the gate's data dir (Verify sets
    // graft.oracle.sfDir from its sfDir arg; sf0.01 is the fallback
    // for ad-hoc runs — schemas are identical across SFs anyway).
    "schema_infer" -> {
      val sfDir = sys.props.getOrElse("graft.oracle.sfDir", "/root/testdata/sf0.01")
      val describes = tableList.map(t =>
        s"SELECT '$t' AS table_name, column_name, column_type FROM (DESCRIBE SELECT * FROM $t)")
        .mkString(" UNION ALL ")
      val nanos = tableList.map(t =>
        s"SELECT '$t' AS table_name, name AS column_name FROM parquet_schema('$sfDir/$t.parquet') WHERE logical_type LIKE '%NanoSeconds%'")
        .mkString(" UNION ALL ")
      s"""WITH cols AS ($describes), ns AS ($nanos)
         |SELECT c.table_name, c.column_name,
         | CASE WHEN n.column_name IS NOT NULL THEN 'Int64'
         | ELSE CASE c.column_type
         |  WHEN 'BIGINT' THEN 'Int64'
         |  WHEN 'INTEGER' THEN 'Int32'
         |  WHEN 'DOUBLE' THEN 'Float64'
         |  WHEN 'FLOAT' THEN 'Float32'
         |  WHEN 'VARCHAR' THEN 'String'
         |  WHEN 'DATE' THEN 'Date'
         |  WHEN 'TIMESTAMP' THEN 'DateTime'
         |  WHEN 'BOOLEAN' THEN 'Boolean'
         |  WHEN 'FLOAT[]' THEN 'Array(Float32)'
         |  WHEN 'DOUBLE[]' THEN 'Array(Float64)'
         |  ELSE 'String' END END AS ch_type
         |FROM cols c LEFT JOIN ns n USING (table_name, column_name)
         |ORDER BY table_name, column_name""".stripMargin
    },

    "coerce_null_default" ->
      """SELECT l_orderkey, l_linenumber,
        | coalesce(CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_quantity END, 0.0) AS qty_d,
        | coalesce(CASE WHEN l_linenumber % 2 = 0 THEN NULL ELSE l_returnflag END, '') AS flag_d,
        | coalesce(CASE WHEN l_partkey % 5 = 0 THEN NULL ELSE l_partkey END, 0) AS part_d,
        | coalesce(CASE WHEN l_suppkey % 7 = 0 THEN NULL ELSE (l_suppkey % 2 = 1) END, false) AS odd_supp_d
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "uint_wraparound" ->
      """SELECT l_orderkey, l_linenumber,
        | ((-l_orderkey) * l_partkey) & 4294967295 AS u32_neg,
        | (l_orderkey * 1000003 + l_suppkey) & 4294967295 AS u32_big,
        | (l_orderkey * 2654435761) AS u64
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "parse_datetime" ->
      """SELECT event_id,
        | try_strptime(trim(split_part(
        |   CASE WHEN event_id % 97 = 0 THEN 'not a datetime'
        |        WHEN event_id % 89 = 0 THEN '  '
        |        ELSE strftime(ts, '%Y-%m-%d %H:%M:%S.%g') END, '.', 1)),
        |   '%Y-%m-%d %H:%M:%S') AS parsed_ts
        |FROM events ORDER BY event_id""".stripMargin,

    "parse_date" ->
      """SELECT o_orderkey,
        | CAST(try_strptime(nullif(trim(
        |   CASE WHEN o_orderkey % 101 = 0 THEN '2024-13-45'
        |        WHEN o_orderkey % 103 = 0 THEN ''
        |        ELSE strftime(o_orderdate, '%Y-%m-%d') END), ''),
        |   '%Y-%m-%d') AS DATE) AS parsed_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "replacing_merge" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props FROM (
        | SELECT *, row_number() OVER (
        |   PARTITION BY user_id, event_type
        |   ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q_replacing_deletes" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value FROM (
        | SELECT *, row_number() OVER (
        |   PARTITION BY user_id, event_type
        |   ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) t
        |WHERE rn = 1 AND event_id % 7 <> 0
        |ORDER BY user_id, event_type""".stripMargin,

    "q_collapsing_merge" ->
      """WITH signed AS (
        | SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
        |  CASE WHEN event_id % 3 = 0 THEN -1 ELSE 1 END AS sign
        | FROM events
        |), net AS (
        | SELECT user_id, event_type FROM signed
        | GROUP BY user_id, event_type HAVING sum(sign) > 0
        |), latest_pos AS (
        | SELECT event_id, ts_us, user_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |                     ORDER BY ts_us DESC, event_id DESC) AS rn
        | FROM signed WHERE sign > 0)
        |SELECT p.event_id, p.ts_us, p.user_id, p.event_type, p.value
        |FROM latest_pos p JOIN net USING (user_id, event_type)
        |WHERE p.rn = 1 ORDER BY p.user_id, p.event_type""".stripMargin,

    "q_versioned_collapsing" ->
      """WITH signed AS (
        | SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
        |  CASE WHEN event_id % 3 = 0 THEN -1 ELSE 1 END AS sign,
        |  event_id // 3 AS version
        | FROM events
        |), nets AS (
        | SELECT user_id, event_type, version, sum(sign) AS net
        | FROM signed GROUP BY 1, 2, 3 HAVING sum(sign) <> 0
        |), reps AS (
        | SELECT user_id, event_type, version, sign,
        |  event_id, ts_us, value,
        |  row_number() OVER (PARTITION BY user_id, event_type, version, sign
        |                     ORDER BY ts_us DESC, event_id DESC) AS rn
        | FROM signed)
        |SELECT n.user_id, n.event_type, n.version,
        | CAST(n.net AS BIGINT) AS net,
        | r.event_id AS rep_event_id, r.ts_us AS rep_ts_us,
        | r.value AS rep_value
        |FROM nets n JOIN reps r
        | ON r.user_id = n.user_id AND r.event_type = n.event_type
        |  AND r.version = n.version AND r.rn = 1
        |  AND r.sign = CASE WHEN n.net > 0 THEN 1 ELSE -1 END
        |ORDER BY n.user_id, n.event_type, n.version""".stripMargin,

    "q_summing_merge" ->
      """WITH latest AS (
        | SELECT user_id, event_type, event_id,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |                     ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events
        |), sums AS (
        | SELECT user_id, event_type,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,4))
        |       AS DOUBLE) AS sum_value
        | FROM events GROUP BY user_id, event_type)
        |SELECT s.user_id, s.event_type, s.sum_value,
        | l.event_id AS rep_event_id
        |FROM sums s JOIN latest l
        |  ON l.user_id = s.user_id AND l.event_type = s.event_type AND l.rn = 1
        |ORDER BY s.user_id, s.event_type""".stripMargin,

    "optimize_compact" ->
      """WITH ins AS (
        | SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props FROM events
        | UNION ALL
        | SELECT event_id, epoch_us(ts) + 3600000000 AS ts_us, user_id, event_type, value * 2, props FROM events
        |)
        |SELECT event_id, ts_us, user_id, event_type, value, props FROM (
        | SELECT *, row_number() OVER (
        |   PARTITION BY user_id, event_type
        |   ORDER BY ts_us DESC, event_id DESC) AS rn
        | FROM ins) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "migrate_counts" -> tableList
      .map(t => s"SELECT '$t' AS table_name, count(*) AS n_rows FROM $t")
      .mkString("", " UNION ALL ", " ORDER BY table_name"),

    "chunked_ingest" -> tableList
      .map(t => s"SELECT '$t' AS table_name, CAST(ceil(count(*) / 10000.0) AS BIGINT) AS n_chunks FROM $t")
      .mkString("", " UNION ALL ", " ORDER BY table_name"),

    // A10: per-column stats recomputed independently; the decimal cast
    // mirrors the Spark side so min/max render identically.
    "q_profile" -> Seq(
      "o_orderkey" -> "o_orderkey",
      "o_custkey" -> "o_custkey",
      "o_orderstatus" -> "o_orderstatus",
      "o_orderdate" -> "o_orderdate",
      "o_totalprice" -> "CAST(o_totalprice AS DECIMAL(18,2))")
      .map { case (n, e) =>
        s"""SELECT '$n' AS "column", count(*) AS n_rows,
           | count(*) - count($e) AS n_null,
           | CAST(count(DISTINCT $e) AS BIGINT) AS n_distinct,
           | CAST(min($e) AS VARCHAR) AS min_s,
           | CAST(max($e) AS VARCHAR) AS max_s
           |FROM orders""".stripMargin
      }
      .mkString("", " UNION ALL ", " ORDER BY \"column\"")
  ,

    // A11: the oracle recomputes the watermark split independently —
    // the 60-bit checksum is the manifestSql positional md5 decode
    // (first 15 hex chars), identical to TrainExport.checksum60's
    // conv(substring(md5(id || ':42'), 1, 15), 16, 10).
    "migrate_incremental" -> {
      val h = "md5(CAST(o_orderkey AS VARCHAR) || ':42')"
      val ck = (1 to 15).map { i =>
        val p = BigInt(16).pow(15 - i)
        s"(strpos('0123456789abcdef', substring($h,$i,1))-1)*$p"
      }.mkString("(", " + ", ")")
      s"""WITH wm AS (SELECT max(o_orderkey) // 2 AS watermark FROM orders),
         |r AS (
         | SELECT o_orderpriority, watermark,
         |  o_orderkey > watermark AS is_delta,
         |  CAST($ck AS BIGINT) AS ck
         | FROM orders, wm)
         |SELECT o_orderpriority, watermark,
         | CAST(sum(CASE WHEN is_delta THEN 0 ELSE 1 END) AS BIGINT) AS n_already,
         | CAST(sum(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
         | CAST(bit_xor(CASE WHEN is_delta THEN CAST(0 AS BIGINT) ELSE ck END) AS BIGINT) AS ck_already,
         | CAST(bit_xor(CASE WHEN is_delta THEN ck ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ck_delta,
         | CAST(bit_xor(ck) AS BIGINT) AS ck_full
         |FROM r GROUP BY 1, 2 ORDER BY o_orderpriority""".stripMargin
    },

    // A13: the TTL rollup replayed — same data-derived horizon, same
    // min-day representative, same exact-cents kernel.
    "q_ttl_expire" ->
      """WITH daily AS (
        | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |   AS BIGINT) AS cents
        | FROM events GROUP BY 1, 2),
        |b AS (SELECT max(day) - 20 AS cut FROM daily),
        |fresh AS (
        | SELECT event_type, day, n_rows, cents, false AS is_rolled
        | FROM daily, b WHERE day > cut),
        |rolled AS (
        | SELECT event_type, min(day) AS day,
        |  CAST(sum(n_rows) AS BIGINT) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS cents, true AS is_rolled
        | FROM daily, b WHERE day <= cut GROUP BY 1)
        |SELECT * FROM fresh UNION ALL SELECT * FROM rolled
        |ORDER BY event_type, day""".stripMargin
  )
}
