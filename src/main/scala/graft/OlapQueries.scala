package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.B — the ClickHouse-style OLAP query surface the migrated
  * data serves (reference main.py:65: ReplacingMergeTree is built to be
  * queried like this).
  *
  * Determinism-by-construction for the DuckDB gate: every floating
  * aggregate is routed through exact DECIMAL arithmetic on BOTH sides,
  * so results are independent of partitioning/reduction order — the
  * property that also makes them stable on a 1000-executor cluster.
  * Ratios (avg) are a single double division of exact inputs, which is
  * bit-deterministic on IEEE hardware.
  *
  * Scale notes per query are inline; see SURVEY.md §5.
  */
object OlapQueries {

  private def Q(f: (SparkSession, String) => DataFrame) = f

  private val d2 = DecimalType(18, 2)
  private val d4 = DecimalType(18, 4)
  private val d6 = DecimalType(18, 6)
  private def dec2(c: String): Column = col(c).cast(d2)
  private val one = lit(1).cast(DecimalType(3, 2))
  /** l_extendedprice * (1 - l_discount), exact at scale 4. */
  private def discPrice: Column =
    (dec2("l_extendedprice") * (one - dec2("l_discount"))).cast(d4)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // B1: TPC-H Q1-style pricing summary. groupBy.agg gets map-side
    // partial aggregation for free: at 100 TB only (flag,status) pairs
    // cross the shuffle, not rows.
    "q1_pricing_summary" -> Q { (s, d) =>
      // spread: the 8 decimal aggregates otherwise run serially in the
      // single-row-group scan task (r17; identity at scale)
      Tables.spread(Tables.lineitem(s, d))
        .filter(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // Aggregate exactly in DECIMAL, emit DOUBLE (r03 hash-gate root
          // cause: the driver canonicalizes DuckDB decimals to float64 but
          // keeps Spark parquet decimals, so trailing-zero decimal values
          // — integer quantity sums, 2-dp price sums — mismatch on their
          // string form. decimal->double of the SAME exact sum is
          // correctly rounded identically on both engines).
          sum(dec2("l_quantity")).cast(DoubleType).as("sum_qty"),
          sum(dec2("l_extendedprice")).cast(DoubleType).as("sum_base_price"),
          sum(discPrice).cast(DoubleType).as("sum_disc_price"),
          sum((discPrice * (one + dec2("l_tax"))).cast(d6)).cast(DoubleType).as("sum_charge"),
          (sum(dec2("l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          (sum(dec2("l_extendedprice")).cast(DoubleType) / count(lit(1))).as("avg_price"),
          (sum(dec2("l_discount")).cast(DoubleType) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // B2: top-10 orders by revenue for a segment. Small dims broadcast;
    // the lineitem-orders join shuffles on orderkey only after pruning
    // to 3 columns; top-k is a sort of the *aggregated* rows.
    "q3_top_orders" -> Q { (s, d) =>
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-03-15"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-03-15"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          col("o_orderdate").cast(DateType).as("order_dt"),
          col("o_orderpriority"))
        .agg(sum(discPrice).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // B3: 5-way star join -> per-nation revenue. region/nation/supplier
    // broadcast (tiny at any scale); customer-orders-lineitem shuffle on
    // their keys; the c_nationkey = s_nationkey condition prunes rows
    // before aggregation.
    "q5_region_revenue" -> Q { (s, d) =>
      val asia = broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA"))
      val nat = broadcast(Tables.nation(s, d))
      val sup = broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"))
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(asia, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(discPrice).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // B4: selective filter + global agg. The three predicates reach the
    // parquet scan as PushedFilters; single partial-agg shuffle of one
    // row per partition.
    "q6_forecast_revenue" -> Q { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum((dec2("l_extendedprice") * dec2("l_discount")).cast(d4))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // B2b (oracle, round 9): TPC-H Q4 shape — order counts per
    // priority for a quarter, restricted to orders with at least one
    // late-shipping lineitem (EXISTS → LEFT SEMI join, never
    // join+distinct; the semi join build side is the filtered order
    // window, broadcast-sized). Adapted to the test schema's columns:
    // "late" = l_shipdate > o_orderdate + 60 days.
    "q4_priority_count" -> Q { (s, d) =>
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1997-04-01"))
      val l = Tables.lineitem(s, d)
      val late = l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") > date_add(o("o_orderdate"), 60))
        .select(col("l_orderkey").as("o_orderkey")).distinct()
      o.join(late, Seq("o_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // B2c (oracle, round 9): TPC-H Q14 shape — promo revenue share
    // for a month. Brings the `part` dimension into the gated surface:
    // part broadcasts against the shipdate-pruned lineitem window;
    // exact DECIMAL sums, the share is one double multiply+divide of
    // the same exact sums on both engines.
    "q14_promo_share" -> Q { (s, d) =>
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-03-01") &&
          col("l_shipdate") < lit("1997-04-01"))
      val p = Tables.part(s, d).select("p_partkey", "p_type")
      val promoAmt = when(col("p_type") === "PROMO", discPrice)
        .otherwise(lit(0).cast(DecimalType(3, 2)))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(sum(promoAmt.cast(d4)).cast(DoubleType).as("promo_revenue"),
          sum(discPrice.cast(d4)).cast(DoubleType).as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          (lit(100.0) * col("promo_revenue") / col("total_revenue"))
            .as("promo_share"))
    },

    // B5: running spend + order rank per customer — ONE shuffle on
    // o_custkey serves both window functions (same partitioning).
    "q_window_running" -> Q { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("order_dt"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast(DateType).as("order_dt"),
          // windowed sum runs on exact DECIMAL; both output columns are
          // emitted DOUBLE (2-dp prices at decimal scale 4 always carry
          // trailing zeros — the r03 hash-gate poison)
          dec2("o_totalprice").as("price_dec"))
        .withColumn("order_rank", row_number().over(w).cast(LongType))
        .withColumn("running_spend",
          sum(col("price_dec")).over(w).cast(DoubleType))
        .withColumn("price", col("price_dec").cast(DoubleType))
        .drop("price_dec")
        .select(col("o_custkey"), col("o_orderkey"), col("order_dt"),
          col("price"), col("order_rank"), col("running_spend"))
        .orderBy("o_custkey", "order_rank")
    },

    // B6: exact distinct per event_type (ClickHouse uniqExact). The
    // approximate `uniq` twin is q_uniq_approx (hash-gated portable
    // sketch; spec also checks it against this one).
    "q_distinct_users" -> Q { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    },

    // B6b: approximate distinct — the scale path (no exact distinct
    // expansion; one pass, fixed 1 KiB sketch per group). Uses the
    // portable HLL (functions/HllPortable.scala) whose DuckDB twin
    // hash-gates it exactly; `uniq()` CH-compat (GraftExtensions)
    // stays on Spark's HLL++.
    "q_uniq_approx" -> Q { (s, d) =>
      graft.functions.HllPortable.estimate(
        Tables.events(s, d), "event_type", col("user_id"), "n_users_approx")
        .orderBy("event_type")
    },

    // B6c (round 8): the same sketch over a STRING column — exercises
    // the native variable-length hash path (previously spec-only; now
    // the DuckDB oracle rebuilds full XXH64 over the UTF-8 bytes, so
    // the gate hash-compares this path too).
    "q_uniq_approx_str" -> Q { (s, d) =>
      graft.functions.HllPortable.estimate(
        Tables.events(s, d), "event_type", col("props"), "n_props_approx")
        .orderBy("event_type")
    },

    // B6d (round 8): REAGGREGATABILITY of the portable sketch — per-
    // (type, day) register states (the uniqState write path) merged by
    // register max (uniqMerge), then estimated. The oracle is the
    // DIRECT single-pass DuckDB estimate, so a gate pass proves
    // merge-of-partials == direct, bit-exactly — the AggregatingMerge-
    // Tree rollup contract at any grain.
    "uniq_merge_portable" -> Q { (s, d) =>
      import graft.functions.HllPortable
      val ev = Tables.events(s, d)
        .withColumn("day", expr("ts_us div 86400000000"))
      val daily = HllPortable.registers(ev, Seq("event_type", "day"),
        col("user_id"))
      val merged = daily.groupBy("event_type", "_idx")
        .agg(max("_reg").as("_reg"))
      HllPortable.estimateFromRegisters(merged, Seq("event_type"),
          "n_users_approx")
        .orderBy("event_type")
    },

    // B6f (oracle, round 14): SLIDING-WINDOW distinct — per day, the
    // distinct users of the trailing 3 days, by register-max MERGING
    // the daily HLL states instead of re-counting raw rows per window
    // (raw recount reads every row windowDays times at 100 TB; the
    // merge runs over #days × 1 KB of state). Truncated windows at
    // history start are deterministic and oracle-mirrored.
    "q_sliding_hll" -> Q { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("day", expr("ts_us div 86400000000"))
      graft.functions.HllPortable
        .slidingDistinct(ev, "day", col("user_id"), 3, "n_users_3d")
        .orderBy("day")
    },

    // B29b (round 10): MERGEABLE quantile states — the CH quantileState
    // / quantileMerge idiom, quantile twin of uniq_merge_portable. Daily
    // fixed-grid histogram states (≤256 16-byte rows per group-day,
    // regardless of input size) merge by exact per-bucket SUM to the
    // event_type grain, then interpolate p50/p90/p99. The oracle is the
    // DIRECT DuckDB estimate — a pass proves merge-of-partials ==
    // direct bit-exactly (grid merges are order-insensitive; t-digest/
    // KLL merges are not, which is why the portable sketch is a grid).
    "q_quantile_merge_portable" -> Q { (s, d) =>
      import graft.functions.QuantileSketch
      val ev = Tables.events(s, d)
        .withColumn("day", expr("ts_us div 86400000000"))
      val daily = QuantileSketch.state(ev, Seq("event_type", "day"),
        col("value"))
      QuantileSketch.estimateFromState(daily, Seq("event_type"),
          QuantileSketch.gateQs)
        .orderBy("event_type", "q_label")
    },

    // B29c (round 10): the streaming quantile sketch's settled STATE —
    // the (group, bucket, cnt) relation QuantileSketch.state maintains
    // as ONE update-mode streaming aggregation (QuantileSketchSpec
    // proves stream-settles-to-batch; this gates the settled relation
    // itself through the same transform, the cms_stream_relation
    // pattern). Build = merge = one additive groupBy-count — why the
    // stream and the batch coincide; state ≤ #groups×B rows forever.
    "quantile_stream_state" -> Q { (s, d) =>
      import graft.functions.QuantileSketch
      QuantileSketch.state(Tables.events(s, d), Seq("event_type"),
          col("value"))
        .select(col("event_type"), col("_b").as("bucket"),
          col("_cnt").as("cnt"))
        .orderBy("event_type", "bucket")
    },

    // B7: top-3 heavy hitters per event_type. Aggregate first (shuffle
    // of (type,user) pairs), then rank *within groups* — no global sort
    // of raw events.
    "q_topk_events" -> Q { (s, d) =>
      val w = Window.partitionBy("event_type")
        .orderBy(col("cnt").desc, col("user_id"))
      Tables.events(s, d)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 3)
        .orderBy("event_type", "rk")
    },

    // B8: tumbling 1-hour rollup (toStartOfHour). Integer bucket math on
    // ts_us keeps both engines exact; one partial-agg shuffle.
    "q_time_bucket" -> Q { (s, d) =>
      Tables.events(s, d)
        .groupBy(expr("ts_us div 3600000000").as("hour_bucket"))
        .agg(count(lit(1)).as("n_events"),
          // exact decimal sum, double output (r03 hash-gate root cause)
          sum(dec2("value")).cast(DoubleType).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("hour_bucket")
    },

    // B10b (round 7): Z-order clustering key over (user_id, hour) —
    // the file-skipping layout for conjunctive user×time predicates.
    // The gate proves the Morton interleave bit-exactly; the layout
    // win itself (tight per-file min-max boxes) is spec-measured in
    // ZOrderSpec.
    "q_zorder" -> Q { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          graft.operators.ZOrder.zValue(
            col("user_id"), expr("ts_us div 3600000000")).as("z"))
        .orderBy("event_id")
    },

    // B11: semi-structured extraction — the ClickHouse JSONExtract
    // pattern over the events.props JSON payload; get_json_object is
    // codegen'd, so extraction happens inside the scan stage.
    "q_json_extract" -> Q { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"),
          count(col("k")).as("n_with_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    },

    // B12: ASOF join (ClickHouse ASOF JOIN) — each event matched to
    // the user's most recent strictly-earlier purchase. One shuffle.
    "q_asof_join" -> Q { (s, d) =>
      val ev = Tables.events(s, d).select("event_id", "user_id", "ts_us")
      val pur = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts_us")
      graft.operators.AsofJoin
        .leftAsof(ev, pur, "user_id", "ts_us", "ts_us", strict = true)
        .select(col("event_id"), col("asof.ts_us").as("prev_purchase_us"))
        .orderBy("event_id")
    },

    // B72 (round 14): LAST-TOUCH MARKETING ATTRIBUTION — the composite
    // the asof machinery exists for: every purchase credits the user's
    // most recent at-or-before view's channel (JSON-extracted from the
    // view's props), unattributed purchases fall to 'direct', revenue
    // rolls up per channel in exact DECIMAL. One user shuffle (the
    // shared asof window) + one bounded channel agg. Views pre-dedup
    // to one channel per (user, ts) — min(channel) — because BOTH
    // engines' asof semantics are ambiguous on duplicate right
    // timestamps; the rule is deterministic and replayed by the oracle.
    "q_attribution" -> Q { (s, d) =>
      val ev = Tables.events(s, d)
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_us"),
          concat(lit("ch"),
            pmod(get_json_object(col("props"), "$.k").cast("long"), lit(5L))
              .cast("string")).as("channel"))
        .groupBy("user_id", "ts_us").agg(min("channel").as("channel"))
      graft.operators.AsofJoin
        .leftAsof(pur, views, "user_id", "ts_us", "ts_us", strict = false)
        .select(coalesce(col("asof.channel"), lit("direct")).as("channel"),
          col("value"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("channel")
    },

    // B12f (oracle, round 9): ASOF with a TOLERANCE bound (pandas
    // merge_asof tolerance): a prior purchase more than 1 h back does
    // not count — the match nulls, the row survives. Same
    // single-shuffle plan; the oracle composes DuckDB's native ASOF
    // with the same gap filter.
    "q_asof_tolerance" -> Q { (s, d) =>
      val ev = Tables.events(s, d).select("event_id", "user_id", "ts_us")
      val pur = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts_us")
      graft.operators.AsofJoin
        .leftAsofTolerance(ev, pur, "user_id", "ts_us", "ts_us",
          tolerance = 3600000000L, strict = true)
        .select(col("event_id"), col("asof.ts_us").as("prev_purchase_us"))
        .orderBy("event_id")
    },

    // B12b (round 5): the FORWARD direction — earliest purchase
    // at-or-after each event; same single-shuffle scan, time axis
    // reversed. Gated against DuckDB's native ASOF with the
    // inequality flipped.
    "q_asof_fwd" -> Q { (s, d) =>
      val ev = Tables.events(s, d).select("event_id", "user_id", "ts_us")
      val pur = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts_us")
      graft.operators.AsofJoin
        .leftAsof(ev, pur, "user_id", "ts_us", "ts_us", forward = true)
        .select(col("event_id"), col("asof.ts_us").as("next_purchase_us"))
        .orderBy("event_id")
    },

    // B12d (round 8): NEAREST direction (pandas merge_asof nearest) —
    // the closest purchase in either direction, ties to the earlier
    // one. Both carries run as two frames over ONE window sort (single
    // shuffle); the oracle composes DuckDB's backward + forward ASOF.
    "q_asof_nearest" -> Q { (s, d) =>
      val ev = Tables.events(s, d).select("event_id", "user_id", "ts_us")
      val pur = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts_us")
      graft.operators.AsofJoin
        .leftAsofNearest(ev, pur, "user_id", "ts_us", "ts_us")
        .select(col("event_id"), col("asof.ts_us").as("nearest_purchase_us"))
        .orderBy("event_id")
    },

    // B12c (round 7): the TIME-BUCKETED asof plan — identical output
    // to q_asof_join (same oracle), but windows partition by
    // (user_id, hour) with boundary carry-over, so one hot user's
    // history spreads over #hours tasks instead of serializing on one
    // core. This is the plan to ship at 100 TB; the plain variant
    // stays as the small-data/reference form.
    "q_asof_bucketed" -> Q { (s, d) =>
      val ev = Tables.events(s, d).select("event_id", "user_id", "ts_us")
      val pur = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts_us")
      graft.operators.AsofJoin
        .leftAsofBucketed(ev, pur, "user_id", "ts_us", "ts_us",
          t => floor(t / 3600000000L), strict = true)
        .select(col("event_id"), col("asof.ts_us").as("prev_purchase_us"))
        .orderBy("event_id")
    },

    "q_asof_fwd_bucketed" -> Q { (s, d) =>
      val ev = Tables.events(s, d).select("event_id", "user_id", "ts_us")
      val pur = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts_us")
      graft.operators.AsofJoin
        .leftAsofBucketed(ev, pur, "user_id", "ts_us", "ts_us",
          t => floor(t / 3600000000L), forward = true)
        .select(col("event_id"), col("asof.ts_us").as("next_purchase_us"))
        .orderBy("event_id")
    },

    // B9: session windows (30-min gap) per user. lag + cumulative flag
    // sum + final agg all share the user_id partitioning — Catalyst
    // plans a single exchange.
    "q_sessionize" -> Q { (s, d) =>
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
      val gapUs = 30L * 60 * 1000000
      Tables.events(s, d)
        .select("user_id", "ts_us", "event_id")
        .withColumn("new_sess",
          when(col("ts_us") - lag("ts_us", 1).over(byUser) > gapUs, 1)
            .otherwise(0))
        .withColumn("session_idx", sum("new_sess").over(byUser))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          min("ts_us").as("start_us"),
          max("ts_us").as("end_us"))
        .orderBy("user_id", "session_idx")
    }
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_dt, o_orderpriority,
        | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, order_dt, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q14_promo_share" ->
      """WITH l AS (
        | SELECT l_partkey,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |   (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |   AS DECIMAL(18,4)) AS dp
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |   AND l_shipdate < TIMESTAMP '1997-04-01')
        |SELECT
        | CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN dp
        |   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
        | CAST(sum(dp) AS DOUBLE) AS total_revenue,
        | 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN dp
        |   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |  / CAST(sum(dp) AS DOUBLE) AS promo_share
        |FROM l JOIN part p ON p.p_partkey = l.l_partkey""".stripMargin,

    "q4_priority_count" ->
      """WITH o AS (
        | SELECT o_orderkey, o_orderpriority, o_orderdate FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |   AND o_orderdate < TIMESTAMP '1997-04-01')
        |SELECT o_orderpriority, count(*) AS order_count
        |FROM o
        |WHERE EXISTS (
        | SELECT 1 FROM lineitem l
        | WHERE l.l_orderkey = o.o_orderkey
        |   AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_dt,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        | row_number() OVER w AS order_rank,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_rank""".stripMargin,

    "q_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_uniq_approx" -> graft.functions.HllPortable.oracleSql(
      "events", "event_type", "user_id", "n_users_approx"),

    "q_uniq_approx_str" -> graft.functions.HllPortable.oracleSql(
      "events", "event_type", "props", "n_props_approx", stringKernel = true),

    // the DIRECT estimate: equality with the merged-partials Spark
    // plan is exactly the reaggregation-correctness statement
    "uniq_merge_portable" -> graft.functions.HllPortable.oracleSql(
      "events", "event_type", "user_id", "n_users_approx"),

    // B6f: the register-level merge replayed day for day — the oracle
    // rebuilds daily sketches and the trailing-window max-merge, so a
    // hash match proves the sliding composition, not just the sketch
    "q_sliding_hll" -> graft.functions.HllPortable.slidingDistinctSql(
      "events", "epoch_us(ts) // 86400000000", "user_id", 3, "n_users_3d"),

    // direct-build estimate; the Spark side goes through daily partials
    // + merge, so a hash match proves the sketch's reaggregation law
    "q_quantile_merge_portable" -> graft.functions.QuantileSketch.oracleSql(
      "events", "event_type", "value", graft.functions.QuantileSketch.gateQs),

    // the raw state relation (grid bucket counts) — replayed directly
    "quantile_stream_state" ->
      s"""SELECT event_type,
         | CAST(least(greatest(floor(value / ${graft.functions.QuantileSketch.Width}), 0),
         |   ${graft.functions.QuantileSketch.B - 1}) AS BIGINT) AS bucket,
         | count(*) AS cnt
         |FROM events WHERE value IS NOT NULL AND NOT isnan(value)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_topk_events" ->
      """SELECT event_type, user_id, cnt, rk FROM (
        | SELECT event_type, user_id, cnt, row_number() OVER (
        |   PARTITION BY event_type ORDER BY cnt DESC, user_id) AS rk
        | FROM (SELECT event_type, user_id, count(*) AS cnt
        |       FROM events GROUP BY event_type, user_id) g) r
        |WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin,

    "q_time_bucket" ->
      """SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
        | count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY hour_bucket ORDER BY hour_bucket""".stripMargin,

    "q_zorder" ->
      s"""SELECT event_id,
         | ${graft.operators.ZOrder.zValueSql("user_id", "(epoch_us(ts) // 3600000000)")} AS z
         |FROM events ORDER BY event_id""".stripMargin,

    "q_asof_join" ->
      """SELECT l.event_id, epoch_us(r.ts) AS prev_purchase_us
        |FROM events l
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') r
        |ON l.user_id = r.user_id AND l.ts > r.ts
        |ORDER BY l.event_id""".stripMargin,

    // B72: DuckDB's native ASOF with the same dedup rule and the same
    // exact-DECIMAL revenue roll-up.
    "q_attribution" ->
      """WITH pur AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, value FROM events
        | WHERE event_type = 'purchase'),
        |vw AS (
        | SELECT user_id, epoch_us(ts) AS ts_us,
        |  min('ch' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 5
        |      AS VARCHAR)) AS channel
        | FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |att AS (
        | SELECT coalesce(v.channel, 'direct') AS channel, p.value
        | FROM pur p ASOF LEFT JOIN vw v
        | ON p.user_id = v.user_id AND p.ts_us >= v.ts_us)
        |SELECT channel, count(*) AS n_purchases,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM att GROUP BY 1 ORDER BY channel""".stripMargin,

    "q_asof_tolerance" ->
      """SELECT l.event_id,
        | CASE WHEN epoch_us(l.ts) - epoch_us(r.ts) <= 3600000000
        |  THEN epoch_us(r.ts) END AS prev_purchase_us
        |FROM events l
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') r
        |ON l.user_id = r.user_id AND l.ts > r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q_asof_fwd" ->
      """SELECT l.event_id, epoch_us(r.ts) AS next_purchase_us
        |FROM events l
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') r
        |ON l.user_id = r.user_id AND l.ts <= r.ts
        |ORDER BY l.event_id""".stripMargin,

    // nearest = closer of the backward and forward matches, ties to
    // the earlier (backward) side — composed from two native ASOFs
    "q_asof_nearest" ->
      """WITH pur AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |b AS (
        | SELECT l.event_id, epoch_us(l.ts) AS lts, epoch_us(r.ts) AS bts
        | FROM events l
        | ASOF LEFT JOIN pur r ON l.user_id = r.user_id AND l.ts >= r.ts
        |), f AS (
        | SELECT l.event_id, epoch_us(r.ts) AS fts
        | FROM events l
        | ASOF LEFT JOIN pur r ON l.user_id = r.user_id AND l.ts <= r.ts
        |)
        |SELECT b.event_id, CASE
        |  WHEN fts IS NULL THEN bts
        |  WHEN bts IS NULL THEN fts
        |  WHEN (lts - bts) <= (fts - lts) THEN bts ELSE fts
        | END AS nearest_purchase_us
        |FROM b JOIN f USING (event_id) ORDER BY b.event_id""".stripMargin,

    // same semantics as the plain variants — the bucketed plan must be
    // output-identical, so it faces the identical oracle
    "q_asof_bucketed" ->
      """SELECT l.event_id, epoch_us(r.ts) AS prev_purchase_us
        |FROM events l
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') r
        |ON l.user_id = r.user_id AND l.ts > r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q_asof_fwd_bucketed" ->
      """SELECT l.event_id, epoch_us(r.ts) AS next_purchase_us
        |FROM events l
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') r
        |ON l.user_id = r.user_id AND l.ts <= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type,
        | CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | count(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
        | max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_sessionize" ->
      """WITH flagged AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |       THEN 1 ELSE 0 END AS new_sess
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), sess AS (
        | SELECT user_id, ts_us, event_id,
        |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS session_idx
        | FROM flagged)
        |SELECT user_id, session_idx, count(*) AS n_events,
        | min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin
  )
}
