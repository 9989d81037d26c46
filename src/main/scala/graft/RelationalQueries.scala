package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-4 widening of the relational/OLAP surface (SURVEY.md §2.B):
  * semi/anti joins (IN / NOT EXISTS), CUBE grouping sets, moving-average
  * window frames, moment statistics, histograms, arrayJoin (explode),
  * and set operators — the remaining ClickHouse query shapes a user of
  * the migrated warehouse reaches for daily.
  *
  * Determinism contract (hash gate): decimal arithmetic internally,
  * BIGINT / DOUBLE / DATE / STRING outputs only; any double formula is
  * written as the IDENTICAL expression tree on both engines so IEEE
  * evaluation is bit-equal.
  */
object RelationalQueries {

  private def Q(f: (SparkSession, String) => DataFrame) = f

  private val d2 = DecimalType(18, 2)
  private val d4 = DecimalType(18, 4)
  private def dec2(c: String): Column = col(c).cast(d2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // B21: semi/anti join — per-nation customers with ≥1 order (LeftSemi)
    // vs none (LeftAnti). Both plan as existence joins: the orders side
    // is reduced to its join key before the shuffle, and no row ever
    // multiplies (the 100 TB-safe way to answer IN / NOT EXISTS — never
    // a join + distinct).
    "q_semi_anti" -> Q { (s, d) =>
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val ord = Tables.orders(s, d).select("o_custkey")
      val nations = cust.select("c_nationkey").distinct()
      val withOrd = cust
        .join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_with"))
      val withoutOrd = cust
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_without"))
      nations
        .join(withOrd, Seq("c_nationkey"), "left")
        .join(withoutOrd, Seq("c_nationkey"), "left")
        .select(col("c_nationkey").cast(LongType).as("nationkey"),
          coalesce(col("n_with"), lit(0L)).as("n_with"),
          coalesce(col("n_without"), lit(0L)).as("n_without"))
        .orderBy("nationkey")
    },

    // B22: GROUPING SETS via CUBE — revenue at every (returnflag,
    // linestatus) granularity in ONE aggregation: Expand feeds all four
    // grouping levels through a single partial-agg shuffle (vs 4 scans
    // for 4 GROUP BYs).
    "q_grouping_sets" -> Q { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(dec2("l_extendedprice")).cast(DoubleType).as("sum_price"),
          (grouping(col("l_returnflag")) * 2 +
            grouping(col("l_linestatus"))).cast(LongType).as("g"))
        .select(
          when(col("g") === 2 || col("g") === 3, lit("ALL"))
            .otherwise(col("l_returnflag")).as("returnflag"),
          when(col("g") === 1 || col("g") === 3, lit("ALL"))
            .otherwise(col("l_linestatus")).as("linestatus"),
          col("n_rows"), col("sum_price"), col("g"))
        .orderBy("g", "returnflag", "linestatus")
    },

    // B23: 7-day moving average over the DAILY revenue series — window
    // frame (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW). The global
    // (un-partitioned) window runs over POST-AGGREGATION rows — one row
    // per day, thousands of rows at ANY input scale — so the single-
    // partition sort is safe at 100 TB; the heavy lifting happened in
    // the partial-agg shuffle before it.
    "q_moving_avg" -> Q { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast(DateType).as("day"))
        .agg(sum(dec2("o_totalprice")).as("rev_dec"),
          count(lit(1)).as("n_orders"))
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      daily.select(
        col("day"), col("n_orders"),
        col("rev_dec").cast(DoubleType).as("revenue"),
        // exact decimal sum over the frame, ONE double division at the
        // end — identical tree in the oracle SQL
        (sum(col("rev_dec")).over(w).cast(DoubleType) /
          count(lit(1)).over(w).cast(DoubleType)).as("ma7"))
        .orderBy("day")
    },

    // B74 (round 14): the navigation/distribution window-function
    // suite — lag/lead/row_number/ntile/percent_rank/cume_dist, the
    // bread-and-butter OLAP windows a migrated warehouse user reaches
    // for daily, pinned for cross-engine parity in one gate. The
    // partition key is the HIGH-cardinality o_custkey (the scale
    // story: per-key ordering work is bounded by orders-per-customer,
    // never a global or low-cardinality sort; a priority-partitioned
    // window would serialize 1/5 of the table per task). Prices ride
    // as exact cents; percent_rank/cume_dist are single divides, and
    // both engines define the 1-row partition as pr=0, cd=1.
    "q_window_suite" -> Q { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
          .as("price_c"),
        col("o_orderdate"))
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(col("o_orderkey"), col("o_custkey"),
        lag("price_c", 1).over(w).as("prev_price"),
        lead("price_c", 1).over(w).as("next_price"),
        row_number().over(w).cast(LongType).as("rn"),
        ntile(4).over(w).cast(LongType).as("tile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
        .orderBy("o_orderkey")
    },

    // B24: moment statistics (CH varSamp/stddevSamp) from EXACT decimal
    // power sums — never a streaming-variance double reduction, whose
    // result depends on partitioning. n, Σx, Σx² are exact; the variance
    // formula is one fixed double expression tree evaluated identically
    // on both engines (and identically on a 1-node or 1000-node
    // cluster — order-independence is the scale story here too).
    "q_stat_aggs" -> Q { (s, d) =>
      val base = Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec2("value")).as("sx"),
          sum((dec2("value") * dec2("value")).cast(d4)).as("sxx"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"))
      val nD = col("n").cast(DoubleType)
      val sxD = col("sx").cast(DoubleType)
      val sxxD = col("sxx").cast(DoubleType)
      val varS = (nD * sxxD - sxD * sxD) / (nD * (nD - lit(1.0)))
      base.select(col("event_type"), col("n"),
        (sxD / nD).as("mean"),
        varS.as("var_samp"),
        sqrt(varS).as("stddev_samp"),
        col("min_v"), col("max_v"))
        .orderBy("event_type")
    },

    // B25: fixed-width histogram of event values (CH histogram-style
    // rollup): bucket = min(floor(value/50), 9). Pure column math into
    // one partial-agg shuffle of ≤10 groups.
    "q_histogram" -> Q { (s, d) =>
      Tables.events(s, d)
        .groupBy(least(floor(col("value") / 50.0), lit(9L))
          .cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"))
        .orderBy("bucket")
    },

    // B26: arrayJoin (CH) ≡ explode — token frequency table. Generate
    // executor-side (explode never touches the driver), aggregate the
    // (token) key; top-100 by a deterministic total order. The explode
    // fan-out stays inside the scan stage; only (token, partial count)
    // pairs cross the shuffle.
    "q_array_join" -> Q { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(100)
    },

    // B27: set operators — INTERSECT (purchased AND clicked) and EXCEPT
    // (viewed but never purchased), tagged and unioned. Spark plans both
    // as existence aggregations on the hashed key — no row blowup.
    "q_set_ops" -> Q { (s, d) =>
      val ev = Tables.events(s, d)
      def ids(t: String): DataFrame =
        ev.filter(col("event_type") === t).select("user_id")
      val both = ids("purchase").intersect(ids("click"))
        .select(lit("purchase_and_click").as("grp"), col("user_id"))
      val viewOnly = ids("view").except(ids("purchase"))
        .select(lit("view_no_purchase").as("grp"), col("user_id"))
      both.unionByName(viewOnly).orderBy("grp", "user_id")
    },

    // B30: FULL OUTER join — per-hour click vs purchase counts, hours
    // where either side is absent surviving with zeroed counts. Both
    // sides are pre-aggregated before the join: the outer join shuffles
    // one row per (hour, side), never raw events.
    "q_outer_join" -> Q { (s, d) =>
      def hourly(t: String) = Tables.events(s, d)
        .filter(col("event_type") === t)
        .groupBy(expr("ts_us div 3600000000").as("hour_bucket"))
        .agg(count(lit(1)).as(s"n_$t"))
      hourly("click").join(hourly("purchase"), Seq("hour_bucket"), "full_outer")
        .select(col("hour_bucket"),
          coalesce(col("n_click"), lit(0L)).as("n_click"),
          coalesce(col("n_purchase"), lit(0L)).as("n_purchase"))
        .orderBy("hour_bucket")
    },

    // B29: exact quantiles (CH quantileExact / medianExact) — gated IF
    // Spark's Percentile and DuckDB's quantile_cont share the linear
    // interpolation tree bit-for-bit (empirically verified by this
    // query's hash match; both compute lower + (upper-lower)*frac on
    // exact doubles).
    "q_quantiles" -> Q { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"),
          expr("percentile(value, 0.99)").as("p99"))
        .orderBy("event_type")
    },

    // B29 (oracle, round 9): robust outlier detection via median
    // absolute deviation — the observability classic (3×MAD fences
    // survive the outliers that wreck mean/stddev fences). Two
    // grouped percentile passes (the parity q_quantiles proved) with
    // the tiny per-group stats broadcast back between them; the fence
    // comparison is a decision over a >3× gap, robust to transport.
    "q_anomaly_mad" -> Q { (s, d) =>
      val e = Tables.events(s, d).select("event_type", "value")
      val med = e.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val stats = dev.groupBy("event_type")
        .agg(min("med").as("med"),
          expr("percentile(adev, 0.5)").as("mad"))
      dev.select("event_type", "adev")
        .join(broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(min("med").as("med"), min("mad").as("mad"),
          count(lit(1)).as("n"),
          sum(when(col("adev") > col("mad") * 3.0, 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy("event_type")
    },

    // B28: the salted join, gated for CORRECTNESS against the plain
    // join's oracle — salting must preserve exact join multiplicity
    // (the failure mode of a buggy salt is silent row loss or dup).
    // Shape: events (big, skewed on user_id) x per-user dim; hot users
    // fan out over 8 salt buckets. The oracle knows nothing of salts.
    "q_salted_join" -> Q { (s, d) =>
      val ev = Tables.events(s, d).select("user_id", "event_type")
      val dim = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("u_events"))
      graft.operators.SkewTools.saltedJoin(ev, dim, "user_id", salts = 8)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("u_events")).as("sum_u"))
        .orderBy("event_type")
    },

    // B79 (round 14): ordered group concatenation — ClickHouse
    // groupUniqArray + arrayStringConcat (and ANSI string_agg): the
    // canonical "list the categories per group" rollup. Deterministic
    // ONLY because the set is sorted before joining (an unordered
    // string_agg is partitioning-dependent — the trap this gate
    // pins). Both collected sets are bounded relations (≤ #statuses,
    // ≤ #months), so collect_set survives any corpus size; the count
    // rides the same partial-agg pass.
    "q_group_concat" -> Q { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          array_join(array_sort(collect_set(col("l_linestatus"))), ",")
            .as("statuses"),
          array_join(array_sort(collect_set(
            date_format(col("l_shipdate"), "yyyy-MM"))), ",")
            .as("ship_months"),
          countDistinct(col("l_linestatus")).as("n_status"))
        .orderBy("l_returnflag")
    },

    // B78 (round 14): data-quality audit — the deequ/dbt-test niche
    // as one gate: referential integrity (anti joins — never
    // join+distinct), domain ranges, key uniqueness, null checks, and
    // the order-total CONSISTENCY rule (o_totalprice vs the lineitem
    // roll-up Σ ext·(1−disc)·(1+tax), which this fixture violates —
    // an audit that can't fire proves nothing). All decimal
    // arithmetic at widths where BOTH engines keep exact products:
    // (12,2)·(4,2)·(4,2) → scale-6 exact, far from Spark's 38-digit
    // rounding cliff (the envelope discipline). Each rule is one
    // bounded 1-row aggregate; the union is 6 rows.
    "q_dq_audit" -> Q { (s, d) =>
      val orders = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val cust = Tables.customer(s, d)
      def rule(id: Long, name: String, viol: DataFrame,
               checked: DataFrame): DataFrame =
        viol.agg(count(lit(1)).as("violations"))
          .crossJoin(checked.agg(count(lit(1)).as("checked")))
          .select(lit(id).as("rule_id"), lit(name).as("rule"),
            col("violations"), col("checked"))
      val r1 = rule(1L, "ref_orders_customer",
        orders.join(cust, orders("o_custkey") === cust("c_custkey"),
          "left_anti"), orders)
      val r2 = rule(2L, "ref_lineitem_orders",
        li.join(orders, li("l_orderkey") === orders("o_orderkey"),
          "left_anti"), li)
      val r3 = rule(3L, "range_quantity",
        li.where(col("l_quantity") <= 0 || col("l_quantity") > 50), li)
      val r4 = rule(4L, "unique_lineitem_key",
        li.groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(count(lit(1)).as("n")).where(col("n") > 1), li)
      val r5 = rule(5L, "null_custkey",
        orders.where(col("o_custkey").isNull), orders)
      val sums = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
          (lit(BigDecimal(1).setScale(2)) -
            col("l_discount").cast(DecimalType(4, 2))) *
          (lit(BigDecimal(1).setScale(2)) +
            col("l_tax").cast(DecimalType(4, 2)))).as("t"))
      val r6 = rule(6L, "consistency_totalprice",
        orders.join(sums, orders("o_orderkey") === sums("l_orderkey"))
          .where(abs(col("o_totalprice").cast(DecimalType(12, 2)) -
            col("t")) > lit(BigDecimal("0.01"))), orders)
      r1.union(r2).union(r3).union(r4).union(r5).union(r6)
        .orderBy("rule_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "q_dq_audit" ->
      """WITH r1 AS (
        | SELECT 1 AS rule_id, 'ref_orders_customer' AS rule,
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |   AS violations,
        |  (SELECT count(*) FROM orders) AS checked),
        |r2 AS (
        | SELECT 2, 'ref_lineitem_orders',
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |  (SELECT count(*) FROM lineitem)),
        |r3 AS (
        | SELECT 3, 'range_quantity',
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_quantity <= 0 OR l_quantity > 50),
        |  (SELECT count(*) FROM lineitem)),
        |r4 AS (
        | SELECT 4, 'unique_lineitem_key',
        |  (SELECT count(*) FROM (
        |    SELECT l_orderkey, l_linenumber FROM lineitem
        |    GROUP BY 1, 2 HAVING count(*) > 1)),
        |  (SELECT count(*) FROM lineitem)),
        |r5 AS (
        | SELECT 5, 'null_custkey',
        |  (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
        |  (SELECT count(*) FROM orders)),
        |sums AS (
        | SELECT l_orderkey,
        |  sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (CAST(1.00 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
        |      (CAST(1.00 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS t
        | FROM lineitem GROUP BY 1),
        |r6 AS (
        | SELECT 6, 'consistency_totalprice',
        |  (SELECT count(*) FROM orders o JOIN sums s
        |    ON o.o_orderkey = s.l_orderkey
        |   WHERE abs(CAST(o.o_totalprice AS DECIMAL(12,2)) - s.t)
        |     > CAST(0.01 AS DECIMAL(4,2))),
        |  (SELECT count(*) FROM orders)),
        |u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
        | UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
        | UNION ALL SELECT * FROM r5 UNION ALL SELECT * FROM r6)
        |SELECT CAST(rule_id AS BIGINT) AS rule_id, rule,
        | CAST(violations AS BIGINT) AS violations,
        | CAST(checked AS BIGINT) AS checked
        |FROM u ORDER BY rule_id""".stripMargin,

    "q_semi_anti" ->
      """WITH nations AS (SELECT DISTINCT c_nationkey FROM customer),
        |w AS (
        | SELECT c_nationkey, count(*) AS n_with FROM customer
        | WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        | GROUP BY c_nationkey),
        |wo AS (
        | SELECT c_nationkey, count(*) AS n_without FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        | GROUP BY c_nationkey)
        |SELECT CAST(n.c_nationkey AS BIGINT) AS nationkey,
        | CAST(coalesce(w.n_with, 0) AS BIGINT) AS n_with,
        | CAST(coalesce(wo.n_without, 0) AS BIGINT) AS n_without
        |FROM nations n
        |LEFT JOIN w ON n.c_nationkey = w.c_nationkey
        |LEFT JOIN wo ON n.c_nationkey = wo.c_nationkey
        |ORDER BY nationkey""".stripMargin,

    "q_grouping_sets" ->
      """SELECT
        | CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
        | CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
        | count(*) AS n_rows,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS g
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g, returnflag, linestatus""".stripMargin,

    "q_moving_avg" ->
      """WITH daily AS (
        | SELECT CAST(o_orderdate AS DATE) AS day,
        |  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec,
        |  count(*) AS n_orders
        | FROM orders GROUP BY day)
        |SELECT day, n_orders,
        | CAST(rev_dec AS DOUBLE) AS revenue,
        | CAST(sum(rev_dec) OVER w AS DOUBLE)
        |   / CAST(count(*) OVER w AS DOUBLE) AS ma7
        |FROM daily
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,

    "q_stat_aggs" ->
      """WITH base AS (
        | SELECT event_type, count(*) AS n,
        |  sum(CAST(value AS DECIMAL(18,2))) AS sx,
        |  sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
        |      AS DECIMAL(18,4))) AS sxx,
        |  min(value) AS min_v, max(value) AS max_v
        | FROM events GROUP BY event_type)
        |SELECT event_type, n,
        | CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        | (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_samp,
        | sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_samp,
        | min_v, max_v
        |FROM base ORDER BY event_type""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(least(floor(value / 50.0), 9) AS BIGINT) AS bucket,
        | count(*) AS n, min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_array_join" ->
      """SELECT token, count(*) AS cnt FROM (
        | SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        | FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token
        |ORDER BY cnt DESC, token
        |LIMIT 100""".stripMargin,

    "q_outer_join" ->
      """WITH c AS (
        | SELECT epoch_us(ts) // 3600000000 AS hour_bucket, count(*) AS n_click
        | FROM events WHERE event_type = 'click' GROUP BY hour_bucket),
        |p AS (
        | SELECT epoch_us(ts) // 3600000000 AS hour_bucket, count(*) AS n_purchase
        | FROM events WHERE event_type = 'purchase' GROUP BY hour_bucket)
        |SELECT coalesce(c.hour_bucket, p.hour_bucket) AS hour_bucket,
        | CAST(coalesce(n_click, 0) AS BIGINT) AS n_click,
        | CAST(coalesce(n_purchase, 0) AS BIGINT) AS n_purchase
        |FROM c FULL OUTER JOIN p ON c.hour_bucket = p.hour_bucket
        |ORDER BY hour_bucket""".stripMargin,

    "q_quantiles" ->
      """SELECT event_type,
        | quantile_cont(value, 0.5) AS p50,
        | quantile_cont(value, 0.9) AS p90,
        | quantile_cont(value, 0.99) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_anomaly_mad" ->
      """WITH med AS (
        | SELECT event_type, quantile_cont(value, 0.5) AS med
        | FROM events GROUP BY 1
        |), dev AS (
        | SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
        | FROM events e JOIN med m USING (event_type)
        |), stats AS (
        | SELECT event_type, min(med) AS med,
        |  quantile_cont(adev, 0.5) AS mad
        | FROM dev GROUP BY 1)
        |SELECT d.event_type, min(s.med) AS med, min(s.mad) AS mad,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CASE WHEN d.adev > s.mad * 3.0 THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_outliers
        |FROM dev d JOIN stats s USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    "q_salted_join" ->
      """WITH dim AS (
        | SELECT user_id, count(*) AS u_events FROM events GROUP BY user_id)
        |SELECT event_type, count(*) AS n,
        | CAST(sum(u_events) AS BIGINT) AS sum_u
        |FROM events JOIN dim USING (user_id)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // B74: identical window definition; ntile/percent_rank/cume_dist
    // are SQL-standard on both engines (1-row partition: pr=0, cd=1,
    // verified); the (o_orderdate, o_orderkey) order is total, so
    // every navigation value is deterministic
    "q_window_suite" ->
      """SELECT o_orderkey, o_custkey,
        | lag(price_c) OVER w AS prev_price,
        | lead(price_c) OVER w AS next_price,
        | CAST(row_number() OVER w AS BIGINT) AS rn,
        | CAST(ntile(4) OVER w AS BIGINT) AS tile,
        | percent_rank() OVER w AS pr,
        | cume_dist() OVER w AS cd
        |FROM (
        | SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |   AS price_c,
        |  o_orderdate
        | FROM orders) t
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_set_ops" ->
      """SELECT 'purchase_and_click' AS grp, user_id FROM (
        | SELECT user_id FROM events WHERE event_type = 'purchase'
        | INTERSECT
        | SELECT user_id FROM events WHERE event_type = 'click')
        |UNION ALL
        |SELECT 'view_no_purchase' AS grp, user_id FROM (
        | SELECT user_id FROM events WHERE event_type = 'view'
        | EXCEPT
        | SELECT user_id FROM events WHERE event_type = 'purchase')
        |ORDER BY grp, user_id""".stripMargin,

    // B79: sorted-distinct concatenation via list ops (DuckDB's
    // string_agg ordering guarantees are looser; the sorted list is
    // the deterministic common form). Timestamp months format the
    // same under the UTC session timezone.
    "q_group_concat" ->
      """SELECT l_returnflag,
        | array_to_string(list_sort(list_distinct(list(l_linestatus))),
        |   ',') AS statuses,
        | array_to_string(list_sort(list_distinct(
        |   list(strftime(l_shipdate, '%Y-%m')))), ',') AS ship_months,
        | CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_status
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
