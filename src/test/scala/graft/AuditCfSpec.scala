package graft

import org.apache.spark.sql.functions._

/** Driver-side replicas for the round-14 composite gates:
  * q_item_cooccur (CF lift), q_ab_sample_size (two-proportion n),
  * q_dq_audit (rule table) — each recomputed in plain Scala from the
  * sf0.001 fixture and compared row-for-row.
  */
class AuditCfSpec extends SparkFunSuite {

  test("q_item_cooccur matches a plain-Scala pair count + lift") {
    val out = AnalyticsQueries.queries("q_item_cooccur")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("co"), r.getAs[Long]("lift_ppm"),
          r.getAs[Long]("rk"))).toMap
    val pres = Tables.events(spark, sf)
      .where(col("event_type") === "click")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val byUser = pres.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
      .filter(_._2.size <= 256)
    val nUsers = byUser.size.toLong
    val cnt = byUser.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val co = byUser.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = co.groupBy(_._1.head).flatMap { case (a, pairs) =>
      pairs.toSeq
        .map { case (p, c) => (p(1), c) }
        .sortBy { case (b, c) => (-c, b) }
        .take(3).zipWithIndex
        .map { case ((b, c), i) =>
          val lift = ((c * 1000000L) / cnt(a)) * nUsers / cnt(b)
          (a, b) -> (c, lift, (i + 1).toLong)
        }
    }
    assert(out == expected, s"${out.size} vs ${expected.size} rows")
  }

  test("q_ab_sample_size matches the scala two-proportion formula") {
    val za = 1.9599639845400545
    val zb = 0.8416212335729143
    val mde = 0.015625
    val rows = AnalyticsQueries.queries("q_ab_sample_size")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p1 = r.getAs[Long]("converters").toDouble /
        r.getAs[Long]("viewers").toDouble
      assert(r.getAs[Double]("p1") == p1)
      val p2 = p1 + mde
      val n = math.ceil(((za + zb) * (za + zb) *
        (p1 * (1.0 - p1) + p2 * (1.0 - p2))) / (mde * mde)).toLong
      assert(r.getAs[Long]("n_required") == n, s"day ${r.getLong(0)}")
    }
  }

  test("q_dq_audit: clean rules report zero, consistency fires, checked counts") {
    val rows = RelationalQueries.queries("q_dq_audit")(spark, sf)
      .collect().map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("violations"), r.getAs[Long]("checked"))).toMap
    val nOrders = Tables.orders(spark, sf).count()
    val nLi = Tables.lineitem(spark, sf).count()
    assert(rows("ref_orders_customer") == ((0L, nOrders)))
    assert(rows("ref_lineitem_orders") == ((0L, nLi)))
    assert(rows("range_quantity") == ((0L, nLi)))
    // the fixture's lineitem does NOT have a unique (orderkey,
    // linenumber) key — the audit catches that too; pin the count
    // against an independent duplicate-group count
    val dupGroups = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("n")).where(col("n") > 1).count()
    assert(dupGroups > 0, "fixture expected to carry duplicate keys")
    assert(rows("unique_lineitem_key") == ((dupGroups, nLi)))
    assert(rows("null_custkey") == ((0L, nOrders)))
    // the fixture violates the TPC-H total identity — the audit must
    // see it (an audit that can't fire proves nothing)
    val (viol, checked) = rows("consistency_totalprice")
    assert(viol > 0 && checked == nOrders, s"viol $viol of $checked")
  }
}
