package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.SessionizeStream

class SessionizeStreamSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(min: Int) =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("session_window groups events by 30-min gaps per user") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val sq = SessionizeStream.sessionWindows(
        stream.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("sessions_builtin")
      .outputMode("complete").start()
    try {
      // user 1: events at 0,10,20 (one session), then 60 (new session)
      stream.addData(Seq((ts(0), 1L), (ts(10), 1L), (ts(20), 1L), (ts(60), 1L)))
      sq.processAllAvailable()
      val rows = spark.table("sessions_builtin")
        .orderBy("user_id", "start_us").collect()
      assert(rows.length == 2)
      assert(rows(0).getLong(3) == 3L) // first session: 3 events
      assert(rows(1).getLong(3) == 1L)
    } finally sq.stop()
  }

  test("flatMapGroupsWithState closes sessions at the gap and on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val sq = SessionizeStream.sessionizeWithState(spark,
        stream.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("sessions_state")
      .outputMode("append").start()
    try {
      // session A: user 1 at minutes 0,10; session B opens at minute 60
      stream.addData(Seq((ts(0), 1L), (ts(10), 1L)))
      sq.processAllAvailable()
      stream.addData(Seq((ts(60), 1L)))
      sq.processAllAvailable()
      // drive the watermark far forward so session B times out too
      stream.addData(Seq((ts(300), 2L)))
      sq.processAllAvailable()
      stream.addData(Seq((ts(400), 2L)))
      sq.processAllAvailable()

      val rows = spark.table("sessions_state")
        .orderBy("user_id", "start_us").collect()
        .map(r => (r.getLong(0), r.getLong(3)))
      // user 1: session of 2 events (closed by the minute-60 event),
      // then the singleton session closed by event-time timeout
      assert(rows.contains((1L, 2L)), s"got ${rows.mkString(",")}")
      assert(rows.contains((1L, 1L)), s"got ${rows.mkString(",")}")
    } finally sq.stop()
  }
}

class ClickHouseCompatSpec extends SparkFunSuite {

  test("ClickHouse-style SQL runs verbatim through spark.sql") {
    GraftCatalog.registerTables(spark, sf)
    val df = spark.sql(
      """SELECT toStartOfHour(toDateTime(ts_us / 1000000)) AS h,
        |       uniqExact(user_id) AS exact_u,
        |       uniq(user_id) AS approx_u,
        |       toUInt32(-1) AS wrapped
        |FROM events GROUP BY h ORDER BY h LIMIT 5""".stripMargin).collect()
    assert(df.length == 5)
    assert(df.forall(_.getLong(3) == 4294967295L))
    df.foreach { r =>
      val exact = r.getLong(1).toDouble
      assert(math.abs(r.getLong(2) - exact) / exact < 0.1)
    }
  }

  test("argMax/countIf/sumIf/avgIf/quantile combinators") {
    GraftCatalog.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT argMax(event_type, value) AS top_type,
        |       countIf(value > 5.0) AS n_big,
        |       sumIf(value, event_type = 'click') AS click_sum,
        |       avgIf(value, event_type = 'click') AS click_avg,
        |       quantile(value, 0.5) AS med
        |FROM events""".stripMargin).collect()(0)
    val want = Tables.events(spark, sf).selectExpr(
      "max_by(event_type, value)",
      "count(CASE WHEN value > 5.0 THEN 1 END)",
      "sum(CASE WHEN event_type = 'click' THEN value END)",
      "avg(CASE WHEN event_type = 'click' THEN value END)").collect()(0)
    assert(r.getString(0) == want.getString(0))
    assert(r.getLong(1) == want.getLong(1))
    assert(math.abs(r.getDouble(2) - want.getDouble(2)) < 1e-9)
    assert(math.abs(r.getDouble(3) - want.getDouble(3)) < 1e-9)
    assert(r.getDouble(4) > 0)
  }

  test("JSONExtract* and quantileExact") {
    GraftCatalog.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT JSONExtractInt(props, 'k') AS k,
        |       JSONExtractString(props, 'k') AS ks,
        |       JSONExtractFloat(props, 'k') AS kf
        |FROM events WHERE event_id = 0""".stripMargin).collect()(0)
    val want = Tables.events(spark, sf).filter(col("event_id") === 0)
      .selectExpr("CAST(get_json_object(props, '$.k') AS BIGINT)")
      .collect()(0).getLong(0)
    assert(r.getLong(0) == want)
    assert(r.getString(1) == want.toString)
    assert(r.getDouble(2) == want.toDouble)
    val q = spark.sql(
      "SELECT quantileExact(value, 0.5) AS med, quantile(value, 0.5) AS amed FROM events")
      .collect()(0)
    assert(math.abs(q.getDouble(0) - q.getDouble(1)) < q.getDouble(0) * 0.1)
  }

  test("arrayJoin/has/empty/notEmpty/lengthUTF8/toYYYYMM") {
    GraftCatalog.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT arrayJoin(array(1, 2, 3)) AS x,
        |       has(array('a','b'), 'b') AS hb,
        |       empty('') AS e, notEmpty('x') AS ne,
        |       lengthUTF8('héllo') AS lu,
        |       toYYYYMM(TIMESTAMP '2024-07-25 12:00:00') AS ym""".stripMargin)
      .collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(r(0).getBoolean(1) && r(0).getBoolean(2) && r(0).getBoolean(3))
    assert(r(0).getInt(4) == 5) // chars, not bytes
    assert(r(0).getInt(5) == 202407)
  }

  test("topK sketch returns the true heavy hitters on skewed data") {
    GraftCatalog.registerTables(spark, sf)
    val sketch = spark.sql(
      "SELECT topK(event_type, 3) AS t FROM events").collect()(0)
      .getAs[Seq[org.apache.spark.sql.Row]](0).map(_.getString(0)).toSet
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").count()
      .orderBy(col("count").desc).limit(3)
      .collect().map(_.getString(0)).toSet
    assert(sketch == exact)
  }

  test("groupArray/groupUniqArray/any/anyLast") {
    GraftCatalog.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT event_type,
        |       size(groupArray(event_id)) AS n_all,
        |       size(groupUniqArray(user_id)) AS n_uniq,
        |       any(event_id) AS first_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect()
    val want = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).cast("int").as("n"),
        countDistinct(col("user_id")).cast("int").as("u"))
      .orderBy("event_type").collect()
    r.zip(want).foreach { case (got, w) =>
      assert(got.getInt(1) == w.getInt(1) && got.getInt(2) == w.getInt(2))
    }
  }

  test("uniqExact equals count distinct; toDate/toInt casts behave") {
    GraftCatalog.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT uniqExact(o_custkey) AS u,
        |       toDate(min(o_orderdate)) AS d0,
        |       toInt64(max(o_orderkey)) AS mx
        |FROM orders""".stripMargin).collect()(0)
    val want = Tables.orders(spark, sf)
      .selectExpr("count(DISTINCT o_custkey)").collect()(0).getLong(0)
    assert(r.getLong(0) == want)
  }
}
