package graft

import org.apache.spark.sql.functions._

class OlapQueriesSpec extends SparkFunSuite {

  test("every B-group query runs and returns rows at sf0.001") {
    OlapQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("portable hll hash kernel: xxhash64(long) matches reference constants") {
    // Constants from an independent python XXH64 (8-byte LE, seed 42);
    // the DuckDB oracle kernel (DedupOracles.xxh64LongCtes) was
    // validated against the same reference, so this test pins all
    // three implementations together.
    import spark.implicits._
    val got = Seq(0L, 42L, -1L, 123456789L).toDF("x")
      .select(xxhash64(col("x"))).as[Long].collect().toSeq
    assert(got == Seq(-5252525462095825812L, -6876166290308861218L,
      3858142552250413010L, 3415128141240069951L))
  }

  test("q_uniq_approx is within 5% of exact distinct per event_type") {
    val exact = OlapQueries.queries("q_distinct_users")(spark, sf)
      .select("event_type", "n_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = OlapQueries.queries("q_uniq_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.05,
        s"$k: approx $ap vs exact $ex")
    }
  }

  test("q_topk_events returns exactly 3 users per event_type, rank-ordered") {
    val rows = OlapQueries.queries("q_topk_events")(spark, sf).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      assert(rs.length == 3, s"$t has ${rs.length} rows")
      assert(rs.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
      // counts non-increasing with rank
      val cnts = rs.sortBy(_.getLong(3)).map(_.getLong(2)).toSeq
      assert(cnts == cnts.sorted.reverse)
    }
  }

  test("q_sessionize: session bounds are consistent and gaps respected") {
    val df = OlapQueries.queries("q_sessionize")(spark, sf)
    // every session: start <= end; sessions of one user don't overlap
    val bad = df.filter(col("start_us") > col("end_us")).count()
    assert(bad == 0)
    val perUser = df.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val total = perUser.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("q5_region_revenue broadcasts the dimension tables") {
    val plan = OlapQueries.queries("q5_region_revenue")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins")
  }
}
