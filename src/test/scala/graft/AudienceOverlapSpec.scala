package graft

import org.apache.spark.sql.functions._
import graft.functions.HllPortable

/** Bounds the sketch-based audience overlap (q_audience_overlap_sketch)
  * against the exact collect_set query it replaces at scale. HLL at
  * m=1024 has standard error 1.04/√1024 ≈ 3.3% per cardinality;
  * inclusion-exclusion sums three estimates, so the overlap can be off
  * by ~3σ of the UNION in the worst case — the spec pins that envelope
  * (and the per-audience estimates tighter), which is the documented
  * contract: sketch for 100M-user audiences, exact for small ones.
  */
class AudienceOverlapSpec extends SparkFunSuite {

  test("per-audience and overlap estimates stay inside the HLL error envelope") {
    val events = Tables.events(spark, sf)
    val est = HllPortable
      .pairwiseOverlap(events, "event_type", col("user_id"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

    val exactAud = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val du = events.select("event_type", "user_id").distinct()
    val exactOverlap = du.as("a").join(du.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("ov")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(est.nonEmpty)
    est.foreach { case ((ta, tb), (ua, ub, uu, ov)) =>
      val (ea, eb) = (exactAud(ta), exactAud(tb))
      val eo = exactOverlap.getOrElse((ta, tb), 0L)
      val eu = ea + eb - eo
      // per-audience: one estimate, ~3σ = 10% + slack for tiny groups
      assert(math.abs(ua - ea) <= 0.10 * ea + 5,
        s"audience $ta: est $ua vs exact $ea")
      assert(math.abs(ub - eb) <= 0.10 * eb + 5,
        s"audience $tb: est $ub vs exact $eb")
      assert(math.abs(uu - eu) <= 0.10 * eu + 5,
        s"union $ta/$tb: est $uu vs exact $eu")
      // overlap difference: three estimates stacked -> bound vs UNION
      assert(math.abs(ov - eo) <= 0.15 * eu + 8,
        s"overlap $ta/$tb: est $ov vs exact $eo (union $eu)")
    }
  }

  test("sketch state is bounded: register rows per audience never exceed m") {
    val regs = HllPortable.registers(
      Tables.events(spark, sf), Seq("event_type"), col("user_id"))
    val maxRows = regs.groupBy("event_type").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)
    assert(maxRows <= HllPortable.M)
  }
}
