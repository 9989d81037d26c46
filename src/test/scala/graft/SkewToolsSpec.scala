package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewTools

class SkewToolsSpec extends SparkFunSuite {

  test("salted join equals the plain join on a skewed key distribution") {
    // events is skewed toward a few user_ids by construction of the
    // modulo filter below; join against a per-user dimension
    val big = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type")
    val dim = Tables.events(spark, sf)
      .select("user_id").distinct()
      .withColumn("segment", pmod(col("user_id"), lit(5)))
    val plain = big.join(dim, "user_id")
      .select("event_id", "user_id", "event_type", "segment")
      .orderBy("event_id").collect().toSeq
    val salted = SkewTools.saltedJoin(big, dim, "user_id", salts = 8)
      .select("event_id", "user_id", "event_type", "segment")
      .orderBy("event_id").collect().toSeq
    assert(salted == plain)
  }
}
