package graft

import org.apache.spark.sql.functions._
import graft.functions.HllPortable

/** HllPortable beyond the gate (the gate bit-compares the long path
  * against DuckDB): the round-7 type dispatch — string/native hashing
  * must estimate real cardinalities, not the pre-fix ~1 collapse.
  */
class HllPortableSpec extends SparkFunSuite {
  import spark.implicits._

  private def err(est: Long, truth: Long): Double =
    math.abs(est.toDouble - truth) / truth

  test("string values hash natively: estimate tracks true distinct") {
    // pre-fix behavior: cast("long") on "u123" -> NULL -> every value
    // lands in one register -> estimate ~1.
    val n = 20000
    val df = (0 until n).map(i => ("g", s"user_${i % 5000}")).toDF("g", "v")
    val est = HllPortable.estimate(df, "g", col("v"), "u")
      .collect().head.getLong(1)
    assert(err(est, 5000) < 0.10, s"string estimate $est vs 5000")
  }

  test("integral dispatch: int column and its long twin agree bit-exactly") {
    val df = (0 until 10000).map(i => ("g", i % 3000)).toDF("g", "v")
    val asInt = HllPortable.estimate(df, "g", col("v"), "u").collect().head.getLong(1)
    val asLong = HllPortable.estimate(
      df.withColumn("v", col("v").cast("long")), "g", col("v"), "u")
      .collect().head.getLong(1)
    assert(asInt == asLong)
    assert(err(asInt, 3000) < 0.10, s"int estimate $asInt vs 3000")
  }

  test("double values estimate through the native path") {
    val df = (0 until 8000).map(i => ("g", (i % 2000) + 0.5)).toDF("g", "v")
    val est = HllPortable.estimate(df, "g", col("v"), "u")
      .collect().head.getLong(1)
    assert(err(est, 2000) < 0.12, s"double estimate $est vs 2000")
  }
}
