package graft

import org.apache.spark.sql.functions._
import graft.operators.GeoHash

class GeoHashSpec extends SparkFunSuite {
  import spark.implicits._

  private def enc(lon: Double, lat: Double, p: Int): String =
    Seq((lon, lat)).toDF("lon", "lat")
      .select(GeoHash.encode(col("lon"), col("lat"), p))
      .collect()(0).getString(0)

  test("known geohashes: the two canonical published examples") {
    // Jutland lighthouse (57.64911, 10.40744) -> u4pruydqqvj; p<=8 prefix
    assert(enc(10.40744, 57.64911, 8) == "u4pruydq")
    // ezs42 decodes to (42.605, -5.603) — re-encoding round-trips
    assert(enc(-5.603, 42.605, 5) == "ezs42")
  }

  test("lower precision is a prefix of higher precision") {
    val gh8 = enc(10.40744, 57.64911, 8)
    for (p <- 1 to 7) assert(enc(10.40744, 57.64911, p) == gh8.take(p))
  }

  test("domain boundaries clamp into the edge cells") {
    // exactly +180/+90 lands in the last cell, not out of range
    assert(enc(180.0, 90.0, 1) == "z")
    assert(enc(-180.0, -90.0, 1) == "0")
  }

  test("quadrant sanity: first character splits the globe as published") {
    // well-known single-char cells
    assert(enc(0.1, 0.1, 1) == "s")    // lon>0, lat>0 near origin
    assert(enc(-0.1, -0.1, 1) == "7")  // lon<0, lat<0 near origin
  }
}
