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

  test("pointInPolygon: square membership, boundary half-open rule") {
    val sq = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    def in(x: Long, y: Long): Boolean =
      Seq((x, y)).toDF("x", "y")
        .select(GeoHash.pointInPolygon(col("x"), col("y"), sq))
        .collect()(0).getBoolean(0)
    assert(in(5, 5))
    assert(!in(15, 5) && !in(-1, 5) && !in(5, 11))
    // half-open: bottom-left corner/edges in, top edge out
    assert(in(0, 0) && in(5, 0) && in(0, 5))
    assert(!in(5, 10) && !in(10, 5))
  }

  test("pointInPolygon: non-convex polygon (the notch is outside)") {
    // a "U": (0,0)(10,0)(10,10)(6,10)(6,4)(4,4)(4,10)(0,10)
    val u = Seq((0L, 0L), (10L, 0L), (10L, 10L), (6L, 10L),
      (6L, 4L), (4L, 4L), (4L, 10L), (0L, 10L))
    def in(x: Long, y: Long): Boolean =
      Seq((x, y)).toDF("x", "y")
        .select(GeoHash.pointInPolygon(col("x"), col("y"), u))
        .collect()(0).getBoolean(0)
    assert(in(2, 8) && in(8, 8) && in(5, 2)) // the two arms + base
    assert(!in(5, 8))                        // the notch
  }

  test("quadrant sanity: first character splits the globe as published") {
    // well-known single-char cells
    assert(enc(0.1, 0.1, 1) == "s")    // lon>0, lat>0 near origin
    assert(enc(-0.1, -0.1, 1) == "7")  // lon<0, lat<0 near origin
  }
}
