package graft

import org.apache.spark.sql.functions._
import graft.operators.Downsample

class DownsampleSpec extends SparkFunSuite {
  import spark.implicits._

  test("lttb: first/last pinned, interior bucket keeps the largest triangle") {
    // t in [0,8], 3 buckets of 3: flat edges, a spike in the middle.
    // Anchors: bucket0 avg (1,0), bucket2 avg (7,0) -> area = 6*v,
    // so the spike (4,100) must win bucket 1.
    val df = Seq(
      ("g", 0L, 0L), ("g", 1L, 0L), ("g", 2L, 0L),
      ("g", 3L, 1L), ("g", 4L, 100L), ("g", 5L, 2L),
      ("g", 6L, 0L), ("g", 7L, 0L), ("g", 8L, 0L)
    ).toDF("g", "t", "v")
    val out = Downsample.lttb(df, col("g"), col("t"), col("v"), 3)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((0L, 0L, 0L), (1L, 4L, 100L), (2L, 8L, 0L)))
  }

  test("lttb: equal areas break toward the later point (struct rule)") {
    // bucket 1 has two points with identical |area| -> larger t wins
    val df = Seq(
      ("g", 0L, 0L), ("g", 1L, 0L), ("g", 2L, 0L),
      ("g", 3L, 50L), ("g", 5L, 50L),
      ("g", 6L, 0L), ("g", 7L, 0L), ("g", 8L, 0L)
    ).toDF("g", "t", "v")
    val out = Downsample.lttb(df, col("g"), col("t"), col("v"), 3)
      .orderBy("bucket").collect()
    assert(out(1).getLong(2) == 5L)
  }

  test("lttb: output size is bounded by the bucket count per series") {
    val df = (0 until 500).map(i => ("a", i.toLong, (i % 37).toLong))
      .toDF("g", "t", "v")
    val out = Downsample.lttb(df, col("g"), col("t"), col("v"), 10)
      .collect()
    assert(out.length == 10)
    val ts = out.map(_.getLong(2)).sorted
    assert(ts.head == 0L && ts.last == 499L) // endpoints survive
  }

  test("lttb: single-bucket degenerate series keeps its first point") {
    val df = Seq(("g", 5L, 9L), ("g", 5L, 3L)).toDF("g", "t", "v")
    val out = Downsample.lttb(df, col("g"), col("t"), col("v"), 3)
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(2) == 5L && out(0).getLong(3) == 3L) // min (t,v)
  }
}
