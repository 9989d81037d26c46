package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkFunSuite {
  import spark.implicits._

  private def zRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("mask-shift interleave matches the bit-loop reference") {
    val rnd = new scala.util.Random(42)
    val pairs =
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      // full 31-bit range — ids far beyond the old 16-bit spread
      Seq.fill(200)((rnd.nextLong(1L << 31), rnd.nextLong(1L << 31))) ++
      Seq((0L, 0L), (65535L, 65535L), ((1L << 31) - 1, (1L << 31) - 1),
        ((1L << 31) - 1, 0L), (0L, (1L << 31) - 1),
        // high bits beyond 31 must be ignored
        (1L << 40 | 7L, 3L))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"))).as[Long].collect()
    val want = pairs.map { case (a, b) => zRef(a & 0x7FFFFFFFL, b & 0x7FFFFFFFL) }
    assert(got.toSeq == want)
    // 62-bit z stays non-negative even at the max input — signed
    // range-partitioning and ORDER BY therefore agree with unsigned
    assert(got.forall(_ >= 0L))
  }

  test("z-value is monotone in each dimension with the other fixed") {
    val df = (0L until 512L).map(a => (a, 77L)).toDF("a", "b")
    val zs = df.select(ZOrder.zValue(col("a"), col("b"))).as[Long].collect()
    assert(zs.toSeq == zs.sorted.toSeq)
    val df2 = (0L until 512L).map(b => (13L, b)).toDF("a", "b")
    val zs2 = df2.select(ZOrder.zValue(col("a"), col("b"))).as[Long].collect()
    assert(zs2.toSeq == zs2.sorted.toSeq)
  }

  test("z-clustered partitions give tight boxes: a point-range predicate prunes") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(4096)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      .zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
    val df = rows.toDF("id", "a", "b")

    def overlapping(clustered: org.apache.spark.sql.DataFrame): Long = {
      val boxes = clustered
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("a").as("a0"), max("a").as("a1"),
          min("b").as("b0"), max("b").as("b1"))
      // query box: a in [100,120], b in [50,70]
      boxes.where(col("a1") >= 100 && col("a0") <= 120 &&
        col("b1") >= 50 && col("b0") <= 70).count()
    }

    val zFiles = overlapping(ZOrder.cluster(df, col("a"), col("b"), 16))
    val naive = overlapping(df.repartition(16, col("id")))
    assert(naive == 16, s"hash layout should straddle the box everywhere, got $naive")
    assert(zFiles <= 6, s"z layout should prune most partitions, overlapped $zFiles")
  }

  test("pruning survives ids beyond 2^16 (the old spread aliased these)") {
    // user ids in the tens of millions — every value aliases onto the
    // low-16-bit torus under the old spread, so far-apart users would
    // have shared z ranges and the per-file boxes would go wide. The
    // 31-bit spread must keep the boxes tight.
    val rnd = new scala.util.Random(11)
    val base = 40_000_000L
    val rows = Seq.fill(4096)((base + rnd.nextInt(1 << 20).toLong,
        base + rnd.nextInt(1 << 20).toLong))
      .zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
    val df = rows.toDF("id", "a", "b")

    val boxes = ZOrder.cluster(df, col("a"), col("b"), 16)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("a").as("a0"), max("a").as("a1"),
        min("b").as("b0"), max("b").as("b1"))
    // query box: a tiny window deep inside the id space
    val lo = base + 500000L; val hi = base + 520000L
    val overlapped = boxes.where(col("a1") >= lo && col("a0") <= hi &&
      col("b1") >= lo && col("b0") <= hi).count()
    assert(overlapped <= 6,
      s"31-bit z layout should prune most partitions at large ids, overlapped $overlapped")
  }
}
