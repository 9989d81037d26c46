package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkFunSuite {
  import spark.implicits._

  private def zRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("mask-shift interleave matches the bit-loop reference") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L),
        // high bits beyond 16 must be ignored
        (1L << 20 | 7L, 3L))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"))).as[Long].collect()
    val want = pairs.map { case (a, b) => zRef(a & 0xFFFFL, b & 0xFFFFL) }
    assert(got.toSeq == want)
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
}
