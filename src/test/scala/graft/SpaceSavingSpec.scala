package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.functions.SpaceSaving
import graft.functions.SpaceSaving.Ctr
import graft.streaming.TopKStream

class SpaceSavingSpec extends SparkFunSuite {
  import spark.implicits._

  private def foldScala(seq: Seq[(Long, Long)], k: Int): List[Ctr] =
    seq.foldLeft(List.empty[Ctr]) { case (r, (v, w)) =>
      SpaceSaving.insert(r, v, w, k)
    }

  // deterministic pseudo-random item stream with a heavy-hitter skew
  private def stream(n: Int, dom: Int): Seq[Long] =
    (1 to n).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      if (h % 3 != 0) h % 4 else h % dom // ~2/3 of mass on items 0-3
    }

  test("insert kernel: SpaceSaving guarantee on a skewed stream") {
    val k = 8
    val items = stream(5000, 400)
    val regs = foldScala(items.map(_ -> 1L), k)
    val truth = items.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    assert(regs.size == k)
    // c >= true >= c - e for every tracked item
    regs.foreach { r =>
      val t = truth.getOrElse(r.v, 0L)
      assert(r.c >= t && t >= r.c - r.e, s"$r vs true $t")
    }
    // every item with true count > n/k is tracked
    val heavy = truth.filter(_._2 > items.size.toLong / k).keySet
    assert(heavy.nonEmpty && heavy.subsetOf(regs.map(_.v).toSet))
  }

  test("foldOrdered == plain-Scala fold of the same sorted cells") {
    val k = 5
    val items = stream(2000, 60)
    val cells = items.groupBy(identity).toSeq
      .map { case (v, xs) => (v, xs.size.toLong) }.sortBy(_._1)
    val expect = foldScala(cells, k).sortBy(r => (-r.c, r.v))
    val df = cells.toDF("v", "c").agg(
      SpaceSaving.foldOrdered(
        array_sort(collect_list(struct(col("v").as("v"),
          col("c").as("c")))), k).as("regs"))
      .select(explode(col("regs")).as("r"))
      .select(col("r.v"), col("r.c"), col("r.e"))
      .collect().map(r => Ctr(r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(r => (-r.c, r.v)).toList
    assert(df == expect)
  }

  test("merge: under-k disjoint sides merge EXACTLY; bounds preserved") {
    val k = 8
    // two under-k exact sketches with disjoint keys -> merge is exact
    val a = foldScala(Seq(1L -> 5L, 2L -> 3L), k)
    val b = foldScala(Seq(10L -> 7L, 11L -> 1L), k)
    val m = SpaceSaving.merge(a, b, k)
    assert(m.map(r => (r.v, r.c, r.e)).toSet ==
      Set((1L, 5L, 0L), (2L, 3L, 0L), (10L, 7L, 0L), (11L, 1L, 0L)))
    // saturated sides: the conservative merge keeps c >= true >= c - e
    val s1 = stream(3000, 300); val s2 = stream(3000, 350).map(_ + 1)
    val ra = foldScala(s1.map(_ -> 1L), k)
    val rb = foldScala(s2.map(_ -> 1L), k)
    val truth = (s1 ++ s2).groupBy(identity)
      .map { case (v, xs) => v -> xs.size.toLong }
    SpaceSaving.merge(ra, rb, k).foreach { r =>
      val t = truth.getOrElse(r.v, 0L)
      assert(r.c >= t && t >= r.c - r.e, s"merged $r vs true $t")
    }
  }

  test("topKSketch aggregate: single sorted partition equals the plain fold") {
    val k = 4
    val items = stream(500, 40)
    val df = items.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("seq", "v")
      .coalesce(1).sortWithinPartitions("seq")
    val out = df.agg(SpaceSaving.topKSketch(k)(col("v"), lit(1L)).as("regs"))
      .select(explode(col("regs")).as("r"))
      .select(col("r.v"), col("r.c"), col("r.e"))
      .collect().map(r => Ctr(r.getLong(0), r.getLong(1), r.getLong(2)))
      .toList
    val expect = foldScala(items.map(_ -> 1L), k).sortBy(r => (-r.c, r.v))
    assert(out == expect)
  }

  test("topKSketch aggregate: guarantee holds under real shuffling") {
    val k = 8
    val items = stream(4000, 300)
    val truth = items.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val out = items.toDF("v").repartition(7)
      .agg(SpaceSaving.topKSketch(k)(col("v"), lit(1L)).as("regs"))
      .select(explode(col("regs")).as("r"))
      .select(col("r.v"), col("r.c"), col("r.e"))
      .collect().map(r => Ctr(r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { r =>
      val t = truth.getOrElse(r.v, 0L)
      assert(r.c >= t && t >= r.c - r.e, s"$r vs true $t")
    }
    val heavy = truth.filter(_._2 > items.size.toLong / k).keySet
    assert(heavy.subsetOf(out.map(_.v).toSet))
  }

  test("TopKStream: batch-split invariance — registers equal the plain fold") {
    val k = 3
    val feed = stream(60, 12).zipWithIndex
      .map { case (v, i) => TopKStream.In(1L, i.toLong, v, 1L) }
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TopKStream.In]
    val q = TopKStream.topKWithState(spark, mem.toDF(), k)
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("update").start()
    try {
      // three uneven micro-batches, in seq order
      mem.addData(feed.take(17)); q.processAllAvailable()
      mem.addData(feed.slice(17, 41)); q.processAllAvailable()
      mem.addData(feed.drop(41)); q.processAllAvailable()
      val last = spark.table("topk_stream")
        .groupBy("item").agg(max(struct(col("cnt_est"), col("err_bound")))
          .as("s"))
      // the FINAL batch's registers: recompute from the full fold
      val expect = foldScala(feed.map(f => (f.item, f.w)), k)
        .sortBy(r => (-r.c, r.v))
      // memory sink in update mode appends each batch's rows; take the
      // last occurrence per item among the final-state register set
      val rows = spark.table("topk_stream").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      val finalRegs = expect.map(r => (r.v, r.c, r.e))
      finalRegs.foreach(fr => assert(rows.contains(fr),
        s"final register $fr not emitted"))
      assert(last.count() >= k)
    } finally q.stop()
  }
}
