package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkFunSuite {

  import spark.implicits._

  private def run(edges: Seq[(String, String, Long)], iters: Int = 12)
      : Map[String, Long] =
    PageRank.ranks(edges.toDF("src", "dst", "w"), iters = iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Driver-side replica of the exact integer recurrence — pins the
    * operator's arithmetic (fixed point, per-edge floor div, damping
    * integer ops) independently of Spark.
    */
  private def reference(edges: Seq[(String, String, Long)],
                        iters: Int): Map[String, Long] = {
    val w = edges.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val outw = w.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val nodes = (w.keys.map(_._1) ++ w.keys.map(_._2)).toSeq.distinct
    val p30 = w.map { case ((s, d), ww) =>
      (s, d) -> (ww * PageRank.P30) / outw(s) }
    val n = nodes.size
    var r = nodes.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 1 to iters) {
      val csum = nodes.map { v =>
        v -> p30.collect { case ((s, d), p) if d == v => (r(s) * p) / PageRank.P30 }.sum
      }.toMap
      r = nodes.map(v =>
        v -> ((15L * PageRank.Scale / 100) / n + (85L * csum(v)) / 100)).toMap
    }
    r
  }

  test("matches the driver-side integer reference on an asymmetric graph") {
    val edges = Seq(("a", "b", 3L), ("b", "c", 1L), ("c", "a", 2L),
      ("a", "c", 1L), ("c", "b", 5L))
    assert(run(edges, iters = 8) == reference(edges, iters = 8))
  }

  test("small-graph fast path == forced distributed loop, bit-exact " +
      "(round-15 serving policy)") {
    val edges = Seq(("a", "b", 3L), ("b", "c", 1L), ("c", "a", 2L),
      ("a", "c", 1L), ("c", "b", 5L), ("d", "a", 7L))
    val df = edges.toDF("src", "dst", "w")
    def m(x: org.apache.spark.sql.DataFrame) =
      x.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fast = m(PageRank.ranks(df, iters = 12)) // default: fast path
    val dist = m(PageRank.ranks(df, iters = 12, smallGraphEdges = 0))
    assert(fast == dist)
    // and for a NON-default damping (the round-15 teleport fix):
    // teleport mass must track the parameter on BOTH paths
    val fast70 = m(PageRank.ranks(df, damping100 = 70, iters = 6))
    val dist70 = m(PageRank.ranks(df, damping100 = 70, iters = 6,
      smallGraphEdges = 0))
    assert(fast70 == dist70)
    assert(fast70 != fast, "damping parameter must change the ranks")
  }

  test("a symmetric cycle gives every node the identical rank") {
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    val r = run(edges)
    assert(r.values.toSet.size == 1, s"cycle ranks diverged: $r")
  }

  test("a hub absorbing all edges outranks its spokes") {
    val edges = Seq(("a", "hub", 1L), ("b", "hub", 1L), ("c", "hub", 1L),
      ("hub", "a", 1L), ("hub", "b", 1L), ("hub", "c", 1L))
    val r = run(edges)
    assert(r("hub") > r("a") && r("a") == r("b") && r("b") == r("c"))
  }

  test("deterministic across runs and repartitionings") {
    val edges = (0 until 200).map(i =>
      (s"n${i % 17}", s"n${(i * 7 + 3) % 17}", (i % 5 + 1).toLong))
    val df1 = edges.toDF("src", "dst", "w")
    val df2 = edges.toDF("src", "dst", "w").repartition(7)
    val r1 = PageRank.ranks(df1).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val r2 = PageRank.ranks(df2).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(r1 == r2)
  }

  test("total rank mass stays within the floor-loss envelope") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L),
      ("c", "b", 1L))
    val r = run(edges)
    val total = r.values.sum
    // no dangling nodes here: mass loss is flooring only —
    // ≤ (#nodes + #edges) per iteration, tiny vs the 1e9 scale
    assert(total <= PageRank.Scale && total > PageRank.Scale - 1000000L,
      s"mass $total out of envelope")
  }
}
