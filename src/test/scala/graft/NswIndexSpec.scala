package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, NswIndex}

/** Graph ANN (round 14, §2 C42): per-cell NSW under the IVF coarse
  * layer. No SQL oracle is possible (the greedy walk's visit set has
  * no closed form — the design decision is on the record in
  * NswIndex's scaladoc and SURVEY §2), so this spec carries the
  * correctness weight: structural invariants, an EXACT-equivalence
  * anchor (exhaustive beam == brute force), pinned deterministic
  * recall at the operating point, and build reproducibility.
  */
class NswIndexSpec extends SparkFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val model = IvfIndex.train(emb, nList = 8)
  private lazy val probes = emb.filter(col("vec_id") % 50 === 0)

  private def exactTopK(k: Int) = {
    val c = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("cv"))
    val p = probes.select(col("vec_id").as("probe_id"),
      col("embedding").cast("array<double>").as("pv"))
    val w = Window.partitionBy("probe_id").orderBy(col("d2"), col("vec_id"))
    c.join(broadcast(p), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.functions.VectorOps.sqDist(col("pv"), col("cv")).as("d2"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** The full-cell SCAN over the same probed cells, same L2 metric —
    * the reference that isolates walk-miss from IVF cell-miss.
    */
  private def scanTopK(k: Int, nProbe: Int) = {
    val c = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("cv"),
      IvfIndex.assignCell(col("embedding"), model).as("cell"))
    val p = probes.select(col("vec_id").as("probe_id"),
      col("embedding").cast("array<double>").as("pv"),
      explode(IvfIndex.probeCells(col("embedding"), model, nProbe))
        .as("cell"))
    val w = Window.partitionBy("probe_id").orderBy(col("d2"), col("vec_id"))
    c.join(broadcast(p),
        c("cell") === p("cell") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.functions.VectorOps.sqDist(col("pv"), col("cv")).as("d2"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  test("graph invariants: bounded out-degree, valid edges, every node " +
      "DIRECTED-reachable from the entry; build is deterministic") {
    val gs = NswIndex.build(emb, model, m = 8, efC = 32).collect()
    assert(gs.map(_.ids.length).sum == emb.count())
    gs.foreach { g =>
      val n = g.ids.length
      // edges become DIRECTED after degree pruning (hnswlib's shrink
      // does the same): the over-full node drops its out-edge, the
      // other side keeps its own — so the invariant that matters for
      // search is bounded out-degree + reachability FROM the entry,
      // not symmetry
      g.adj.foreach { a =>
        assert(a.length <= 16) // 2M cap
        a.foreach(j => assert(j >= 0 && j < n))
      }
      if (n > 1) {
        // the walk follows OUT-edges: BFS from entry 0 must reach all
        val seen = scala.collection.mutable.BitSet(0)
        val q = scala.collection.mutable.Queue(0)
        while (q.nonEmpty) {
          val c = q.dequeue()
          g.adj(c).foreach(j => if (!seen(j)) { seen += j; q.enqueue(j) })
        }
        assert(seen.size == n, s"cell ${g.cell}: ${seen.size}/$n reachable")
      }
    }
    // reproducible bit-for-bit: same data -> same adjacency
    val gs2 = NswIndex.build(emb, model, m = 8, efC = 32).collect()
    val byCell = gs.map(g => g.cell -> g).toMap
    gs2.foreach { g2 =>
      val g1 = byCell(g2.cell)
      assert(g1.ids.toSeq == g2.ids.toSeq)
      assert(g1.adj.map(_.toSeq).toSeq == g2.adj.map(_.toSeq).toSeq)
    }
  }

  test("EXACT anchor: exhaustive beam over all probed cells == brute " +
      "force (the approximation is only in what the walk skips)") {
    val graphs = NswIndex.build(emb, model, m = 8, efC = 32)
    val nsw = NswIndex.topK(graphs, probes, model, k = 5,
      nProbe = model.nList, ef = 4096, scanBelow = 0) // force the walk
    val exact = exactTopK(5)
    val a = nsw.select("probe_id", "rk", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = exact.select("probe_id", "rk", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("operating point (M=8, efC=32, ef=32, nProbe=4): the walk " +
      "matches the full-cell SCAN's recall — cell-miss is the IVF " +
      "layer's, never the graph's — and is deterministic") {
    val graphs = NswIndex.build(emb, model, m = 8, efC = 32)
    def setsOf(df: org.apache.spark.sql.DataFrame,
               idIdx: Int): Map[Long, Set[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getLong(idIdx))
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    val want = exactTopK(5).collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    def recallOf(got: Map[Long, Set[Long]]): Double =
      want.toSeq.map { case (p, ws) =>
        got.getOrElse(p, Set.empty).count(ws.contains)
      }.sum.toDouble / (want.size * 5)
    val nsw = setsOf(NswIndex.topK(graphs, probes, model, k = 5,
      nProbe = 4, ef = 32, scanBelow = 0) // the WALK is under test here
      .select("probe_id", "rk", "vec_id"), 2)
    val scan = setsOf(scanTopK(5, nProbe = 4)
      .select(col("probe_id"), col("rk"), col("vec_id")), 2)
    val (rNsw, rScan) = (recallOf(nsw), recallOf(scan))
    info(f"recall@5: nsw=$rNsw%.4f vs ivf-scan=$rScan%.4f (same cells)")
    // the walk gives up (almost) nothing vs scanning its cells in full
    assert(rNsw >= rScan - 0.02, f"walk $rNsw%.4f vs scan $rScan%.4f")
    assert(rNsw >= 0.6) // and the end-to-end point is genuinely useful
    // deterministic end to end
    val again = setsOf(NswIndex.topK(graphs, probes, model, k = 5,
      nProbe = 4, ef = 32, scanBelow = 0)
      .select("probe_id", "rk", "vec_id"), 2)
    assert(again == nsw)
  }

  test("serving policy (round 15): cells below the cutoff answer by " +
      "EXACT scan — the default policy equals the full-cell scan on " +
      "this corpus (every cell < autoScanBelow(32)), and never costs " +
      "more evals than the scan") {
    val graphs = NswIndex.build(emb, model, m = 8, efC = 32)
    // every sf0.001 cell is far below 4*32=128 → policy == scan
    val policy = NswIndex.topK(graphs, probes, model, k = 5,
        nProbe = 4, ef = 32) // default scanBelow = auto
      .select("probe_id", "rk", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val scan = scanTopK(5, nProbe = 4)
      .select("probe_id", "rk", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(policy == scan,
      "below-cutoff cells must serve exact scan results")
    // evals bound: BOTH branches are ≤ |cell| for every (probe, cell)
    val gs = graphs.collect()
    val q = probes.select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0).toArray
    gs.filter(_.ids.nonEmpty).foreach { g =>
      val (_, evWalk) = NswIndex.searchCell(g.vecs, g.adj, q, 32, 0)
      val (_, evPolicy) = NswIndex.searchCell(g.vecs, g.adj, q, 32,
        NswIndex.autoScanBelow(32))
      assert(evWalk <= g.ids.length && evPolicy <= g.ids.length)
      // below the cutoff the policy branch IS the scan
      if (g.ids.length < NswIndex.autoScanBelow(32))
        assert(evPolicy == g.ids.length)
    }
  }

  test("output shape: rk dense 1..k, d2 ascending, no self matches") {
    val graphs = NswIndex.build(emb, model, m = 8, efC = 32)
    val out = NswIndex.topK(graphs, probes, model, k = 5, nProbe = 4,
      ef = 32).collect()
    assert(out.forall(r => r.getLong(0) != r.getLong(2)))
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val ds = sorted.map(_.getDouble(3))
      assert(ds.zip(ds.tail).forall { case (x, y) => x <= y })
    }
  }
}
