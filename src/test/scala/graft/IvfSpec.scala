package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Similarity}

class IvfSpec extends SparkFunSuite {

  test("IVF recall vs brute force beats the cell-fraction baseline") {
    val corpus = Tables.embeddings(spark, sf)
    val probes = corpus.filter(col("vec_id") % 50 === 0)
    val model = IvfIndex.train(corpus, nList = 16)
    assert(model.nList == 16)

    val ivf = IvfIndex.topK(corpus, probes, model, k = 5, nProbe = 4)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(corpus, probes, 5)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (ivf & exact).size.toDouble / exact.size
    // scanning 4/16 cells blind would give ~25%; the quantizer must do
    // materially better than chance on its own training data
    assert(recall >= 0.4, s"IVF recall $recall")
  }

  test("training is bit-deterministic across independent runs") {
    val corpus = Tables.embeddings(spark, sf)
    val a = IvfIndex.train(corpus, nList = 16)
    // shuffle the input partitioning — the sorted driver-side sample
    // must erase any ordering difference
    val b = IvfIndex.train(corpus.repartition(7), nList = 16)
    assert(a.centroids == b.centroids, "centroids differ between runs")
  }

  test("ivf oracle SQL materializes when the gate dir is set") {
    val old = sys.props.get("graft.oracle.sfDir")
    try {
      System.setProperty("graft.oracle.sfDir", sf)
      val sql = VectorQueries.oracles.get("ann_ivf")
      assert(sql.nonEmpty, "ann_ivf oracle missing with active session + sfDir")
      // all 16 trained centroids inlined as DOUBLE[] literals
      assert(sql.get.split("::DOUBLE\\[\\]").length - 1 == VectorQueries.IvfNList)
    } finally {
      old match {
        case Some(v) => System.setProperty("graft.oracle.sfDir", v)
        case None => System.clearProperty("graft.oracle.sfDir")
      }
    }
  }

  test("cell assignment is total and deterministic") {
    val corpus = Tables.embeddings(spark, sf)
    val model = IvfIndex.train(corpus, nList = 8)
    val cells = corpus.select(
        IvfIndex.assignCell(col("embedding"), model).as("cell"))
      .groupBy("cell").count().collect()
    assert(cells.map(_.getInt(0)).forall(c => c >= 0 && c < 8))
    assert(cells.map(_.getLong(1)).sum == corpus.count())
  }

  test("large-k training auto-raises the sample: k=1024 gets 32+ samples/centroid") {
    // 40k synthetic vectors, well past the old fixed 16384 cap: at
    // nList=1024 the effective cap must rise to 32*1024=32768 (the
    // round-9 silent-degradation caveat), giving 1024 DISTINCT,
    // well-separated centroids rather than 16-samples-per-centroid
    // memorization near the cap
    val vecs = spark.range(40000).selectExpr(
      "id AS vec_id",
      """transform(sequence(0, 7),
        |  i -> CAST(pmod(xxhash64(id, i), 1000) / 500.0 - 1.0 AS FLOAT))
        |AS embedding""".stripMargin)
    val m = IvfIndex.train(vecs, nList = 1024)
    assert(m.nList == 1024)
    assert(m.centroids.distinct.size == 1024, "degenerate duplicate centroids")
    // parallel assignment must not break bit-determinism
    val m2 = IvfIndex.train(vecs.repartition(13), nList = 1024)
    assert(m.centroids == m2.centroids)
  }

  test("train refuses k beyond the driver-side Lloyd's envelope") {
    val e = intercept[IllegalArgumentException] {
      IvfIndex.train(Tables.embeddings(spark, sf), nList = 10000)
    }
    assert(e.getMessage.contains("distributed"))
  }

  test("trainDistributed is bit-deterministic under repartitioning") {
    // the property the driver envelope existed to protect: exact
    // DECIMAL accumulation makes the distributed means independent of
    // partitioning, task order, and executor count
    val corpus = Tables.embeddings(spark, sf)
    val a = IvfIndex.trainDistributed(corpus, nList = 8, maxIter = 4)
    val b = IvfIndex.trainDistributed(corpus.repartition(13), nList = 8,
      maxIter = 4)
    assert(a.centroids == b.centroids, "distributed centroids drift")
  }

  test("trainDistributed quantizer serves IVF search with real recall") {
    val corpus = Tables.embeddings(spark, sf)
    val probes = corpus.filter(col("vec_id") % 50 === 0)
    val model = IvfIndex.trainDistributed(corpus, nList = 16, maxIter = 6)
    val ivf = IvfIndex.topK(corpus, probes, model, k = 5, nProbe = 4)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(corpus, probes, 5)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"distributed-IVF recall $recall")
  }

  test("trainDistributed sampled path: no seed aliasing, still deterministic") {
    // 40k vectors at samplesPerCentroid=32, nList=64 -> target 2048,
    // ratio ~19 > 1: the subsample path runs. Under the pre-fix
    // aliasing (sample filter and seed bucketing sharing xxhash64(v))
    // most power-of-two seed buckets were structurally empty; the
    // salted sample hash must keep nearly all nList buckets populated,
    // and the sampled model must stay partitioning-invariant
    val vecs = spark.range(40000).selectExpr(
      "id AS vec_id",
      """transform(sequence(0, 7),
        |  i -> CAST(pmod(xxhash64(id, i), 1000) / 500.0 - 1.0 AS FLOAT))
        |AS embedding""".stripMargin)
    val m = IvfIndex.trainDistributed(vecs, nList = 64, maxIter = 3,
      samplesPerCentroid = 32)
    assert(m.nList >= 56, s"seed buckets collapsed: only ${m.nList} of 64")
    assert(m.centroids.distinct.size == m.nList)
    val m2 = IvfIndex.trainDistributed(vecs.repartition(9), nList = 64,
      maxIter = 3, samplesPerCentroid = 32)
    assert(m.centroids == m2.centroids, "sampled training not partition-stable")
  }

  test("two-level IVF: assignment total, deterministic, real recall") {
    val corpus = Tables.embeddings(spark, sf)
    val probes = corpus.filter(col("vec_id") % 50 === 0)
    val m = IvfIndex.trainTwoLevel(corpus, k1 = 4, k2 = 4, maxIter = 5)
    assert(m.nCells > 4 && m.nCells <= 16)
    // assignment: every vector lands in a valid global cell
    val cells = corpus.select(
        IvfIndex.assignCell2(col("embedding"), m).as("cell"))
      .groupBy("cell").count().collect()
    assert(cells.map(_.getInt(0)).forall(c => c >= 0 && c < m.nCells))
    assert(cells.map(_.getLong(1)).sum == corpus.count())
    // training deterministic under repartitioning (both levels)
    val m2 = IvfIndex.trainTwoLevel(corpus.repartition(7), k1 = 4, k2 = 4,
      maxIter = 5)
    assert(m.level1.centroids == m2.level1.centroids)
    assert(m.sub.map(_.centroids) == m2.sub.map(_.centroids))
    // serving recall: probing half the super-cells and a quarter of
    // the global cells must beat the blind cell fraction
    val ivf2 = IvfIndex.topK2(corpus, probes, m, k = 5,
        nProbe1 = 2, nProbe = 4)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(corpus, probes, 5)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf2 & exact).size.toDouble / exact.size
    assert(recall >= 0.35, s"two-level recall $recall")
  }

  test("trainDistributed handles k past the driver envelope") {
    // 30k synthetic vectors, nList=1024 (> nothing driver-side could
    // verify bit-stably at this shape before): training completes,
    // yields distinct centroids, and assignment is total
    val vecs = spark.range(30000).selectExpr(
      "id AS vec_id",
      """transform(sequence(0, 7),
        |  i -> CAST(pmod(xxhash64(id, i), 1000) / 500.0 - 1.0 AS FLOAT))
        |AS embedding""".stripMargin)
    val m = IvfIndex.trainDistributed(vecs, nList = 1024, maxIter = 2)
    assert(m.nList >= 1000, s"only ${m.nList} seed buckets populated")
    assert(m.centroids.distinct.size == m.nList,
      "degenerate duplicate centroids")
    val cells = vecs.select(
        IvfIndex.assignCell(col("embedding"), m).as("cell"))
      .groupBy("cell").count().collect()
    assert(cells.map(_.getLong(1)).sum == 30000L)
  }

  test("rangeSearch: exactly the candidates within r2, no window, broadcast-only plan") {
    val corpus = Tables.embeddings(spark, sf)
    val probes = corpus.filter(col("vec_id") % 50 === 0)
    val model = IvfIndex.train(corpus, nList = 16)
    val r2 = VectorQueries.RangeR2
    val res = IvfIndex.rangeSearch(corpus, probes, model, r2 = r2, nProbe = 4)

    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "cell join not broadcast")
    assert(!plan.contains("SortMergeJoin"), "range search shuffles the corpus")
    assert(!plan.contains("Window"), "range search must not need a per-probe window")

    // semantic identity: result == {(p, c, d2) : c in p's probed
    // cells, c != p, d2 <= r2}, with d2 from the exact replay fold
    val all = corpus.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(p: Long, c: Long): Double = {
      val (pv, cv) = (all(p), all(c)); var s = 0.0; var i = 0
      while (i < pv.length) { val dd = pv(i) - cv(i); s += dd * dd; i += 1 }
      s
    }
    val cells = corpus.select(col("vec_id"),
        IvfIndex.assignCell(col("embedding"), model).as("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pcells = probes.select(col("vec_id"),
        IvfIndex.probeCells(col("embedding"), model, 4).as("pc")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    val expected = (for {
      p <- pcells.keys.toSeq
      c <- all.keys.toSeq if c != p && pcells(p).contains(cells(c))
      d = d2(p, c) if d <= r2
    } yield (p, c, d)).toSet
    val got = res.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected, s"range result drift: got ${got.size}, expected ${expected.size}")
    assert(got.nonEmpty, "radius too tight: empty result proves nothing")
  }
}
