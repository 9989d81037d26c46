package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, ScalarQuant}

class SqSpec extends SparkFunSuite {

  private def collectVecs(): Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  // the operator's exact arithmetic, replayed in plain Scala: floor-
  // clamp encode, midpoint reconstruction (mul then add), left-to-
  // right squared-diff fold — any drift from the Spark kernels is a
  // spec failure, which is what lets the oracle inline the ranges
  private def replay(m: ScalarQuant.SqModel, v: Array[Double]): Array[Int] =
    v.indices.map { i =>
      if (m.widths(i) == 0.0) 0
      else math.min(math.max(math.floor((v(i) - m.mins(i)) / m.widths(i)), 0.0), 255.0).toInt
    }.toArray

  private def replayD2(m: ScalarQuant.SqModel, p: Array[Double], code: Array[Int]): Double = {
    var s = 0.0; var i = 0
    while (i < p.length) {
      val r = m.mins(i) + (code(i) + 0.5) * m.widths(i)
      val dd = p(i) - r
      s += dd * dd; i += 1
    }
    s
  }

  test("sq8 codes: total, in [0,255], deterministic, midpoint error <= width/2") {
    val corpus = Tables.embeddings(spark, sf)
    val m = ScalarQuant.train(corpus, dim = 64)
    assert(m.dim == 64)
    val codes = corpus.select(ScalarQuant.encode(col("embedding"), m).as("c"))
    assert(codes.count() == corpus.count())
    assert(codes.select(explode(col("c")).as("ci"))
      .where(col("ci") < 0 || col("ci") > 255).count() == 0)
    val a = corpus.select(col("vec_id"), ScalarQuant.encode(col("embedding"), m).as("c"))
      .orderBy("vec_id").collect().toSeq
    val b = corpus.repartition(7)
      .select(col("vec_id"), ScalarQuant.encode(col("embedding"), m).as("c"))
      .orderBy("vec_id").collect().toSeq
    assert(a == b, "encode not deterministic across partitionings")

    // in-range values sit inside their bucket: |x - recon| <= w/2
    // (+ tiny float slack); the boundary x = max codes 255 and lands
    // exactly w/2 away
    val all = collectVecs()
    all.values.foreach { v =>
      val code = replay(m, v)
      v.indices.foreach { i =>
        val r = m.mins(i) + (code(i) + 0.5) * m.widths(i)
        assert(math.abs(v(i) - r) <= m.widths(i) / 2 + 1e-12,
          s"dim $i: |${v(i)} - $r| > w/2 = ${m.widths(i) / 2}")
      }
    }
  }

  test("sq8 topK == the Scala replay of encode + midpoint ADC, and recall is near-exact") {
    val corpus = Tables.embeddings(spark, sf)
    val probes = corpus.filter(col("vec_id") % 50 === 0)
    val m = ScalarQuant.train(corpus, dim = 64)
    val got = ScalarQuant.topK(corpus, probes, m, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

    val all = collectVecs()
    val codes = all.map { case (id, v) => id -> replay(m, v) }
    val probeIds = all.keys.filter(_ % 50 == 0)
    val expected = (for {
      p <- probeIds.toSeq
      ranked = all.keys.filter(_ != p).toSeq
        .map(c => (c, replayD2(m, all(p), codes(c))))
        .sortBy { case (c, d) => (d, c) }.take(5).zipWithIndex
      ((c, d), i) <- ranked
    } yield (p, c, d, (i + 1).toLong)).toSet
    assert(got == expected, "sq8 topK != Scala replay (bit-level drift)")

    // 8 bits/dim quantization noise is tiny next to inter-vector
    // distances — SQ8 should rank near-exactly (PQ's 16-byte codes
    // manage 0.35 here; SQ8 keeps 64 bytes)
    val exact = (for {
      p <- probeIds.toSeq
      (c, _) <- all.keys.filter(_ != p).toSeq
        .map { c =>
          val (pv, cv) = (all(p), all(c)); var s = 0.0; var i = 0
          while (i < pv.length) { val dd = pv(i) - cv(i); s += dd * dd; i += 1 }
          (c, s)
        }.sortBy { case (c, d) => (d, c) }.take(5)
    } yield (p, c)).toSet
    val recall = (got.map { case (p, c, _, _) => (p, c) } & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 recall $recall — quantization should be near-exact")
  }

  test("ivf-sq8: results are sq8 scores restricted to probed cells; serving joins broadcast") {
    val corpus = Tables.embeddings(spark, sf)
    val probes = corpus.filter(col("vec_id") % 50 === 0)
    val ivf = IvfIndex.train(corpus, nList = VectorQueries.IvfNList)
    val m = ScalarQuant.train(corpus, dim = 64)
    val res = ScalarQuant.topKIvf(corpus, probes, ivf, m, k = 5, nProbe = 4)

    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "probe side not broadcast")
    assert(!plan.contains("SortMergeJoin"), "serving join shuffles the corpus")

    // every served row carries the flat-replay ad2 for its pair, and
    // the candidate really lives in one of the probe's cells
    val all = collectVecs()
    val codes = all.map { case (id, v) => id -> replay(m, v) }
    val cells = corpus.select(col("vec_id"),
        IvfIndex.assignCell(col("embedding"), ivf).as("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pcells = probes.select(col("vec_id"),
        IvfIndex.probeCells(col("embedding"), ivf, 4).as("pc")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    res.collect().foreach { r =>
      val (p, c, d) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(pcells(p).contains(cells(c)), s"candidate $c outside probe $p's cells")
      assert(d == replayD2(m, all(p), codes(c)), s"ad2 drift for ($p, $c)")
    }
  }

  test("training refuses NULL elements and non-finite ranges loudly") {
    import spark.implicits._
    val bad = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, Double.PositiveInfinity)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      ScalarQuant.train(bad, dim = 2)
    }
    assert(e.getMessage.contains("non-finite"), e.getMessage)
    val ragged = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0)))
      .toDF("vec_id", "embedding")
    // dim count mismatch is caught up front, before any NPE
    val e2 = intercept[IllegalArgumentException] {
      ScalarQuant.train(ragged, dim = 3)
    }
    assert(e2.getMessage.contains("dimensions"), e2.getMessage)
  }
}
