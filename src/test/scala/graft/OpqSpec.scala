package graft

import org.apache.spark.sql.functions._
import graft.operators.{OpqIndex, PqIndex}

class OpqSpec extends SparkFunSuite {
  import spark.implicits._

  // deterministic pseudo-random in [-1, 1)
  private def h(i: Long, j: Long): Double = {
    var z = i * 0x9E3779B97F4A7C15L + j * 0xBF58476D1CE4E5B9L
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^= (z >>> 31)
    ((z >>> 11) % 100000L) / 50000.0 - 1.0
  }

  /** Adversarial-for-PQ corpus (d=8, m=2): ALL the variance lives in
    * the first subspace's dims (scaled 10×), the second subspace is
    * near-noise — a plain m=2 split wastes half its code budget; a
    * rotation can rebalance. This is exactly Ge et al.'s motivating
    * case.
    */
  private def skewed(n: Int): Seq[Seq[Double]] =
    (1 to n).map { i =>
      Seq(10.0 * h(i, 0), 10.0 * h(i, 1), 10.0 * h(i, 2), 10.0 * h(i, 3),
        0.1 * h(i, 4), 0.1 * h(i, 5), 0.1 * h(i, 6), 0.1 * h(i, 7))
    }

  private def mse(vecs: Seq[Seq[Double]], rot: Seq[Seq[Double]],
                  pq: PqIndex.PqModel): Double = {
    val d = vecs.head.size
    val dSub = pq.dSub
    val errs = vecs.map { x0 =>
      val x = if (rot.isEmpty) x0.toArray
        else Array.tabulate(d)(i =>
          (0 until d).foldLeft(0.0)((a, j) => a + rot(i)(j) * x0(j)))
      (0 until pq.m).map { j =>
        val sl = x.slice(j * dSub, (j + 1) * dSub)
        val best = pq.subCentroids(j).minBy(c =>
          c.zip(sl).map { case (a, b) => (a - b) * (a - b) }.sum)
        best.zip(sl).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
    }
    errs.sum / errs.size
  }

  test("jacobiSvdUV: U, V orthogonal and U'BV diagonal") {
    val d = 8
    val b = Array.tabulate(d, d)((i, j) => h(i + 1, j + 17) * (i + j + 1))
    val (u, v) = OpqIndex.jacobiSvdUV(b)
    def orthErr(m: Array[Array[Double]]): Double =
      (for (i <- 0 until d; j <- 0 until d) yield {
        val dot = (0 until d).map(t => m(t)(i) * m(t)(j)).sum
        math.abs(dot - (if (i == j) 1.0 else 0.0))
      }).max
    assert(orthErr(u) < 1e-10 && orthErr(v) < 1e-10)
    // U^T B V must be diagonal
    val s = Array.tabulate(d, d)((i, j) =>
      (for (p <- 0 until d; q <- 0 until d)
        yield u(p)(i) * b(p)(q) * v(q)(j)).sum)
    val offDiag = (for (i <- 0 until d; j <- 0 until d if i != j)
      yield math.abs(s(i)(j))).max
    val diagMin = (0 until d).map(i => math.abs(s(i)(i))).min
    assert(offDiag < 1e-8 * diagMin + 1e-10)
  }

  test("trained rotation is orthogonal and distance-preserving") {
    val df = skewed(600).map(Tuple1(_)).toDF("embedding")
    val m = OpqIndex.train(df, dim = 8, m = 2, k = 4, iters = 4)
    val r = m.rotation
    val d = 8
    val orthErr = (for (i <- 0 until d; j <- 0 until d) yield {
      val dot = (0 until d).map(t => r(t)(i) * r(t)(j)).sum
      math.abs(dot - (if (i == j) 1.0 else 0.0))
    }).max
    assert(orthErr < 1e-9, s"R'R deviates from I by $orthErr")
    // ||Rx - Ry|| == ||x - y|| (rotation preserves the metric)
    val x = skewed(2)(0).toArray; val y = skewed(2)(1).toArray
    def rot(v: Array[Double]) = Array.tabulate(d)(i =>
      (0 until d).foldLeft(0.0)((a, j) => a + r(i)(j) * v(j)))
    val d0 = x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
    val d1 = rot(x).zip(rot(y)).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(math.abs(d0 - d1) < 1e-9 * d0)
  }

  test("OPQ cuts reconstruction MSE on the variance-skewed corpus; " +
      "near-isotropic corpora gain ~nothing (both directions pinned)") {
    val vecs = skewed(600)
    val df = vecs.map(Tuple1(_)).toDF("embedding")
    val pq = PqIndex.train(df, dim = 8, m = 2, k = 4)
    val opq = OpqIndex.train(df, dim = 8, m = 2, k = 4, iters = 4)
    val ePq = mse(vecs, Nil, pq)
    val eOpq = mse(vecs, opq.rotation, opq.pq)
    assert(eOpq < 0.8 * ePq,
      s"OPQ should cut skewed-corpus MSE substantially: $eOpq vs $ePq")
    // isotropic: every dim same scale -> rotation can't help much
    val iso = (1 to 600).map(i => (0 until 8).map(j => h(i, j)).toSeq)
    val dfIso = iso.map(Tuple1(_)).toDF("embedding")
    val pqI = PqIndex.train(dfIso, dim = 8, m = 2, k = 4)
    val opqI = OpqIndex.train(dfIso, dim = 8, m = 2, k = 4, iters = 4)
    val ratio = mse(iso, opqI.rotation, opqI.pq) / mse(iso, Nil, pqI)
    assert(ratio > 0.85 && ratio < 1.15,
      s"isotropic corpus: OPQ ~ PQ expected, ratio $ratio")
  }

  test("rotate Column == plain-Scala matVec, bit-exact") {
    val df = skewed(50).map(Tuple1(_)).toDF("embedding")
    val m = OpqIndex.train(df, dim = 8, m = 2, k = 4, iters = 2)
    val r = m.rotation
    val out = df.select(OpqIndex.rotate(col("embedding"), r).as("y"))
      .collect().map(_.getSeq[Double](0))
    skewed(50).zip(out).foreach { case (x, y) =>
      val expect = (0 until 8).map(i =>
        (0 until 8).foldLeft(0.0)((a, j) => a + r(i)(j) * x(j)))
      assert(y == expect) // identical fold order -> identical bits
    }
  }

  test("training is deterministic: two runs, identical rotation bits") {
    val df = skewed(400).map(Tuple1(_)).toDF("embedding")
    val a = OpqIndex.train(df, dim = 8, m = 2, k = 4, iters = 3).rotation
    val b = OpqIndex.train(df, dim = 8, m = 2, k = 4, iters = 3).rotation
    assert(a == b)
  }

  test("topK serves k rows per probe through the rotated ADC chain") {
    val corpus = (1L to 200L).map(i =>
      (i, (0 until 8).map(j => h(i, j) * (if (j < 4) 10 else 1)).toSeq))
      .toDF("vec_id", "embedding")
    val model = OpqIndex.train(corpus, dim = 8, m = 2, k = 4, iters = 3)
    val probes = corpus.where(col("vec_id") % 50 === 0)
    val out = OpqIndex.topK(corpus, probes, model, k = 5)
    val counts = out.groupBy("probe_id").count().collect()
    assert(counts.length == 4 && counts.forall(_.getLong(1) == 5L))
  }
}
