package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

class PcaSpec extends SparkFunSuite {

  import spark.implicits._

  private def quantize(v: Seq[Float]): Seq[Long] =
    v.map(x => math.floor(x.toDouble * Pca.Scale).toLong)

  test("top direction is unit, deterministic, and beats every axis " +
      "on the Rayleigh quotient") {
    val emb = Tables.embeddings(spark, sf)
    val w1 = Pca.topDirection(emb, 64)
    val w2 = Pca.topDirection(emb.repartition(5), 64)
    assert(w1.toSeq == w2.toSeq, "direction depends on partitioning")
    val norm = math.sqrt(w1.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9, s"not unit: $norm")
    // Rayleigh quotient wᵀCw vs the best single axis eᵢᵀCeᵢ
    val q = emb.collect().map(_.getSeq[Float](1)).map(quantize)
    val n = q.length
    def cov(i: Int, j: Int): Double = {
      val sij = q.map(v => v(i) * v(j)).sum
      val si = q.map(_(i)).sum; val sj = q.map(_(j)).sum
      (BigDecimal(n) * BigDecimal(sij) -
        BigDecimal(si) * BigDecimal(sj)).toDouble
    }
    def rayleigh(v: Array[Double]): Double =
      (0 until 64).map(i => (0 until 64)
        .map(j => v(i) * cov(i, j) * v(j)).sum).sum
    val rw = rayleigh(w1)
    val bestAxis = (0 until 64).map(i => cov(i, i)).max
    assert(rw >= bestAxis * 0.999,
      s"top direction ($rw) loses to a coordinate axis ($bestAxis)")
    // sign rule: the largest-|w| component is positive
    val k = (0 until 64).maxBy(i => (math.abs(w1(i)), -i))
    assert(w1(k) > 0)
  }

  test("the gate's projection equals the driver dot on every vector") {
    val w = VectorQueries.pcaModel(spark, sf)
    val out = VectorQueries.queries("vec_pca_project")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("proj")).toMap
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    vecs.foreach { case (id, v) =>
      // the same left-associative fold the generated expression uses
      val exp = quantize(v).zip(w).foldLeft(0.0) {
        case (a, (q, wi)) => a + q * wi
      }
      assert(out(id) == exp, s"vec $id: ${out(id)} != $exp")
    }
  }
}
