package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvSketch

class KmvSketchSpec extends SparkFunSuite {

  import spark.implicits._

  private def algebra(rows: Seq[(String, Long)], k: Int) =
    KmvSketch.setAlgebra(rows.toDF("s", "v"), col("s"), col("v"),
      "a", "b", k).head()

  test("non-full sketches are exact on every output") {
    // |A| = 6, |B| = 5, overlap {10,11,12} — far below k
    val a = Seq(1L, 2L, 3L, 10L, 11L, 12L).map(("a", _))
    val b = Seq(10L, 11L, 12L, 20L, 21L).map(("b", _))
    val r = algebra(a ++ b, k = 256)
    assert(r.getAs[Long]("exact_a") == 6 && r.getAs[Long]("exact_b") == 5)
    assert(r.getAs[Long]("est_a") == 6, "non-full sketch = exact count")
    assert(r.getAs[Long]("est_b") == 5)
    assert(r.getAs[Long]("est_union") == 8)
    assert(r.getAs[Long]("est_inter") == 3)
    assert(r.getAs[Long]("est_diff_ab") == 3)
  }

  test("full sketches estimate within the KMV error envelope") {
    // |A| = 10000, |B| = 10000, |A∩B| = 5000, |A∖B| = 5000
    val a = (0L until 10000L).map(("a", _))
    val b = (5000L until 15000L).map(("b", _))
    val k = 256
    val r = algebra(a ++ b, k)
    // KMV relative standard error ≈ 1/sqrt(k-2) ≈ 6.3%; assert 5σ
    def within(est: Long, truth: Long, tol: Double): Unit =
      assert(math.abs(est - truth) <= truth * tol,
        s"est $est vs $truth beyond ${tol * 100}%")
    within(r.getAs[Long]("est_a"), 10000L, 0.32)
    within(r.getAs[Long]("est_b"), 10000L, 0.32)
    within(r.getAs[Long]("est_union"), 15000L, 0.32)
    // intersection/difference ride the same prefix sample; looser
    within(r.getAs[Long]("est_inter"), 5000L, 0.45)
    within(r.getAs[Long]("est_diff_ab"), 5000L, 0.45)
  }

  test("difference is directional: est(A∖B) uses A's retained prefix") {
    // B ⊂ A strictly: A∖B = 2000, B∖A = 0
    val a = (0L until 3000L).map(("a", _))
    val b = (0L until 1000L).map(("b", _))
    val r = algebra(a ++ b, k = 256)
    assert(r.getAs[Long]("est_diff_ab") > 0)
    val rFlipped = KmvSketch.setAlgebra(
      (a ++ b).toDF("s", "v"), col("s"), col("v"), "b", "a", 256).head()
    // B∖A is empty — the estimator must say so exactly (no retained
    // B-hash below θ is absent from A's complete prefix)
    assert(rFlipped.getAs[Long]("est_diff_ab") == 0)
  }

  test("kmin keeps the k smallest distinct values, ignoring nulls") {
    val df = Seq[java.lang.Long](9L, 1L, 5L, 1L, null, 3L, 7L)
      .toDF("h").select(KmvSketch.kmin(3)(col("h")).as("ks"))
    assert(df.head().getSeq[Long](0) == Seq(1L, 3L, 5L))
  }

  test("plan: one source scan feeds both sketch sides (checkpointed)") {
    val df = (0L until 100L).map(v => (if (v % 2 == 0) "a" else "b", v))
      .toDF("s", "v")
    val out = graft.functions.KmvSketch.setAlgebra(df, col("s"), col("v"),
      "a", "b", 16)
    val plan = out.queryExecution.executedPlan.toString
    // the sketch relation is checkpointed: downstream reads scan the
    // materialized RDD, not the aggregation lineage twice
    assert(!plan.contains("ObjectHashAggregate"),
      s"sketch agg re-derived per side:\n$plan")
  }

  test("determinism: two runs produce identical rows") {
    val rows = (0L until 5000L).map(v => (if (v % 3 == 0) "a" else "b", v))
    val r1 = algebra(rows, 128)
    val r2 = algebra(rows, 128)
    assert(r1 == r2)
  }
}
