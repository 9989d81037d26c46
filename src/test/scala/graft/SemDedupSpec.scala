package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, SemDedup}

class SemDedupSpec extends SparkFunSuite {

  import spark.implicits._

  test("min-id-wins keep rule on a crafted corpus") {
    // cell geometry: two tight clusters far apart -> 2 k-means cells;
    // ids 1,2,3 are near-identical (dups of 1), ids 10,11 are
    // near-identical (dups of 10), id 20 is alone in cluster B
    def v(base: Array[Double], eps: Double): Seq[Double] =
      base.zipWithIndex.map { case (x, i) => x + (if (i == 0) eps else 0.0) }.toSeq
    val a = Array(1.0, 0.0, 0.0, 0.0)
    val b = Array(0.0, 1.0, 0.0, 0.0)
    val vecs = Seq(
      (1L, v(a, 0.0)), (2L, v(a, 0.001)), (3L, v(a, 0.002)),
      (10L, v(b, 0.0)), (11L, v(b, 0.001)),
      (20L, Seq(0.0, -1.0, 0.1, 0.0))
    ).toDF("vec_id", "embedding")
    val model = IvfIndex.train(vecs, nList = 2)
    val out = SemDedup.flag(vecs, model, tau = 0.99)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 1L), (2L, 1L, 0L), (3L, 2L, 0L),
      (10L, 0L, 1L), (11L, 1L, 0L), (20L, 0L, 1L)))
  }

  test("every cell's lowest-id vector is kept on the test corpus") {
    val corpus = Tables.embeddings(spark, sf)
    val model = IvfIndex.train(corpus, nList = 8)
    val flagged = SemDedup.flag(corpus, model, tau = 0.3).cache()
    assert(flagged.count() == corpus.count(), "one verdict per vector")
    // the minimum id in each cell can have no lower-id neighbor
    val minKept = flagged
      .withColumn("mn", min("vec_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("cell")))
      .where(col("vec_id") === col("mn") && col("keep") === 0)
      .count()
    assert(minKept == 0, "a cell-minimum id was dropped")
    flagged.unpersist()
  }
}
