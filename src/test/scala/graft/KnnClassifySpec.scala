package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class KnnClassifySpec extends SparkFunSuite {

  import spark.implicits._

  test("majority vote of the k nearest neighbors, ties to the smaller label") {
    // probe 100 sits in a cluster of three label-7 vectors plus two
    // label-2 outliers -> 7 wins 3:2
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0), 7L),
      (2L, Seq(0.99, 0.01, 0.0), 7L),
      (3L, Seq(0.98, 0.02, 0.0), 7L),
      (4L, Seq(0.0, 1.0, 0.0), 2L),
      (5L, Seq(0.0, 0.99, 0.01), 2L),
      (100L, Seq(1.0, 0.001, 0.0), 9L)
    ).toDF("vec_id", "embedding", "label")
    val probes = corpus.where(col("vec_id") === 100)
    val out = Similarity.knnClassify(corpus, probes, k = 5).head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) == (100L, 7L, 3L))

    // 2:2 vote between labels 3 and 8 (k=4) -> smaller label wins
    val tied = Seq(
      (1L, Seq(1.0, 0.0), 8L), (2L, Seq(0.9, 0.1), 8L),
      (3L, Seq(0.0, 1.0), 3L), (4L, Seq(0.1, 0.9), 3L),
      (100L, Seq(0.7, 0.7), 5L)
    ).toDF("vec_id", "embedding", "label")
    val t = Similarity.knnClassify(tied,
      tied.where(col("vec_id") === 100), k = 4).head()
    assert((t.getLong(1), t.getLong(2)) == (3L, 2L))
  }

  test("classifies every probe exactly once on the test corpus") {
    val corpus = Tables.embeddings(spark, sf)
    val probes = corpus.filter(col("vec_id") % 50 === 0)
    val out = Similarity.knnClassify(corpus, probes, k = 5)
    assert(out.count() == probes.count())
    assert(out.select("probe_id").distinct().count() == probes.count())
  }
}
