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
}
