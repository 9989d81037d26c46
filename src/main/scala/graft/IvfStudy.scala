package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (SURVEY.md §9): IVF recall@5 vs brute force across
  * nProbe, with the scanned-cell fraction as the cost proxy — the
  * recall/cost curve that justifies the IVF scale path and picks the
  * default nProbe.
  */
object IvfStudy {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpus = Tables.embeddings(spark, sfDir)
    val probes = corpus.filter(col("vec_id") % 50 === 0)
    val k = 5

    val exact = graft.operators.Similarity
      .bruteForceTopK(corpus, probes, k)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // sweep nList too: at a fixed scanned-cell FRACTION, more (smaller)
    // cells should buy recall on clustered data — the knob that keeps
    // the scan fraction constant as the corpus grows (nList ~ sqrt(n))
    val nLists = sys.env.get("SPARK_GRAFT_IVF_NLISTS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(16))
    nLists.foreach { nList =>
      val model = graft.operators.IvfIndex.train(corpus, nList = nList)
      Seq(1, 2, 4, 8).map(p => math.min(p * nList / 16, nList)).distinct
        .filter(_ >= 1).foreach { nProbe =>
          val approx = graft.operators.IvfIndex
            .topK(corpus, probes, model, k = k, nProbe = nProbe)
            .select("probe_id", "vec_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          val recall = (approx & exact).size.toDouble / exact.size
          println(f"""{"nList":$nList,"nProbe":$nProbe,"recall_at_$k":$recall%.3f,"cell_fraction":${nProbe.toDouble / nList}%.3f}""")
        }
    }
    spark.stop()
  }
}
