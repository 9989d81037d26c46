package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, PqIndex}

/** Dev measurement (round 9, not part of the driver contract): IVF-PQ
  * recall@5 vs exact L2, raw codes vs RESIDUAL codes at the same
  * (m, k) budget — the empirical backing for shipping residual
  * encoding (FAISS IVFPQ's by_residual) as the scale path. Also prints
  * the IVF-candidate ceiling (exact rerank within probed cells) so the
  * quantization loss is separable from the coarse-quantizer loss.
  *
  * Run: `sbt "runMain graft.PqStudy [dir] [nProbe]"`.
  */
object PqStudy {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nProbe = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpus = Tables.embeddings(spark, d)
    val probes = corpus.filter(col("vec_id") % 50 === 0)
    val k = 5

    // exact L2 ground truth, driver-side (bounded: test corpora)
    val all = corpus.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val probeIds = all.keys.filter(_ % 50 == 0).toSeq
    val exact = (for {
      p <- probeIds
      (id, _) <- all.toSeq.filter(_._1 != p).map { case (id, v) =>
        val pv = all(p); var s = 0.0; var i = 0
        while (i < v.length) { val dd = pv(i) - v(i); s += dd * dd; i += 1 }
        (id, s)
      }.sortBy { case (id, dd) => (dd, id) }.take(k)
    } yield (p, id)).toSet

    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }

    val ivf = IvfIndex.train(corpus, nList = VectorQueries.IvfNList)
    // the IVF candidate ceiling: exact rerank inside probed cells
    val ceiling = recallOf(IvfIndex.topK(corpus, probes, ivf, k, nProbe))
    println(f"""{"ivf_exact_rerank_ceiling":$ceiling%.3f,"nProbe":$nProbe}""")

    Seq((8, 16), (16, 16), (16, 64)).foreach { case (m, kk) =>
      val raw = PqIndex.train(corpus, dim = 64, m = m, k = kk)
      val res = PqIndex.trainResidual(corpus, ivf, dim = 64, m = m, k = kk)
      val rRaw = recallOf(PqIndex.topKIvf(corpus, probes, ivf, raw, k, nProbe))
      val rRes = recallOf(PqIndex.topKIvfResidual(corpus, probes, ivf, res, k, nProbe))
      println(f"""{"m":$m,"k":$kk,"code_bytes":$m,"recall_ivfpq_raw":$rRaw%.3f,"recall_ivfpq_residual":$rRes%.3f}""")
    }
    spark.stop()
  }
}
