package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (round 10): separates the two axes the scale100
  * ann_ivfpq cell conflated — corpus growth vs probe-set growth. The
  * gate's probe set (vec_id % 50 == 0) grows WITH the corpus, so a
  * ×100 replica multiplies candidate pairs ×10000 (both sides ×100);
  * production ANN serving scales the corpus, not the per-query probe
  * batch. This times topKIvf on one dir with (a) the base-replica
  * probes only (fixed batch) and (b) the full scaled probe set.
  *
  * Run: `sbt "runMain graft.AnnProbeStudy [dir]"` → one JSON line.
  */
object AnnProbeStudy {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_scale100_x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, d)
    val ivf = VectorQueries.ivfModel(spark, d)
    val pq = VectorQueries.pqModel(spark, d)
    val probesAll = emb.filter(col("vec_id") % 50 === 0)
    val probesBase = probesAll.filter(col("vec_id") < 10000000L)
    val (nAll, nBase) = (probesAll.count(), probesBase.count())
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(p: org.apache.spark.sql.DataFrame): Double = time {
      graft.operators.PqIndex.topKIvf(emb, p, ivf, pq, k = 5, nProbe = 2)
        .write.format("noop").mode("overwrite").save()
    }
    run(probesBase) // warm
    val fixed = (1 to 2).map(_ => run(probesBase)).min
    val scaled = (1 to 2).map(_ => run(probesAll)).min
    println(f"""{"metric":"ann_probe_study","dir":"$d","n_corpus":${emb.count()},"probes_fixed":$nBase,"probes_scaled":$nAll,"sec_fixed":$fixed%.2f,"sec_scaled":$scaled%.2f}""")
    spark.stop()
  }
}
