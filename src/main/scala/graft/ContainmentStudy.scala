package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline study harness (IvfStudy/PqStudy pattern): time the
  * containment verify-join variants at a given SF. Round-9 context:
  * the first pipeline bench put dedup_containment at 87 s on sf0.1 —
  * this corpus has a CLOSED vocabulary (2,041 distinct 5-grams, median
  * df 291), so "rarest-gram" prefix filtering keeps ~12M of 12.5M
  * ordered pairs and the verify join dominates everything.
  *
  * Run: `sbt "runMain graft.ContainmentStudy [sfDir] [variant...]"`.
  */
object ContainmentStudy {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val variants = if (args.length > 1) args.drop(1).toSeq
                   else Seq("current")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    variants.foreach { v =>
      val out =
        if (v.startsWith("q:"))
          SparkEntry.queries(v.drop(2).takeWhile(_ != '#'))(spark, sfDir)
        else if (v.startsWith("jaccard"))
          graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.4)
        else if (v.startsWith("minhash"))
          graft.operators.Dedup.minhashClusters(docs, "doc_id", "text", 0.5)
        else
          graft.operators.Dedup.containmentPairs(docs, "doc_id", "text", 0.9)
      // Materialize EVERY column through the noop sink (Bench.runOnce
      // discipline): a bare count() lets Catalyst prune the Project
      // expressions and EliminateSorts drop the orderBy — for
      // projection-shaped queries the old harness timed a bare scan
      // (the round-14 verdict's invalid-receipt finding; measured 50×
      // contradiction on text_ngram_sim: 0.22 s counted vs 11 s
      // written). Rows counted OUTSIDE the timed window.
      val t0 = System.nanoTime()
      out.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val n = out.count()
      println(f"""{"variant":"$v","sf":"$sfDir","pairs":$n,"sec":$secs%.2f}""")
    }
    spark.stop()
  }
}
