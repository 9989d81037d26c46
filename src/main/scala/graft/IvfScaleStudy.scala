package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev measurement (round 10): IVF training + recall at LARGE nList —
  * re-validates the nList ≈ √n scaling rule beyond toy k, now that
  * train() auto-raises its sample with k (MinSamplesPerCentroid) and
  * cell assignment uses the k-independent matrix kernel.
  *
  * The shipped embeddings table is 2k vectors, far too small for
  * k ≥ 1024, so the study builds a deterministic ×`k` replica with
  * per-replica jitter: each copy's components move by a hash-derived
  * offset in [-0.05, 0.05) — copies of one vector form a small CLUSTER
  * around the original (the realistic near-dup geometry IVF thrives
  * on), rather than 100 identical points (which would degenerate
  * k-means) or uniform noise (which would have no cluster structure).
  *
  * Run: `sbt "runMain graft.IvfScaleStudy [baseDir] [replicas]"`.
  * Prints one JSON line per (nList, nProbe) with train seconds and
  * recall@5 vs brute force at a ~constant scanned-cell fraction.
  */
object IvfScaleStudy {

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(100)
    // arg 3 (round-10 continuation): which trainer(s) to measure —
    // "driver" (sequential Lloyd's), "dist" (decimal-exact distributed
    // k-means), or "both"
    val mode = args.lift(2).getOrElse("driver")
    require(Set("driver", "dist", "both", "two")(mode),
      s"mode must be driver|dist|both|two, got '$mode'")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val baseVecs = Tables.embeddings(spark, base)
      .select("vec_id", "embedding")
    // ×reps with jitter: component i of replica r moves by
    // hash(vec_id, r, i)-derived delta in [-0.05, 0.05)
    val corpus = (0 until reps).map { r =>
      if (r == 0) baseVecs
      else baseVecs.select(
        (col("vec_id") + lit(r * 10000000L)).as("vec_id"),
        expr(s"""transform(embedding, (x, i) -> CAST(x +
            (pmod(xxhash64(vec_id, $r, i), 1000) - 500) / 10000.0
            AS FLOAT))""").as("embedding"))
    }.reduce(_.unionByName(_)).localCheckpoint(true)
    val n = corpus.count()

    val probes = baseVecs.filter(col("vec_id") % 50 === 0)
      .localCheckpoint(true)
    val k = 5
    val exact = graft.operators.Similarity
      .bruteForceTopK(corpus, probes, k)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val trainers: Seq[(String, Int => graft.operators.IvfIndex.Model)] =
      (if (mode == "driver" || mode == "both")
        Seq("driver" -> ((nl: Int) =>
          graft.operators.IvfIndex.train(corpus, nList = nl))) else Nil) ++
      (if (mode == "dist" || mode == "both")
        Seq("dist" -> ((nl: Int) =>
          graft.operators.IvfIndex.trainDistributed(corpus, nList = nl))) else Nil)

    val nLists =
      if (args.length > 3) args.drop(3).toSeq.map(_.toInt)
      else Seq(64, 256, 1024, 2048)

    // "two": the hierarchical quantizer at k1 = k2 = sqrt(nList) —
    // same global cell count, assignment pays k1 + k2 distances
    if (mode == "two") {
      for (nList <- nLists) {
        val k1 = math.max(1, math.sqrt(nList.toDouble).round.toInt)
        val k2 = math.max(1, (nList + k1 - 1) / k1)
        val t0 = System.nanoTime()
        val m2 = graft.operators.IvfIndex.trainTwoLevel(corpus, k1, k2)
        val trainSec = (System.nanoTime() - t0) / 1e9
        Seq((math.max(1, k1 / 4), math.max(1, nList / 16)),
            (math.max(1, k1 / 2), math.max(1, nList / 4))).distinct
          .foreach { case (np1, np) =>
            val t1 = System.nanoTime()
            val approx = graft.operators.IvfIndex
              .topK2(corpus, probes, m2, k = k, nProbe1 = np1, nProbe = np)
              .select("probe_id", "vec_id").collect()
              .map(r => (r.getLong(0), r.getLong(1))).toSet
            val querySec = (System.nanoTime() - t1) / 1e9
            val recall = (approx & exact).size.toDouble / exact.size
            println(f"""{"n":$n,"trainer":"two","nList":${m2.nCells},"k1":$k1,"nProbe1":$np1,"nProbe":$np,"train_sec":$trainSec%.2f,"query_sec":$querySec%.2f,"recall_at_$k":$recall%.3f}""")
          }
      }
      spark.stop()
      return
    }

    for (nList <- nLists; (tname, trainFn) <- trainers) {
      val t0 = System.nanoTime()
      val model = trainFn(nList)
      val trainSec = (System.nanoTime() - t0) / 1e9
      // constant scanned-cell fraction ~1/16 across nList, plus 1/4
      val probesPer = Seq(math.max(1, nList / 16), math.max(1, nList / 4))
      probesPer.distinct.foreach { nProbe =>
        val t1 = System.nanoTime()
        val approx = graft.operators.IvfIndex
          .topK(corpus, probes, model, k = k, nProbe = nProbe)
          .select("probe_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val querySec = (System.nanoTime() - t1) / 1e9
        val recall = (approx & exact).size.toDouble / exact.size
        println(f"""{"n":$n,"trainer":"$tname","nList":$nList,"nProbe":$nProbe,"train_sec":$trainSec%.2f,"query_sec":$querySec%.2f,"recall_at_$k":$recall%.3f,"cell_fraction":${nProbe.toDouble / nList}%.4f}""")
      }
    }
    spark.stop()
  }
}
