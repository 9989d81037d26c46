package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement (round 11) — two round-10 verdict asks in one
  * harness:
  *
  *  1. **Serving cost at equal recall, ivfpq vs ivf2pq** (verdict #2):
  *     both compositions rank by the SAME ADC distance over the same
  *     codes, so at equal probed-cell budget their recall should
  *     coincide and the comparison is pure serving cost (assignment +
  *     probe-ranking overhead of the two-level quantizer vs flat).
  *
  *  2. **A harder ANN corpus** (verdict #8): every round-10 IVF
  *     measurement ran on the jittered replica, which saturates
  *     recall at 1.0 — it validates mechanics, not recall
  *     differentiation. This study adds a MIXTURE-OF-BALLS corpus
  *     with a controlled overlap knob: C cluster centers with
  *     components uniform in [-2, 2] (expected center separation
  *     ~sqrt(2·(4/3)·dim) ≈ 13 at dim 64), points = center +
  *     per-component uniform noise in [-sigma, sigma). sigma sweeps
  *     the separation/noise ratio: 0.5 = well-separated, 2.0 =
  *     heavily overlapped. Everything is hash-derived (xxhash64), so
  *     the corpus is deterministic and partitioning-independent.
  *
  * Run: `sbt "runMain graft.AnnCorpusStudy <mog|replica> <n> <args>"`
  *  - mog:     args = <clusters> <sigma> [nList] [pqK]
  *  - replica: args = <baseDir> <reps>   [nList] [pqK]  (IvfScaleStudy's
  *             jittered-replica corpus, for the 200k serving A/B)
  * Prints one JSON line per (index, probe budget) with train seconds,
  * serving seconds (min of 2 after warm), and recall@5 vs the exact
  * ground truth in the metric the index actually ranks by (cosine for
  * ivf/ivf2, L2 for the PQ family).
  */
object AnnCorpusStudy {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("mog")
    require(Set("mog", "replica")(mode), s"mode mog|replica, got '$mode'")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dim = 64
    val (corpus, tag) = mode match {
      case "mog" =>
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val clusters = args.lift(2).map(_.toInt).getOrElse(256)
        val sigma = args.lift(3).map(_.toDouble).getOrElse(1.0)
        // round 13: anisotropy knob for the OPQ arm — aniso=1 scales
        // component i by 2^-(i div 8) (variance halves every 8 dims),
        // the decaying-spectrum shape real learned embeddings have and
        // the setting OPQ exists for; aniso=0 keeps the isotropic ball
        // mixture (where a rotation provably can't help — the honest
        // control arm)
        val aniso = args.lift(6).map(_.toInt).getOrElse(0)
        val scale =
          if (aniso == 1) " / CAST(shiftleft(1L, CAST(i / 8 AS INT)) AS DOUBLE)"
          else ""
        val c = spark.range(n).select(col("id").as("vec_id"),
          expr(
            s"""transform(sequence(0, ${dim - 1}), i -> CAST((
               |  (pmod(xxhash64(52962L, pmod(xxhash64(vec_id), $clusters), i), 2001) - 1000) / 500.0
               |  + (pmod(xxhash64(vec_id, i, 1025L), 2001) - 1000) / 1000.0 * $sigma
               |)$scale AS FLOAT))""".stripMargin).as("embedding"))
          .localCheckpoint(true)
        (c, s""""corpus":"mog","clusters":$clusters,"sigma":$sigma,"aniso":$aniso""")
      case "replica" =>
        val base = args.lift(1).getOrElse("/root/testdata/sf0.1")
        val reps = args.lift(2).map(_.toInt).getOrElse(100)
        val baseVecs = Tables.embeddings(spark, base)
          .select("vec_id", "embedding")
        val c = (0 until reps).map { r =>
          if (r == 0) baseVecs
          else baseVecs.select(
            (col("vec_id") + lit(r * 10000000L)).as("vec_id"),
            expr(s"""transform(embedding, (x, i) -> CAST(x +
                (pmod(xxhash64(vec_id, $r, i), 1000) - 500) / 10000.0
                AS FLOAT))""").as("embedding"))
        }.reduce(_.unionByName(_)).localCheckpoint(true)
        (c, s""""corpus":"replica","reps":$reps""")
    }
    val n = corpus.count()
    val nList = (if (mode == "mog") args.lift(4) else args.lift(3))
      .map(_.toInt).getOrElse(1024)
    // round 12: PQ codebook resolution knob — k=16 (4-bit, the
    // oracle-gated shape) vs k=256 (8-bit, the FAISS default) decides
    // whether mog's low ADC recall is the code BUDGET or ADC itself
    val pqK = (if (mode == "mog") args.lift(5) else args.lift(4))
      .map(_.toInt).getOrElse(16)
    val k1 = math.max(1, math.sqrt(nList.toDouble).round.toInt)
    val k2 = math.max(1, (nList + k1 - 1) / k1)

    // ~100 probes regardless of corpus size (fixed serving batch — the
    // AnnProbeStudy lesson: serving scales the corpus, not the batch)
    val step = math.max(1L, n / 100L)
    val probes = corpus.filter(pmod(col("vec_id"), lit(step)) === 0L)
      .localCheckpoint(true)
    val nProbes = probes.count()
    val k = 5

    // exact ground truths, both metrics (cosine: what ivf/ivf2 rank
    // by; L2: what ADC approximates)
    val exactCos = graft.operators.Similarity
      .bruteForceTopK(corpus, probes, k)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p = probes.select(col("vec_id").as("probe_id"),
      col("embedding").cast("array<double>").as("pv"))
    val cc = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("cv"))
    import org.apache.spark.sql.expressions.Window
    val exactL2 = cc.join(broadcast(p), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        aggregate(zip_with(col("pv"), col("cv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x).as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("d2").asc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def recallOf(df: DataFrame, gt: Set[(Long, Long)]): Double = {
      val got = df.select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & gt).size.toDouble / gt.size
    }
    // serving time = min of 2 after one warm run; recall from the warm
    def serve(name: String, trainSec: Double, gt: Set[(Long, Long)],
              budget: String, build: () => DataFrame): Unit = {
      val rec = recallOf(build(), gt) // warm + recall
      val secs = (1 to 2).map { _ =>
        timed(build().write.format("noop").mode("overwrite").save())._2
      }.min
      println(f"""{"study":"ann_corpus_r12",$tag,"n":$n,"probes":$nProbes,"index":"$name","nList":$nList,"pqK":$pqK,$budget,"train_sec":$trainSec%.2f,"serve_sec":$secs%.2f,"recall_at_$k":$rec%.3f}""")
    }

    val (ivf, tIvf) = timed(
      graft.operators.IvfIndex.train(corpus, nList = nList))
    val (ivf2, tIvf2) = timed(
      graft.operators.IvfIndex.trainTwoLevel(corpus, k1, k2))
    val (pq, tPq) = timed(
      graft.operators.PqIndex.train(corpus, dim = dim, m = 16, k = pqK))
    val (pqRes, tPqRes) = timed(
      graft.operators.PqIndex.trainResidual(corpus, ivf, dim = dim,
        m = 16, k = pqK))

    // OPQ vs raw PQ at the same byte budget (round 13, verdict #2):
    // flat exhaustive ADC for both, so the ONLY difference is the
    // trained rotation — the recall delta IS the rotation's value on
    // this corpus (expected ~0 on isotropic mog, real lift with the
    // aniso spectrum)
    val (opq, tOpq) = timed(
      graft.operators.OpqIndex.train(corpus, dim = dim, m = 16, k = pqK,
        iters = 4))
    serve("pq_flat", tPq, exactL2, """"nProbe":0""",
      () => graft.operators.PqIndex.topK(corpus, probes, pq, k))
    serve("opq_flat", tOpq, exactL2, """"nProbe":0""",
      () => graft.operators.OpqIndex.topK(corpus, probes, opq, k))

    // MRL prefix serving (round 12, C29h): no trained model at all —
    // recall is bought with prefix dims + shortlist breadth instead of
    // cells/codes; measured at two prefix widths and shortlists 10·k
    // and 40·k so the recall-vs-scan-fraction trade is on record
    for (md <- Seq(8, 16); sl <- Seq(10 * k, 40 * k)) {
      serve("mrl", 0.0, exactL2, s""""mrlDim":$md,"shortlist":$sl""",
        () => graft.operators.Similarity.mrlTopK(corpus, probes, k, md, sl))
    }

    // probed-cell budgets: ~1/16 and ~1/4 of global cells; ivf2 probes
    // the SAME global-cell count through (nProbe1, nProbe)
    for (np <- Seq(math.max(1, nList / 16), math.max(1, nList / 4))) {
      val np1 = math.max(1, math.min(k1, (np + k2 - 1) / k2 * 2))
      serve("ivf", tIvf, exactCos, s""""nProbe":$np""",
        () => graft.operators.IvfIndex.topK(corpus, probes, ivf, k, np))
      serve("ivf2", tIvf2, exactCos, s""""nProbe1":$np1,"nProbe":$np""",
        () => graft.operators.IvfIndex.topK2(corpus, probes, ivf2, k, np1, np))
      serve("ivfpq", tIvf + tPq, exactL2, s""""nProbe":$np""",
        () => graft.operators.PqIndex.topKIvf(corpus, probes, ivf, pq, k, np))
      serve("ivf2pq", tIvf2 + tPq, exactL2, s""""nProbe1":$np1,"nProbe":$np""",
        () => graft.operators.PqIndex.topKIvf2(corpus, probes, ivf2, pq, k, np1, np))
      serve("ivfpq_residual", tIvf + tPqRes, exactL2, s""""nProbe":$np""",
        () => graft.operators.PqIndex.topKIvfResidual(corpus, probes, ivf,
          pqRes, k, np))
    }
    spark.stop()
  }
}
