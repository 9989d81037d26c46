package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement (round 13 — r12 verdict #5): run dedup_semantic's
  * scale arm AS THE OPERATOR'S CONTRACT PRESCRIBES.
  *
  * The r12 scalewide study held nList fixed at the gate's 16 while the
  * corpus grew 100×, so the in-cell Σ|cell|² term grew ~100² — the
  * 19.2× wall outlier was the STUDY disobeying SemDedup's own design
  * rule ("the cell count is the knob": scale nList ∝ n so per-cell
  * size — and therefore the per-cell quadratic — stays constant).
  * This study sweeps both arms at 1×/10×/100× of the sf0.01
  * embeddings (jittered shifted-id replicas, the AnnCorpusStudy
  * transport):
  *
  *   fixed:  nList = 16 always            (what scalewide_r12 did)
  *   scaled: nList = max(16, n / 31)      (the 1× gate's ~31
  *           vectors/cell density held constant — per-cell quadratic
  *           flat by construction)
  *
  * Recorded per arm: train seconds (bounded driver sample — should be
  * ~flat), flag seconds, and the EXACT candidate-pair count Σ|cell|²
  * (the quadratic the knob exists to bound). Expected: fixed goes
  * superlinear in pairs and wall; scaled holds pairs ~∝ n. If scaled
  * does NOT flatten, that is a real finding → guard.
  *
  * Run: `sbt "runMain graft.SemDedupScaleStudy [baseDir]"` → one JSON
  * line per (rep, arm) → tools/semdedup_scale_r13.json.
  */
object SemDedupScaleStudy {

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def corpusAt(reps: Int): DataFrame = {
      val baseVecs = Tables.embeddings(spark, base)
        .select("vec_id", "embedding")
      (0 until reps).map { r =>
        if (r == 0) baseVecs
        else baseVecs.select(
          (col("vec_id") + lit(r * 10000000L)).as("vec_id"),
          expr(s"""transform(embedding, (x, i) -> CAST(x +
              (pmod(xxhash64(vec_id, $r, i), 1000) - 500) / 10000.0
              AS FLOAT))""").as("embedding"))
      }.reduce(_.unionByName(_)).localCheckpoint(true)
    }

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for (reps <- Seq(1, 10, 100)) {
      val corpus = corpusAt(reps)
      val n = corpus.count()
      for ((arm, nList) <- Seq(
          "fixed" -> 16,
          "scaled" -> math.max(16, (n / 31L).toInt))) {
        val (model, tTrain) = timed(
          graft.operators.IvfIndex.train(corpus, nList = nList))
        // the quadratic the knob bounds: sum of |cell|^2 over cells
        val pairs = corpus
          .select(graft.operators.IvfIndex
            .assignCell(col("embedding"), model).as("cell"))
          .groupBy("cell").agg(count(lit(1)).as("c"))
          .agg(sum(col("c") * col("c"))).collect()(0).getLong(0)
        val (_, warm) = timed(
          graft.operators.SemDedup.flag(corpus, model,
            tau = VectorQueries.SemTau)
            .write.format("noop").mode("overwrite").save())
        val secs = (1 to 2).map(_ => timed(
          graft.operators.SemDedup.flag(corpus, model,
            tau = VectorQueries.SemTau)
            .write.format("noop").mode("overwrite").save())._2).min
        println(f"""{"study":"semdedup_scale_r13","reps":$reps,"n":$n,"arm":"$arm","nList":$nList,"cells_sq_pairs":$pairs,"train_sec":$tTrain%.2f,"flag_sec":$secs%.2f,"warm_sec":$warm%.2f}""")
      }
    }
    spark.stop()
  }
}
