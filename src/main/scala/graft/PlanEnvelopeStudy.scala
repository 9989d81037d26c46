package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement (round 12, verdict task #5 carried from round 10):
  * the plan-serialization ENVELOPE for model reference objects.
  *
  * `CentroidDistsExpr` / `PqCodesExpr` / `PqLutExpr` carry their model
  * (centroid matrix / codebooks) as a codegen REFERENCE OBJECT — it
  * rides the stage's serialized task binary, which Spark broadcasts
  * ONCE per stage (TorrentBroadcast), not once per task. So the cost
  * to bound is one model-sized serialize+broadcast+deserialize per
  * STAGE LAUNCH, not per task or per row.
  *
  * Method: the probe frame has ONE ROW PER TASK and trivial row work,
  * so its wall time ≈ scheduler floor + task-binary cost; sweeping the
  * model size k ∈ {16, 1024, 8192, 65536} × dim 64 (16 = the floor
  * probe) isolates the model's marginal launch cost at two task
  * counts. Serialized bytes are measured directly with
  * JavaSerializer on the same object the codegen context references.
  * The PQ codebook shape the round-11 kernels add (m=16, k=256,
  * dsub=4) is swept the same way.
  *
  * Outcome → SURVEY §14: either the envelope stays flat through the
  * IVF-guard's k ≤ 8192 (expected: 4 MB model, one broadcast) and
  * 65536 names its real cost, or the numbers motivate moving matrices
  * to an explicit Broadcast variable. `ann_ivf2pq`'s Model2 worst
  * case (k1 + k1·k2 ≈ 2·nList centroids at the √-decomposition) is
  * covered by the same sweep.
  *
  * Run: `sbt "runMain graft.PlanEnvelopeStudy"` → one JSON line per
  * (model, tasks).
  */
object PlanEnvelopeStudy {

  private def serBytes(o: AnyRef): Long = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(o); oos.close(); bos.size().toLong
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dim = 64
    def probe(tasks: Int): DataFrame =
      spark.range(tasks.toLong, tasks.toLong * 2, 1L, tasks)
        .select(col("id").as("vec_id"),
          expr(s"transform(sequence(0, ${dim - 1}), i -> CAST(" +
            "(pmod(xxhash64(id, i), 2001) - 1000) / 500.0 AS FLOAT))")
            .as("embedding"))

    def centroids(k: Int): Seq[Seq[Double]] =
      (0 until k).map(c => (0 until dim).map(i =>
        ((c * 31 + i * 7) % 2001 - 1000) / 500.0))

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def launch(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // k=16 is the scheduler-floor probe: same plan shape, negligible
    // model — the marginal cost of a big model is (sec_k − sec_16)
    for (k <- Seq(16, 1024, 8192, 65536)) {
      val cs = centroids(k)
      val bytes = serBytes(cs.map(_.toArray).toArray)
      def q(tasks: Int) = probe(tasks).select(col("vec_id"),
        array_min(graft.functions.VectorOps
          .centroidDists(col("embedding"), cs)).as("d"))
      launch(q(4)) // codegen + JIT warm, tiny stage
      for (tasks <- Seq(32, 256)) {
        val sec = (1 to 3).map(_ => timed(launch(q(tasks)))).min
        println(f"""{"study":"plan_envelope_r12","model":"centroids","k":$k,"dim":$dim,"ser_mb":${bytes / 1e6}%.2f,"tasks":$tasks,"sec":$sec%.3f}""")
      }
    }

    // round 13 (r12 verdict #6): the typedlit MAP shape Dict.get
    // compiles in — unlike the codegen reference objects above, the
    // dictionary is a plan LITERAL, so the swept cost covers analysis
    // + plan serialization per query + stage launch. Values sized like
    // real dim attributes (~16 chars). The measured envelope sets
    // Dict.fromTable's maxRows default.
    for (nKeys <- Seq(16, 4096, 16384, 65536)) {
      val dict: Map[Long, String] =
        (0L until nKeys.toLong).map(i => i -> f"value_$i%08d_xxxxxxxx").toMap
      val bytes = serBytes(dict)
      def qd(tasks: Int) = probe(tasks).select(col("vec_id"),
        graft.operators.Dict.get(dict,
          pmod(col("vec_id"), lit(nKeys.toLong))).as("v"))
      launch(qd(4))
      for (tasks <- Seq(32, 256)) {
        val sec = (1 to 3).map(_ => timed(launch(qd(tasks)))).min
        println(f"""{"study":"plan_envelope_r13","model":"dict_map","keys":$nKeys,"ser_mb":${bytes / 1e6}%.3f,"tasks":$tasks,"sec":$sec%.3f}""")
      }
    }

    // the PQ codebook shape the round-11 fused kernels add per plan
    val cb = (0 until 16).map(m => (0 until 256).map(c =>
      (0 until 4).map(i => ((m * 131 + c * 31 + i * 7) % 2001 - 1000) / 500.0)))
    val cbBytes = serBytes(cb.map(_.map(_.toArray).toArray).toArray)
    def qPq(tasks: Int) = probe(tasks).select(col("vec_id"),
      graft.functions.VectorOps.pqCodes(col("embedding"), cb).as("codes"))
    launch(qPq(4))
    for (tasks <- Seq(32, 256)) {
      val sec = (1 to 3).map(_ => timed(launch(qPq(tasks)))).min
      println(f"""{"study":"plan_envelope_r12","model":"pq_codebooks","m":16,"k":256,"ser_mb":${cbBytes / 1e6}%.3f,"tasks":$tasks,"sec":$sec%.3f}""")
    }
    spark.stop()
  }
}
