package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 scale step — extends the round-10 100× evidence beyond the
  * top-5 dedup ops (verdict #3): the headline OLAP set and the dedup
  * family members the 100× study had not touched, measured at 1×, 10×
  * and 100× of the sf0.01 gate data on fixed 32 cores.
  *
  * Replication model:
  *  - FACTS replicate, DIMENSIONS stay 1× (the realistic 100-TB shape:
  *    dims remain broadcast-sized while facts grow). Replica i shifts
  *    the fact's own key space (o_orderkey/l_orderkey move together so
  *    per-replica join multiplicity is preserved; events shift
  *    event_id AND user_id, so the per-user shapes — sessionize,
  *    retention, audience — scale in the user dimension).
  *  - documents take the Scale100Study affine-cipher replication
  *    (replicas are NOT near-dups of each other; constant dup rate);
  *    embeddings hash-jitter into near-dup clusters.
  *
  * dedup_containment's `auto` strategy may REFUSE at 100× (the
  * calibrated quadratic guard is the designed outcome there, as in
  * ScaleStudy) — recorded as -2, not a crash.
  *
  * Run: `sbt "runMain graft.ScaleWideStudy [baseDir]"` → one JSON line.
  */
object ScaleWideStudy {

  private val O = 10000000L

  private[graft] def replicateAll(spark: SparkSession, base: String,
                                  out: String, k: Int): Unit = {
    val fs = new java.io.File(out)
    if (new java.io.File(fs, "_DONE").exists()) return
    fs.mkdirs()
    // dims: 1× (broadcast-sized at any corpus scale)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      Tables(spark, base, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    def reps(t: String)(f: (DataFrame, Int) => DataFrame): Unit =
      (0 until k).map(i => f(Tables(spark, base, t), i))
        .reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    reps("orders")((df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * O)))
    reps("lineitem")((df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * O)))
    reps("events")((df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * O))
        .withColumn("user_id", col("user_id") + lit(i * O)))
    reps("documents")((df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * O))
        .withColumn("text",
          translate(col("text"), Scale100Study.abc, Scale100Study.cipher(i))))
    reps("embeddings")((df, i) =>
      if (i == 0) df
      else df.select((col("vec_id") + lit(i * O)).as("vec_id"),
        expr(s"""transform(embedding, (x, j) -> CAST(x +
            (pmod(xxhash64(vec_id, $i, j), 1000) - 500) / 10000.0
            AS FLOAT))""").as("embedding"),
        col("label")))
    new java.io.File(fs, "_DONE").createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dirs = Seq(1 -> base) ++ Seq(10, 100).map { k =>
      val d = s"/tmp/graft_scalewide_x$k"
      replicateAll(spark, base, d, k)
      k -> d
    }

    val ops = Seq(
      // headline OLAP at 100×
      "q1_pricing_summary", "q3_top_orders", "q5_region_revenue",
      "q_window_running", "q_sessionize", "q_asof_bucketed",
      "q_audience_overlap_sketch", "q_retention_cohort",
      // dedup/text members the round-10 study did not cover
      "dedup_exact", "dedup_simhash", "dedup_url", "dedup_embedding",
      "dedup_semantic", "dedup_containment", "text_span_scrub",
      "text_contaminate", "pipeline_ccnet_buckets")

    // -2 = the quadratic guard refused (designed outcome, not failure)
    def timeOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: IllegalStateException
          // Option(..): an ISE with a null message must not NPE inside
          // the guard and mask the original failure (ADVICE r11)
          if Option(e.getMessage).exists(_.contains("maxCandidates")) =>
        -2.0 }
    }
    ops.foreach(n => timeOnce(n, "/root/testdata/sf0.001")) // codegen warm

    val passes = (1 to 2).map { _ =>
      (for (op <- ops; (k, d) <- dirs) yield (op, k) -> timeOnce(op, d)).toMap
    }
    def minAt(op: String, k: Int) = {
      val vs = passes.map(_((op, k)))
      if (vs.exists(_ < 0)) -2.0 else vs.min
    }

    val qs = ops.map { op =>
      val t1 = minAt(op, 1); val t10 = minAt(op, 10); val t100 = minAt(op, 100)
      val r10 = if (t1 > 0 && t10 > 0) t10 / t1 else -2.0
      val r100 = if (t1 > 0 && t100 > 0) t100 / t1 else -2.0
      f""""$op":{"x1":$t1%.2f,"x10":$t10%.2f,"x100":$t100%.2f,"r10":$r10%.2f,"r100":$r100%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scalewide_r12","base":"$base","ops":$qs}""")

    // --- ccnet adaptive-vs-exact at 100× (round-12 task #6) --------
    // The 10M-row exact envelope means every replica corpus still
    // takes the exact path; here we FORCE the bounded grid on the
    // 100× corpus and record wall + boundary + bucket-label drift vs
    // exact — the adaptive path exercised on real (replicated) data,
    // not just PlanGuardSpec's synthetic switch.
    locally {
      val d100 = dirs.last._2
      val scores = graft.operators.QualityRules.lmScore(
        Tables.documents(spark, d100), "doc_id", "text")
        .localCheckpoint(true)
      val nDocs = scores.count()
      def run(maxExact: Long): (Double, Double, Double, DataFrame) = {
        spark.conf.set(
          graft.operators.QualityRules.MaxExactBoundaryRowsKey,
          maxExact.toString)
        val t0 = System.nanoTime()
        val b = graft.operators.QualityRules.ccnetBuckets(scores, "doc_id")
          .localCheckpoint(true)
        val wall = (System.nanoTime() - t0) / 1e9
        // recover the effective boundaries from the labeled output
        val q1 = b.where(col("bucket") =!= "tail")
          .agg(min("avg_log2")).head().getDouble(0)
        val q2 = b.where(col("bucket") === "head")
          .agg(min("avg_log2")).head().getDouble(0)
        (wall, q1, q2, b)
      }
      val (wExact, q1e, q2e, bE) = run(Long.MaxValue)
      val (wAdapt, q1a, q2a, bA) = run(1000L)
      spark.conf.unset(graft.operators.QualityRules.MaxExactBoundaryRowsKey)
      val moved = bE.select(col("doc_id"), col("bucket").as("be"))
        .join(bA.select(col("doc_id"), col("bucket").as("ba")), "doc_id")
        .where(col("be") =!= col("ba")).count()
      println(f"""{"metric":"scalewide_ccnet_r12","rows":$nDocs,"exact_sec":$wExact%.2f,"adaptive_sec":$wAdapt%.2f,"q1_exact":$q1e%.6f,"q1_adaptive":$q1a%.6f,"q2_exact":$q2e%.6f,"q2_adaptive":$q2a%.6f,"labels_moved":$moved,"labels_moved_pct":${100.0 * moved / nDocs}%.3f}""")
    }
    spark.stop()
  }
}
