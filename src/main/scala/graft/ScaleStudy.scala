package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offline scale harness (not part of the driver contract): replicate
  * the largest shipped SF by `k` with shifted keys and measure how the
  * headline queries scale — the empirical step behind SURVEY §5's
  * design arguments ("would this plan survive a 100× scale-up?").
  *
  * Replication semantics chosen to scale the AXES that matter:
  *  - facts (lineitem/orders/events) grow k× with disjoint key ranges;
  *    events also grows the USER population k× (distinct-count and
  *    sessionize state scale), with time density growing in place;
  *  - documents grow k× under new doc_ids with a per-replica Caesar
  *    rotation of the letters (a cheap codegen `translate`): replicas
  *    of one doc are NOT near-dups of each other, so the corpus keeps
  *    a CONSTANT duplication rate and duplicate-GROUP sizes as it
  *    grows — the realistic 100 TB model. (Verbatim replication would
  *    instead grow every near-dup group k×, inflating candidate pairs
  *    ~k² — a group-size stress, not a scale model; the near-dup ops'
  *    ratios would then measure the replication artifact, not the
  *    plan. Within a replica the rotation is one substitution cipher,
  *    so token boundaries, doc lengths, and every within-replica
  *    duplicate relation are preserved exactly.)
  *  - embeddings grows the corpus k× (brute-force ANN cost scales);
  *  - dimensions (region..part) stay fixed, like real warehouses.
  *
  * Run: `sbt "runMain graft.ScaleStudy [baseDir] [k] [workDir]"`.
  * Prints one JSON line: per-query seconds at base and at k×, plus the
  * time ratio (ideal scan-bound behavior on fixed cores ≈ k; anything
  * wildly above k is a scale-killer to hunt).
  */
object ScaleStudy {

  private val shift = 100000000L // key offset per replica — disjoint ranges

  private def replicate(spark: SparkSession, base: String, out: String,
                        k: Int): Unit = {
    val fs = new java.io.File(out)
    if (new java.io.File(fs, "_DONE").exists()) return
    fs.mkdirs()
    // dims: link by rewrite (small)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      Tables(spark, base, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    def scaled(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val src = Tables(spark, base, t)
      val un = (0 until k).map(i => f(src, i)).reduce(_.unionByName(_))
      un.write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    scaled("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * shift)) }
    scaled("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * shift)) }
    scaled("events") { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * shift))
        .withColumn("user_id", col("user_id") + lit(i * 10000000L)) }
    scaled("documents") { (df, i) =>
      val abc = "abcdefghijklmnopqrstuvwxyz"
      val rot = abc.drop(i % 26) + abc.take(i % 26)
      df.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("text", translate(col("text"),
          abc + abc.toUpperCase, rot + rot.toUpperCase)) }
    scaled("embeddings") { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)) }
    new java.io.File(fs, "_DONE").createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    // r9 suffix: the replica layout changed (per-replica text rotation)
    val work = args.lift(2).getOrElse(s"/tmp/graft_scale_r9_x$k")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    replicate(spark, base, work, k)

    // -2 = the operator itself REFUSED (the round-10 quadratic guard:
    // past maxCandidates the exact set-overlap ops throw loudly rather
    // than run n² — at 10× of sf0.1 both dedup_ngram_jaccard and
    // dedup_containment cross the bound BY DESIGN, and the refusal IS
    // the measured scale behavior); -1 = any other failure
    def timeOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: IllegalStateException if e.getMessage != null &&
          e.getMessage.contains("maxCandidates") => -2.0
        case e: Throwable =>
          System.err.println(s"[scale] $name failed at $dir: ${e.getMessage}")
          -1.0
      }
    }
    // headline + the LLM-pipeline set (round 9): the scale mandate's
    // own operators get measured ratios, not design arguments.
    // Optional trailing args restrict the set (focused re-runs for
    // newly added operators without repaying the full sweep).
    val only = args.drop(3).toSet
    val unknown = only.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")}")
    val studied =
      if (only.isEmpty) Bench.headline ++ Bench.pipeline
      else only.toSeq.sorted
    // warm codegen at the smallest SF
    studied.foreach { n =>
      try timeOnce(n, "/root/testdata/sf0.001") catch { case _: Throwable => () }
    }
    // interleaved passes (same rationale as Bench), min-of-3
    val passes = (1 to 3).map { _ =>
      studied.map { n =>
        n -> (timeOnce(n, base), timeOnce(n, work))
      }.toMap
    }
    // min over SUCCESSFUL runs; a query with none keeps its sentinel
    // (-2 refused-by-guard / -1 failed) and reports no ratio
    def minOk(ts: Seq[Double]): Double = {
      val ok = ts.filter(_ >= 0)
      // all-sentinel: -2 (refused) only if every pass refused, else -1
      if (ok.nonEmpty) ok.min
      else if (ts.forall(_ == -2.0)) -2.0 else -1.0
    }
    val rows = studied.map { n =>
      val bts = passes.map(_(n)._1); val sts = passes.map(_(n)._2)
      val bs = minOk(bts); val ss = minOk(sts)
      (n, bs, ss, if (bs > 0 && ss > 0) ss / bs else -1.0)
    }
    val qs = rows.map { case (n, b, s, r) =>
      f""""$n":{"base":$b%.3f,"scaled":$s%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    println(f"""{"metric":"scale_study","k":$k,"queries":$qs}""")
    spark.stop()
  }
}
