package graft

import org.apache.spark.sql.SparkSession

/** Round-12 scale step for the round's own additions: the ClickHouse-
  * analytics widening (B32-B50) plus ann_mrl, measured at 1×, 10× and
  * 100× of the sf0.01 gate data on fixed 32 cores — the same
  * replication model and pass discipline as [[ScaleWideStudy]] (facts
  * replicate with shifted key spaces, dims stay broadcast-sized).
  *
  * What the replication exercises per family: the per-entity
  * aggregates (sum/minmax_map, delta_sum, bounding_ratio, arg_minmax,
  * sequence_next_node) scale in GROUP COUNT (user ids shift per
  * replica, per-group size constant); the per-day statistics (welch/
  * ks/mann-whitney) scale in GROUP SIZE (30 days absorb 100× rows —
  * the long-moment envelopes' stress direction); lttb/sparkbar/
  * exp_decay/fill_interp stress their window+grid shapes; ann_mrl
  * scales probes AND corpus 100× each (10⁴× pair work for the prefix
  * scan stage).
  *
  * A loud envelope refusal (ANSI overflow / raise_error guard) is a
  * DESIGNED outcome at some scale for the long-moment family — it
  * records as -3, distinct from the -2 candidate-guard refusal and
  * from a crash.
  *
  * Run: `sbt "runMain graft.AnalyticsScaleStudy [baseDir]"` → one
  * JSON line (tools/analytics_scale_r12.json).
  */
object AnalyticsScaleStudy {

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
      ScaleWideStudy.replicateAll(spark, base, d, k)
      k -> d
    }

    val ops = Seq(
      "q_sum_map", "q_minmax_map", "q_arg_minmax", "q_delta_sum",
      "q_bounding_ratio", "q_max_intersections", "q_interval_union",
      "q_linreg", "q_welch_ttest", "q_ks_test", "q_mann_whitney",
      "q_quantile_weighted", "q_geohash", "q_sparkbar",
      "q_exp_decay_avg", "q_lttb", "q_fill_interp", "q_cramers_v",
      "q_sequence_next_node", "ann_mrl",
      // round-13 statistics completions: student/ztest stress the
      // long-moment envelope like welch; entropy/theils/contingency
      // stress the cell-table collapse (cells stay constant as rows
      // grow — the fold work is scale-invariant by design)
      "q_student_ttest", "q_mean_ztest", "q_entropy", "q_theils_u",
      "q_contingency",
      // the topk gates' fold is cell-table-bounded (users), and the
      // replication grows the user domain 100x — the stress is the
      // sequential per-group fold length
      "q_topk_sketch", "q_topk_weighted", "q_cramers_v_bc", "q_covar",
      // bloom scales in filter-relation size (capped at m); ipv4 is a
      // pure scan projection; interval_join's windows grow with users
      // while the bucket grid bounds the candidate pairs
      "q_bloom_filter", "q_ipv4_funcs", "q_interval_join", "q_anova")

    def timeOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable
            if Option(e.getMessage).exists(m =>
              m.contains("envelope") || m.contains("overflow") ||
                m.contains("ARITHMETIC")) ||
              Option(e.getCause).flatMap(c => Option(c.getMessage))
                .exists(m => m.contains("envelope") ||
                  m.contains("overflow") || m.contains("ARITHMETIC")) =>
          -3.0 // loud envelope refusal — designed, not a crash
      }
    }
    ops.foreach(n => timeOnce(n, "/root/testdata/sf0.001")) // codegen warm

    val passes = (1 to 2).map { _ =>
      (for (op <- ops; (k, d) <- dirs) yield (op, k) -> timeOnce(op, d)).toMap
    }
    // min wall time over the passes that SUCCEEDED; a sentinel (<0)
    // only reports through when every pass refused/crashed, so one
    // transient refusal can't poison a cell another pass completed.
    def minAt(op: String, k: Int) = {
      val vs = passes.map(_((op, k)))
      val ok = vs.filter(_ >= 0)
      if (ok.nonEmpty) ok.min else vs.min
    }
    val qs = ops.map { op =>
      val t1 = minAt(op, 1); val t10 = minAt(op, 10); val t100 = minAt(op, 100)
      val r10 = if (t1 > 0 && t10 > 0) t10 / t1 else -2.0
      val r100 = if (t1 > 0 && t100 > 0) t100 / t1 else -2.0
      f""""$op":{"x1":$t1%.2f,"x10":$t10%.2f,"x100":$t100%.2f,"r10":$r10%.2f,"r100":$r100%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"analytics_scale_r13","base":"$base","ops":$qs}""")
    spark.stop()
  }
}
