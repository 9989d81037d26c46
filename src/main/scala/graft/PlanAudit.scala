package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val audited =
      if (args.nonEmpty) args.toSeq
      else Seq("mix_domains", "mix_epochs", "export_manifest",
        "text_span_dedup", "q_uniq_approx_str", "dedup_keep_best",
        "pipeline_train_export",
        // round 9: the new gate surface
        "dedup_containment", "dedup_ngram_jaccard", "dedup_semantic",
        "dedup_url", "text_pii_scrub", "text_top_terms",
        "ann_knn_classify", "mix_temperature", "q_versioned_collapsing",
        "q_audience_overlap", "q_retention_cohort",
        // round 10: the new gate surface
        "q_audience_overlap_sketch", "span_stream_flags",
        "cms_stream_relation")
    audited.foreach { q =>
      println(s"======== $q")
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      // condensed: exchanges, joins, scans
      plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Scan parquet") ||
        l.contains("HashAggregate") && l.contains("partial") || l.contains("Window") ||
        l.contains("InMemoryTableScan") || l.contains("InMemoryRelation"))
        .foreach(l => println(l.take(200)))
    }
    spark.stop()
  }
}
