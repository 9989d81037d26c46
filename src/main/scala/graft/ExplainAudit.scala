package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted plans for the headline queries so the
  * pushdown/broadcast/codegen story can be audited (SURVEY.md §6). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_pricing_summary", "q6_forecast_revenue", "q3_top_orders",
      "q_sessionize", "dedup_exact", "q_limit_by", "q_funnel",
      "q_rollup_totals", "q_with_fill", "q_ch_sql",
      "q_semi_anti", "q_grouping_sets", "q_moving_avg", "q_salted_join",
      "pipeline_clean", "q_sequence_match", "q_pivot_if", "q_corr",
      "q_url_parse", "q_ch_array_funcs")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
