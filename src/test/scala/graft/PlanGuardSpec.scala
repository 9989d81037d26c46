package graft

/** Plan-REGRESSION guards (round 10): the round-9 containment episode
  * proved plan shape can rot invisibly while correctness gates stay
  * green (an 87 s plan and a 3.7 s plan return identical rows). This
  * suite pins the load-bearing physical-plan properties the scale
  * story depends on; any regression fails here, not in a bench
  * archaeology session two rounds later.
  *
  * Properties are asserted on the PLANNED (pre-execution) physical
  * plan: scan pushdown/pruning, static join strategy, window-limit
  * insertion and exchange counts are all decided by the planner, so
  * no data needs to move to check them.
  */
class PlanGuardSpec extends SparkFunSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("headline scans push filters and prune columns") {
    // q6: the selective date+discount+quantity filter must reach the
    // parquet scan, not run post-scan
    val q6 = plan("q6_forecast_revenue")
    assert(q6.contains("PushedFilters: [IsNotNull"),
      s"q6 scan lost its pushed filters:\n$q6")
    // q1: lineitem has 16 columns; the scan must read only the 7 the
    // query touches — l_comment/l_partkey in ReadSchema means pruning
    // regressed and a 100-TB scan reads the fat columns for nothing
    val q1 = plan("q1_pricing_summary")
    assert(!q1.contains("l_comment") && !q1.contains("l_partkey"),
      s"q1 scan reads pruned-away columns:\n$q1")
    assert(q1.contains("ReadSchema"), s"q1 lost its columnar scan:\n$q1")
  }

  test("dimension joins broadcast (q3, q5)") {
    Seq("q3_top_orders", "q5_region_revenue").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q: dimension join no longer broadcasts:\n$p")
    }
  }

  test("scan-stage-only operators plan zero pre-aggregation exchanges") {
    // these are one-pass map-side operators followed by at most a
    // final ordering; an Exchange BEFORE the aggregate would mean a
    // full-corpus shuffle appeared in a scan-stage op. Allow the
    // post-agg singlePartition/rangepartitioning exchanges (they move
    // #groups rows, not the corpus); forbid hashpartitioning of the
    // raw scan output
    Seq("q_array_hof", "text_quality", "vec_stats").foreach { q =>
      val p = plan(q)
      val badExchanges = p.linesIterator.filter(l =>
        l.contains("Exchange hashpartitioning")).toSeq
      assert(badExchanges.isEmpty,
        s"$q: corpus-wide shuffle appeared in a scan-stage op:\n$p")
    }
  }

  test("top-n queries keep the WindowGroupLimit partial pruning") {
    // WindowGroupLimit prunes each partition to its top-n BEFORE the
    // rank shuffle — without it every (group, row) crosses the network
    // to be discarded on the other side
    Seq("q_topk_events", "sample_stratified", "text_top_terms").foreach { q =>
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"),
        s"$q: partial top-n pruning regressed:\n$p")
    }
  }

  test("asof join stays sort-merge on the bucketed path (no exchange re-shuffle)") {
    // q_asof_bucketed's contract: pre-bucketed inputs join with no
    // additional Exchange inserted for the join itself
    val p = plan("q_asof_bucketed")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"asof join fell off the merge path:\n$p")
  }

  test("text_lm_score: one tokenize pass, bigram strings never shuffle") {
    // the (id, hash) table feeds the count build AND the score join;
    // the persist seam must keep tokenize+shingle+hash to ONE pass (a
    // second Generate in the final plan = the recomputation disease
    // the span/minhash families fixed). The count-table join has no
    // forced broadcast hint — on tiny inputs the planner may still
    // pick BroadcastHashJoin from size ESTIMATES, which is cost-based
    // and flips to the shuffled shape as the corpus grows (exactly
    // the behavior the round-9 verdict demanded of the minhash side
    // joins), so broadcast presence is not asserted either way.
    val p = plan("text_lm_score")
    assert(p.linesIterator.count(_.contains("Generate explode")) <= 1,
      s"lm_score tokenizes the corpus twice (persist seam lost):\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("_bg")),
      s"lm_score shuffles bigram STRINGS (text must stay in the scan stage):\n$p")
  }

  test("quantile sketch: one corpus shuffle, post-agg windows only") {
    // the only hashpartitioning of non-aggregated rows is the state
    // build's (group, bucket) partial-agg shuffle; the window stages
    // run over <= #groups*B post-agg rows
    val p = plan("q_quantile_merge_portable")
    val rawExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(rawExchanges.size <= 3, // state agg + merge agg + estimate agg
      s"quantile sketch grew extra corpus shuffles:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum") ||
      p.contains("HashAggregate"),
      s"quantile sketch lost map-side partial aggregation:\n$p")
  }

  test("ccnet buckets: no unbounded global Percentile past the exact envelope") {
    // the round-10 weak flag: the tertile boundary aggregate ran exact
    // Percentile unconditionally — one O(n) buffer on ONE task at any
    // corpus size. The fix is cost-switched (QualityRules.ccnetBuckets);
    // past the threshold the GATE QUERY ITSELF must plan the bounded
    // grid, not Percentile — asserted here by forcing the threshold to
    // zero and planning the registered query
    spark.conf.set(graft.operators.QualityRules.MaxExactBoundaryRowsKey, "0")
    try {
      val p = plan("pipeline_ccnet_buckets")
      assert(!p.toLowerCase.contains("percentile"),
        s"ccnet boundary aggregate is unbounded past the threshold:\n$p")
    } finally
      spark.conf.unset(graft.operators.QualityRules.MaxExactBoundaryRowsKey)
    // under the default envelope the gate keeps the exact (oracle-
    // matching) aggregate
    val pd = plan("pipeline_ccnet_buckets")
    assert(pd.toLowerCase.contains("percentile"),
      s"ccnet default path lost its exact percentile:\n$pd")
  }

  test("PQ serves join against a MATERIALIZED coded index, never a " +
      "lazy encode projection (round-12 per-candidate re-eval fix)") {
    // whole-stage codegen defers a lazy stream-side projection into
    // the join's emit path — the encode/assignment then re-evaluates
    // PER CANDIDATE (measured 28.2 s -> 0.20 s on a 20k mog corpus
    // for topKIvf2). The fix materializes the coded corpus via
    // localCheckpoint; its plan signature is a bare RDD scan as the
    // join's stream side, with no pq_codes/centroid_dists left of it.
    Seq("ann_pq", "ann_ivfpq", "ann_ivf2pq", "ann_ivfpq_residual")
      .foreach { q =>
        val p = plan(q)
        val joinAt = p.indexOf("roadcast")
        assert(joinAt >= 0, s"$q: serving join missing:\n$p")
        // below the join, the corpus side must be the checkpointed
        // scan: any pq_codes under the join means the coded
        // projection leaked back into the serve stage (pq_lut on the
        // probe side is fine and expected)
        assert(!p.substring(joinAt).contains("pq_codes"),
          s"$q: coded-corpus projection re-inlined into the serve join:\n$p")
      }
  }

  test("funnel strict: one user_id shuffle serves rank + every step window") {
    // row_number and all per-step window mins share the entity
    // partitioning: exactly one Exchange hashpartitioning over the
    // raw events (the groupBy reuses it), anything more means the
    // window specs diverged
    val p = plan("q_funnel_strict")
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size <= 2, // events->user_id + post-agg level count
      s"funnel strict re-shuffles between window passes:\n$p")
  }

  test("struct-extreme aggregates map-side combine, no window (r12 family)") {
    // argMinMax/boundingRatio are ONE aggregate: partial_min/partial_max
    // of structs before the exchange, zero Window operators
    Seq("q_arg_minmax", "q_bounding_ratio").foreach { q =>
      val p = plan(q)
      assert(p.contains("partial_min") || p.contains("partial_max"),
        s"$q lost its map-side combine:\n$p")
      assert(!p.contains("WindowExec") && !p.contains("Window "),
        s"$q regressed to a window plan:\n$p")
    }
  }

  test("lttb: bucket stats BROADCAST to candidates, never sort-merge") {
    val p = plan("q_lttb")
    assert(p.contains("BroadcastHashJoin"),
      s"lttb bucket-stats join no longer broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"lttb shuffles candidates against B-row bucket stats:\n$p")
  }

  test("dictGet: join-free, exchange-free until the final groupBy") {
    val p = plan("q_dict_get")
    assert(!p.contains("Join"),
      s"dictGet compiled-in map regressed to a join:\n$p")
  }

  test("bloom membership: filter side BROADCASTS, never sort-merge (round 13)") {
    // the filter is <= m rows by construction; a SortMergeJoin here
    // would shuffle every probe bit against a 1024-row relation
    val p = plan("q_bloom_filter")
    assert(p.contains("BroadcastHashJoin"),
      s"bloom filter join no longer broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"bloom probes shuffle against the m-row filter:\n$p")
  }

  test("opq serving: the rotation adds NO exchange before the encode scan (round 13)") {
    // rotate is a map-side projection; the only corpus exchanges
    // allowed are the ones ann_pq itself plans (the final ranking
    // window's partitioning). An extra hashpartitioning of raw
    // embeddings means the rotation started shuffling.
    val pPq = plan("ann_pq")
    val pOpq = plan("ann_opq")
    def exchanges(p: String) =
      p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges(pOpq) <= exchanges(pPq),
      s"ann_opq plans more corpus exchanges than ann_pq:\n$pOpq")
  }

  test("topk sketch gate: one corpus shuffle (the cell groupBy), " +
    "fold runs post-aggregation (round 13)") {
    val p = plan("q_topk_sketch")
    // the (type, user) cell collapse is the only corpus-scale
    // hashpartitioning; the register fold happens on the collapsed
    // relation (a second exchange moves #cells rows, not events)
    val corpusExchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(corpusExchanges.size <= 2,
      s"q_topk_sketch plans extra corpus shuffles:\n$p")
  }

  test("mrl serving: prefix shortlist is the bounded aggregate, " +
    "refine joins broadcast") {
    val p = plan("ann_mrl")
    // stage 1 must be the TopK partial aggregate (no window over the
    // probes×corpus scored rows); stage 2's joins all broadcast
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"mrl refine no longer broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"mrl shuffles the corpus against the shortlist:\n$p")
  }

  test("sliding hll: day-window mapping and day filter BROADCAST; no " +
    "raw-row window recount (round 14)") {
    val p = plan("q_sliding_hll")
    // the #days×window mapping and the observed-days semi filter are
    // bounded relations — a SortMergeJoin here means register state
    // shuffled against a relation that fits in one broadcast
    assert(p.contains("BroadcastHashJoin"),
      s"sliding-hll mapping join no longer broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"sliding-hll shuffles sketch state against a bounded relation:\n$p")
    // no window operator at all: the 'sliding' comes from the mapping
    // join + register max, never a per-row frame over raw events
    assert(!p.contains("WindowExec"),
      s"sliding-hll regressed to a raw-row window:\n$p")
  }

  test("nb classify: model and class joins broadcast; the only " +
    "corpus-keyed window is the per-doc argmax (round 14)") {
    val p = plan("text_nb_classify")
    // the ≤ B·|classes| model must hash-join broadcast; the |classes|
    // frame must nested-loop broadcast — a SortMergeJoin on either
    // means the corpus shuffles against a bounded relation
    assert(p.contains("BroadcastHashJoin"),
      s"nb model join no longer broadcasts:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"nb classes frame degenerated to a cartesian product:\n$p")
    // argmax window partitions by the doc key, never globally
    assert(!p.contains("Window [") ||
      !p.contains("windowspecdefinition()"),
      s"nb argmax window lost its per-doc partitioning:\n$p")
  }

  test("dsir: both bucket-count distributions broadcast; the corpus " +
    "never sort-merges against a bounded relation (round 14)") {
    val p = plan("text_dsir")
    assert(p.contains("BroadcastHashJoin"),
      s"dsir bucket-count joins no longer broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"dsir totals frame degenerated to a cartesian product:\n$p")
    // top-k must be TakeOrdered, never a global sort of all docs
    assert(p.contains("TakeOrderedAndProject"),
      s"dsir top-k lost its bounded-heap TakeOrdered:\n$p")
  }

  test("stl decompose: seasonal means broadcast back; the trend " +
    "window partitions by series key (round 14)") {
    val p = plan("q_stl_decompose")
    assert(p.contains("BroadcastHashJoin"),
      s"stl seasonal join no longer broadcasts:\n$p")
    assert(!p.contains("windowspecdefinition()"),
      s"stl trend window lost its per-key partitioning:\n$p")
  }

  test("period detect: the floor-mean stats broadcast; the lag " +
    "self-join runs on the daily pre-agg, not raw rows (round 14)") {
    val p = plan("q_period_detect")
    assert(p.contains("BroadcastHashJoin"),
      s"acf mean-stats join no longer broadcasts:\n$p")
    // the daily collapse (partial+final) and the per-lag sum must all
    // be hash aggregates — the lag fan-out runs over the #days
    // relation those aggregates produce, never over raw rows
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"acf lost its daily pre-aggregation before the lag join:\n$p")
  }
}
