package graft

import org.apache.spark.sql.functions._
import graft.functions.QuantileSketch
import graft.operators.QualityRules

/** Round 11 — the bounded ccnet boundary path (closes the round-10
  * verdict's one weak flag): `ccnetBuckets` cost-switches its tertile
  * aggregate from exact `Percentile` (one O(n) buffer on ONE task —
  * fine at gate scale, an OOM at 10¹⁰ docs) to the bounded adaptive
  * QuantileSketch grid. This suite pins
  *  - the switch itself (conf-forced bounded path plans NO Percentile),
  *  - the DRIFT BOUND of the bounded path vs the exact tertiles on the
  *    gate corpus (boundaries within one grid cell; bucket labels can
  *    differ only for docs within a cell of an exact boundary),
  *  - adaptiveQuantiles edge semantics (empty, constant, NaN input).
  */
class CcnetBoundarySpec extends SparkFunSuite {

  private lazy val scores =
    QualityRules.lmScore(Tables.documents(spark, sf), "doc_id", "text")
      .localCheckpoint(true)

  private def forcedBounded[A](f: => A): A = {
    spark.conf.set(QualityRules.MaxExactBoundaryRowsKey, "0")
    try f finally spark.conf.unset(QualityRules.MaxExactBoundaryRowsKey)
  }

  test("forced-bounded path plans no Percentile anywhere") {
    val p = forcedBounded {
      QualityRules.ccnetBuckets(scores, "doc_id")
        .queryExecution.executedPlan.toString
    }
    assert(!p.toLowerCase.contains("percentile"),
      s"bounded boundary path still plans an exact Percentile:\n$p")
    // and the default (gate) path keeps the exact aggregate — the
    // switch is real, not a blanket replacement
    val pd = QualityRules.ccnetBuckets(scores, "doc_id")
      .queryExecution.executedPlan.toString
    assert(pd.toLowerCase.contains("percentile"),
      s"default path lost its exact percentile (gate parity at risk):\n$pd")
  }

  test("bounded boundaries drift at most one grid cell from exact tertiles") {
    val ex = scores.agg(
      expr("percentile(avg_log2, CAST(1.0 AS DOUBLE)/CAST(3.0 AS DOUBLE))"),
      expr("percentile(avg_log2, CAST(2.0 AS DOUBLE)/CAST(3.0 AS DOUBLE))"))
      .head()
    val (q1, q2) = (ex.getDouble(0), ex.getDouble(1))
    val mm = scores.agg(min("avg_log2"), max("avg_log2")).head()
    val cell = (mm.getDouble(1) - mm.getDouble(0)) / QuantileSketch.AdaptiveB
    val est = QuantileSketch.adaptiveQuantiles(scores, col("avg_log2"),
        Seq("q1" -> 1.0 / 3.0, "q2" -> 2.0 / 3.0))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(est("q1") - q1) <= cell,
      s"q1 drift ${math.abs(est("q1") - q1)} > cell $cell")
    assert(math.abs(est("q2") - q2) <= cell,
      s"q2 drift ${math.abs(est("q2") - q2)} > cell $cell")
  }

  test("bucket labels differ only within one grid cell of an exact boundary") {
    val exact = QualityRules.ccnetBuckets(scores, "doc_id")
    val bounded = forcedBounded(QualityRules.ccnetBuckets(scores, "doc_id"))
    val mm = scores.agg(min("avg_log2"), max("avg_log2")).head()
    val cell = (mm.getDouble(1) - mm.getDouble(0)) / QuantileSketch.AdaptiveB
    val ex = scores.agg(
      expr("percentile(avg_log2, CAST(1.0 AS DOUBLE)/CAST(3.0 AS DOUBLE))"),
      expr("percentile(avg_log2, CAST(2.0 AS DOUBLE)/CAST(3.0 AS DOUBLE))"))
      .head()
    val diff = exact.as("e").join(bounded.as("b"), "doc_id")
      .where(col("e.bucket") =!= col("b.bucket"))
      .select(col("doc_id"), col("e.avg_log2").as("s"))
      .collect()
    val n = scores.count()
    assert(diff.length <= math.max(1L, n / 20),
      s"${diff.length} of $n docs changed bucket under the bounded path")
    diff.foreach { r =>
      val s = r.getDouble(1)
      val near = math.min(math.abs(s - ex.getDouble(0)),
        math.abs(s - ex.getDouble(1)))
      assert(near <= cell,
        s"doc ${r.get(0)} changed bucket but its score $s is $near " +
          s"from the nearest exact boundary (> cell $cell)")
    }
  }

  test("adaptiveQuantiles edge semantics: empty, constant, NaN") {
    import spark.implicits._
    // empty input -> empty frame (callers' min/when pivots see NULLs,
    // matching exact percentile over empty input)
    val empty = Seq.empty[Double].toDF("v")
    assert(QuantileSketch.adaptiveQuantiles(empty, col("v"),
      Seq("p50" -> 0.5)).count() === 0)
    // constant input -> every quantile IS the value, no interpolation
    val const = Seq.fill(10)(7.25).toDF("v")
    val c = QuantileSketch.adaptiveQuantiles(const, col("v"),
      Seq("p50" -> 0.5, "p90" -> 0.9)).collect()
    assert(c.length === 2 && c.forall(_.getDouble(1) === 7.25))
    // NaN rows are excluded, not clamped into the top bucket: with NaN
    // present the estimates match the NaN-free input's exactly
    val base = (1 to 100).map(_.toDouble)
    val clean = base.toDF("v")
    val dirty = (base ++ Seq.fill(50)(Double.NaN)).toDF("v")
    val qs = Seq("p50" -> 0.5, "p99" -> 0.99)
    val a = QuantileSketch.adaptiveQuantiles(clean, col("v"), qs)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = QuantileSketch.adaptiveQuantiles(dirty, col("v"), qs)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a === b, s"NaN rows moved the estimates: $a vs $b")
    // ... and the fixed-grid state() excludes them too (ADVICE r10)
    val st = QuantileSketch.state(dirty.withColumn("g", lit(1)),
      Seq("g"), col("v"))
    assert(st.agg(sum("_cnt")).head().getLong(0) === 100L)
  }

  test("ccnet export composition: the bucket filter changes the " +
      "manifest population (round 12, C41b)") {
    // head+middle keeps ~2/3 of scored docs — the export manifest of
    // the bucketed pipeline must differ from the all-docs manifest in
    // BOTH row counts and checksums (else the composition is inert)
    val full = SparkEntry.queries("export_manifest")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val ccnet = SparkEntry.queries("pipeline_ccnet_export")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(ccnet.keySet === full.keySet) // all 8 shards still populated
    val totalFull = full.values.map(_._1).sum
    val totalKept = ccnet.values.map(_._1).sum
    assert(totalKept < totalFull,
      s"bucket filter kept everything: $totalKept of $totalFull")
    assert(totalKept * 3 > totalFull,
      s"kept far less than the designed ~2/3: $totalKept of $totalFull")
    assert(full.exists { case (s, (_, ck)) => ccnet(s)._2 != ck },
      "checksums identical across every shard - filter not reflected")
  }
}
