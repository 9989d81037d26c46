package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Round-10 scale-plan guarantees for the dedup family:
  *
  *  1. the minhash/verify side-table joins are COST-BASED — broadcast
  *     below [[Dedup.MaxSideBroadcastBytesKey]], shuffled co-partitioned
  *     equi-join above — and BOTH paths produce identical pairs
  *     (strategy equivalence, mirroring the exactSetPairs auto spec);
  *  2. the forced-over-threshold plan really is the shuffled one (no
  *     BroadcastHashJoin/BroadcastNestedLoop anywhere once the hint is
  *     withheld and autoBroadcast is off) — the "bucketed plan
  *     selected when forced over threshold" audit;
  *  3. the exact set-overlap `auto` probe is THREE-WAY: prefix,
  *     allpairs, or a LOUD refusal naming the sub-quadratic escape —
  *     never a silent quadratic past maxCandidates;
  *  4. `strategy = "lsh"` (sketch-bounded candidates, exact verify)
  *     agrees with the exact sweep on a corpus whose qualifying pairs
  *     sit well above the threshold (where LSH recall is ~1).
  */
class DedupStrategySpec extends SparkFunSuite {

  private lazy val corpus = DedupQueries.corpus(spark, sf)
    .localCheckpoint(true)

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)).toSet

  /** Run `f` with the side-broadcast cap forced to `bytes` (and the
    * planner's own broadcasts disabled, so any broadcast left in the
    * plan is OUR hint), restoring both confs after.
    */
  private def withCaps[T](bytes: Long)(f: => T): T = {
    val prevCap = spark.conf.getOption(Dedup.MaxSideBroadcastBytesKey)
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(Dedup.MaxSideBroadcastBytesKey, bytes.toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally {
      prevCap match {
        case Some(v) => spark.conf.set(Dedup.MaxSideBroadcastBytesKey, v)
        case None => spark.conf.unset(Dedup.MaxSideBroadcastBytesKey)
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect() // materialize THIS QueryExecution so AQE's plan is final
    df.queryExecution.executedPlan.toString
  }

  test("minhashPairs: broadcast and shuffled verify joins emit identical pairs") {
    val bc = withCaps(Long.MaxValue)(pairSet(
      Dedup.minhashPairs(corpus, "doc_id", "text", 0.5)))
    val sh = withCaps(1L)(pairSet(
      Dedup.minhashPairs(corpus, "doc_id", "text", 0.5)))
    assert(bc.nonEmpty)
    assert(bc == sh)
  }

  test("minhashVerifiedPairs: broadcast and shuffled verify joins agree") {
    def run(cap: Long) = withCaps(cap)(pairSet(
      Dedup.minhashVerifiedPairs(corpus, "doc_id", "text", 0.5)
        .select("doc_a", "doc_b", "jaccard")))
    val bc = run(Long.MaxValue)
    val sh = run(1L)
    assert(bc.nonEmpty)
    assert(bc == sh)
  }

  test("forced over threshold, the selected plan is shuffled (no broadcast anywhere)") {
    withCaps(1L) {
      val plan = finalPlan(
        Dedup.minhashVerifiedPairs(corpus, "doc_id", "text", 0.5))
      assert(!plan.contains("BroadcastHashJoin") &&
        !plan.contains("BroadcastNestedLoop"),
        s"expected the co-partitioned verify join, got:\n$plan")
    }
    withCaps(Long.MaxValue) {
      // under the cap our hint is what makes the broadcast plan: the
      // planner's own threshold stays disabled inside withCaps
      val plan = finalPlan(
        Dedup.minhashPairs(corpus, "doc_id", "text", 0.5))
      assert(plan.contains("BroadcastHashJoin"),
        s"expected the hinted broadcast verify join, got:\n$plan")
    }
  }

  test("auto probe: three-way decision (prefix | allpairs | loud refusal)") {
    // closed vocabulary: huge Σdf² makes prefix enumeration dwarf n²/2
    assert(Dedup.chooseCandidateStrategy(1000, 1e9, 0.4,
      ordered = false, 100000000L) == "allpairs")
    // open vocabulary: rare grams, tiny Σdf² -> prefix
    assert(Dedup.chooseCandidateStrategy(1000000, 1e7, 0.4,
      ordered = false, 100000000L) == "prefix")
    // both quadratics past the bound -> refuse, naming the escape
    val e = intercept[IllegalStateException] {
      Dedup.chooseCandidateStrategy(1e9, 1e22, 0.4,
        ordered = false, 100000000L)
    }
    assert(e.getMessage.contains("lsh") &&
      e.getMessage.contains("maxCandidates"))
    // ordered (containment) refusal recommends the explicit opt-in,
    // not lsh (which does not bound containment)
    val eo = intercept[IllegalStateException] {
      Dedup.chooseCandidateStrategy(1e9, 1e22, 0.9,
        ordered = true, 100000000L)
    }
    assert(eo.getMessage.contains("prefix"))
    // empty corpus: 0 enumerations, prefix path, no NULL-agg crash
    assert(Dedup.chooseCandidateStrategy(0, 0.0, 0.4,
      ordered = false, 100000000L) == "prefix")
    // the WEIGHTED cost model: identical enumeration counts, but the
    // t=0.9 containment regime aborts after ~10% of each merge while
    // t=0.4 jaccard pays ~71% — so the same bound runs the first and
    // refuses the second (the round-10 calibration: both normalize to
    // ~5e6 weighted steps/s measured)
    val enums = 2.0e9 // → ordered work 2e8, unordered work 1.43e9
    assert(Dedup.chooseCandidateStrategy(math.sqrt(enums), 1e30, 0.9,
      ordered = true, Dedup.DefaultMaxCandidates) == "allpairs")
    intercept[IllegalStateException] {
      Dedup.chooseCandidateStrategy(math.sqrt(2 * enums), 1e30, 0.4,
        ordered = false, Dedup.DefaultMaxCandidates)
    }
  }

  test("auto refuses end-to-end when maxCandidates is exceeded") {
    val e = intercept[IllegalStateException] {
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.4,
        maxCandidates = 10L).count()
    }
    assert(e.getMessage.contains("lsh"))
  }

  test("empty corpus returns empty pairs (probe survives the NULL sum)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(empty, "doc_id", "text", 0.4).count() == 0)
  }

  test("prefix and allpairs generators agree (t*sz exact-integer sizes included)") {
    // threshold 0.5: any even gram-set size makes t*sz an exact
    // integer — the regime where an ulp-up ceil would shorten the
    // prefix below the pigeonhole bound and silently drop pairs
    val px = pairSet(Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.5,
      strategy = "prefix"))
    val ap = pairSet(Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.5,
      strategy = "allpairs"))
    assert(px.nonEmpty)
    assert(px == ap)
  }

  test("dense-bitset sweep: plan uses bitmap_and_count, scores bit-equal prefix's merge") {
    // the planted corpus is closed-vocabulary (few distinct grams,
    // short docs), so the round-18 dense-bitset verify must fire on
    // the allpairs sweep…
    val ap = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.5,
      strategy = "allpairs")
    assert(finalPlan(ap).contains("bitmap_and_count"),
      "allpairs on a closed vocabulary should verify via the bitset kernel")
    // …and its jaccard doubles must be BIT-identical to the sorted-
    // merge verify (prefix strategy): same exact intersection counts,
    // same one IEEE divide
    def exact(df: DataFrame): Map[(Long, Long), Long] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        java.lang.Double.doubleToLongBits(r.getDouble(2))).toMap
    val px = exact(Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.5,
      strategy = "prefix"))
    val bm = exact(ap)
    assert(bm.nonEmpty && bm == px)
  }

  test("lsh strategy: exact verdicts on sketch-bounded candidates match the exact sweep") {
    // the planted corpus's qualifying pairs at t=0.5 are exact copies
    // (j=1) and two-word-dropped near copies (j >> 0.7): LSH band
    // recall there is 1 - (1 - j^4)^32 ~ 1, so the sketch-bounded
    // candidate set covers every qualifying pair and exact
    // verification makes the outputs identical
    val lsh = pairSet(Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.5,
      strategy = "lsh"))
    val ex = pairSet(Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.5,
      strategy = "allpairs"))
    assert(lsh.nonEmpty)
    assert(lsh == ex)
  }

  test("lsh strategy refuses ordered (containment) semantics") {
    val e = intercept[IllegalArgumentException] {
      Dedup.containmentPairs(corpus, "doc_id", "text", 0.9,
        strategy = "lsh").count()
    }
    assert(e.getMessage.toLowerCase.contains("containment"))
  }

  test("hot-bucket guard: band join refuses past predicted maxCandidates") {
    // verbatim copies -> identical signatures -> every band bucket
    // holds all n docs -> predicted pairs = 32 * n(n-1)/2; a small
    // bound must trip BEFORE the join runs
    import spark.implicits._
    val clones = (0 until 40)
      .map(i => (i.toLong, "same exact boilerplate text for every doc"))
      .toDF("doc_id", "text")
    val sigs = Dedup.signatures(clones, "doc_id", "text")
      .localCheckpoint(true)
    val e = intercept[IllegalStateException] {
      Dedup.minhashPairsFromSigs(sigs, 0.5, maxCandidates = 1000L).count()
    }
    assert(e.getMessage.contains("maxCandidates"))
    assert(e.getMessage.contains("exact-dedup first"))
    // under the default bound the same corpus runs fine
    assert(Dedup.minhashPairsFromSigs(sigs, 0.5).count() > 0)
  }
}
