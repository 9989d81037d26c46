package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169) — the published method for picking pretraining
  * documents that LOOK LIKE a target distribution (Wikipedia, curated
  * text) out of a raw crawl: estimate importance weights
  * p_target(x)/p_raw(x) under hashed n-gram feature distributions and
  * keep the top-weighted docs.
  *
  * Determinism contract (SURVEY §11): the paper's log-ratio
  *   log w(d) = Σ_t [log p̂_T(b(t)) − log p̂_R(b(t))]
  * is quantized DYADICALLY — floor(log2 x) = length(bin(x)) − 1 —
  * with Laplace(+1) smoothing, so the whole score is one exact
  * BIGINT per document:
  *   score(d) = Σ_t [flog2(cntT(b(t)) + 1) − flog2(cntR(b(t)) + 1)]
  *            + |d| · [flog2(totR + B) − flog2(totT + B)]
  * b(t) is the portable md5 feature bucket (NaiveBayes.featureBucket —
  * first 8 hex of md5("tok:seed") mod B), replayable by any engine
  * with md5. The deviation from the paper (real-valued logs, Gumbel
  * resampling) is documented: the dyadic score keeps the ranking
  * reproducible bit-for-bit across engines, and top-k selection is
  * the paper's own "deterministic variant" (§3, importance ranking
  * without the Gumbel noise).
  *
  * Scale shape (100 TB raw corpus): the two distributions collapse to
  * ≤ B-row bucket-count relations in ONE map-side-combined shuffle
  * each (text never shuffles; grams explode in the scan stage). Both
  * relations BROADCAST. Scoring = scan-stage explode → broadcast
  * joins → one (doc_id) partial-agg shuffle of integer pairs. The
  * top-k is TakeOrdered (per-partition bounded heaps), never a global
  * sort.
  */
object Dsir {

  /** Per-doc integer importance scores against a target subset.
    *
    * @param docs    corpus; every row is also part of the RAW
    *                distribution
    * @param isTarget row predicate marking the target-distribution
    *                subset (e.g. lang = 'en', a curated source)
    * Output: (idCol, n_tokens, score) — score BIGINT, higher = more
    * target-like.
    */
  def scores(docs: DataFrame, idCol: String, textCol: String,
             isTarget: Column, seed: Long = 7L,
             nBuckets: Int = 4096): DataFrame = {
    val b = nBuckets.toLong
    def flog2(c: Column): Column = length(bin(c)).cast("long") - 1L
    val grams = docs
      .select(col(idCol), isTarget.as("_t"),
        explode(NaiveBayes.tokensOf(col(textCol))).as("tok"))
      .select(col(idCol), col("_t"),
        NaiveBayes.featureBucket(col("tok"), seed, nBuckets).as("bucket"))
    // raw = everything; target = the marked subset. Both bounded ≤ B.
    val rawCnt = grams.groupBy("bucket").agg(count(lit(1)).as("cnt_r"))
    val tgtCnt = grams.filter(col("_t"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt_t"))
    val totals = grams.agg(
      count(lit(1)).as("tot_r"),
      sum(when(col("_t"), 1L).otherwise(0L)).as("tot_t"))
    // per-gram dyadic evidence; a bucket absent from target counts as
    // flog2(0 + 1) = 0, so the target join is LEFT over the sparse
    // observed buckets (raw always hits — every gram is in raw).
    val evidence = grams
      .join(broadcast(rawCnt), "bucket")
      .join(broadcast(tgtCnt), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(flog2(coalesce(col("cnt_t"), lit(0L)) + 1L) -
        flog2(col("cnt_r") + 1L)).as("_ev"))
    docs.select(col(idCol),
        size(NaiveBayes.tokensOf(col(textCol))).cast("long").as("n_tokens"))
      .join(evidence, Seq(idCol), "left")
      .crossJoin(broadcast(totals)) // bounded: 1 row
      .withColumn("score",
        coalesce(col("_ev"), lit(0L)) +
          col("n_tokens") * (flog2(col("tot_r") + b) - flog2(col("tot_t") + b)))
      .select(col(idCol), col("n_tokens"), col("score"))
  }

  /** Top-k selection by (score DESC, id ASC) — the deterministic
    * importance-ranking variant; TakeOrdered, never a global sort.
    */
  def selectTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.orderBy(col("score").desc, col(idCol).asc).limit(k)
}
