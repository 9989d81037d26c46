package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling & split assignment for training pipelines
  * (SURVEY.md §2 C13-C14).
  *
  * Everything here is a pure function of (key, seed) — NOT rand():
  * a failed task recompute, a re-run, or a different cluster produces
  * byte-identical samples and splits. That determinism is what makes
  * a 100 TB train/val/test split auditable.
  */
object Sampling {

  private val Buckets = 1000000L

  private def bucket(key: Column, seed: Long): Column =
    pmod(xxhash64(key, lit(seed)), lit(Buckets))

  /** Engine-portable bucket: first 8 hex chars of md5("<key>:<seed>").
    * Same decisions are reproducible in ANY engine with md5 (DuckDB,
    * ClickHouse, Trino…) — the auditable cross-system variant; xxhash64
    * (codegen'd, no string round-trip) stays the in-Spark default.
    */
  def portableBucket(key: Column, seed: Long): Column =
    pmod(conv(substring(md5(
      concat_ws(":", key.cast("string"), lit(seed))), 1, 8), 16, 10)
      .cast("long"), lit(Buckets))

  private def bucketOf(key: Column, seed: Long, portable: Boolean): Column =
    if (portable) portableBucket(key, seed) else bucket(key, seed)

  /** Keep ~`frac` of rows, keyed on `key` (same key → same decision,
    * so e.g. all chunks of one document stay together when keyed on
    * the document id).
    */
  def deterministicSample(df: DataFrame, key: Column, frac: Double,
                          seed: Long = 42L, portable: Boolean = false): DataFrame = {
    require(frac >= 0 && frac <= 1)
    df.filter(bucketOf(key, seed, portable) < (frac * Buckets).toLong)
  }

  /** Assign each row a split label by hash bucket. `weights` are
    * (label, weight) in priority order; weights are normalized.
    */
  def splitAssign(df: DataFrame, key: Column,
                  weights: Seq[(String, Double)],
                  seed: Long = 42L, portable: Boolean = false): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0))
    val total = weights.map(_._2).sum
    val b = bucketOf(key, seed, portable)
    val bounds = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .map(f => (f * Buckets).toLong)
    val split = weights.zip(bounds.sliding(2).toSeq).foldRight(
      lit(weights.last._1)) { case (((label, _), Seq(lo, hi)), rest) =>
        when(b >= lo && b < hi, lit(label)).otherwise(rest)
      }
    df.withColumn("split", split)
  }

  /** Deterministic global shuffle: a total order by keyed hash. At
    * cluster scale this is one range-partitioned sort producing a
    * stable, seed-controlled training order.
    */
  def deterministicShuffle(df: DataFrame, key: Column,
                           seed: Long = 42L): DataFrame =
    df.orderBy(xxhash64(key, lit(seed)), key)

  /** Weight-proportional Bernoulli sampling (round 7): keep a row with
    * probability `weight / maxWeight` — the quality-weighted
    * subsampling pass of a training pipeline (downweight low-quality
    * documents instead of hard-thresholding them). Deterministic like
    * everything here: same (key, seed, weight) → same decision, and
    * the comparison is one IEEE divide + multiply on the integer-
    * valued bucket, so the portable variant reproduces bit-identically
    * in any engine with md5 — no ln/pow, which libms round
    * differently. Weights above `maxWeight` simply always keep.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     maxWeight: Double, seed: Long = 42L,
                     portable: Boolean = false): DataFrame = {
    require(maxWeight > 0)
    df.filter(bucketOf(key, seed, portable).cast("double") <
      weight / maxWeight * Buckets)
  }

  /** Deterministic stratified sample: the `n` hash-first rows of each
    * stratum (language-balanced subcorpora, per-source caps). One
    * shuffle on the stratum; WindowGroupLimit prunes each partition to
    * its top-n before the final sort, so a 10^9-row stratum ships only
    * n rows. Ties cannot occur: (bucket, key) is a total order.
    */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column, n: Int,
                       seed: Long = 42L, portable: Boolean = false): DataFrame = {
    require(n > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata).orderBy(bucketOf(key, seed, portable), key)
    df.withColumn("_smp_rn", row_number().over(w))
      .filter(col("_smp_rn") <= n).drop("_smp_rn")
  }
}
