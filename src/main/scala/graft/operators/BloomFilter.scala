package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom filter (Bloom 1970) — the mergeable SET-MEMBERSHIP
  * state completing the sketch family (HLL = distinct counts, CMS =
  * point counts, quantile grid = quantiles, SpaceSaving = top-k
  * frequencies; this one answers "might THIS key be in the set" with
  * NO false negatives). The crawl-pipeline use is URL/doc-id
  * membership against a multi-billion-key seen-set where the exact
  * set would not broadcast.
  *
  * Like [[CmSketch]], the filter is SPARSE AND RELATIONAL: the set of
  * SET bit indexes as rows (bit). Build = project k bit positions per
  * key + distinct; merge = union + distinct (bitwise OR, associative
  * and exact — any partitioning of the input builds the identical
  * relation); membership = a broadcast join counting hits (all k
  * present ⇒ maybe-in-set). No opaque binary state — any engine can
  * read, merge, or audit a stored filter, and the DuckDB oracle
  * replays every bit decision off the long-kernel CTEs.
  *
  * Bit positions derive from ONE xxhash64 via seeded affine
  * permutations (the minhash coefficient machinery — bit_j =
  * ((a_j·x32 + b_j) mod P) mod m), the [[CmSketch]] transport.
  *
  * Sizing (documented contract): FPR ≈ (1 − e^(−k·n/m))^k — the
  * defaults (m = 4096, k = 3) give ~3% at n ≈ 500 keys, the gate's
  * corpus; production sizes m ≈ 10·n bits with k = 7 for ~0.8%. State
  * is ≤ min(m, k·n) rows by construction, never key-scale.
  */
object BloomFilter {

  val NumHashes = 3
  val NumBits = 4096

  /** Affine coefficients, seeded apart from minhash's and CMS's. */
  private[graft] val rowCoeffs = Dedup.coeffs(NumHashes, seed = 131L)

  private def x32(h: Column): Column =
    shiftright(h, 32).bitwiseXOR(h).bitwiseAND(lit(0xFFFFFFFFL))

  /** Bit index of `key` (a LONG column) for hash row `j`; `m` is the
    * filter width in bits (size by the FPR contract above — both
    * sides of a build/probe pair must use the same m).
    */
  def bit(j: Int, key: Column, m: Int = NumBits): Column = {
    val (a, b) = rowCoeffs(j)
    pmod(lit(a) * x32(xxhash64(key)) + lit(b),
      lit(Dedup.MinhashPrime)) % m
  }

  /** Build the sparse filter — the distinct set-bit relation (bit). */
  def build(df: DataFrame, keyCol: String, m: Int = NumBits): DataFrame =
    (0 until NumHashes)
      .map(j => df.select(bit(j, col(keyCol), m).as("bit")))
      .reduce(_.unionByName(_))
      .distinct()

  /** Merge partial filters — bitwise OR: union + distinct, associative
    * and exact under any grouping.
    */
  def merge(filters: DataFrame*): DataFrame =
    filters.reduce(_.unionByName(_)).distinct()

  /** Membership verdicts for `probes`' keys: in_bloom = every one of
    * the k probe bits is set. The filter side broadcasts (≤ m rows by
    * construction). NO false negatives — a key that was built in
    * always answers true (spec-pinned); false positives at the sizing
    * contract's rate.
    */
  def contains(bf: DataFrame, probes: DataFrame, keyCol: String,
               m: Int = NumBits): DataFrame = {
    val lookups = (0 until NumHashes)
      .map(j => probes.select(col(keyCol), bit(j, col(keyCol), m).as("bit")))
      .reduce(_.unionByName(_))
    lookups.join(broadcast(bf.withColumn("__set", lit(1L))),
        Seq("bit"), "left")
      .groupBy(col(keyCol))
      .agg((sum(coalesce(col("__set"), lit(0L))) === NumHashes)
        .cast("long").as("in_bloom"))
  }
}
