package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable count-min sketch (Cormode & Muthukrishnan 2005) — the
  * mergeable heavy-hitter state complementing the bounded TopK
  * aggregate (exact top-k per query) and the portable HLL (distinct
  * counts): CMS answers "how often did THIS key occur" from O(d·w)
  * state, overestimating only.
  *
  * The sketch is SPARSE AND RELATIONAL: rows (j, bucket, cnt) — which
  * makes every CMS operation a plain relational one (build = groupBy
  * count with map-side partials; merge = union + groupBy sum,
  * associative and exact like uniqMerge; estimate = a join against
  * the ≤ d·w-row sketch, broadcastable by construction). No opaque
  * binary state, so ANY engine can read, merge, or audit a stored
  * sketch — the cross-engine discipline of HllPortable.
  *
  * Hash rows derive from ONE xxhash64 via seeded affine permutations
  * (the minhash coefficient machinery, [[Dedup.coeffs]]): bucket_j =
  * ((a_j · x32 + b_j) mod P) mod width, where x32 is the proven
  * 32-bit fold — so the DuckDB oracle replays every bucket decision
  * bit-exactly off the long-kernel CTEs.
  */
object CmSketch {

  val Depth = 4
  val Width = 512

  /** Affine row coefficients, seeded apart from minhash's. */
  private[graft] val rowCoeffs = Dedup.coeffs(Depth, seed = 99L)

  private def x32(h: Column): Column =
    shiftright(h, 32).bitwiseXOR(h).bitwiseAND(lit(0xFFFFFFFFL))

  /** Bucket of `key` (a LONG column) in hash row `j`. */
  def bucket(j: Int, key: Column): Column = {
    val (a, b) = rowCoeffs(j)
    pmod(lit(a) * x32(xxhash64(key)) + lit(b),
      lit(Dedup.MinhashPrime)) % Width
  }

  /** Build the sparse sketch (j, bucket, cnt) over `keyCol`. */
  def sketch(df: DataFrame, keyCol: String): DataFrame =
    (0 until Depth)
      .map(j => df.select(lit(j).as("j"), bucket(j, col(keyCol)).as("bucket")))
      .reduce(_.unionByName(_))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))

  /** Merge partial sketches — associative, exact, any grouping. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_.unionByName(_))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))

  /** Point estimates for `probes`' keys: min over rows of the bucket
    * count (0 for never-seen buckets). The sketch side broadcasts —
    * it is ≤ Depth·Width rows by construction.
    */
  def estimate(sk: DataFrame, probes: DataFrame, keyCol: String): DataFrame = {
    val lookups = (0 until Depth)
      .map(j => probes.select(col(keyCol), lit(j).as("j"),
        bucket(j, col(keyCol)).as("bucket")))
      .reduce(_.unionByName(_))
    lookups.join(broadcast(sk), Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}
