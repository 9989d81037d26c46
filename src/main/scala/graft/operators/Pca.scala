package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top principal direction of an embedding corpus (SURVEY.md §2 C53) —
  * the PCA primitive behind embedding whitening, drift monitoring and
  * the "is this corpus one blob or several" question, done the
  * deterministic two-stage way:
  *
  *  1. **Moments, distributed and EXACT.** Embedding floats quantize
  *     to integers at ×2²⁰ via floor() (floor is identical on both
  *     engines and across partitions; a raw double sum would be
  *     reduction-order-dependent). One posexplode + one 64-key
  *     shuffle aggregates Σqᵢ and the full Σqᵢqⱼ row per dimension —
  *     map-side combined, d² longs of state total (envelope:
  *     n·(3·2²⁰)² < 2⁶³ ⇒ n < ~2·10⁵ vectors per exact batch at this
  *     scale; larger corpora pre-scale to 2¹⁶ — documented, the covar
  *     rule).
  *  2. **Eigenvector, driver-side and reproducible.** The d×d
  *     covariance (n·Σqq − Σq·Σqᵀ, BigDecimal-exact, then one double
  *     conversion per entry) is a BOUNDED d² relation — the
  *     trained-model-collect precedent (k-means/OPQ/SQ). Power
  *     iteration runs a FIXED 64 rounds from e₁, single-threaded, so
  *     the weights are bit-reproducible run to run; sign rule: the
  *     largest-|w| component is made positive (ties → lowest index).
  *
  * The learned direction then TRANSPORTS as SQL literals (E-notation,
  * the round-14 double-transport rule) into both the Spark projection
  * and the DuckDB oracle — the trained-model-literal pattern. The
  * projection itself is the shared left-associative unrolled dot
  * product, so both engines evaluate the identical IEEE tree.
  */
object Pca {

  val Scale: Long = 1L << 20

  /** E-notation double literal (parses as DOUBLE, correctly rounded,
    * on both engines — bare decimals type as DECIMAL and DuckDB's
    * DECIMAL→DOUBLE cast is off by an ulp at 17 digits).
    */
  def dLit(v: Double): String = {
    val s = v.toString
    if (s.exists(c => c == 'E' || c == 'e')) s else s + "e0"
  }

  /** Train: exact integer moments in one shuffle, then driver power
    * iteration. Returns the unit top direction (length `dim`).
    */
  def topDirection(emb: DataFrame, dim: Int, iters: Int = 64)
      : Array[Double] = {
    val qv = emb.select(
      transform(col("embedding"),
        x => floor(x.cast("double") * Scale).cast("long")).as("q"))
    val ex = qv.select(posexplode(col("q")).as(Seq("i", "qi")), col("q"))
    val aggs = (0 until dim).map(j =>
      sum(col("qi") * element_at(col("q"), j + 1)).as(s"s$j")) :+
      sum(col("qi")).as("sq") :+ count(lit(1)).as("cnt")
    val rows = ex.groupBy(col("i")).agg(aggs.head, aggs.tail: _*)
      .collect() // d rows of d+2 longs — the bounded-model collect
    require(rows.length == dim, s"expected $dim moment rows, got ${rows.length}")
    val n = rows.head.getAs[Long]("cnt")
    val sq = new Array[Long](dim)
    val sqq = Array.ofDim[Long](dim, dim)
    rows.foreach { r =>
      val i = r.getAs[Int]("i")
      sq(i) = r.getAs[Long]("sq")
      (0 until dim).foreach(j => sqq(i)(j) = r.getAs[Long](s"s$j"))
    }
    // covariance entries exact in BigDecimal, ONE double conversion
    val c = Array.tabulate(dim, dim) { (i, j) =>
      (BigDecimal(n) * BigDecimal(sqq(i)(j)) -
        BigDecimal(sq(i)) * BigDecimal(sq(j))).toDouble
    }
    var w = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to iters) {
      val nw = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(0.0)((a, j) => a + c(i)(j) * w(j)))
      val norm = math.sqrt(nw.foldLeft(0.0)((a, x) => a + x * x))
      require(norm > 0, "degenerate covariance (all-zero) - no direction")
      (0 until dim).foreach(i => w(i) = nw(i) / norm)
    }
    // sign rule: largest-|w| component positive, ties -> lowest index
    val k = (0 until dim).maxBy(i => (math.abs(w(i)), -i))
    if (w(k) < 0) (0 until dim).foreach(i => w(i) = -w(i))
    w
  }

  /** The unrolled projection expression — ONE generator for both
    * engines (`base` = 0 for Spark arrays, 1 for DuckDB lists):
    * floor-quantized components dotted with the weight literals in a
    * fixed left-associative chain, so the IEEE tree is identical.
    */
  def projSql(vecCol: String, w: Array[Double], base: Int): String =
    w.zipWithIndex.map { case (wi, i) =>
      s"(floor(CAST($vecCol[${i + base}] AS DOUBLE) * $Scale) * ${dLit(wi)})"
    }.mkString(" + ")
}
