package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimized Product Quantization (round 13) — Ge, He, Ke, Sun,
  * "Optimized Product Quantization for Approximate Nearest Neighbor
  * Search", CVPR 2013; FAISS's `OPQMatrix` pre-transform: learn an
  * ORTHOGONAL rotation R so that the rotated space splits into
  * subspaces with balanced variance / minimal quantization error,
  * then run ordinary PQ there. Distances are preserved exactly
  * (‖Rx − Ry‖ = ‖x − y‖), so the ADC machinery, the serving joins
  * and the ranking rule are [[PqIndex]]'s unchanged — OPQ only moves
  * WHERE the codebooks spend their centroids.
  *
  * Why this rung exists: the round-12 corpus study's honest finding
  * was 16-byte ADC at 0.04-0.22 recall on corpora whose noise sits at
  * the quantization scale; rerank (shipped) is one production answer,
  * the trained rotation is FAISS's other one — it lifts ADC recall at
  * the SAME byte budget whenever the data's variance is unevenly or
  * correlatedly spread across dims (the usual case for learned
  * embeddings; a perfectly isotropic corpus gains nothing, and the
  * spec pins both directions).
  *
  * Training (OPQ-NP, the non-parametric alternation of Ge et al. §4):
  * on the SAME deterministic sorted driver sample [[IvfIndex.train]]
  * uses (orderBy(vector) → limit(sampleCap) → collect — the justified-
  * collect precedent; FAISS trains OPQ on a sample too), alternate
  *   (1) per-subspace Lloyd's on the rotated sample (the identical
  *       seeding + update rule as IvfIndex.train, so the loop is
  *       bit-deterministic),
  *   (2) reconstruct ŷ from the codes, and
  *   (3) the orthogonal Procrustes step: R = V·Uᵀ for
  *       B = Σ xᵢ·ŷᵢᵀ = U·S·Vᵀ — B folds sequentially over the sorted
  *       sample (deterministic), and the 64×64 SVD runs a fixed-sweep
  *       one-sided Jacobi (pure Scala, no library, deterministic).
  * Identity init; a fixed iteration count (no convergence test) keeps
  * the whole model a pure function of the sample.
  *
  * The final shipped model is (R, PqIndex.train over the ROTATED
  * corpus) — the same codebook path every other PQ gate uses, so the
  * trained rotation and codebooks inline into the DuckDB oracle with
  * the established exact-literal transport, and the rotation itself
  * replays as a fixed-order fold (per output dim: products left to
  * right — one rounding per multiply, one per add, same tree both
  * engines).
  */
object OpqIndex {

  /** rotation: d×d orthogonal matrix (row i = weights producing output
    * dim i); pq: codebooks trained in the rotated space.
    */
  final case class OpqModel(rotation: Seq[Seq[Double]],
                            pq: PqIndex.PqModel) {
    def dim: Int = rotation.size
  }

  /** y = R·x as a Column: per output dim, products fold left to right
    * (zip_with then a sequential aggregate — one rounding per product,
    * one per add), so DuckDB replays each coordinate bit-exactly.
    */
  def rotate(vec: Column, rotation: Seq[Seq[Double]]): Column = {
    val r = typedlit(rotation)
    transform(r, row =>
      aggregate(zip_with(row, vec, (a, b) => a * b.cast("double")),
        lit(0.0), (acc, t) => acc + t))
  }

  /** Train OPQ: the alternating loop above, then final codebooks via
    * [[PqIndex.train]] on the rotated corpus. `iters` is FIXED (no
    * convergence test) so the model is a pure function of the sample.
    */
  def train(vecs: DataFrame, dim: Int, m: Int = 4, k: Int = 16,
            iters: Int = 8, vecCol: String = "embedding",
            sampleCap: Int = 16384): OpqModel = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dSub = dim / m
    val sample: Array[Array[Double]] = vecs
      .select(col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull && size(col("v")) === dim)
      .orderBy(col("v"))
      .limit(sampleCap)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= k,
      s"OPQ needs at least k=$k sample vectors, got ${sample.length}")
    // Init = OPQ-P (Ge et al. §3.2): PCA + eigenvalue allocation.
    // Identity init is a FIXED POINT of the NP alternation whenever
    // the data's principal axes are coordinate-aligned (B comes out
    // symmetric PSC → U = V → R = I forever), so the parametric init
    // is what actually moves: rotate onto the eigenbasis and deal the
    // eigenvectors to subspaces balancing the PRODUCT of eigenvalues
    // (greedy, largest first, into the bucket with the smallest
    // running log-product that still has room).
    var r = pcaAllocInit(sample, dim, m, dSub)

    var it = 0
    while (it < iters) {
      val y = sample.map(matVec(r, _))
      // per-subspace Lloyd's + reconstruction
      val yhat = Array.fill(sample.length)(new Array[Double](dim))
      var j = 0
      while (j < m) {
        val slice = y.map(v => java.util.Arrays.copyOfRange(v, j * dSub,
          (j + 1) * dSub))
        val cents = lloyd(slice, k)
        var i = 0
        while (i < sample.length) {
          val c = cents(nearestIdx(slice(i), cents))
          System.arraycopy(c, 0, yhat(i), j * dSub, dSub)
          i += 1
        }
        j += 1
      }
      // Procrustes: B = sum x yhat^T (sequential over the sorted
      // sample -> deterministic), R = V U^T for B = U S V^T
      val b = Array.fill(dim, dim)(0.0)
      var i = 0
      while (i < sample.length) {
        val x = sample(i); val yh = yhat(i)
        var p = 0
        while (p < dim) {
          val xp = x(p); val bp = b(p); var q = 0
          while (q < dim) { bp(q) += xp * yh(q); q += 1 }
          p += 1
        }
        i += 1
      }
      val (u, v) = jacobiSvdUV(b)
      // R = V U^T: R[i][j] = sum_t V[i][t] * U[j][t]
      r = Array.tabulate(dim, dim)((i2, j2) =>
        (0 until dim).foldLeft(0.0)((acc, t) => acc + v(i2)(t) * u(j2)(t)))
      it += 1
    }

    val rSeq: Seq[Seq[Double]] = r.map(_.toSeq).toSeq
    val rotated = vecs.select(
      rotate(col(vecCol), rSeq).as("embedding"))
    OpqModel(rSeq, PqIndex.train(rotated, dim, m, k, "embedding",
      sampleCap))
  }

  /** Exhaustive OPQ-ADC top-k: [[PqIndex.topK]] over the rotated
    * corpus and probes — the rotation is one map-side projection on
    * each scan (no shuffle added), everything downstream is the
    * standard coded-corpus serving shape.
    */
  def topK(corpus: DataFrame, probes: DataFrame, model: OpqModel, k: Int,
           idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame = {
    def rot(df: DataFrame) = df.select(col(idCol),
      rotate(col(vecCol), model.rotation).as(vecCol))
    PqIndex.topK(rot(corpus), rot(probes), model.pq, k, idCol, vecCol)
  }

  /** IVF-OPQ (FAISS's `OPQm,IVFn,PQm` index string): rotate, then the
    * standard IVF-PQ serving shape over rotated vectors. `ivfRot` MUST
    * be trained on the ROTATED corpus (train IvfIndex over
    * rotate(corpus) — assignment and probing happen in the rotated
    * space, where the codebooks live). Join shape, broadcasts and the
    * 140×-rule index materialization are [[PqIndex.topKIvf]]'s.
    */
  def topKIvf(corpus: DataFrame, probes: DataFrame,
              ivfRot: IvfIndex.Model, model: OpqModel, k: Int,
              nProbe: Int = 4, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    def rot(df: DataFrame) = df.select(col(idCol),
      rotate(col(vecCol), model.rotation).as(vecCol))
    PqIndex.topKIvf(rot(corpus), rot(probes), ivfRot, model.pq, k,
      nProbe, idCol, vecCol)
  }

  // -------------------------------------------------- driver kernels

  /** OPQ-P initialization: rows of R are the sample covariance's
    * eigenvectors, ordered by the eigenvalue-allocation rule —
    * eigenvalues descend into the m subspace buckets, each new one
    * landing in the not-yet-full bucket with the smallest running
    * Σ log λ (balancing per-subspace variance products, Ge et al.'s
    * independence-assumption optimum). Deterministic throughout:
    * sequential covariance fold over the sorted sample, fixed-sweep
    * Jacobi eigensolver, ties break on index.
    */
  private def pcaAllocInit(sample: Array[Array[Double]], dim: Int,
                           m: Int, dSub: Int): Array[Array[Double]] = {
    val n = sample.length
    val mu = new Array[Double](dim)
    sample.foreach { x =>
      var i = 0; while (i < dim) { mu(i) += x(i); i += 1 }
    }
    var i = 0; while (i < dim) { mu(i) /= n; i += 1 }
    val cov = Array.fill(dim, dim)(0.0)
    sample.foreach { x =>
      var p = 0
      while (p < dim) {
        val xp = x(p) - mu(p); val cp = cov(p); var q = 0
        while (q < dim) { cp(q) += xp * (x(q) - mu(q)); q += 1 }
        p += 1
      }
    }
    var p = 0
    while (p < dim) {
      var q = 0; while (q < dim) { cov(p)(q) /= n; q += 1 }; p += 1
    }
    val (eigVals, eigVecs) = symEigen(cov) // eigVecs(j) = eigenvector j
    val order = eigVals.indices.sortBy(j => (-eigVals(j), j))
    // greedy product balancing: log-sum per bucket, capacity dSub
    val logSum = new Array[Double](m)
    val fill = new Array[Int](m)
    val rows = Array.fill(dim)(null: Array[Double])
    order.foreach { j =>
      var best = -1
      var bestLs = Double.MaxValue
      var b = 0
      while (b < m) {
        if (fill(b) < dSub && logSum(b) < bestLs) {
          bestLs = logSum(b); best = b
        }
        b += 1
      }
      logSum(best) += math.log(math.max(eigVals(j), 1e-300))
      rows(best * dSub + fill(best)) = eigVecs(j)
      fill(best) += 1
    }
    rows
  }

  /** Cyclic Jacobi eigensolver for a SYMMETRIC matrix, fixed 30
    * sweeps (deterministic, no convergence test). Returns
    * (eigenvalues, eigenvectors) with eigenvectors as rows.
    */
  private[graft] def symEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 30) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq * apq > 1e-30 * math.abs(a(p)(p) * a(q)(q)) &&
            math.abs(apq) > 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0.0)
                1.0 / (theta + math.sqrt(1.0 + theta * theta))
              else -1.0 / (-theta + math.sqrt(1.0 + theta * theta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val vals = Array.tabulate(d)(i => a(i)(i))
    val vecs = Array.tabulate(d, d)((j, i) => v(i)(j)) // row j = eigvec j
    (vals, vecs)
  }

  private def matVec(r: Array[Array[Double]],
                     x: Array[Double]): Array[Double] = {
    val d = r.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      val ri = r(i); var s = 0.0; var j2 = 0
      while (j2 < d) { s += ri(j2) * x(j2); j2 += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  private def nearestIdx(v: Array[Double],
                         cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      val cc = cents(c); var d = 0.0; var i = 0
      while (i < v.length) { val t = v(i) - cc(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The identical deterministic Lloyd's loop as [[IvfIndex.train]]
    * (same seeding — sample[(j·n/k)] — same first-index argmin, same
    * empty-cell rule, maxIter 10), run in memory on the already-
    * collected sample slices.
    */
  private def lloyd(sample: Array[Array[Double]],
                    k0: Int): Array[Array[Double]] = {
    val n = sample.length
    val k = math.min(k0, n)
    val dim = sample(0).length
    var cents = Array.tabulate(k)(j => sample((j.toLong * n / k).toInt).clone())
    var iter = 0; var moved = true
    while (iter < 10 && moved) {
      val assign = sample.map(nearestIdx(_, cents))
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var si = 0
      while (si < n) {
        val s = sums(assign(si)); val v = sample(si); var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(assign(si)) += 1
        si += 1
      }
      moved = false
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else {
          val mu = Array.tabulate(dim)(i => sums(c)(i) / counts(c))
          if (!java.util.Arrays.equals(mu, cents(c))) moved = true
          mu
        }
      }
      iter += 1
    }
    cents
  }

  /** One-sided Jacobi SVD of a square matrix B = U·S·Vᵀ, returning
    * (U, V) (S is not needed for Procrustes). Fixed 30 sweeps over the
    * fixed (p<q) pair order — deterministic, no convergence test;
    * 30 sweeps at d=64 is far past one-sided Jacobi's quadratic-
    * convergence horizon. Rank-deficient inputs (a zero singular
    * value) refuse loudly — a degenerate B means the reconstruction
    * collapsed a dimension, which real embedding corpora don't do.
    */
  private[graft] def jacobiSvdUV(b: Array[Array[Double]])
      : (Array[Array[Double]], Array[Array[Double]]) = {
    val d = b.length
    // column-major working copy W (w(j) = column j) and V = I
    val w = Array.tabulate(d)(j => Array.tabulate(d)(i => b(i)(j)))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val vc = Array.tabulate(d)(j => Array.tabulate(d)(i => v(i)(j)))
    var sweep = 0
    while (sweep < 30) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          var app = 0.0; var aqq = 0.0; var apq = 0.0; var i = 0
          while (i < d) {
            app += w(p)(i) * w(p)(i)
            aqq += w(q)(i) * w(q)(i)
            apq += w(p)(i) * w(q)(i)
            i += 1
          }
          // rotate only when the columns are meaningfully correlated —
          // apq² > ε²·app·aqq (relative test; absolute thresholds
          // misfire across the 10⁴ dynamic range a skewed B spans)
          if (apq * apq > 1e-30 * app * aqq && math.abs(apq) > 0.0) {
            val zeta = (aqq - app) / (2.0 * apq)
            // stable tan root; zeta == 0 must give t = 1 (a 45°
            // rotation), not signum(0) = 0
            val t =
              if (zeta >= 0.0) 1.0 / (zeta + math.sqrt(1.0 + zeta * zeta))
              else -1.0 / (-zeta + math.sqrt(1.0 + zeta * zeta))
            val cs = 1.0 / math.sqrt(1.0 + t * t)
            val sn = cs * t
            var i2 = 0
            while (i2 < d) {
              val wp = w(p)(i2); val wq = w(q)(i2)
              w(p)(i2) = cs * wp - sn * wq
              w(q)(i2) = sn * wp + cs * wq
              val vp = vc(p)(i2); val vq = vc(q)(i2)
              vc(p)(i2) = cs * vp - sn * vq
              vc(q)(i2) = sn * vp + cs * vq
              i2 += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // U columns = normalized W columns. B is ROUTINELY rank-deficient
    // here: each subspace's reconstruction takes only k distinct
    // values, so rank(B) <= m·(k-1)+1 — the Procrustes objective is
    // INDIFFERENT to U's null-space columns, and any deterministic
    // orthonormal completion is optimal. Columns below the relative
    // rank cutoff complete by Gram-Schmidt over the canonical basis
    // (fixed order -> deterministic).
    val uCols = Array.fill(d)(null: Array[Double])
    val norms = Array.tabulate(d) { j2 =>
      math.sqrt((0 until d).foldLeft(0.0)((a, i) =>
        a + w(j2)(i) * w(j2)(i)))
    }
    val cutoff = 1e-10 * math.max(norms.max, java.lang.Double.MIN_NORMAL)
    var j = 0
    while (j < d) {
      if (norms(j) > cutoff)
        uCols(j) = Array.tabulate(d)(i => w(j)(i) / norms(j))
      j += 1
    }
    var basis = 0
    j = 0
    while (j < d) {
      if (uCols(j) == null) {
        // next canonical vector with a non-negligible residual
        var done = false
        while (!done) {
          require(basis < d,
            "OPQ Procrustes: orthonormal completion exhausted the " +
              "canonical basis - numerically degenerate B")
          val cand = Array.tabulate(d)(i => if (i == basis) 1.0 else 0.0)
          var c2 = 0
          while (c2 < d) {
            val uc = uCols(c2)
            if (uc != null) {
              var dot = 0.0; var i = 0
              while (i < d) { dot += uc(i) * cand(i); i += 1 }
              i = 0
              while (i < d) { cand(i) -= dot * uc(i); i += 1 }
            }
            c2 += 1
          }
          val rn = math.sqrt(cand.foldLeft(0.0)((a, x) => a + x * x))
          basis += 1
          if (rn > 1e-6) {
            uCols(j) = cand.map(_ / rn)
            done = true
          }
        }
      }
      j += 1
    }
    val u = Array.tabulate(d, d)((i, j2) => uCols(j2)(i))
    val vOut = Array.tabulate(d, d)((i, j2) => vc(j2)(i))
    (u, vOut)
  }
}
