package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity for the training-data pipeline (SURVEY.md §2
  * C5-C7): exact cosine primitives, brute-force top-k (the correctness
  * baseline), and random-hyperplane LSH (the scale path).
  *
  * All dot products accumulate left-to-right in DOUBLE via codegen'd
  * higher-order functions — bit-deterministic, matching DuckDB's
  * list_inner_product fold for the oracle.
  */
object Similarity {

  /** dot(a, b) in double, sequential left-to-right accumulation —
    * the fused codegen kernel (graft.functions.DotProductExpr).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dot(a, b)

  /** The array-HOF formulation of the same fold: semantically and
    * bit-wise identical (spec-enforced), kept as the cross-check
    * oracle for the codegen kernel.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** cosine(a, b) with a fixed operation tree: dot / (sqrt(na) * sqrt(nb)). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Turn a scored (probe_id, vec_id, cos) relation into per-probe
    * top-k rows via the bounded TopK aggregator: partial aggregates
    * carry at most k entries per probe per partition across the
    * shuffle — no global sort of scored rows (SURVEY.md §5).
    */
  private def selectTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("probe_id")
      .agg(graft.functions.TopK.topk(k)(col("cos"), col("vec_id")).as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(col("probe_id"), col("col._2").as("vec_id"),
        col("col._1").as("cos"), (col("pos") + 1).cast("long").as("rk"))

  /** Brute-force exact top-k neighbors of each probe vector.
    * Probes are expected to be a SMALL set (they are broadcast — the
    * corpus is scanned exactly once, in place, with no corpus shuffle);
    * per-probe selection is the bounded TopK aggregate, tie-broken by
    * corpus id so results are total-ordered.
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
    selectTopK(
      c.join(broadcast(p), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          cosine(col("probe_vec"), col("vec")).as("cos")), k)
  }

  /** Window-function variant of the same query — identical results,
    * kept as the cross-check oracle for the aggregator path (and for
    * callers that need other window functions over the same keys).
    */
  def bruteForceTopKWindow(corpus: DataFrame, probes: DataFrame, k: Int,
                           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("vec_id"))
    c.join(broadcast(p), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("probe_vec"), col("vec")).as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Matryoshka-representation serving (round 12; Kusupati et al.
    * 2022 — MRL trains embeddings so every PREFIX is itself a valid
    * lower-dimensional embedding): shortlist by EXACT squared L2 on
    * the first `mrlDim` dims — mrlDim/dim of the scan's compute and,
    * on a column-sliced store, of its I/O — then rerank ONLY the
    * shortlist at full dimension. The adaptive-retrieval shape from
    * the paper, and the cheapest ANN rung of all: no trained model,
    * no codes, just a prefix slice.
    *
    * Scale shape: stage 1 is [[bruteForceTopK]]'s bounded TopK
    * aggregate over prefix slices (probes broadcast, corpus scanned
    * once, map-side partial top-k — no scored-row shuffle); stage 2
    * re-reads raw vectors for ONLY probes×shortlist ids via broadcast
    * joins, zero shuffle (the `ann_ivfpq_rerank` refine shape). Both
    * distances fold bit-exactly (SqDistExpr), so shortlist membership
    * AND final ranks replay in the DuckDB oracle.
    */
  def mrlTopK(corpus: DataFrame, probes: DataFrame, k: Int, mrlDim: Int,
              shortlist: Int, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    require(mrlDim >= 1, s"mrlDim must be >= 1, got $mrlDim")
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    // spread (round 18): the BNLJ sweep's parallelism is the corpus
    // side's partition count; an under-split corpus file serializes
    // the n×p prefix-distance pass onto one core (sf1 JobProfile:
    // wall ≈ Σtask). Identity on any realistically-written table.
    val c = graft.Tables.spread(corpus)
      .select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
    // prefixSqDist (round 18): bit-identical to sqDist over the two
    // slices, minus two array materializations per candidate pair
    val pre = c.join(broadcast(p), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.functions.VectorOps.prefixSqDist(
          col("probe_vec"), col("vec"), mrlDim).as("pd2"))
    // TopK orders by (-score, id): score = −pd2 → pd2 asc, vec_id asc
    val sl = pre.groupBy("probe_id")
      .agg(graft.functions.TopK.topk(shortlist)(-col("pd2"), col("vec_id"))
        .as("top"))
      .select(col("probe_id"), explode(col("top")).as("e"))
      .select(col("probe_id"), col("e._2").as("vec_id"))
    c.join(broadcast(sl), "vec_id")
      .join(broadcast(p), "probe_id")
      .select(col("probe_id"), col("vec_id"),
        graft.functions.VectorOps.sqDist(col("probe_vec"), col("vec"))
          .as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("d2").asc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("vec_id"), col("d2"),
        col("rk").cast("long").as("rk"))
  }

  /** kNN label propagation: classify each probe by majority vote of
    * its k nearest labeled neighbors (exact cosine), ties on the vote
    * count broken toward the smallest label — fully deterministic.
    *
    * Scale shape: the neighbor search is [[bruteForceTopK]]'s bounded
    * aggregate (swap in IvfIndex/PqIndex.topK for corpus scale — any
    * (probe_id, vec_id, rk) relation votes the same way); the label
    * join BROADCASTS the tiny neighbor set against the corpus labels,
    * so the full label table never shuffles; the vote itself is
    * #probes × k rows.
    */
  def knnClassify(corpus: DataFrame, probes: DataFrame, k: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  labelCol: String = "label"): DataFrame = {
    val nn = bruteForceTopK(corpus, probes, k, idCol, vecCol)
    val labels = corpus.select(col(idCol).as("vec_id"),
      col(labelCol).cast("long").as("label"))
    val votes = labels.join(broadcast(nn), "vec_id")
      .groupBy("probe_id", "label").agg(count(lit(1)).as("n_votes"))
    votes.withColumn("rk", row_number().over(
        Window.partitionBy("probe_id")
          .orderBy(col("n_votes").desc, col("label"))))
      .where(col("rk") === 1)
      .select(col("probe_id"), col("label").as("pred_label"),
        col("n_votes"))
  }

  /** Deterministic pseudo-random hyperplane components (seeded). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Embedding dimensionality of `vecCol`, read from one row (a tiny
    * LIMIT-1 job, same cost class as k-means centroid training in
    * IvfIndex). zip_with against a wrong-length plane pads with NULLs
    * and silently collapses every signature to one bucket — so derive,
    * never assume.
    */
  def vecDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** Random-hyperplane signature: bit j = sign(dot(v, plane_j)). */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (plane, j) =>
      when(dot(vec, typedlit(plane)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Embedding near-duplicate pairs via LSH buckets + exact cosine
    * rerank. Only (bucket, id, vec) shuffles; pair candidates are
    * bounded by bucket occupancy. Cosine-similar vectors agree on most
    * hyperplane signs, so they collide on at least one of the two
    * half-signature buckets with high probability.
    */
  def embeddingPairs(vecs: DataFrame, threshold: Double = 0.99,
                     nPlanes: Int = 16,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else vecDim(vecs, vecCol)
    val planes = hyperplanes(nPlanes, d)
    val v = vecs.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
    val sigs = v.select(col("vec_id"), lshSignature(col("vec"), planes).as("sig"))
    // two bands of nPlanes/2 bits each; candidates travel as bare id
    // pairs through the dedup shuffle — vectors join back once per
    // distinct pair (same fix as Dedup.minhashPairs)
    val banded = sigs.select(col("vec_id"),
        explode(array(
          struct(lit(0).as("band"), col("sig").bitwiseAND(lit((1L << (nPlanes / 2)) - 1)).as("bh")),
          struct(lit(1).as("band"), shiftright(col("sig"), nPlanes / 2).as("bh")))).as("bb"))
      .select(col("vec_id"), col("bb.band"), col("bb.bh"))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
      .join(v.select(col("vec_id").as("vec_a"), col("vec").as("va")), "vec_a")
      .join(v.select(col("vec_id").as("vec_b"), col("vec").as("vb")), "vec_b")
      .select(col("vec_a"), col("vec_b"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** LSH-bucketed approximate top-k: like bruteForceTopK but each probe
    * only scores corpus vectors sharing an LSH band — the 1000-executor
    * path where the corpus is too big to score fully per probe. Recall
    * vs the exact baseline is spec-checked.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              nPlanes: Int = 16,
              idCol: String = "vec_id", vecCol: String = "embedding",
              dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else vecDim(corpus, vecCol)
    val planes = hyperplanes(nPlanes, d)
    def banded(df: DataFrame, id: String) =
      df.select(col(idCol).as(id), lshSignature(col(vecCol), planes).as("sig"))
        .select(col(id),
          explode(array(
            struct(lit(0).as("band"), col("sig").bitwiseAND(lit((1L << (nPlanes / 2)) - 1)).as("bh")),
            struct(lit(1).as("band"), shiftright(col("sig"), nPlanes / 2).as("bh")))).as("bb"))
        .select(col(id), col("bb.band"), col("bb.bh"))
    val c = banded(corpus, "vec_id")
    val p = banded(probes, "probe_id")
    // candidate (probe, vec) ids dedup BEFORE the vectors attach —
    // only one cosine per distinct candidate, and the dedup shuffle
    // moves 16 bytes per band hit instead of two embedding payloads
    val cand = c.join(broadcast(p),
        c("band") === p("band") && c("bh") === p("bh") &&
          col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"))
      .dropDuplicates("probe_id", "vec_id")
    selectTopK(
      cand
        .join(broadcast(probes.select(col(idCol).as("probe_id"),
          col(vecCol).as("probe_vec"))), "probe_id")
        .join(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec")), "vec_id")
        .select(col("probe_id"), col("vec_id"),
          cosine(col("probe_vec"), col("vec")).as("cos")), k)
  }
}
