package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication — SemDeDup (Abbas et al. 2023,
  * arXiv:2303.09540): embedding-space near-duplicates are found INSIDE
  * k-means clusters only, never across the whole corpus. The coarse
  * quantizer turns the O(n²) pairwise-cosine problem into Σ|cell|²
  * work, and the cell count is the knob that bounds it: at 100 TB you
  * train nList ≈ n/1000 centroids (training cost is unchanged — it is
  * a bounded driver-side sample either way, [[IvfIndex.train]]) so the
  * per-cell quadratic stays constant as the corpus grows.
  *
  * Keep rule: a vector is KEPT iff no lower-id vector in its cell is
  * within `tau` cosine. Min-id-wins is a one-join decision —
  * deterministic, rerun-stable, and free of the iterative
  * connected-components loop (the paper keeps a random representative
  * per duplicate set; a fixed total order is the reproducible version
  * of the same policy). Transitive chains collapse toward the lowest
  * id: if a~b and b~c but a!~c, both b and c are dropped only when
  * each has a LOWER similar id — c survives unless something below it
  * is within tau, the same "one representative per local
  * neighborhood" outcome the paper reports is insensitive to policy.
  *
  * Scale shape: cell assignment is a map-side argmin against broadcast
  * centroids (no shuffle); the self-join shuffles the corpus ONCE on
  * `cell` (co-partitioned equi-join); vectors leave the scan stage
  * only as (id, cell, vec) — and at PQ scale the vec side can be
  * swapped for ADC codes the same way [[PqIndex.topKIvf]] does.
  */
object SemDedup {

  /** Per-vector verdict: (vec_id, cell, n_dup_lower, keep). */
  def flag(vecs: DataFrame, model: IvfIndex.Model, tau: Double,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = vecs.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("vec"),
      IvfIndex.assignCell(col(vecCol), model).as("cell"))
    val a = assigned.select(col("cell"), col("vec_id").as("a_id"),
      col("vec").as("a_vec"))
    val b = assigned.select(col("cell"), col("vec_id").as("b_id"),
      col("vec").as("b_vec"))
    // lower-id neighbors within tau, counted per victim
    val dupCounts = a.join(b, Seq("cell"))
      .where(col("a_id") < col("b_id") &&
        Similarity.cosine(col("a_vec"), col("b_vec")) >= tau)
      .groupBy(col("b_id")).agg(count(lit(1)).as("n_dup_lower"))
    assigned.select(col("vec_id"), col("cell").cast("long").as("cell"))
      .join(dupCounts, col("vec_id") === dupCounts("b_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("n_dup_lower"), lit(0L)).as("n_dup_lower"),
        (coalesce(col("n_dup_lower"), lit(0L)) === 0).cast("long").as("keep"))
  }
}
