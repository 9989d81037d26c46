package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document duplicate-span detection (SURVEY.md §2 C24) — the
  * window-level half of "Deduplicating Training Data Makes Language
  * Models Better" (Lee et al. 2022): find W-token windows that occur
  * in more than one document (boilerplate, licenses, templated spans)
  * and report, per document, how much of it is such duplicated
  * material. Exact-substring suffix-array dedup refines this; the
  * windowed rolling form is the shape that distributes.
  *
  * Scale shape: each document emits its DISTINCT windows as 64-bit
  * hashes inside the scan stage — 16 bytes a pair, the text never
  * shuffles. The global window-frequency table is one (hash -> n_docs)
  * aggregation with map-side partials; joining it back to the pairs is
  * a same-key shuffle join (both sides hash-partitioned on the window
  * hash — co-partitioned, no broadcast needed since the frequency
  * table scales with the corpus). A viral window (license header in
  * millions of docs) is ONE row on the count side; the pair side
  * spreads across partitions, so there is no hot-key serialization.
  */
object SpanDedup {

  /** Per-doc duplicate-span report over W-token windows:
    * (id, win_total, win_dup, dup_frac) for every doc with >= W tokens,
    * where win_dup counts this doc's distinct windows that also appear
    * in at least one OTHER document and dup_frac = win_dup/win_total
    * (one IEEE divide — engine-portable).
    */
  def report(docs: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    val pairs = docs
      .select(col(idCol),
        explode(Contamination.wordShingles(col(textCol), w)).as("_win"))
      .select(col(idCol), xxhash64(col("_win")).as("_wh"))
    val winDocs = pairs // pairs are distinct per doc -> count(*) = #docs
      .groupBy("_wh").agg(count(lit(1)).as("_n_docs"))
    pairs.join(winDocs, Seq("_wh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("win_total"),
        sum(when(col("_n_docs") > 1, 1L).otherwise(0L)).as("win_dup"))
      .withColumn("dup_frac",
        col("win_dup").cast("double") / col("win_total").cast("double"))
  }
}
