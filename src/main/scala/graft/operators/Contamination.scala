package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination (SURVEY.md §2 C18): flag training
  * documents sharing word n-grams with an evaluation set — the
  * standard pre-training hygiene pass (GPT-3 appendix C / PaLM-style
  * 8-gram overlap, here W configurable).
  *
  * Scale shape (the 100-TB story): the corpus explodes to DISTINCT
  * (doc_id, gram-hash-64) pairs inside the scan stage — 16 bytes a
  * pair, the text never leaves the scan. The eval side is a benchmark
  * suite (MBs, not TBs): its distinct gram hashes reduce to a few
  * hundred thousand longs and BROADCAST, so the contamination join is
  * map-side — zero shuffle of the corpus beyond the per-doc count
  * aggregation. A 64-bit gram-hash collision between a train gram and
  * a different eval gram is the only way the flagging can differ from
  * exact string overlap (same caveat, and same acceptance, as the
  * minhash band-bucket join).
  */
object Contamination {

  /** Distinct W-word shingles of lower(trim(text)), as one array
    * column. Docs with fewer than W tokens contribute none.
    */
  def wordShingles(text: Column, w: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    // letCol: the window lambda slices a BOUND token array - inlining
    // the split tree would re-tokenize per window (quadratic in doc
    // length; see TextFunctions.letCol)
    val windows = graft.functions.TextFunctions.letCol(toks)(t =>
      array_distinct(transform(sequence(lit(1), size(t) - (w - 1)),
        i => array_join(slice(t, i, lit(w)), " "))))
    when(length(trim(text)) > 0 && size(toks) >= w, windows)
      .otherwise(typedlit(Seq.empty[String]))
  }

  /** Per-train-doc contamination report against `eval`:
    * (idCol, n_grams, n_hit, hit_ratio), only docs with n_hit > 0.
    * Both inputs need (idCol, textCol).
    */
  def report(train: DataFrame, eval: DataFrame, idCol: String,
             textCol: String, w: Int): DataFrame = {
    def grams(df: DataFrame) = df
      .select(col(idCol), explode(wordShingles(col(textCol), w)).as("_g"))
      .select(col(idCol), xxhash64(col("_g")).as("_gh"))
    val evalGrams = grams(eval).select("_gh").distinct()
    grams(train)
      .join(broadcast(evalGrams.withColumn("_hit", lit(1L))), Seq("_gh"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
      .where(col("n_hit") > 0)
      .withColumn("hit_ratio",
        col("n_hit").cast("double") / col("n_grams").cast("double"))
  }
}
