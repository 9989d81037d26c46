package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concatenation-style sequence packing (SURVEY.md §2 C19): lay the
  * corpus out as fixed-length training windows. Docs are concatenated
  * in deterministic order within a shard and split at every `seqLen`
  * token boundary — the GPT-style pack: no padding waste, a doc may
  * straddle windows (`pack_first`..`pack_last`).
  *
  * Scale shape: one shuffle on `shard` + a per-shard sort — the
  * running token offset is a prefix sum inside each shard, nothing
  * global. Shard count scales with the corpus (here `nShards` fixed
  * for the gate; at 100 TB pick ~#cores×4 so each shard's window sort
  * fits an executor and the layout job is embarrassingly parallel).
  * Output is the doc→window placement map a writer would use to emit
  * token shards; it is a pure function of (doc order, token counts),
  * so re-runs are reproducible.
  */
object SequencePacker {

  /** (idCol, shard, n_tokens, tok_offset, pack_first, pack_last) for
    * every doc with n_tokens > 0. `tokens` must already be a LONG
    * column on `docs`.
    */
  def pack(docs: DataFrame, idCol: String, tokensCol: String,
           nShards: Int, seqLen: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), pmod(col(idCol), lit(nShards.toLong)).as("shard"),
        col(tokensCol).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("tok_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("pack_first", floor(col("tok_offset") / seqLen).cast("long"))
      .withColumn("pack_last",
        floor((col("tok_offset") + col("n_tokens") - 1) / seqLen).cast("long"))
  }
}
