package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming NEAR-duplicate detection (the ingest-time companion of
  * batch Dedup.minhashPairs): each arriving document is flagged
  * against everything seen within the watermark horizon, in one
  * streaming query.
  *
  * Shape: fused MinHash128 signature (stateless, one kernel pass) →
  * explode into 32 four-hash band buckets → bucket-level
  * dropDuplicatesWithinWatermark → per-document surviving-bucket count
  * on a tumbling window. A document is NOVEL iff all 32 of its band
  * rows survived — i.e. none of its buckets was claimed by an earlier
  * document.
  *
  * Semantics are candidate-level (recall-first): any shared band
  * flags a duplicate, the same candidate rule the batch operator uses
  * BEFORE its est-Jaccard rerank. A coincidental single-band collision
  * can flag a non-duplicate; pipelines that need the exact batch
  * semantics join flagged docs back to a signature store and rerank —
  * the flag stream bounds that join to candidates.
  *
  * Scale: state is one row per DISTINCT (band, bucket-hash) in the
  * horizon — 12 bytes of key per entry, independent of document size;
  * the window aggregation state is one counter per in-flight document.
  * Nothing text-sized ever enters a shuffle or the state store.
  *
  * Intra-micro-batch caveat: within one batch a duplicate GROUP has no
  * arrival order, so its bucket rows split arbitrarily between members
  * and every member (including the would-be keeper) can flag as
  * duplicate — over-flagging, never under. Cross-batch (the normal
  * ingest case) is exact first-arrival-wins.
  */
object NearDedupStream {

  def flagNearDuplicates(docs: DataFrame, tsCol: String = "ts",
                         horizon: String = "2 hours",
                         emitWindow: String = "1 hour"): DataFrame = {
    val sigs = docs.select(col("doc_id"), col(tsCol),
      graft.functions.MinHash128.signature(col("text")).as("sig"))
    // 32 band buckets + one PRESENCE row whose key is unique per
    // doc_id: a document that loses every band bucket to earlier
    // claimants still emits (novel=false) instead of vanishing. The
    // presence key dedups too — an exact doc_id redelivery inside the
    // horizon (at-least-once ingest) therefore emits nothing, which is
    // the right outcome for a replay.
    val banded = sigs.select(col("doc_id"), col(tsCol),
      explode(expr(
        "concat(transform(sequence(0, 31), " +
          "k -> xxhash64(k, slice(sig, k * 4 + 1, 4))), " +
          "array(xxhash64('presence', doc_id)))")).as("bh"))
    val survivors = EventsStream.watermarked(banded, tsCol, horizon)
      .dropDuplicatesWithinWatermark("bh")
    survivors
      .groupBy(window(col(tsCol), emitWindow), col("doc_id"))
      .agg(count(lit(1)).as("n_live"))
      .select(col("doc_id"),
        unix_micros(col("window.start")).as("window_start_us"),
        (col("n_live") === 33).as("novel"))
  }
}
