package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming duplicate-SPAN detection — the ingest-time companion of
  * batch [[graft.operators.SpanDedup.report]] (Lee et al. 2022
  * window-level dedup), the same relationship NearDedupStream has to
  * batch minhash dedup: each arriving document's W-token windows are
  * checked against every window seen within the watermark horizon, in
  * one streaming query.
  *
  * Shape: distinct W-token windows hash inside the scan stage
  * (stateless; the text never reaches state or a shuffle) → window-
  * hash rows + one per-doc PRESENCE row → dropDuplicatesWithinWatermark
  * on the hash (first claim wins) → per-document surviving-row count
  * on a tumbling emit window. Output per doc:
  * (doc_id, window_start_us, win_total, win_new, win_dup) where
  * win_new windows were first claimed BY this doc and win_dup were
  * already claimed by an earlier one.
  *
  * Semantics are FIRST-ARRIVAL-WINS, the ingest-time analogue of the
  * batch report's "occurs in more than one doc": for a window shared
  * by docs d1, d2, ... in arrival order, the batch operator flags all
  * of them, the stream flags all but d1 — exactly the set you'd scrub
  * at ingest while keeping one canonical copy. Within one micro-batch
  * a shared window's claimant is arbitrary (same documented caveat as
  * NearDedupStream); cross-batch is exact.
  *
  * Scale: state is one 8-byte key per DISTINCT window hash in the
  * horizon — independent of document size and of how many documents
  * repeat the window (a viral license header is ONE state entry);
  * the emit aggregation holds one counter per in-flight document.
  */
object SpanDedupStream {

  def flagDupSpans(docs: DataFrame, tsCol: String = "ts", w: Int = 8,
                   horizon: String = "2 hours",
                   emitWindow: String = "1 hour"): DataFrame = {
    val wins = docs.select(col("doc_id"), col(tsCol),
      graft.operators.Contamination.wordShingles(col("text"), w).as("_wins"))
    // Presence row: unique per doc_id, so a doc whose EVERY window was
    // claimed earlier still emits (win_new = 0) instead of vanishing;
    // an exact doc_id redelivery inside the horizon dedups on it and
    // emits nothing — the right outcome for at-least-once replays.
    val rows = wins.select(col("doc_id"), col(tsCol),
      size(col("_wins")).cast("long").as("win_total"),
      explode(concat(
        transform(col("_wins"), s => xxhash64(s)),
        array(xxhash64(lit("presence"), col("doc_id"))))).as("_wh"))
    val survivors = EventsStream.watermarked(rows, tsCol, horizon)
      .dropDuplicatesWithinWatermark("_wh")
    survivors
      .groupBy(window(col(tsCol), emitWindow), col("doc_id"))
      .agg(max(col("win_total")).as("win_total"),
        (count(lit(1)) - 1L).as("win_new"))
      .select(col("doc_id"),
        unix_micros(col("window.start")).as("window_start_us"),
        col("win_total"),
        col("win_new").cast("long").as("win_new"),
        (col("win_total") - col("win_new")).cast("long").as("win_dup"))
  }
}
