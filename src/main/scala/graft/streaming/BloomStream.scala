package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.BloomFilter

/** Streaming Bloom filter (round 13) — the ingest-time side of the
  * portable sparse filter ([[graft.operators.BloomFilter]]): the same
  * set-bit relation maintained by ONE update-mode streaming
  * aggregation (each bit row carries how many keys set it; membership
  * reads only the bit's existence).
  *
  * State is bounded at m rows BY CONSTRUCTION — like [[CmsStream]],
  * the filter never grows with the stream, so no watermark or TTL is
  * needed; build and merge are the same union+distinct relation, so a
  * snapshot merges losslessly with any batch filter (spec-proven to
  * settle to the batch build of everything streamed). The unbounded-
  * stream use is the crawl seen-set: "have we (probably) fetched this
  * URL before" with no false negatives at any stream length.
  */
object BloomStream {

  def filterStream(keyed: DataFrame, keyCol: String,
                   m: Int = BloomFilter.NumBits): DataFrame =
    (0 until BloomFilter.NumHashes)
      .map(j => keyed.select(BloomFilter.bit(j, col(keyCol), m).as("bit")))
      .reduce(_.unionByName(_))
      .groupBy("bit").agg(count(lit(1)).as("n_setters"))
}
