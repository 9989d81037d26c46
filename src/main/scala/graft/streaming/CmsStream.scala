package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.CmSketch

/** Streaming count-min sketch — the ingest-time side of the portable
  * sparse CMS ([[graft.operators.CmSketch]]): the same (j, bucket,
  * cnt) relation maintained by ONE update-mode streaming aggregation.
  *
  * State is bounded at Depth·Width rows BY CONSTRUCTION — the sketch
  * never grows with the stream, so no watermark or TTL is needed (the
  * property that makes CMS the right frequency state for unbounded
  * streams where exact per-key counts would grow without limit).
  * Because build and merge are the same union+sum relation, a stored
  * snapshot of this aggregation merges losslessly with any batch
  * sketch — spec-proven to settle to the batch sketch of everything
  * streamed.
  */
object CmsStream {

  def sketchStream(keyed: DataFrame, keyCol: String): DataFrame =
    (0 until CmSketch.Depth)
      .map(j => keyed.select(lit(j).as("j"),
        CmSketch.bucket(j, col(keyCol)).as("bucket")))
      .reduce(_.unionByName(_))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
}
