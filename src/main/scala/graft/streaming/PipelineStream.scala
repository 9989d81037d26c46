package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{CleanPipeline, Sampling}

/** The end-to-end cleaning pipeline (SURVEY.md §2 C17) as ONE
  * Structured Streaming query: scrub → quality score → filter →
  * content dedup → deterministic sample, for the ingest-time variant
  * of `pipeline_clean` — documents are cleaned as they arrive instead
  * of in a nightly batch.
  *
  * Everything except the dedup is stateless column arithmetic, so the
  * whole pipeline carries exactly one piece of streaming state: the
  * md5 content-hash set, bounded by the event-time watermark
  * (dropDuplicatesWithinWatermark). At 100 TB/day the state store
  * holds 16-byte hashes for the horizon only — never text — and the
  * sample filter is a pure function of the key, so re-processing after
  * failure keeps the sample stable.
  *
  * Batch equivalence (StreamingCleanSpec): identical output to the
  * batch `pipeline_clean` on the same documents, because both build on
  * [[CleanPipeline.scored]] and differ only in the dedup mechanism
  * (first-arrival within watermark vs min-doc_id keeper window).
  */
object PipelineStream {

  def clean(docs: DataFrame, tsCol: String = "ts",
            minQuality: Double = 0.3, sampleFrac: Double = 0.5,
            horizon: String = "2 hours"): DataFrame = {
    val scored = CleanPipeline.scored(docs)
      .filter(col("quality") >= minQuality)
    val deduped = EventsStream.watermarked(scored, tsCol, horizon)
      .dropDuplicatesWithinWatermark("h")
    Sampling.deterministicSample(deduped, col("doc_id"), sampleFrac,
        portable = true)
      .select("doc_id", "n_tokens", "quality")
  }
}
