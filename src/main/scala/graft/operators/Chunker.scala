package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping fixed-size chunking (SURVEY.md §2 C32) — the RAG /
  * context-window preprocessing step: split each document's token
  * stream into `chunkSize`-token chunks advancing by `chunkSize - overlap`
  * tokens, so consecutive chunks share `overlap` tokens of context
  * and no boundary sentence is ever lost to a hard cut.
  *
  * Chunk k covers tokens [k·stride, k·stride + chunkSize); the last chunk
  * may be shorter but is only emitted if it starts inside the doc.
  * Every token belongs to at least one chunk; tokens at stride
  * boundaries belong to exactly two.
  *
  * Scale shape: pure executor-side array work inside the scan stage —
  * tokenize, one `transform(sequence(...))` per doc, explode. Zero
  * shuffle; the output order (and any downstream partitioning) is the
  * caller's. At 100 TB this is the same single-pass shape as the
  * text-metric queries: the text never leaves the executor that read
  * it, and each doc's cost is linear in its own length.
  */
object Chunker {

  /** (idCol, chunk_id, chunk_start, n_chunk_tokens, chunk_text) for
    * every doc with at least one token. `chunkSize` > `overlap` >= 0.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need size > overlap >= 0, got size=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val toks = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("_tk"))
    // number of chunks = ceil(max(1, n - overlap) / stride) via
    // integer `div` — exact on both engines, no float ceil (Spark's
    // Column `/` is ALWAYS double division, even on longs)
    val nChunks = expr(
      s"CAST((greatest(size(_tk) - $overlap, 1) + ${stride - 1}) div $stride AS BIGINT)")
    toks
      .select(col(idCol), col("_tk"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("chunk_start"),
        least(lit(chunkSize.toLong), size(col("_tk")) - col("chunk_id") * stride)
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("_tk"),
          (col("chunk_id") * stride + 1).cast("int"), lit(chunkSize)), " ")
          .as("chunk_text"))
  }
}
