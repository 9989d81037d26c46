package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 C12): treat media payloads
  * as opaque binary columns with typed metadata extracted executor-side.
  *
  * The decode step is a clearly-marked deterministic STUB (this
  * container ships no image/audio codecs); everything around it — the
  * binary column handling, the typed Dataset batch path, partitioning,
  * and the output schema — is the real plumbing a decode UDF would run
  * in. Swap `decodeStub` for a real codec call and nothing else changes.
  */
object Multimodal {

  /** Typed metadata record for a decoded media payload. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, sha_hex: String,
                             width: Long, height: Long, n_frames: Long)

  /** What a decoder reports per payload. */
  final case class MediaDecoded(width: Long, height: Long, nFrames: Long)

  /** The codec seam: implement this and pass it to [[extractMetaTyped]]
    * to run a REAL decoder — nothing else in the pipeline changes.
    * Lifecycle contract (the shape native media libs need):
    *  - the instance is constructed on the DRIVER and serialized to
    *    executors, so fields must be lightweight config (paths, flags);
    *  - `open()` runs once per partition BEFORE the first row — load
    *    native libraries / allocate codec contexts here, into
    *    `@transient` or lazily-initialized fields;
    *  - `decode()` runs per row, executor-side, and may throw — a real
    *    pipeline wraps it with its corrupt-payload policy;
    *  - `close()` runs at task completion (success OR failure, via
    *    `TaskContext.addTaskCompletionListener`) — free native memory
    *    here.
    */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def decode(docId: Long, payload: Array[Byte]): MediaDecoded
    def close(): Unit = ()
  }

  /** The honest in-sandbox decoder: [[decodeStub]] behind the seam. */
  object StubMediaDecoder extends MediaDecoder {
    override def decode(docId: Long, payload: Array[Byte]): MediaDecoded = {
      val (w, h, f) = decodeStub(docId, payload.length.toLong)
      MediaDecoded(w, h, f)
    }
  }

  /** STUB decoder: deterministic fake dimensions derived from payload
    * size + id. A real implementation would parse the container header
    * (JPEG SOF / MP4 moov / WAV fmt) right here, per row, executor-side.
    */
  def decodeStub(docId: Long, nBytes: Long): (Long, Long, Long) = (
    64L + Math.floorMod(docId * 7919L + nBytes, 1856L),
    64L + Math.floorMod(docId * 104729L + nBytes, 1016L),
    1L + Math.floorMod(nBytes, 240L))

  /** Columnar metadata extraction — used by the gate query; pure
    * codegen'd expressions, byte-identical to the typed path below.
    */
  def extractMeta(payloads: DataFrame): DataFrame =
    payloads.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("sha_hex"),
      (lit(64L) + pmod(col("doc_id") * 7919L + length(col("payload")), lit(1856L))).as("width"),
      (lit(64L) + pmod(col("doc_id") * 104729L + length(col("payload")), lit(1016L))).as("height"),
      (lit(1L) + pmod(length(col("payload")).cast("long"), lit(240L))).as("n_frames"))

  /** STUB feature extractor (the decode → embed stage): a
    * deterministic fake embedding derived from the payload's FNV-1a
    * fingerprint — e_j = pmod(fp, 1000003 + j) / (1000003 + j), dims
    * in [0, 1). A real pipeline would run the vision/audio encoder
    * right here per row, executor-side; everything around it —
    * columnar plumbing, per-dim schema, downstream vector math — is
    * real and engine-portable (the gate recomputes it in DuckDB from
    * the same bytes). Integer pmod then one exact division keeps every
    * dim bit-identical across engines.
    */
  def extractFeatures(payloads: DataFrame, dims: Int = 8): DataFrame = {
    val fp = graft.functions.Fnv1a64.fingerprint(
      col("payload").cast("string"))
    val es = (0 until dims).map { j =>
      val m = 1000003L + j
      (pmod(fp, lit(m)).cast("double") / lit(m.toDouble)).as(s"e$j")
    }
    payloads.select(col("doc_id") +: es: _*)
      .select(col("doc_id") +: (0 until dims).map(j => col(s"e$j")) :+
        sqrt((0 until dims).map(j => col(s"e$j") * col(s"e$j"))
          .reduce(_ + _)).as("l2_norm"): _*)
  }

  /** Frame sampling: every `everyK`-th frame index of each payload —
    * the explode fan-out a video pipeline uses to turn one media row
    * into per-frame work items (each would carry a decoded tensor in a
    * real pipeline; here the index + provenance columns ARE the
    * payload). Fan-out happens executor-side; no driver involvement.
    */
  def sampleFrames(meta: DataFrame, everyK: Int = 7): DataFrame =
    meta.select(
      col("doc_id"), col("sha_hex"),
      explode(sequence(lit(0L), col("n_frames") - 1L, lit(everyK.toLong)))
        .as("frame_idx"))

  /** Typed per-partition batch path — the shape a real decoder runs in
    * (one iterator per partition, codec initialized once per partition
    * via [[MediaDecoder.open]], released at task completion, rows
    * streamed through). With the default [[StubMediaDecoder]] the
    * output is byte-identical to `extractMeta`; spec asserts equality
    * and the open/decode/close lifecycle.
    */
  def extractMetaTyped(spark: SparkSession, payloads: DataFrame,
                       decoder: MediaDecoder = StubMediaDecoder): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        decoder.open()
        // release native resources on success AND failure/cancellation
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => decoder.close()))
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          digest.reset()
          val sha = digest.digest(bytes).map("%02x".format(_)).mkString
          val d = decoder.decode(id, bytes)
          MediaMeta(id, bytes.length.toLong, sha, d.width, d.height, d.nFrames)
        }
      }
  }
}
