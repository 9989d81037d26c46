package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 C12): treat media payloads
  * as opaque binary columns with typed metadata extracted executor-side.
  *
  * Image decode is REAL ([[Multimodal.ImageIoDecoder]], round 9): the
  * JDK's `javax.imageio` parses PNG/BMP/GIF/JPEG headers executor-side
  * behind the [[Multimodal.MediaDecoder]] seam. Formats the JDK has no
  * codec for (video/audio) fall back to the clearly-marked
  * deterministic stub; everything around the seam — binary column
  * handling, the typed Dataset batch path, partitioning, output
  * schema — is the same plumbing either way.
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

  /** REAL image decoder (round 9) — `javax.imageio` ships in the JDK,
    * so PNG / BMP / GIF / JPEG / WBMP (+ TIFF on JDK 9+) decode with
    * zero added dependencies. Reads ONLY the header: `getWidth(0)` /
    * `getHeight(0)` parse dimensions without decoding pixel data, the
    * right cost profile for a metadata scan over binary payloads.
    * `getNumImages(allowSearch = true)` counts frames (real for
    * animated GIF / multi-page TIFF; 1 for stills).
    *
    * Payloads no JDK reader recognizes fall through to `fallback`
    * (default: the deterministic stub) — the corrupt-or-exotic-payload
    * policy stays the caller's, and a corpus mixing real images with
    * formats the JDK lacks (video, audio) keeps flowing.
    */
  final class ImageIoDecoder(fallback: MediaDecoder = StubMediaDecoder)
      extends MediaDecoder {
    override def open(): Unit =
      // no disk-backed stream cache on executors: decode from memory
      javax.imageio.ImageIO.setUseCache(false)
    override def decode(docId: Long, payload: Array[Byte]): MediaDecoded = {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (readers.hasNext) {
          val r = readers.next()
          try {
            r.setInput(in)
            MediaDecoded(r.getWidth(0).toLong, r.getHeight(0).toLong,
              math.max(1, r.getNumImages(true)).toLong)
          } finally r.dispose()
        } else fallback.decode(docId, payload)
      } finally if (in != null) in.close()
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

  /** REAL columnar metadata extraction (round 14): the pure-byte
    * [[graft.functions.ImageHeader]] Catalyst expression parses each
    * payload's container header in-place — format sniff (png/jpeg/gif/
    * bmp), width/height, bit depth — inside whole-stage codegen, plus
    * size and sha256 of the full payload. Unknown formats and cut
    * headers surface as the named in-band refusals ('unknown' /
    * 'truncated') with NULL dimensions — per-row, so one corrupt
    * payload never kills a 100 TB scan.
    */
  def extractImageMeta(payloads: DataFrame): DataFrame =
    payloads.select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha_hex"),
        graft.functions.ImageHeader.imageMeta(col("payload")).as("m"))
      .select(col("doc_id"), col("n_bytes"), col("sha_hex"),
        col("m.format").as("format"), col("m.width").as("width"),
        col("m.height").as("height"), col("m.bit_depth").as("bit_depth"))

  /** REAL audio/video container metadata (round 14, the time-based
    * sibling of [[extractImageMeta]]): the pure-byte
    * [[graft.functions.MediaHeader]] Catalyst expression parses each
    * payload's container header in-place — WAV RIFF chunk walk, FLAC
    * STREAMINFO bit-unpack, MP4 box walk to mvhd + trak count — inside
    * whole-stage codegen, plus payload size and sha256. Duration,
    * sample rate, channel count, bit depth, and stream count come from
    * the container's own header fields; unknown formats and cut
    * headers surface as the named in-band refusals ('unknown' /
    * 'truncated') with NULL fields.
    */
  def extractAvMeta(payloads: DataFrame): DataFrame =
    payloads.select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha_hex"),
        graft.functions.MediaHeader.mediaMeta(col("payload")).as("m"))
      .select(col("doc_id"), col("n_bytes"), col("sha_hex"),
        col("m.format").as("format"), col("m.duration_ms").as("duration_ms"),
        col("m.sample_rate").as("sample_rate"),
        col("m.channels").as("channels"),
        col("m.bit_depth").as("bit_depth"), col("m.streams").as("streams"))

  /** Columnar metadata extraction with STUB dimensions — the
    * format-agnostic fallback shape (video/audio payloads have no
    * in-JVM parser here); pure codegen'd expressions, byte-identical
    * to the typed path below. Image payloads should use
    * [[extractImageMeta]] (real header parse) instead.
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
