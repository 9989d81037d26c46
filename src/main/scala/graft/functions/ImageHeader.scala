package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-byte image HEADER parser (round 14 — upgrades SURVEY.md §2 C12
  * from the deterministic decode stub to the real capability): format
  * sniff + dimension/bit-depth extraction for the four stable public
  * container formats a metadata scan meets — PNG (IHDR chunk), JPEG
  * (SOFn segment walk), GIF (logical screen descriptor), BMP
  * (BITMAPINFOHEADER). Zero libraries — the byte layouts come from the
  * public format specs (PNG: RFC 2083 §11.2.2; JPEG: ITU-T T.81 §B.2.2;
  * GIF89a spec §18; BMP: Windows BITMAPINFOHEADER), the same
  * fileformat-doc-to-byte-parser discipline as sources/SqliteFile.
  *
  * A native Catalyst `Expression` with `doGenCode`, so a 100 TB binary
  * scan keeps the parse inside whole-stage codegen next to the
  * projection — no UDF encoder boundary per payload. Parse cost is a
  * bounded header walk (JPEG: segment hops to the first SOF; others:
  * fixed offsets) — pixel data is never touched.
  *
  * Refusals are NAMED IN-BAND (per-row, flow-friendly — an ETL scan
  * must not die on one corrupt payload):
  *  - format = 'truncated': a known magic whose header is cut short, a
  *    JPEG whose segment structure breaks / ends before any SOF, or a
  *    PNG whose first chunk is not IHDR (spec-violating) — the payload
  *    CLAIMED a format and failed it; width/height/bit_depth are NULL.
  *  - format = 'unknown': no known magic (video/audio/other) —
  *    dimensions NULL; the caller's exotic-format policy applies
  *    (Multimodal.MediaDecoder keeps the stub fallback for those).
  */
object ImageHeader {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("bit_depth", LongType, nullable = true)))

  /** Column API: struct(format, width, height, bit_depth). */
  def imageMeta(c: Column): Column =
    graftShim.column(ImageHeaderExpr(graftShim.expression(c)))

  /** Column API: EXIF orientation (1-8) of a JPEG payload, NULL when
    * absent/not-JPEG/malformed. See [[exifOrientation(b*)]].
    */
  def exifOrientation(c: Column): Column =
    graftShim.column(ExifOrientationExpr(graftShim.expression(c)))

  // ---------------------------------------------------------- kernel

  private val Png = UTF8String.fromString("png")
  private val Jpeg = UTF8String.fromString("jpeg")
  private val Gif = UTF8String.fromString("gif")
  private val Bmp = UTF8String.fromString("bmp")
  private val Truncated = UTF8String.fromString("truncated")
  private val Unknown = UTF8String.fromString("unknown")

  private def row(fmt: UTF8String, w: Long, h: Long, d: Long): InternalRow =
    new GenericInternalRow(Array[Any](fmt, w, h, d))
  private def bad(fmt: UTF8String): InternalRow =
    new GenericInternalRow(Array[Any](fmt, null, null, null))

  private def be(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L; var i = 0
    while (i < n) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }
  private def le(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L; var i = n - 1
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Shared by interpreted eval and generated code. */
  def parseRow(b: Array[Byte]): InternalRow = {
    val n = b.length
    // PNG: 8-byte magic, then the IHDR chunk MUST be first (spec) —
    // 4-byte length (13), 4-byte 'IHDR', then w/h BE32 + depth byte.
    if (n >= 8 && be(b, 0, 8) == 0x89504E470D0A1A0AL) {
      if (n < 26) return bad(Truncated)
      if (be(b, 12, 4) != 0x49484452L) return bad(Truncated) // not IHDR
      return row(Png, be(b, 16, 4), be(b, 20, 4), b(24) & 0xffL)
    }
    // GIF: 'GIF87a' / 'GIF89a', then the logical screen descriptor —
    // w/h LE16, packed byte's color-resolution field (bits 4-6) + 1.
    if (n >= 6 && be(b, 0, 4) == 0x47494638L &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      if (n < 11) return bad(Truncated)
      return row(Gif, le(b, 6, 2), le(b, 8, 2), ((b(10) >> 4) & 0x7) + 1L)
    }
    // BMP: 'BM', BITMAPINFOHEADER at byte 14 — w LE32@18, h LE32@22
    // (negative = top-down; magnitude is the pixel height), bpp LE16@28.
    if (n >= 2 && b(0) == 'B' && b(1) == 'M') {
      if (n < 30) return bad(Truncated)
      val h = le(b, 22, 4).toInt.toLong // sign-extend the LE32
      return row(Bmp, le(b, 18, 4), math.abs(h), le(b, 28, 2))
    }
    // JPEG: SOI then a segment walk to the first SOFn (frame header):
    // every segment is FF <marker> <len BE16 incl. itself>; SOF holds
    // precision @+4, height BE16 @+5, width BE16 @+7. Standalone
    // markers (TEM, RSTn) carry no length. A structural break, running
    // off the buffer, or EOI/SOS before any SOF -> 'truncated'.
    if (n >= 2 && (b(0) & 0xff) == 0xFF && (b(1) & 0xff) == 0xD8) {
      var i = 2
      while (i + 1 < n) {
        if ((b(i) & 0xff) != 0xFF) return bad(Truncated)
        val mk = b(i + 1) & 0xff
        if (mk == 0xFF) { i += 1 } // fill byte
        else if (mk == 0x01 || (mk >= 0xD0 && mk <= 0xD7)) i += 2 // standalone
        else if (mk == 0xD9 || mk == 0xDA) return bad(Truncated) // EOI/SOS, no SOF
        else if (mk >= 0xC0 && mk <= 0xCF && mk != 0xC4 && mk != 0xC8 &&
            mk != 0xCC) {
          if (i + 9 > n) return bad(Truncated)
          return row(Jpeg, be(b, i + 7, 2), be(b, i + 5, 2), b(i + 4) & 0xffL)
        } else {
          if (i + 4 > n) return bad(Truncated)
          val len = be(b, i + 2, 2).toInt
          if (len < 2) return bad(Truncated)
          i += 2 + len
        }
      }
      return bad(Truncated)
    }
    bad(Unknown)
  }

  /** EXIF orientation (tag 0x0112, values 1-8) from a JPEG's APP1
    * segment — the one EXIF field a resize/thumbnail pipeline MUST
    * read (cameras store sensor-native pixels and record the rotation
    * here; ignoring it ships sideways images). Pure-byte: the same
    * segment walk as [[parseRow]] hops to APP1 'Exif\0\0', then the
    * embedded TIFF structure (byte order 'II'/'MM', magic 42, IFD0
    * entry scan) yields the tag — public layouts from ITU-T T.81 +
    * the TIFF 6.0 / EXIF 2.x specs.
    *
    * NULL-not-refusal contract: orientation is OPTIONAL metadata, so
    * every miss — not a JPEG, no APP1, no EXIF marker, malformed TIFF,
    * tag absent, value out of 1-8 — is NULL, never an error. (The
    * format/dimension REQUIRED fields keep parseRow's named refusals.)
    */
  def exifOrientation(b: Array[Byte]): Any = {
    val n = b.length
    if (n < 4 || (b(0) & 0xff) != 0xFF || (b(1) & 0xff) != 0xD8) return null
    var i = 2
    while (i + 4 <= n) {
      if ((b(i) & 0xff) != 0xFF) return null
      val mk = b(i + 1) & 0xff
      if (mk == 0xFF) { i += 1 }
      else if (mk == 0x01 || (mk >= 0xD0 && mk <= 0xD7)) i += 2
      else if (mk == 0xD9 || mk == 0xDA) return null // no APP1 before scan
      else {
        val len = be(b, i + 2, 2).toInt
        if (len < 2 || i + 2 + len > n) return null
        if (mk == 0xE1 && len >= 16 &&
            be(b, i + 4, 4) == 0x45786966L && be(b, i + 8, 2) == 0L) {
          val t = i + 10 // TIFF header origin (offsets are relative here)
          val little = b(t) == 'I' && b(t + 1) == 'I'
          val big = b(t) == 'M' && b(t + 1) == 'M'
          if (!little && !big) return null
          def u16(o: Int): Long = if (little) le(b, o, 2) else be(b, o, 2)
          def u32(o: Int): Long = if (little) le(b, o, 4) else be(b, o, 4)
          val segEnd = i + 2 + len
          if (u16(t + 2) != 42L) return null
          val ifd = t + u32(t + 4).toInt
          if (ifd + 2 > segEnd || ifd < t) return null
          val cnt = u16(ifd).toInt
          var e = 0
          while (e < cnt) {
            val off = ifd + 2 + e * 12
            if (off + 12 > segEnd) return null
            if (u16(off) == 0x0112L) {
              if (u16(off + 2) != 3L || u32(off + 4) != 1L) return null
              val v = u16(off + 8) // SHORT value sits in the first 2 bytes
              return if (v >= 1 && v <= 8) java.lang.Long.valueOf(v) else null
            }
            e += 1
          }
          return null // IFD0 has no orientation tag
        }
        i += 2 + len
      }
    }
    null
  }
}

/** EXIF orientation as a codegen'd unary expression — LongType 1-8,
  * NULL on every miss (optional metadata, not a refusal).
  */
case class ExifOrientationExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"exif_orientation requires a binary input, got ${child.dataType}")
  override def prettyName: String = "exif_orientation"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ImageHeader.exifOrientation(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultCode = (c: String) =>
      s"""Object r = graft.functions.ImageHeader.exifOrientation($c);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) r).longValue(); }
         |""".stripMargin
    nullSafeCodeGen(ctx, ev, resultCode)
  }

  override protected def withNewChildInternal(newChild: Expression): ExifOrientationExpr =
    copy(child = newChild)
}

case class ImageHeaderExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ImageHeader.schema
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_meta requires a binary input, got ${child.dataType}")
  override def prettyName: String = "image_meta"

  override protected def nullSafeEval(input: Any): Any =
    ImageHeader.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageHeader.parseRow($c)")

  override protected def withNewChildInternal(newChild: Expression): ImageHeaderExpr =
    copy(child = newChild)
}
