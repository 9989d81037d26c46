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
