package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.functions.ImageHeader
import graft.operators.Multimodal

/** The round-14 real-decode upgrade (C12): ImageHeader parses REAL
  * image bytes — written by the JDK's own codecs (ImageIO ships PNG /
  * JPEG / GIF / BMP writers), not synthetic fixtures — and must agree
  * with the JDK's independent decoder on every one. Plus the named
  * in-band refusals ('truncated' / 'unknown') and format corners the
  * gate's planted corpus can't reach (16-bit PNG from a real encoder,
  * top-down BMP, EOI-before-SOF).
  */
class ImageHeaderSpec extends SparkFunSuite {

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  private def parse(b: Array[Byte]): (String, Option[Long], Option[Long], Option[Long]) = {
    val r = ImageHeader.parseRow(b)
    val fmt = r.getUTF8String(0).toString
    def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
    (fmt, opt(1), opt(2), opt(3))
  }

  test("real JDK-encoded PNG/JPEG/GIF/BMP: format + exact dimensions") {
    val img = new BufferedImage(37, 21, BufferedImage.TYPE_INT_RGB)
    img.setRGB(5, 5, 0xFF8800) // non-trivial content
    val cases = Seq("png" -> "png", "jpg" -> "jpeg",
      "gif" -> "gif", "bmp" -> "bmp")
    cases.foreach { case (writer, expected) =>
      val bytes = encode(img, writer)
      val (fmt, w, h, d) = parse(bytes)
      assert(fmt == expected, s"$writer sniffed as $fmt")
      assert(w.contains(37L) && h.contains(21L),
        s"$writer dims: $w x $h")
      assert(d.nonEmpty)
    }
  }

  test("parser agrees with the JDK's OWN decoder (ImageIoDecoder) on " +
      "real bytes for all four formats") {
    val dec = new Multimodal.ImageIoDecoder()
    val img = new BufferedImage(640, 480, BufferedImage.TYPE_INT_RGB)
    Seq("png", "jpg", "gif", "bmp").foreach { writer =>
      val bytes = encode(img, writer)
      val jdk = dec.decode(0L, bytes)
      val (_, w, h, _) = parse(bytes)
      assert(w.contains(jdk.width) && h.contains(jdk.height),
        s"$writer: parser ${w.orNull}x${h.orNull} vs JDK " +
          s"${jdk.width}x${jdk.height}")
    }
  }

  test("real 16-bit PNG (TYPE_USHORT_GRAY) reports bit depth 16; " +
      "8-bit RGB reports 8") {
    val gray16 = encode(
      new BufferedImage(9, 4, BufferedImage.TYPE_USHORT_GRAY), "png")
    assert(parse(gray16) == (("png", Some(9L), Some(4L), Some(16L))))
    val rgb8 = encode(
      new BufferedImage(9, 4, BufferedImage.TYPE_INT_RGB), "png")
    val (_, _, _, d) = parse(rgb8)
    assert(d.contains(8L))
  }

  test("real JPEG: precision is 8 and the SOF sits behind JFIF APP0 " +
      "(walk is exercised on real segment layout)") {
    val bytes = encode(
      new BufferedImage(33, 17, BufferedImage.TYPE_INT_RGB), "jpg")
    // the JDK writes a JFIF APP0 first — SOI + APP0 means the SOF is
    // NOT at a fixed offset; reaching it proves the segment hops
    assert((bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xD8)
    assert((bytes(3) & 0xff) == 0xE0) // APP0 before any SOF
    assert(parse(bytes) == (("jpeg", Some(33L), Some(17L), Some(8L))))
  }

  test("named refusal: truncated — known magic, cut header") {
    val png = encode(
      new BufferedImage(50, 50, BufferedImage.TYPE_INT_RGB), "png")
    assert(parse(png.take(20))._1 == "truncated")
    assert(parse(png.take(12))._1 == "truncated")
    val jpg = encode(
      new BufferedImage(50, 50, BufferedImage.TYPE_INT_RGB), "jpg")
    // cut inside the first segment, before any SOF
    assert(parse(jpg.take(6))._1 == "truncated")
    // EOI immediately after SOI: structurally valid JPEG, no frame
    assert(parse(Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte))._1 ==
      "truncated")
    // PNG magic but first chunk is not IHDR (spec violation)
    val notIhdr = png.clone(); notIhdr(12) = 'X'.toByte
    assert(parse(notIhdr)._1 == "truncated")
  }

  test("named refusal: unknown — no known magic") {
    assert(parse("hello world".getBytes("UTF-8"))._1 == "unknown")
    assert(parse(Array.empty[Byte])._1 == "unknown")
    assert(parse(Array[Byte](0x00))._1 == "unknown")
    // refusals carry NULL dimensions
    val (_, w, h, d) = parse("plain text".getBytes("UTF-8"))
    assert(w.isEmpty && h.isEmpty && d.isEmpty)
  }

  test("hand corners: progressive SOF2, restart markers skipped, " +
      "top-down BMP height sign") {
    // minimal SOI + RST0 (standalone) + SOF2 for 258x515, precision 12
    val sof2 = Array[Int](0xFF, 0xD8, 0xFF, 0xD0,
      0xFF, 0xC2, 0x00, 0x0B, 0x0C, 0x02, 0x03, 0x01, 0x02, 0x01,
      0x11, 0x00).map(_.toByte)
    assert(parse(sof2) == (("jpeg", Some(0x0102L), Some(0x0203L),
      Some(12L))))
    // BMP with NEGATIVE height (top-down rows): parser reports |h|
    val bmp = encode(
      new BufferedImage(10, 7, BufferedImage.TYPE_INT_RGB), "bmp")
    val neg = bmp.clone()
    // height LE32 at byte 22 := -7
    val hv = -7
    neg(22) = (hv & 0xff).toByte; neg(23) = ((hv >> 8) & 0xff).toByte
    neg(24) = ((hv >> 16) & 0xff).toByte; neg(25) = ((hv >> 24) & 0xff).toByte
    assert(parse(neg) == (("bmp", Some(10L), Some(7L), Some(24L))))
  }

  // ------------------------------------------------ EXIF orientation

  /** Minimal EXIF JPEG: SOI + APP1('Exif\0\0' + TIFF IFD0). The
    * orientation entry sits SECOND so the IFD scan is load-bearing;
    * a junk COM segment precedes APP1 in the `shifted` variant so the
    * segment walk is too.
    */
  private def exifJpeg(little: Boolean, orient: Int,
                       comBefore: Int = 0): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit =
      if (little) { u8(v); u8(v >> 8) } else { u8(v >> 8); u8(v) }
    def u32(v: Int): Unit =
      if (little) { u8(v); u8(v >> 8); u8(v >> 16); u8(v >> 24) }
      else { u8(v >> 24); u8(v >> 16); u8(v >> 8); u8(v) }
    u8(0xFF); u8(0xD8)
    if (comBefore > 0) {
      u8(0xFF); u8(0xFE); u8(0); u8(comBefore + 2)
      (0 until comBefore).foreach(_ => u8(0x41))
    }
    // APP1: 2 len + 6 exif + 8 tiff hdr + 2 count + 2*12 entries + 4 next
    val len = 2 + 6 + 8 + 2 + 24 + 4
    u8(0xFF); u8(0xE1); u8(len >> 8); u8(len & 0xff)
    bos.write("Exif".getBytes); u8(0); u8(0)
    if (little) { u8('I'); u8('I') } else { u8('M'); u8('M') }
    u16(42); u32(8)  // IFD0 right after the 8-byte TIFF header
    u16(2)           // two entries; orientation is the SECOND
    u16(0x011A); u16(5); u32(1); u32(0)       // XResolution (RATIONAL)
    u16(0x0112); u16(3); u32(1)               // Orientation (SHORT, 1)
    u16(orient); u16(0)                       // value in first 2 bytes
    u32(0)           // next-IFD pointer
    bos.toByteArray
  }

  private def exif(b: Array[Byte]): Option[Long] = {
    val e = graft.functions.ImageHeader.exifOrientation(b)
    Option(e).map(_.asInstanceOf[java.lang.Long].longValue())
  }

  test("EXIF orientation: both TIFF byte orders, IFD entry scan, the " +
      "segment walk past junk segments") {
    assert(exif(exifJpeg(little = true, orient = 6)).contains(6L))
    assert(exif(exifJpeg(little = false, orient = 8)).contains(8L))
    assert(exif(exifJpeg(little = true, orient = 3, comBefore = 11))
      .contains(3L))
  }

  test("EXIF orientation misses are NULL, never errors: no APP1 " +
      "(encoder JPEGs are JFIF-only), out-of-range value, bad TIFF " +
      "magic, not a JPEG") {
    val plain = encode(
      new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB), "jpg")
    assert(exif(plain).isEmpty) // JDK writes JFIF APP0, no EXIF
    assert(exif(exifJpeg(little = true, orient = 9)).isEmpty)
    val badMagic = exifJpeg(little = true, orient = 1)
    badMagic(14) = 0x2B // TIFF magic 42 -> 43
    assert(exif(badMagic).isEmpty)
    assert(exif("not an image".getBytes("UTF-8")).isEmpty)
    assert(exif(encode(
      new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB), "png")).isEmpty)
  }

  test("EXIF orientation through the Column API (codegen path)") {
    import spark.implicits._
    val df = Seq(
      (1L, exifJpeg(little = true, orient = 6)),
      (2L, encode(new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB), "jpg")),
      (3L, "text".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .select(col("doc_id"),
        graft.functions.ImageHeader.exifOrientation(col("payload"))
          .as("orient"))
      .orderBy("doc_id").collect()
    assert(df(0).getLong(1) == 6L && df(1).isNullAt(1) && df(2).isNullAt(1))
  }

  test("the Column API parses inside a DataFrame (codegen path) and " +
      "extractImageMeta carries size+sha alongside") {
    import spark.implicits._
    val png = encode(
      new BufferedImage(37, 21, BufferedImage.TYPE_INT_RGB), "png")
    val txt = "not an image".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, txt)).toDF("doc_id", "payload")
    val out = Multimodal.extractImageMeta(df).orderBy("doc_id").collect()
    assert(out(0).getString(3) == "png" && out(0).getLong(4) == 37L &&
      out(0).getLong(5) == 21L && out(0).getLong(6) == 8L)
    assert(out(0).getLong(1) == png.length.toLong)
    // sha matches a reference digest of the same bytes
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val ref = md.digest(png).map("%02x".format(_)).mkString
    assert(out(0).getString(2) == ref)
    assert(out(1).getString(3) == "unknown" && out(1).isNullAt(4))
  }
}
