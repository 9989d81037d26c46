package graft

import java.io.ByteArrayOutputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.functions.MediaHeader
import graft.operators.Multimodal

/** Round-14 audio/video container decode (C12 extension): MediaHeader
  * parses REAL WAV bytes — written by the JDK's own `javax.sound`
  * encoder, not synthetic fixtures — and must agree with the JDK's
  * independent parser on every one. FLAC and ISO-BMFF have no JDK
  * codec, so those fixtures are hand-built byte-for-byte from the
  * public specs (xiph.org FLAC format; ISO/IEC 14496-12), the same
  * discipline as the SqliteFile header fixtures. Plus the named
  * in-band refusals and the walk corners the gate's planted corpus
  * exercises (junk chunks before 'fmt ', odd-size pad bytes, largesize
  * boxes, header-prefix sampling).
  */
class MediaHeaderSpec extends SparkFunSuite {

  // ------------------------------------------------- byte-builder DSL

  private class B {
    private val bos = new ByteArrayOutputStream()
    def ascii(s: String): B = { bos.write(s.getBytes("US-ASCII")); this }
    def u8(v: Int): B = { bos.write(v & 0xff); this }
    def le16(v: Int): B = { u8(v); u8(v >> 8) }
    def le32(v: Long): B = { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
    def be16(v: Int): B = { u8(v >> 8); u8(v) }
    def be24(v: Int): B = { u8(v >> 16); u8(v >> 8); u8(v) }
    def be32(v: Long): B = { u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt); u8(v.toInt) }
    def be64(v: Long): B = { be32(v >>> 32); be32(v & 0xffffffffL) }
    def fill(n: Int, v: Int = 0): B = { (0 until n).foreach(_ => u8(v)); this }
    def bytes: Array[Byte] = bos.toByteArray
  }

  private def parse(b: Array[Byte]): (String, Option[Long], Option[Long], Option[Long], Option[Long], Option[Long]) = {
    val r = MediaHeader.parseRow(b)
    def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
    (r.getUTF8String(0).toString, opt(1), opt(2), opt(3), opt(4), opt(5))
  }

  // ------------------------------------------------------------- WAV

  private def jdkWav(rate: Float, bits: Int, channels: Int, frames: Int): Array[Byte] = {
    val fmt = new AudioFormat(rate, bits, channels, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real JDK-encoded WAV: stream parameters + duration agree with " +
      "the JDK's OWN parser") {
    val cases = Seq((44100f, 16, 2, 44100), (8000f, 8, 1, 12345),
      (48000f, 24, 6, 480))
    cases.foreach { case (rate, bits, ch, frames) =>
      val bytes = jdkWav(rate, bits, ch, frames)
      val (fmt, dur, sr, chans, bps, st) = parse(bytes)
      assert(fmt == "wav" && sr.contains(rate.toLong) &&
        chans.contains(ch.toLong) && bps.contains(bits.toLong) &&
        st.contains(1L), s"($rate,$bits,$ch): $fmt $sr $chans $bps")
      // duration floor(dataBytes*1000/byteRate) vs the JDK's frame count
      val jdk = AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val expect = frames.toLong * 1000L / rate.toLong
      assert(dur.contains(expect),
        s"dur $dur vs $expect (jdk frames ${jdk.getFrameLength})")
      assert(jdk.getFrameLength.toLong == frames.toLong)
    }
  }

  test("WAV chunk walk is load-bearing: junk LIST chunk (odd size, pad " +
      "byte) before 'fmt ', and chunk order data-after-junk") {
    val b = new B().ascii("RIFF").le32(1000).ascii("WAVE")
      .ascii("LIST").le32(7).ascii("junkbyt") // odd → 1 pad byte
      .u8(0)
      .ascii("fmt ").le32(16).le16(1).le16(3).le32(22050)
      .le32(22050 * 3 * 2).le16(6).le16(16)
      .ascii("data").le32(22050 * 3 * 2 * 2) // 2 seconds
      .fill(8).bytes
    assert(parse(b) == (("wav", Some(2000L), Some(22050L), Some(3L),
      Some(16L), Some(1L))))
  }

  test("WAV header-prefix sampling: 'data' header in-buffer but payload " +
      "cut → duration from the declared size; cut before 'data' → NULL " +
      "duration, parameters still real") {
    val full = jdkWav(16000f, 16, 1, 16000) // 1 s, 32000 data bytes
    val cutPayload = full.take(60) // 44-byte canonical header + 16 bytes
    val (f1, d1, s1, _, _, _) = parse(cutPayload)
    assert(f1 == "wav" && d1.contains(1000L) && s1.contains(16000L))
    val cutBeforeData = full.take(36) // RIFF+WAVE+fmt only
    val (f2, d2, s2, _, _, _) = parse(cutBeforeData)
    assert(f2 == "wav" && d2.isEmpty && s2.contains(16000L))
  }

  test("named refusals + RIFF form types: WAVE with no fmt → truncated; " +
      "RIFF/AVI → unknown (magic alone is not a format we speak)") {
    val noFmt = new B().ascii("RIFF").le32(4).ascii("WAVE").bytes
    assert(parse(noFmt)._1 == "truncated")
    assert(parse(new B().ascii("RIFF").bytes)._1 == "truncated")
    val avi = new B().ascii("RIFF").le32(100).ascii("AVI ")
      .ascii("LIST").le32(4).ascii("hdrl").bytes
    assert(parse(avi)._1 == "unknown")
  }

  // ------------------------------------------------------------ FLAC

  private def flac(sr: Long, ch: Int, bps: Int, total: Long,
                   lastFlag: Boolean = true): Array[Byte] = {
    val packed = (sr << 44) | ((ch - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | total
    new B().ascii("fLaC")
      .u8(if (lastFlag) 0x80 else 0x00).be24(34) // STREAMINFO header
      .be16(4096).be16(4096).be24(0).be24(0)     // block/frame sizes
      .be64(packed)
      .fill(16)                                   // md5
      .bytes
  }

  test("FLAC STREAMINFO bit-unpack: 20-bit rate / 3-bit channels / " +
      "5-bit depth / 36-bit total samples, both last-flag values") {
    assert(parse(flac(44100L, 2, 16, 441000L)) ==
      (("flac", Some(10000L), Some(44100L), Some(2L), Some(16L), Some(1L))))
    assert(parse(flac(192000L, 8, 24, 1L << 35, lastFlag = false)) ==
      (("flac", Some((1L << 35) * 1000L / 192000L), Some(192000L),
        Some(8L), Some(24L), Some(1L))))
    // total-samples 0 = "unknown" per spec → NULL duration, real params
    val (f, d, s, c, _, _) = parse(flac(8000L, 1, 8, 0L))
    assert(f == "flac" && d.isEmpty && s.contains(8000L) && c.contains(1L))
  }

  test("FLAC refusals: first block not STREAMINFO; cut mid-STREAMINFO; " +
      "sample-rate 0 (spec-invalid)") {
    val wrongFirst = flac(44100L, 2, 16, 1L)
    wrongFirst(4) = 0x84.toByte // type 4 = VORBIS_COMMENT first
    assert(parse(wrongFirst)._1 == "truncated")
    assert(parse(flac(44100L, 2, 16, 1L).take(20))._1 == "truncated")
    assert(parse(flac(0L, 2, 16, 1L))._1 == "truncated")
  }

  // ------------------------------------------------------- MP4/BMFF

  private def ftyp: B = new B().be32(16).ascii("ftyp")
    .ascii("isom").be32(0x200)

  private def mvhdV0(ts: Long, dur: Long): Array[Byte] =
    new B().be32(108).ascii("mvhd").be32(0) // version 0 + flags
      .be32(0).be32(0).be32(ts).be32(dur)
      .be32(0x10000).be16(0x100).be16(0).be32(0).be32(0) // rate/vol/rsvd
      .be32(0x10000).be32(0).be32(0).be32(0).be32(0x10000).be32(0)
      .be32(0).be32(0).be32(0x40000000)                  // unity matrix
      .fill(24).be32(2).bytes                            // predef + next id

  private def mvhdV1(ts: Long, dur: Long): Array[Byte] =
    new B().be32(120).ascii("mvhd").u8(1).be24(0) // version 1 + flags
      .be64(0).be64(0).be32(ts).be64(dur)
      .be32(0x10000).be16(0x100).be16(0).be32(0).be32(0)
      .be32(0x10000).be32(0).be32(0).be32(0).be32(0x10000).be32(0)
      .be32(0).be32(0).be32(0x40000000)
      .fill(24).be32(2).bytes

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    { val b = new B().be32(8 + payload.length).ascii(typ)
      payload.foreach(x => b.u8(x.toInt)); b.bytes }

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val bos = new ByteArrayOutputStream(); parts.foreach(bos.write); bos.toByteArray
  }

  test("MP4 v0 mvhd behind a variable-size 'free' box, trak count, " +
      "duration floor(dur*1000/timescale)") {
    val trak = new B().be32(8).ascii("trak").bytes
    val moov = box("moov", cat(mvhdV0(600, 1801), trak, trak))
    val b = cat(ftyp.bytes, box("free", Array.fill[Byte](13)(0x4b)),
      moov, box("mdat", "payload-bytes".getBytes))
    assert(parse(b) == (("mp4", Some(3001L), None, None, None, Some(2L))))
  }

  test("MP4 v1 mvhd: 64-bit duration, timescale at the v1 offsets") {
    val trak = new B().be32(8).ascii("trak").bytes
    val moov = box("moov", cat(mvhdV1(1000, 0x100000001L), trak))
    val b = cat(ftyp.bytes, moov)
    assert(parse(b) ==
      (("mp4", Some(0x100000001L * 1000L / 1000L), None, None, None,
        Some(1L))))
  }

  test("MP4 largesize (size=1 → BE64) and size=0 (to-EOF) boxes walk " +
      "correctly") {
    // a skip box declared via largesize, then moov with size 0 (to EOF)
    val skipPayload = Array.fill[Byte](5)(0x00)
    val large = { val b = new B().be32(1).ascii("skip")
      .be64(16L + skipPayload.length)
      skipPayload.foreach(x => b.u8(x.toInt)); b.bytes }
    val moovInner = mvhdV0(600, 600)
    val moovEof = { val b = new B().be32(0).ascii("moov")
      moovInner.foreach(x => b.u8(x.toInt)); b.bytes }
    assert(parse(cat(ftyp.bytes, large, moovEof)) ==
      (("mp4", Some(1000L), None, None, None, Some(0L))))
  }

  test("MP4 refusals: no moov in-buffer; mvhd cut mid-field; box that " +
      "walks backwards") {
    assert(parse(cat(ftyp.bytes, box("mdat", Array.fill[Byte](4)(0))))._1
      == "truncated")
    val cutMvhd = box("moov", mvhdV0(600, 600).take(14))
    assert(parse(cat(ftyp.bytes, cutMvhd))._1 == "truncated")
    val bad = new B().be32(3).ascii("moov").bytes // size < header
    assert(parse(cat(ftyp.bytes, bad))._1 == "truncated")
  }

  // ----------------------------------------------------------- MP3

  private def mp3(id3Size: Int, b1: Int, b2: Int, b3: Int): Array[Byte] = {
    val b = new B()
    if (id3Size >= 0) b.ascii("ID3").u8(4).u8(0).u8(0)
      .u8((id3Size >> 21) & 0x7f).u8((id3Size >> 14) & 0x7f)
      .u8((id3Size >> 7) & 0x7f).u8(id3Size & 0x7f)
      .fill(id3Size, 0x4d)
    b.u8(0xFF).u8(b1).u8(b2).u8(b3).fill(8).bytes
  }

  test("MP3: syncsafe ID3v2 skip (7-bit boundary crossing), version " +
      "bit sample-rate halving, channel modes") {
    // ID3 size 200 = syncsafe 00 00 01 48; MPEG1 Layer III, 44100,
    // joint stereo (mode 1)
    assert(parse(mp3(200, 0xFB, 0x90, 0x40)) ==
      (("mp3", None, Some(44100L), Some(2L), None, Some(1L))))
    // MPEG2 (ver bits 10) halves the base; mono (mode 3) → 1 channel
    assert(parse(mp3(0, 0xF3, 0x94, 0xC0)) ==
      (("mp3", None, Some(24000L), Some(1L), None, Some(1L))))
    // MPEG2.5 (ver bits 00) quarters; sample-rate idx 2 → 32000/4
    assert(parse(mp3(5, 0xE3, 0x98, 0x00)) ==
      (("mp3", None, Some(8000L), Some(2L), None, Some(1L))))
    // bare frame sync, no ID3 tag at all
    assert(parse(new B().u8(0xFF).u8(0xFB).u8(0x90).u8(0x00).fill(4).bytes)
      ._1 == "mp3")
  }

  test("MP3 refusals: ID3-claimed but structure broken → truncated; " +
      "reserved version/layer/bitrate/rate indices; bare 0xFF that is " +
      "not a frame sync → unknown") {
    val cut = mp3(200, 0xFB, 0x90, 0x40).take(30) // cut inside the tag
    assert(parse(cut)._1 == "truncated")
    assert(parse(mp3(0, 0xEB, 0x90, 0x00))._1 == "truncated") // ver reserved
    assert(parse(mp3(0, 0xF9, 0x90, 0x00))._1 == "truncated") // layer reserved
    assert(parse(mp3(0, 0xFB, 0xF0, 0x00))._1 == "truncated") // bitrate 15
    assert(parse(mp3(0, 0xFB, 0x9C, 0x00))._1 == "truncated") // rate idx 3
    assert(parse(Array(0xFF, 0x00, 0x90, 0x00).map(_.toByte))._1 ==
      "unknown") // 0xFF but no sync bits: never claimed mp3
  }

  // ----------------------------------------------------------- OGG

  private def oggPage(packet: Array[Byte]): Array[Byte] = {
    val b = new B().ascii("OggS").u8(0).u8(2).fill(8) // BOS, granule 0
      .le32(1).le32(0).le32(0)                        // serial/seq/crc
      .u8(1).u8(packet.length)                        // one segment
    packet.foreach(x => b.u8(x.toInt)); b.bytes
  }

  test("OGG: Vorbis and Opus identification packets; unknown codec " +
      "reports the container only; refusals") {
    val vorbis = new B().u8(1).ascii("vorbis").be32(0)
      .u8(2).le32(44100).fill(5).bytes
    assert(parse(oggPage(vorbis)) ==
      (("vorbis", None, Some(44100L), Some(2L), None, Some(1L))))
    val opus = new B().ascii("OpusHead").u8(1).u8(6).le16(312)
      .le32(48000).fill(3).bytes
    assert(parse(oggPage(opus)) ==
      (("opus", None, Some(48000L), Some(6L), None, Some(1L))))
    val theora = new B().u8(0x80).ascii("theora").fill(10).bytes
    val (f, d, s, c, _, st) = parse(oggPage(theora))
    assert(f == "ogg" && d.isEmpty && s.isEmpty && c.isEmpty && st.isEmpty)
    assert(parse(oggPage(vorbis).take(20))._1 == "truncated")
    val rate0 = new B().u8(1).ascii("vorbis").be32(0)
      .u8(2).le32(0).fill(5).bytes
    assert(parse(oggPage(rate0))._1 == "truncated")
  }

  test("unknown: no known magic, NULL fields") {
    val (f, d, s, c, bd, st) = parse("plain text".getBytes("UTF-8"))
    assert(f == "unknown" && d.isEmpty && s.isEmpty && c.isEmpty &&
      bd.isEmpty && st.isEmpty)
    assert(parse(Array.empty[Byte])._1 == "unknown")
  }

  test("the Column API parses inside a DataFrame (codegen path) and " +
      "extractAvMeta carries size+sha alongside") {
    import spark.implicits._
    val wav = jdkWav(44100f, 16, 2, 4410)
    val fl = flac(48000L, 2, 24, 48000L)
    val txt = "not media".getBytes("UTF-8")
    val df = Seq((1L, wav), (2L, fl), (3L, txt)).toDF("doc_id", "payload")
    val out = Multimodal.extractAvMeta(df).orderBy("doc_id").collect()
    assert(out(0).getString(3) == "wav" && out(0).getLong(4) == 100L &&
      out(0).getLong(5) == 44100L && out(0).getLong(6) == 2L &&
      out(0).getLong(7) == 16L)
    assert(out(0).getLong(1) == wav.length.toLong)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    assert(out(0).getString(2) ==
      md.digest(wav).map("%02x".format(_)).mkString)
    assert(out(1).getString(3) == "flac" && out(1).getLong(4) == 1000L)
    assert(out(2).getString(3) == "unknown" && out(2).isNullAt(4))
  }
}
