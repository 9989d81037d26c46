package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.sources.{SqliteFile, SqliteWal}

/** The WAL-mode read path (round 13): fixture_wal.db{,-wal} was written
  * by CPython's sqlite3 in journal_mode=WAL with wal_autocheckpoint=0
  * and copied WHILE THE CONNECTION WAS OPEN (tools/make_wal_fixture.py)
  * — the exact on-disk state a live application leaves, which rounds
  * 1-12 refused. The main file alone is STALE by construction (its
  * sqlite_master predates table `walnew`; its rows predate the UPDATE)
  * so every passing assertion here proves the wal replay, not the main
  * file. Expected numbers are the fixture generator's own sqlite
  * aggregates, executed through the live wal before the copy.
  *
  * The committed wal also carries two SYNTHETIC tail frames: one
  * checksum-valid NON-commit frame (an in-flight transaction's spill —
  * content is garbage, must not be applied) and one salt-mismatched
  * frame (stale tail — must cut validation). The content assertions
  * below fail if either leaks through.
  */
class SqliteWalSpec extends SparkFunSuite {

  private val db = "src/test/resources/sqlite/fixture_wal.db"

  test("wal parse: committed prefix cut — 52 applied of 54 frames") {
    val w = SqliteWal.parse(db + "-wal")
    assert(w.frames == 54 && w.committed == 52)
    assert(w.pageSize == 4096)
    assert(w.overrides.nonEmpty && w.overrides.contains(1)) // page-1 override
    // db grew past the main file: appended pages live only in the log
    val mainPages = (new java.io.File(db).length() / 4096).toInt
    assert(w.dbPages > mainPages)
    // every override offset points inside the wal, at a frame content
    val walLen = new java.io.File(db + "-wal").length()
    w.overrides.values.foreach { off =>
      assert(off >= 32 + 24 && off + 4096 <= walLen)
      assert((off - 32 - 24) % (24 + 4096) == 0)
    }
  }

  test("schema through the wal: the table CREATEd in wal mode is visible") {
    val names = SqliteFile.listTables(db).map(_.name).toSet
    assert(names == Set("kv", "walnew")) // walnew exists ONLY in the wal
  }

  test("kv decodes the committed wal state bit-exactly (update+insert+delete)") {
    import org.apache.spark.sql.functions._
    val kv = SqliteFile.read(spark, db, "kv")
    val r = kv.agg(count(lit(1)), sum(col("grp")), sum(length(col("v"))),
      sum(col("amount")), min(col("id")), max(col("id"))).collect()(0)
    // the generator's sqlite aggregates through the live wal
    assert(r.getLong(0) == 3464L)
    assert(r.getLong(1) == 20762L)
    assert(r.getLong(2) == 30278L)
    assert(r.getDouble(3) == 43105.5) // exact: quarters + halves
    assert(r.getLong(4) == 1L && r.getLong(5) == 3500L)
    assert(kv.where(col("v").startsWith("upd-")).count() == 297L)
    // deleted rows are really gone (id % 97 = 0 up to 3500)
    assert(kv.where(col("id") % 97 === 0).count() == 0L)
  }

  test("walnew (rows exist only in the wal) decodes completely") {
    import org.apache.spark.sql.functions._
    val wn = SqliteFile.read(spark, db, "walnew")
    val r = wn.agg(count(lit(1)), sum(col("k")),
      sum(length(col("label")))).collect()(0)
    assert(r.getLong(0) == 200L && r.getLong(1) == 20100L &&
      r.getLong(2) == 1058L)
  }

  test("created-in-WAL database: main file is one stale page, schema " +
      "and data live ONLY in the log (page-1 override is load-bearing)") {
    val wo = "src/test/resources/sqlite/fixture_walonly.db"
    assert(new java.io.File(wo).length() == 4096) // a single page
    val names = SqliteFile.listTables(wo).map(_.name)
    assert(names == Seq("t"))
    import org.apache.spark.sql.functions._
    val t = SqliteFile.read(spark, wo, "t")
    val r = t.agg(count(lit(1)), sum(col("id")), sum(length(col("v"))),
      sum(col("x"))).collect()(0)
    // the generator's own sqlite aggregates (quarters -> exact double)
    assert(r.getLong(0) == 500L && r.getLong(1) == 125250L &&
      r.getLong(2) == 2500L && r.getDouble(3) == 31312.5)
  }

  test("empty -wal sibling: main file reads normally (post-checkpoint state)") {
    val dir = Files.createTempDirectory("graft_wal_empty")
    val cp = dir.resolve("f.db")
    Files.copy(Paths.get("src/test/resources/sqlite/fixture.db"), cp)
    Files.write(dir.resolve("f.db-wal"), Array.empty[Byte])
    assert(SqliteFile.listTables(cp.toString).nonEmpty)
  }

  test("unreadable wal states refuse with named errors") {
    val dir = Files.createTempDirectory("graft_wal_bad")
    val cp = dir.resolve("f.db")
    Files.copy(Paths.get(db), cp)
    val walBytes = Files.readAllBytes(Paths.get(db + "-wal"))

    // truncated header
    Files.write(dir.resolve("f.db-wal"), walBytes.take(16))
    val e1 = intercept[IllegalArgumentException] {
      SqliteFile.listTables(cp.toString)
    }
    assert(e1.getMessage.contains("truncated wal header"))

    // bad magic
    val badMagic = walBytes.clone(); badMagic(0) = 0x13
    Files.write(dir.resolve("f.db-wal"), badMagic)
    val e2 = intercept[IllegalArgumentException] {
      SqliteFile.listTables(cp.toString)
    }
    assert(e2.getMessage.contains("bad wal magic"))

    // corrupted header checksum (flip a salt byte: header cksum breaks)
    val badCk = walBytes.clone(); badCk(17) = (badCk(17) ^ 0x55).toByte
    Files.write(dir.resolve("f.db-wal"), badCk)
    val e3 = intercept[IllegalArgumentException] {
      SqliteFile.listTables(cp.toString)
    }
    assert(e3.getMessage.contains("header checksum mismatch"))
  }

  test("wal/db page-size mismatch refuses loudly (named)") {
    // synthesize a VALID empty wal header declaring 8192-byte pages
    // next to the 4096-page fixture: the checksum must be correct (a
    // bad checksum would trip the header-checksum refusal first, not
    // the size check) — so replay the wal checksum here
    val dir = Files.createTempDirectory("graft_wal_ps")
    val cp = dir.resolve("f.db")
    Files.copy(Paths.get("src/test/resources/sqlite/fixture.db"), cp)
    val hdr = java.nio.ByteBuffer.allocate(32)
    hdr.putInt(0x377f0683) // big-endian-checksum magic
    hdr.putInt(3007000)
    hdr.putInt(8192) // page size that cannot match the 4096 db
    hdr.putInt(1) // checkpoint seq
    hdr.putInt(0x1234) // salt1
    hdr.putInt(0x5678) // salt2
    val b = hdr.array()
    var s0 = 0L; var s1 = 0L
    var i = 0
    while (i < 24) {
      def w(o: Int) = ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
      s0 = (s0 + w(i) + s1) & 0xffffffffL
      s1 = (s1 + w(i + 4) + s0) & 0xffffffffL
      i += 8
    }
    hdr.putInt(24, s0.toInt); hdr.putInt(28, s1.toInt)
    Files.write(dir.resolve("f.db-wal"), hdr.array())
    val e = intercept[IllegalArgumentException] {
      SqliteFile.listTables(cp.toString)
    }
    assert(e.getMessage.contains("wal page size"), e.getMessage)
  }

  test("foreign wal with a committed page-1 frame cannot self-validate " +
      "its page size (main-file bytes 16-17 are checked independently)") {
    // r13 advice: the old check compared the wal header's page size
    // against the EFFECTIVE page 1 — which, when the wal carries a
    // committed page-1 frame, is read from the wal itself. A foreign
    // 8192-page wal next to a 4096-page main file then self-validated,
    // and every non-overridden page would be sliced from the main file
    // at the wrong stride. Build exactly that wal: checksum-valid,
    // one COMMIT frame for page 1 whose content declares 8192.
    val dir = Files.createTempDirectory("graft_wal_foreign")
    val cp = dir.resolve("f.db")
    Files.copy(Paths.get("src/test/resources/sqlite/fixture.db"), cp)
    val ps = 8192
    val wal = java.nio.ByteBuffer.allocate(32 + 24 + ps)
    wal.putInt(0x377f0683) // big-endian checksums
    wal.putInt(3007000)
    wal.putInt(ps)
    wal.putInt(1) // checkpoint seq
    wal.putInt(0xCAFE) // salt1
    wal.putInt(0xBEEF) // salt2
    val b = wal.array()
    def w32(o: Int): Long = ((b(o) & 0xffL) << 24) |
      ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) |
      (b(o + 3) & 0xffL)
    def ck(s: (Long, Long), off: Int, n: Int): (Long, Long) = {
      var (s0, s1) = s; var i = off
      while (i < off + n) {
        s0 = (s0 + w32(i) + s1) & 0xffffffffL
        s1 = (s1 + w32(i + 4) + s0) & 0xffffffffL
        i += 8
      }
      (s0, s1)
    }
    val hck = ck((0L, 0L), 0, 24)
    wal.putInt(24, hck._1.toInt); wal.putInt(28, hck._2.toInt)
    // frame content at offset 32+24: a fake page 1 declaring 8192 + enc 1
    val c = 32 + 24
    val magic = "SQLite format 3\u0000".getBytes("ISO-8859-1")
    System.arraycopy(magic, 0, b, c, 16)
    b(c + 16) = ((ps >> 8) & 0xff).toByte; b(c + 17) = (ps & 0xff).toByte
    wal.putInt(c + 56, 1) // text encoding UTF-8
    // frame header: page 1, commit size 1, salts, cumulative checksum
    wal.putInt(32, 1); wal.putInt(36, 1)
    wal.putInt(40, 0xCAFE); wal.putInt(44, 0xBEEF)
    val f1 = ck(hck, 32, 8)
    val f2 = ck(f1, c, ps)
    wal.putInt(48, f2._1.toInt); wal.putInt(52, f2._2.toInt)
    Files.write(dir.resolve("f.db-wal"), b)
    // sanity: the wal itself parses as one committed page-1 frame —
    // proving the refusal below comes from the MAIN-FILE cross-check,
    // not from a checksum/salt reject
    val wi = SqliteWal.parse(dir.resolve("f.db-wal").toString)
    assert(wi.committed == 1 && wi.overrides.contains(1))
    val e = intercept[IllegalArgumentException] {
      SqliteFile.listTables(cp.toString)
    }
    assert(e.getMessage.contains("main-file page size"), e.getMessage)
  }

  test("a corrupted MID-LOG frame cuts the committed prefix there (sqlite's rule)") {
    val dir = Files.createTempDirectory("graft_wal_cut")
    val cp = dir.resolve("f.db")
    Files.copy(Paths.get(db), cp)
    val walBytes = Files.readAllBytes(Paths.get(db + "-wal"))
    // flip one content byte inside frame 40 (0-based 39): frames 1..39
    // keep validating, everything from 40 on is dropped
    val frameSize = 24 + 4096
    val off = 32 + 39 * frameSize + 24 + 100
    val cut = walBytes.clone(); cut(off) = (cut(off) ^ 0x1).toByte
    Files.write(dir.resolve("f.db-wal"), cut)
    val w = SqliteWal.parse(dir.resolve("f.db-wal").toString)
    assert(w.frames == 54 && w.committed <= 39 && w.committed > 0)
    // the reader still reads — an EARLIER committed snapshot
    val kv = SqliteFile.read(spark, cp.toString, "kv")
    assert(kv.count() > 0)
  }
}
