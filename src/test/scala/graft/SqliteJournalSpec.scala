package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.{SqliteFile, SqliteJournal}

/** The hot-rollback-journal read path (round 14 — the symmetric twin
  * of SqliteWalSpec): fixture_journal.db{,-journal} was written by
  * CPython's sqlite3 with cache_size=2 and copied WHILE a big
  * transaction was open (tools/make_journal_fixture.py) — the main
  * file in the copy contains uncommitted SPILLED pages (a raw read
  * ignoring the journal sees 3658 acct rows, a torn mix) and has
  * GROWN past the baseline (appended pages). Every passing assertion
  * below proves the pre-image replay: the expected numbers are
  * sqlite's own post-rollback aggregates, asserted equal to the
  * baseline by the generator itself.
  */
class SqliteJournalSpec extends SparkFunSuite {

  private val db = "src/test/resources/sqlite/fixture_journal.db"

  test("journal parse: hot, pre-image records, truncation authority") {
    val j = SqliteJournal.parse(db + "-journal")
    assert(j.hot && j.records > 0 && j.overrides.nonEmpty)
    assert(j.pageSize == 4096)
    // initial page count = the baseline main file (118784 bytes)
    assert(j.dbPages == 29)
    // every override points inside the journal, past the first sector
    val len = new java.io.File(db + "-journal").length()
    j.overrides.values.foreach { off =>
      assert(off >= 512 + 4 && off + 4096 <= len)
    }
    // no override beyond the pre-transaction page count survives
    assert(j.overrides.keys.forall(_ <= j.dbPages))
  }

  test("header: hot journal's initial page count truncates the grown " +
      "main file") {
    val h = SqliteFile.header(db)
    assert(h.pageCount == 29) // main copy is 46 pages (188416 bytes)
    assert(h.walPath == db + "-journal" && h.walOverrides.nonEmpty)
    assert(new java.io.File(db).length() / 4096 == 46)
  }

  test("acct reads the PRE-TRANSACTION snapshot bit-exactly from the " +
      "torn copy (sqlite's own rollback answer)") {
    val acct = SqliteFile.read(spark, db, "acct")
    val r = acct.agg(count(lit(1)), sum(col("grp")),
      sum(length(col("label"))), sum(col("bal")),
      min(col("id")), max(col("id"))).collect()(0)
    assert(r.getLong(0) == 4000L)
    assert(r.getLong(1) == 19993L)
    assert(r.getLong(2) == 40000L)
    assert(r.getDouble(3) == 199609.0) // exact: quarters
    assert(r.getLong(4) == 1L && r.getLong(5) == 4000L)
    // nothing from the in-flight transaction leaks through
    assert(acct.where(col("label").startsWith("dirty-")).count() == 0L)
    assert(acct.where(col("label").startsWith("uncommitted-")).count() == 0L)
  }

  test("the uncommitted CREATE TABLE is invisible (schema from the " +
      "rolled-back page 1)") {
    assert(SqliteFile.listTables(db).map(_.name) == Seq("acct"))
  }

  test("cold journals are ignored: zeroed header (PERSIST leftovers) " +
      "and foreign bytes both read the main file normally") {
    val dir = Files.createTempDirectory("graft_jrn_cold")
    val cp = dir.resolve("f.db")
    Files.copy(Paths.get("src/test/resources/sqlite/fixture.db"), cp)
    // zeroed first sector — journal_mode=PERSIST after a clean commit
    Files.write(dir.resolve("f.db-journal"), new Array[Byte](512))
    assert(SqliteFile.listTables(cp.toString).nonEmpty)
    // foreign bytes without the journal magic carry no authority
    Files.write(dir.resolve("f.db-journal"), Array.fill[Byte](512)(0x42))
    assert(SqliteFile.listTables(cp.toString).nonEmpty)
  }

  test("a torn journal record cuts the replay at the valid prefix " +
      "(sqlite's playback rule)") {
    val full = SqliteJournal.parse(db + "-journal")
    // the fixture journal holds MULTIPLE headers (each mid-transaction
    // cache-spill sync writes a new one), so record positions are NOT
    // 512 + i*recSize — derive a real record from the parsed override
    // offsets instead: override = record data start, stored checksum
    // sits right after the 4096 data bytes. Note sqlite's record
    // checksum is SPARSE (every 200th byte) by design — flipping the
    // stored checksum itself is the reliable torn-write simulation.
    val bytes = Files.readAllBytes(Paths.get(db + "-journal"))
    val offs = full.overrides.values.toSeq.sorted
    val mid = offs(offs.size / 2)
    val ckOff = (mid + 4096).toInt
    bytes(ckOff) = (bytes(ckOff) ^ 0x1).toByte
    val dir = Files.createTempDirectory("graft_jrn_cut")
    Files.write(dir.resolve("f.db-journal"), bytes)
    val cut = SqliteJournal.parse(dir.resolve("f.db-journal").toString)
    assert(cut.hot && cut.records < full.records && cut.records > 0)
    // nothing at or past the torn record survives
    assert(cut.overrides.values.forall(_ < mid))
    assert(cut.dbPages == full.dbPages) // truncation survives the cut

    // torn FIRST record: the whole replay is cut, hot with zero records
    val bytes2 = Files.readAllBytes(Paths.get(db + "-journal"))
    val first = offs.head
    val ck2 = (first + 4096).toInt
    bytes2(ck2) = (bytes2(ck2) ^ 0x1).toByte
    Files.write(dir.resolve("g.db-journal"), bytes2)
    val cut2 = SqliteJournal.parse(dir.resolve("g.db-journal").toString)
    assert(cut2.hot && cut2.records == 0 && cut2.overrides.isEmpty)
  }

  test("journal/db page-size mismatch and journal+wal coexistence " +
      "refuse loudly (named)") {
    val dir = Files.createTempDirectory("graft_jrn_bad")
    val cp = dir.resolve("f.db")
    Files.copy(Paths.get("src/test/resources/sqlite/fixture.db"), cp)
    // valid magic, nRec=0, dbPages=1, sector 512, page size 8192
    val hdr = java.nio.ByteBuffer.allocate(512)
    hdr.put(Array(0xd9, 0xd5, 0x05, 0xf9, 0x20, 0xa1, 0x63, 0xd7)
      .map(_.toByte))
    hdr.putInt(0)      // nRec
    hdr.putInt(0x1234) // nonce
    hdr.putInt(1)      // initial page count
    hdr.putInt(512)    // sector size
    hdr.putInt(8192)   // page size that cannot match the 4096 db
    Files.write(dir.resolve("f.db-journal"), hdr.array())
    val e = intercept[IllegalArgumentException] {
      SqliteFile.listTables(cp.toString)
    }
    assert(e.getMessage.contains("journal page size"), e.getMessage)

    // hot journal AND non-empty wal together: not a sqlite state
    val dir2 = Files.createTempDirectory("graft_jrn_wal")
    val cp2 = dir2.resolve("f.db")
    Files.copy(Paths.get(db), cp2)
    Files.copy(Paths.get(db + "-journal"), dir2.resolve("f.db-journal"))
    Files.write(dir2.resolve("f.db-wal"), Array.fill[Byte](64)(1))
    val e2 = intercept[IllegalArgumentException] {
      SqliteFile.listTables(cp2.toString)
    }
    assert(e2.getMessage.contains("BOTH"), e2.getMessage)
  }
}
