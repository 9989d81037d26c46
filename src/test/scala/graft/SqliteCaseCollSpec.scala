package graft

import graft.sources.{SqliteFile, SqliteIndex}
import SqliteIndex.{ColSpec, KeyRange}

/** Round-16 ADVICE fix: sqlite identifiers are ASCII-case-insensitive,
  * so autoindex derivation must match `PRIMARY KEY(a)` to `"A" INTEGER`
  * (the rowid alias) and `UNIQUE(s)` to `"S" ... COLLATE NOCASE` — the
  * old case-sensitive match emitted a phantom PK slot (wrong b-tree,
  * silent garbage) and dropped the NOCASE inheritance. Plus the
  * adjacent bug found while fixing it: an explicit CREATE INDEX column
  * with no COLLATE inherits the COLUMN's declared collation (sqlite's
  * rule), so `CREATE INDEX ix ON u(x)` over a NOCASE column keys the
  * tree in NOCASE order — walking it BINARY misses rows. All pins are
  * sqlite's own PRAGMA/query ground truth printed by
  * tools/make_casecoll_fixture.py.
  */
class SqliteCaseCollSpec extends SparkFunSuite {

  private val db = "src/test/resources/sqlite/casecoll_fixture.db"
  private lazy val indexes = SqliteIndex.listIndexes(db)
  private def idx(name: String) = indexes.find(_.name == name).get
  private lazy val h = SqliteFile.header(db)

  test("case-mismatched PRIMARY KEY(a) over \"A\" INTEGER is the " +
      "rowid alias: exactly ONE autoindex exists and it is UNIQUE(b)") {
    val ts = indexes.filter(_.table == "t")
    assert(ts.map(_.name) == Seq("sqlite_autoindex_t_1"),
      s"phantom autoindex slots: ${ts.map(_.name)}")
    assert(ts.head.supported && ts.head.specs == Seq(ColSpec("b")))
    val (ids, pages) = SqliteIndex.indexRowids(db, h, ts.head, "b-00777")
    assert(ids == Seq(777L)) // "A" aliases the rowid, so A = rowid
    assert(pages < 15, s"point probe touched $pages pages")
  }

  test("case-mismatched UNIQUE(s) inherits NOCASE from \"S\" TEXT " +
      "COLLATE NOCASE (old code silently fell back to BINARY)") {
    val a = idx("sqlite_autoindex_n2_1")
    assert(a.supported && a.specs == Seq(ColSpec("S", nocase = true)))
    // fixture pin: s = 'key-00100' matches the stored 'KEY-00100'
    // variant only under NOCASE -> rowid 100 (v = 300)
    val (ids, _) = SqliteIndex.indexRowids(db, h, a, "key-00100")
    assert(ids == Seq(100L))
  }

  test("explicit CREATE INDEX with no COLLATE inherits the column's " +
      "NOCASE: probe and range fold case exactly as sqlite does") {
    val a = idx("ix")
    assert(a.supported && a.specs == Seq(ColSpec("x", nocase = true)))
    // fixture pin: x = 'KEY-00505' (opposite case of the stored
    // variant) -> rowid 505 (y = 3535)
    val (ids, _) = SqliteIndex.indexRowids(db, h, a, "KEY-00505")
    assert(ids == Seq(505L))
    // fixture pin: x in [key-01000, key-01010) -> 10 rows across all
    // three stored case variants, rowids 1000..1009 (sum(y) = 70315)
    val (rids, _) = SqliteIndex.rangeRowids(db, h, a,
      KeyRange(Some("key-01000"), loInc = true,
        Some("key-01010"), hiInc = false))
    assert(rids.sorted == (1000L to 1009L))
  }

  test("index DDL naming the column in a different case canonicalizes " +
      "to the DECLARED case (DSv2 probe columns carry schema names)") {
    val a = idx("iv")
    assert(a.supported && a.specs == Seq(ColSpec("Qq")),
      s"spec not canonicalized: ${a.specs}")
    val (ids, _) = SqliteIndex.indexRowids(db, h, a, "q-00042")
    assert(ids == Seq(42L))
  }

  test("inherited unsupported collation refuses by name") {
    val a = idx("ir")
    assert(!a.supported)
    assert(a.refusal.get.contains("RTRIM"), a.refusal.get)
    val e = intercept[IllegalArgumentException] {
      SqliteIndex.indexRowids(db, h, a, "r-001  ")
    }
    assert(e.getMessage.contains("unusable"))
  }
}
