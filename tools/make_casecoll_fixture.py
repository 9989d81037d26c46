#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/casecoll_fixture.db — committed
fixture for the round-16 identifier-case / collation-inheritance
fixes (the r16 ADVICE high item plus the adjacent inherited-collation
bug found while fixing it). Prints sqlite's own PRAGMA mapping and
query ground truth that SqliteCaseCollSpec pins.

Tables:
  t  : "A" INTEGER def + lower-case PRIMARY KEY(a) table constraint —
       the rowid alias despite the case mismatch, so the ONLY
       autoindex is UNIQUE(b). The old case-sensitive derivation
       emitted a phantom PK slot and walked the wrong b-tree.
  n2 : "S" TEXT COLLATE NOCASE def + UNIQUE(s) constraint — the
       derived autoindex must inherit NOCASE across the case
       mismatch (old code silently fell back to BINARY).
  u  : x TEXT COLLATE NOCASE + CREATE INDEX ix ON u(x) with NO
       explicit COLLATE — sqlite keys ix in the COLUMN's collation
       (NOCASE); a BINARY walk over it returns silent garbage.
  v  : "Qq" TEXT def + CREATE INDEX iv ON v(qQ) — identifier case
       mismatch between index DDL and column def; the parsed spec
       must canonicalize to the declared case "Qq" so DSv2 probes
       (which carry schema names) match.
  r  : x TEXT COLLATE RTRIM + CREATE INDEX ir ON r(x) — the index
       INHERITS an unimplemented collation and must refuse by name.
"""
import os, sqlite3

out = "src/test/resources/sqlite/casecoll_fixture.db"
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)

db = sqlite3.connect(out)
c = db.cursor()
c.execute("PRAGMA page_size = 1024")

c.execute('CREATE TABLE t("A" INTEGER, b TEXT, PRIMARY KEY(a), UNIQUE(b))')
c.executemany("INSERT INTO t VALUES (?,?)",
              [(i, "b-%05d" % i) for i in range(1, 2001)])

c.execute('CREATE TABLE n2("S" TEXT COLLATE NOCASE, v INTEGER, UNIQUE(s))')
CASES = ["Key-%05d", "KEY-%05d", "key-%05d"]
c.executemany("INSERT INTO n2 VALUES (?,?)",
              [(CASES[(i // 97) % 3] % i, i * 3) for i in range(1, 2001)])

c.execute("CREATE TABLE u(x TEXT COLLATE NOCASE, y INTEGER)")
c.execute("CREATE INDEX ix ON u(x)")
c.executemany("INSERT INTO u VALUES (?,?)",
              [(CASES[(i // 101) % 3] % i, i * 7) for i in range(1, 3001)])

c.execute('CREATE TABLE v("Qq" TEXT, z INTEGER)')
c.execute("CREATE INDEX iv ON v(qQ)")
c.executemany("INSERT INTO v VALUES (?,?)",
              [("q-%05d" % i, i) for i in range(1, 2001)])

c.execute("CREATE TABLE r(x TEXT COLLATE RTRIM, w INTEGER)")
c.execute("CREATE INDEX ir ON r(x)")
c.executemany("INSERT INTO r VALUES (?,?)",
              [("r-%03d  " % i, i) for i in range(1, 101)])
db.commit()

for tbl in ("t", "n2", "u", "v", "r"):
    for row in list(db.cursor().execute(f"PRAGMA index_list({tbl})")):
        xinfo = list(db.cursor().execute(f"PRAGMA index_xinfo('{row[1]}')"))
        print(tbl, row[1], "unique=%d" % row[2],
              [(x[2], x[3], x[4]) for x in xinfo if x[1] >= 0])

print("t autoindex count:",
      len(list(c.execute("PRAGMA index_list(t)"))))
print("t b probe:", c.execute(
    "SELECT \"A\" FROM t WHERE b = 'b-00777'").fetchall())
print("n2 s NOCASE probe key-00100:", c.execute(
    "SELECT v FROM n2 WHERE s = 'key-00100'").fetchall())
print("u plan:", c.execute(
    "EXPLAIN QUERY PLAN SELECT y FROM u WHERE x = 'key-00505'").fetchall())
print("u x probe KEY-00505 (any case):", c.execute(
    "SELECT y FROM u WHERE x = 'key-00505'").fetchall())
print("u x range [key-01000, key-01010):", c.execute(
    "SELECT count(*), sum(y) FROM u "
    "WHERE x >= 'key-01000' AND x < 'key-01010'").fetchall())
print("v plan:", c.execute(
    'EXPLAIN QUERY PLAN SELECT z FROM v WHERE "Qq" = ?', ("q-00042",))
    .fetchall())
print("pages:", c.execute("PRAGMA page_count").fetchone()[0])
db.close()
print("wrote", out, os.path.getsize(out), "bytes")
