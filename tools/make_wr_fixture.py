#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/wr_fixture.db — committed
fixture for round-16 WITHOUT ROWID pk probes (the r15 verdict's #2
item): the table b-tree IS a key-ordered index on the PRIMARY KEY,
so pk equality/range/IN probes descend it directly. Prints sqlite's
own ground truth the spec pins.

Tables (all WITHOUT ROWID, multi-page):
  wr1 : composite pk (a INTEGER, b TEXT) + payloads — eq-prefix+range
        composite descent, full-pk equality, IN on the leading column.
  wr2 : TEXT pk DESC — the walk runs in index (descending) order.
  wr3 : TEXT pk COLLATE NOCASE — candidate (swallow-nothing) probes.
  wr4 : TEXT pk COLLATE RTRIM — pk specs underivable, refuses loudly
        and DSv2 declines to a full scan.
"""
import os, sqlite3

out = "src/test/resources/sqlite/wr_fixture.db"
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)

db = sqlite3.connect(out)
c = db.cursor()
c.execute("PRAGMA page_size = 1024")

c.execute("""CREATE TABLE wr1 (
  a INTEGER NOT NULL,
  b TEXT NOT NULL,
  v INTEGER,
  payload TEXT,
  PRIMARY KEY (a, b)
) WITHOUT ROWID""")
rows = []
for i in range(1, 6001):
    rows.append((i % 97, "b-%05d" % i, i * 3,
                 "payload-%05d-%s" % (i, "x" * (i % 19))))
c.executemany("INSERT INTO wr1 VALUES (?,?,?,?)", rows)

c.execute("""CREATE TABLE wr2 (
  k TEXT PRIMARY KEY DESC,
  v INTEGER
) WITHOUT ROWID""")
c.executemany("INSERT INTO wr2 VALUES (?,?)",
              [("k-%05d" % i, i * 7) for i in range(1, 3001)])

CASES = ["Key-%05d", "KEY-%05d", "key-%05d"]
c.execute("""CREATE TABLE wr3 (
  k TEXT COLLATE NOCASE PRIMARY KEY,
  v INTEGER
) WITHOUT ROWID""")
c.executemany("INSERT INTO wr3 VALUES (?,?)",
              [(CASES[(i // 97) % 3] % i, i * 11) for i in range(1, 3001)])

c.execute("""CREATE TABLE wr4 (
  k TEXT COLLATE RTRIM PRIMARY KEY,
  v INTEGER
) WITHOUT ROWID""")
c.executemany("INSERT INTO wr4 VALUES (?,?)",
              [("r-%03d " % i, i) for i in range(1, 101)])
db.commit()

print("wr1 a=42 count/sum:", c.execute(
    "SELECT count(*), sum(v) FROM wr1 WHERE a = 42").fetchone())
print("wr1 a=42, b range [b-01000,b-04000):", c.execute(
    "SELECT count(*), sum(v) FROM wr1 "
    "WHERE a = 42 AND b >= 'b-01000' AND b < 'b-04000'").fetchone())
print("wr1 full-pk eq (42,'b-04021'):", c.execute(
    "SELECT v, payload FROM wr1 WHERE a = 42 AND b = 'b-04021'")
    .fetchall())
print("wr1 a IN (3, 42, 77):", c.execute(
    "SELECT count(*), sum(v) FROM wr1 WHERE a IN (3, 42, 77)").fetchone())
print("wr1 plan:", c.execute(
    "EXPLAIN QUERY PLAN SELECT * FROM wr1 WHERE a = 42 AND b >= 'b-01000'"
    " AND b < 'b-04000'").fetchall())
print("wr2 range [k-01000,k-01010):", c.execute(
    "SELECT count(*), sum(v) FROM wr2 "
    "WHERE k >= 'k-01000' AND k < 'k-01010'").fetchone())
print("wr3 NOCASE probe key-00505:", c.execute(
    "SELECT v FROM wr3 WHERE k = 'key-00505'").fetchall())
print("pages:", c.execute("PRAGMA page_count").fetchone()[0])
db.close()
print("wrote", out, os.path.getsize(out), "bytes")
