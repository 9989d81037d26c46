#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/fixture.db — the committed test
fixture for graft.sources.SqliteFile (the pure-Scala SQLite file-format
reader). Built with CPython's stdlib sqlite3 so the bytes are produced
by the canonical library, not by anything the reader shares code with.

Coverage by construction:
  - typed: every record serial type (NULL, 1/2/3/4/6/8-byte ints incl.
    negatives at each width boundary, the 0/1 constants, float64, text
    with multibyte UTF-8, blob), INTEGER PRIMARY KEY rowid alias,
    VARCHAR/DATETIME/DATE/BOOLEAN declared types.
  - big: 6000 rows -> multi-level interior b-tree; one ~50 KB body ->
    multi-page overflow chain at the 4096 page size.
  - pair: table-level composite PRIMARY KEY (a, b).
  - altered: ALTER TABLE ADD COLUMN after inserts -> records shorter
    than the schema (trailing-NULL padding path).
  - a view and an index: must be SKIPPED by listTables.

Prints the invariants the spec pins (deterministic content).
"""
import os, sqlite3, zlib

out = "src/test/resources/sqlite/fixture.db"
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)

db = sqlite3.connect(out)
c = db.cursor()
c.execute("PRAGMA page_size = 4096")
c.execute("PRAGMA journal_mode = DELETE")

c.execute("""CREATE TABLE typed (
  id INTEGER PRIMARY KEY,
  i1 INTEGER, i2 INTEGER, i3 INTEGER, i4 INTEGER, i6 INTEGER, i8 INTEGER,
  r REAL, t TEXT, v VARCHAR(20), b BLOB,
  flag BOOLEAN, dt DATETIME, d DATE)""")
rows = [
    # widths: 1/2/3/4/6/8-byte two's complement boundaries
    (1, 127, 32767, 8388607, 2147483647, 140737488355327, 9223372036854775807,
     3.5, "héllo wörld 世界", "vtext", b"\x00\x01\xfe\xff",
     1, "2024-03-01 12:34:56", "2024-03-01"),
    (2, -128, -32768, -8388608, -2147483648, -140737488355328,
     -9223372036854775808, -0.25, "plain", None, b"", 0,
     "1999-12-31 23:59:59", "1999-12-31"),
    (3, 0, 1, None, None, None, None, None, None, "only-v", None, None,
     None, None),
]
c.executemany("INSERT INTO typed VALUES (%s)" % ",".join(["?"] * 14), rows)

c.execute("""CREATE TABLE big (
  id INTEGER PRIMARY KEY, val INTEGER, score REAL, body TEXT)""")
def body(i):
    if i == 4242:  # one multi-page overflow payload
        return ("overflow-" + "x" * 50000)
    # deterministic pseudo-text, varying length 20..420 chars
    seed = zlib.crc32(str(i).encode()) & 0xffffffff
    return ("w%d " % (seed % 1000)) * (20 + seed % 100)
big_rows = [(i, (i * 37) % 10007 - 5000, (i % 997) / 7.0, body(i))
            for i in range(1, 6001)]
c.executemany("INSERT INTO big VALUES (?,?,?,?)", big_rows)

c.execute("""CREATE TABLE pair (
  a INTEGER, b TEXT, amount REAL,
  PRIMARY KEY (a, b))""")
c.executemany("INSERT INTO pair VALUES (?,?,?)",
              [(1, "x", 1.5), (1, "y", 2.5), (2, "x", -3.0)])

c.execute("CREATE TABLE altered (id INTEGER PRIMARY KEY, v TEXT)")
c.executemany("INSERT INTO altered VALUES (?,?)", [(1, "old1"), (2, "old2")])
c.execute("ALTER TABLE altered ADD COLUMN extra INTEGER")
c.execute("INSERT INTO altered VALUES (3, 'new3', 33)")

# WITHOUT ROWID (round 12): index-btree layout. PK columns NOT first
# in declared order (exercises the pk-first record permutation), 5000
# rows -> interior index pages (whose cells carry full records), one
# ~30 KB value -> index-rule overflow chain, plus ALTER after inserts
# -> short records under the permutation.
c.execute("""CREATE TABLE wr (
  payload TEXT, grp INTEGER, k TEXT, amount REAL,
  PRIMARY KEY (grp, k)) WITHOUT ROWID""")
def wr_payload(i):
    if i == 777:  # overflow at the index spill threshold
        return "wrbig-" + "y" * 30000
    seed = zlib.crc32(("wr%d" % i).encode()) & 0xffffffff
    return ("p%d " % (seed % 1000)) * (5 + seed % 40)
wr_rows = [(wr_payload(i), i % 97, "k%05d" % i, (i % 211) / 3.0)
           for i in range(1, 5001)]
c.executemany("INSERT INTO wr VALUES (?,?,?,?)", wr_rows)
c.execute("ALTER TABLE wr ADD COLUMN extra INTEGER")
c.execute("INSERT INTO wr VALUES ('tail', 999, 'k99999', -1.5, 42)")

# small WITHOUT ROWID: single-column TEXT pk, leaf-only root
c.execute("""CREATE TABLE wr_small (
  name TEXT PRIMARY KEY, n INTEGER) WITHOUT ROWID""")
c.executemany("INSERT INTO wr_small VALUES (?,?)",
              [("alpha", 1), ("beta", 2), ("gamma", None)])

c.execute("CREATE INDEX big_val ON big(val)")
c.execute("CREATE VIEW big_view AS SELECT id FROM big WHERE val > 0")
db.commit()
c.execute("VACUUM")  # compact, canonical page layout
db.commit()

# invariants for the spec
for q in [
    "SELECT count(*), sum(val), sum(length(body)) FROM big",
    "SELECT min(score), max(score) FROM big",
    "SELECT count(*) FROM typed",
    "SELECT sum(a), count(*) FROM pair",
    "SELECT count(*), sum(grp), sum(length(payload)), sum(amount) FROM wr",
    "SELECT count(*) FROM wr WHERE extra IS NOT NULL",
    "SELECT sum(n) FROM wr_small",
]:
    print(q, "->", c.execute(q).fetchone())
db.close()
print("wrote", out, os.path.getsize(out), "bytes")
