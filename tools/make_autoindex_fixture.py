#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/autoindex_fixture.db — committed
fixture for the round-15 sqlite_autoindex derivation (UNIQUE /
non-alias PRIMARY KEY constraints served without CREATE INDEX sql).
Prints sqlite's own PRAGMA index mapping — the numbering/collation
ground truth SqliteAutoIndexSpec pins.

Tables:
  au : the numbering matrix — column UNIQUEs at their positions, a
       NOCASE column UNIQUE (collation inheritance), a composite
       table UNIQUE, and a COLLATE-override table UNIQUE.
  pk : TEXT PRIMARY KEY (_1, origin pk) + UNIQUE(y) (_2).
  pkd: INTEGER PRIMARY KEY DESC — the alias QUIRK: x is a REAL stored
       column (rowid separate), served by autoindex _1 with DESC order.
"""
import os, sqlite3

out = "src/test/resources/sqlite/autoindex_fixture.db"
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)

db = sqlite3.connect(out)
c = db.cursor()
c.execute("PRAGMA page_size = 1024")
c.execute("""CREATE TABLE au (
  id INTEGER PRIMARY KEY,
  a TEXT UNIQUE,
  b INTEGER,
  s TEXT COLLATE NOCASE UNIQUE,
  c2 TEXT,
  UNIQUE (b, c2),
  UNIQUE (c2 COLLATE NOCASE)
)""")
CASES = ["Key-%05d", "KEY-%05d", "key-%05d"]
rows = []
for i in range(1, 3001):
    rows.append((i, "uniq-%05d" % i, (i * 37) % 97,
                 CASES[(i // 97) % 3] % i,   # unique even under NOCASE
                 ["c-%05d", "C-%05d"][(i // 500) % 2] % i))  # idem
c.executemany("INSERT INTO au VALUES (?,?,?,?,?)", rows)

c.execute("CREATE TABLE pk (x TEXT PRIMARY KEY, y INTEGER, UNIQUE(y))")
c.executemany("INSERT INTO pk VALUES (?,?)",
              [("pk-%05d" % i, i * 7) for i in range(1, 1001)])

c.execute("CREATE TABLE pkd (x INTEGER PRIMARY KEY DESC, y TEXT)")
c.executemany("INSERT INTO pkd VALUES (?,?)",
              [(1000000 + i * 3, "v-%04d" % i) for i in range(1, 501)])
db.commit()

for tbl in ("au", "pk", "pkd"):
    for r in list(db.cursor().execute(f"PRAGMA index_list({tbl})")):
        xinfo = list(db.cursor().execute(f"PRAGMA index_xinfo('{r[1]}')"))
        print(tbl, r[1], r[3],
              [(x[2], x[3], x[4]) for x in xinfo if x[1] >= 0])
n = c.execute("SELECT count(*), sum(id) FROM au WHERE s = 'key-00100' "
              "COLLATE NOCASE").fetchone()
print("au s NOCASE key-00100 ->", n)
n = c.execute("SELECT count(*), sum(id) FROM au "
              "WHERE b = 42 AND c2 >= 'c-00500' AND c2 < 'c-01500'").fetchone()
print("au b=42 c2 range ->", n)
print("pkd rowid vs x head:",
      list(c.execute("SELECT rowid, x FROM pkd LIMIT 2")))
print("pages:", c.execute("PRAGMA page_count").fetchone()[0])
db.close()
print("wrote", out, os.path.getsize(out), "bytes")
