#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/index_fixture.db — committed
fixture for graft.sources.SqliteIndex (secondary-index point lookups).
Built with CPython's stdlib sqlite3 so the index b-tree bytes are
produced by the canonical library.

Coverage by construction:
  - ix_k  ON t(k): non-unique INTEGER index, 4000 rows over 97 keys ->
    ~41 duplicates per key, multi-level index b-tree at 1 KiB pages
    (interior index cells carry real records — the walk must emit them).
  - ix_s  ON t(s): TEXT index incl. multibyte UTF-8 values.
  - ix_u  ON t(v): UNIQUE REAL index.
  - ix_multi ON t(k, s): composite — leading-column probes supported.
  - refusals: ix_expr (expression), ix_part (partial WHERE),
    ix_desc (DESC), ix_coll (COLLATE NOCASE), plus the internal
    sqlite_autoindex from a UNIQUE table constraint.

Prints the invariants SqliteIndexSpec pins.
"""
import os, sqlite3

out = "src/test/resources/sqlite/index_fixture.db"
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)

db = sqlite3.connect(out)
c = db.cursor()
c.execute("PRAGMA page_size = 1024")  # small pages -> deep trees
c.execute("""CREATE TABLE t (
  id INTEGER PRIMARY KEY,
  k  INTEGER,
  s  TEXT,
  v  REAL,
  u  TEXT UNIQUE
)""")
rows = []
for i in range(1, 4001):
    k = (i * 37) % 97
    s = "name-%05d" % ((i * 7919) % 500)   # ~8 dups per text key
    if i % 250 == 0:
        s = "naïve-%03d" % (i // 250)       # multibyte UTF-8 keys
    v = i + 0.5
    u = "uniq-%06d" % i
    rows.append((i, k, s, v, u))
c.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
c.execute("CREATE INDEX ix_k ON t(k)")
c.execute("CREATE INDEX ix_s ON t(s)")
c.execute("CREATE UNIQUE INDEX ix_u ON t(v)")
c.execute("CREATE INDEX ix_multi ON t(k, s)")
c.execute("CREATE INDEX ix_expr ON t(abs(k))")
c.execute("CREATE INDEX ix_part ON t(k) WHERE k > 50")
c.execute("CREATE INDEX ix_desc ON t(k DESC)")
c.execute("CREATE INDEX ix_coll ON t(s COLLATE NOCASE)")
db.commit()

for (k,) in [(42,)]:
    n = c.execute("SELECT count(*), sum(id) FROM t WHERE k = ?", (k,)).fetchone()
    print("k=%d -> count=%d sum_id=%d" % (k, n[0], n[1]))
n = c.execute("SELECT count(*), sum(id) FROM t WHERE s = 'name-00123'").fetchone()
print("s=name-00123 -> count=%d sum_id=%d" % (n[0], n[1]))
n = c.execute("SELECT count(*), sum(id) FROM t WHERE s = 'naïve-003'").fetchone()
print("s=naïve-003 -> count=%d sum_id=%d" % (n[0], n[1]))
n = c.execute("SELECT id FROM t WHERE v = 777.5").fetchone()
print("v=777.5 -> id=%d" % n[0])
print("pages:", c.execute("PRAGMA page_count").fetchone()[0])
print("indexes:", [r[0] for r in c.execute(
    "SELECT name FROM sqlite_master WHERE type='index' ORDER BY name")])
db.close()
print("wrote", out, os.path.getsize(out), "bytes")
