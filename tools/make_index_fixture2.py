#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/index_fixture2.db — committed
fixture for the round-15 SqliteIndex refusal shrink (DESC walks,
COLLATE NOCASE folding, composite second-column binds). Built with
CPython's stdlib sqlite3 so the index b-tree bytes are canonical.

Coverage by construction (1 KiB pages -> multi-level trees):
  - ix_kd   ON t2(k DESC): descending INTEGER, 4000 rows / 97 keys.
  - ix_sno  ON t2(s COLLATE NOCASE): MIXED-CASE text (the same word
    appears as 'Word-…', 'WORD-…', 'word-…') so fold-equality is
    exercised against genuinely different stored bytes.
  - ix_ks   ON t2(k, s): composite for eq-prefix + second-col ranges.
  - ix_ksd  ON t2(k DESC, s): composite with a DESC leading column.
  - ix_kv   ON t2(k, v DESC): composite with a DESC RANGED column.

Prints the invariants SqliteIndexDescNocaseSpec pins.
"""
import os, sqlite3

out = "src/test/resources/sqlite/index_fixture2.db"
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)

db = sqlite3.connect(out)
c = db.cursor()
c.execute("PRAGMA page_size = 1024")
c.execute("""CREATE TABLE t2 (
  id INTEGER PRIMARY KEY,
  k  INTEGER,
  s  TEXT,
  v  REAL
)""")
CASES = ["Word-%04d", "WORD-%04d", "word-%04d", "wOrD-%04d"]
rows = []
for i in range(1, 4001):
    k = (i * 37) % 97
    # case variant keyed on i//300 so each s-number (period 300 in i)
    # appears in SEVERAL case variants (i%4 would be constant per
    # number: 300 ≡ 0 mod 4)
    s = CASES[(i // 300) % 4] % ((i * 7919) % 300)
    v = (i * 13) % 1000 + 0.25
    rows.append((i, k, s, v))
c.executemany("INSERT INTO t2 VALUES (?,?,?,?)", rows)
c.execute("CREATE INDEX ix_kd ON t2(k DESC)")
c.execute("CREATE INDEX ix_sno ON t2(s COLLATE NOCASE)")
c.execute("CREATE INDEX ix_ks ON t2(k, s)")
c.execute("CREATE INDEX ix_ksd ON t2(k DESC, s)")
c.execute("CREATE INDEX ix_kv ON t2(k, v DESC)")
db.commit()

n = c.execute("SELECT count(*), sum(id) FROM t2 WHERE k = 42").fetchone()
print("k=42 -> count=%d sum_id=%d" % n)
n = c.execute(
    "SELECT count(*), sum(id) FROM t2 WHERE k >= 10 AND k <= 20").fetchone()
print("k in [10,20] -> count=%d sum_id=%d" % n)
n = c.execute(
    "SELECT count(*), sum(id) FROM t2 "
    "WHERE s = 'word-0123' COLLATE NOCASE").fetchone()
print("s NOCASE= word-0123 -> count=%d sum_id=%d" % n)
n = c.execute(
    "SELECT count(*), sum(id) FROM t2 WHERE s = 'word-0123'").fetchone()
print("s BINARY= word-0123 -> count=%s sum_id=%s" % n)
n = c.execute(
    "SELECT count(*), sum(id) FROM t2 "
    "WHERE k = 42 AND s >= 'Word-0100' AND s < 'Word-0200'").fetchone()
print("k=42, s in [Word-0100,Word-0200) -> count=%s sum_id=%s" % n)
n = c.execute(
    "SELECT count(*), sum(id) FROM t2 "
    "WHERE k = 42 AND v >= 100.0 AND v <= 500.0").fetchone()
print("k=42, v in [100,500] -> count=%s sum_id=%s" % n)
print("pages:", c.execute("PRAGMA page_count").fetchone()[0])
db.close()
print("wrote", out, os.path.getsize(out), "bytes")
