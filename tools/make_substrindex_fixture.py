#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/substrindex_fixture.db —
committed fixture for round-17 prefix-substr expression indexes (the
r16 verdict's #5 item): `substr(col, 1, n)` keyspec terms parse into
usable IndexDefs — the index STORES the prefix values, so the probe
walk needs no evaluator, only canonical-name matching. Non-prefix
substr (start != 1) stays refused by name. Prints sqlite's ground
truth SqliteSubstrIndexSpec pins.
"""
import os, sqlite3

out = "src/test/resources/sqlite/substrindex_fixture.db"
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)

db = sqlite3.connect(out)
c = db.cursor()
c.execute("PRAGMA page_size = 1024")
c.execute("CREATE TABLE e (id INTEGER PRIMARY KEY, s TEXT, n INTEGER)")
# s = 'pfx-NNNNN-sufM' so substr(s, 1, 9) = 'pfx-NNNNN' is selective
c.executemany("INSERT INTO e VALUES (?,?,?)",
              [(i, "pfx-%05d-suf%d" % (i // 4, i % 4), i * 3)
               for i in range(1, 4001)])
c.execute("CREATE INDEX s_pre ON e(substr(s, 1, 9))")       # supported
c.execute("CREATE INDEX s_mid ON e(substr(s, 2, 4))")       # refuses
c.execute("CREATE INDEX s_pre_desc ON e(substr(s, 1, 9) DESC)")
db.commit()

print("point substr(s,1,9) = 'pfx-00123':", c.execute(
    "SELECT count(*), sum(id) FROM e WHERE substr(s, 1, 9) = 'pfx-00123'")
    .fetchone())
print("point plan:", c.execute(
    "EXPLAIN QUERY PLAN SELECT id FROM e WHERE substr(s, 1, 9) = 'pfx-00123'")
    .fetchall())
print("range ['pfx-00200', 'pfx-00210'):", c.execute(
    "SELECT count(*), sum(id) FROM e WHERE substr(s, 1, 9) >= 'pfx-00200' "
    "AND substr(s, 1, 9) < 'pfx-00210'").fetchone())
print("desc point 'pfx-00900':", c.execute(
    "SELECT count(*), sum(id) FROM e WHERE substr(s, 1, 9) = 'pfx-00900'")
    .fetchone())
print("pages:", c.execute("PRAGMA page_count").fetchone()[0])
db.close()
print("wrote", out, os.path.getsize(out), "bytes")
