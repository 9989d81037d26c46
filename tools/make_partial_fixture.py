#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/partial_fixture.db — committed
fixture for round-15 partial-index probes: pt's ONLY index is
partial (WHERE k >= 90), so the DSv2 planner must use it exactly when
the query interval is contained in the predicate and fall back to the
scan otherwise."""
import os, sqlite3

out = "src/test/resources/sqlite/partial_fixture.db"
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)
db = sqlite3.connect(out)
c = db.cursor()
c.execute("PRAGMA page_size = 512")
c.execute("CREATE TABLE pt (id INTEGER PRIMARY KEY, k INTEGER, note TEXT)")
c.executemany("INSERT INTO pt VALUES (?,?,?)",
              [(i, (i * 37) % 100, "n-%05d" % i) for i in range(1, 4001)])
c.execute("CREATE INDEX pt_hot ON pt(k) WHERE k >= 90")
db.commit()
n = c.execute("SELECT count(*), sum(id) FROM pt WHERE k >= 95").fetchone()
print("k>=95 ->", n)
n = c.execute("SELECT count(*), sum(id) FROM pt WHERE k = 92").fetchone()
print("k=92 ->", n)
print("pages:", c.execute("PRAGMA page_count").fetchone()[0])
db.close()
print("wrote", out, os.path.getsize(out), "bytes")
