#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/cdc_multi_v3_drop.db — round-16
fixture for the catalog-CDC drop guard (ADVICE fix): cdc_multi_v1's
catalog with table `b` DROPPED and `a` grown. A live `tables=*` stream
that committed watermarks over v1 must refuse LOUDLY at its next
micro-batch plan — the old guard consulted the end offset, which
latestOffset() rebuilds from the live catalog, so a drop passed
silently during live streaming.
"""
import os, shutil, sqlite3

res = "src/test/resources/sqlite"
src = os.path.join(res, "cdc_multi_v1.db")
out = os.path.join(res, "cdc_multi_v3_drop.db")
if os.path.exists(out):
    os.remove(out)
shutil.copy(src, out)

db = sqlite3.connect(out)
c = db.cursor()
c.execute("DROP TABLE b")
c.executemany("INSERT INTO a VALUES (?,?,?)",
              [(i, i * 3, "a-%04d" % i) for i in range(301, 401)])
db.commit()
print("tables:", [r[0] for r in c.execute(
    "SELECT name FROM sqlite_master WHERE type='table' ORDER BY name")])
print("a rows:", c.execute("SELECT count(*) FROM a").fetchone()[0])
db.close()
print("wrote", out, os.path.getsize(out), "bytes")
