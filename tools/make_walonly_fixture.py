#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/fixture_walonly.db{,-wal} — a
database created IN WAL MODE from scratch with autocheckpoint off and
copied while the connection was open: the main file is a single
(stale) page-1 and EVERYTHING — schema included — lives only in the
log. The hardest honest case for the WAL replay: the reader must
resolve page 1 itself through the override map. Prints the invariants
the spec pins."""
import os, shutil, sqlite3

tmp = "/tmp/graft_walonly_fixture.db"
out = "src/test/resources/sqlite/fixture_walonly.db"
for p in (tmp, tmp + "-wal", out, out + "-wal"):
    if os.path.exists(p):
        os.remove(p)

db = sqlite3.connect(tmp)
c = db.cursor()
c.execute("PRAGMA page_size = 4096")
assert c.execute("PRAGMA journal_mode = WAL").fetchone()[0] == "wal"
c.execute("PRAGMA wal_autocheckpoint = 0")
c.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT, x REAL)")
c.executemany("INSERT INTO t VALUES (?,?,?)",
              [(i, "v%04d" % i, i / 4.0) for i in range(1, 501)])
db.commit()
for q in ["SELECT count(*), sum(id), sum(length(v)), sum(x) FROM t"]:
    print(q, "->", c.execute(q).fetchone())
shutil.copyfile(tmp, out)
shutil.copyfile(tmp + "-wal", out + "-wal")
db.close()
print("main:", os.path.getsize(out), "wal:", os.path.getsize(out + "-wal"))
