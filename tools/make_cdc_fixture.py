#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/cdc_*.db — growth snapshots for
graft.sources.SqliteCdcStream (round 14: rowid-watermark CDC) and the
SqliteFile.readRange incremental-read primitive.

Two growth sequences, both built by CPython's stdlib sqlite3 so the
bytes are canonical:

1. Rollback-journal growth (file-replacement shape — the "nightly
   snapshot drop" deployment): cdc_v1.db (400 rows) -> cdc_v2.db
   (+300) -> cdc_v3.db (+300), page_size=512 so v3's b-tree is >=2
   levels deep and interior-cell pruning is load-bearing. Each
   snapshot is a committed, self-contained db; v_{n+1} is v_n plus
   APPENDED rows only (the CDC contract).

2. Live-WAL growth (the "stream a running application's database"
   shape): cdc_wal_v1.db{,-wal} and cdc_wal_v2.db{,-wal} share the
   IDENTICAL main file (wal_autocheckpoint=0, copied while the
   connection is open); v2's wal simply has one more committed
   transaction. A CDC stream pointed at the db sees new rows arrive
   purely through the wal overlay.

Prints the invariants the spec pins.
"""
import os, shutil, sqlite3

res = "src/test/resources/sqlite"
os.makedirs(res, exist_ok=True)

def row(i):
    # ~40 bytes/record so 512-byte pages overflow into a real tree
    return (i, i % 17, "cdc-payload-%06d-%s" % (i, "x" * (i % 11)),
            (i * 31 % 997) / 8.0)

# ---- sequence 1: committed snapshots --------------------------------
tmp = "/tmp/graft_cdc_fixture.db"
for p in (tmp, tmp + "-journal"):
    if os.path.exists(p):
        os.remove(p)

db = sqlite3.connect(tmp)
c = db.cursor()
c.execute("PRAGMA page_size = 512")
c.execute("PRAGMA journal_mode = DELETE")
c.execute("""CREATE TABLE events (
  id INTEGER PRIMARY KEY, grp INTEGER, payload TEXT, score REAL)""")

cuts = [(400, "cdc_v1.db"), (700, "cdc_v2.db"), (1000, "cdc_v3.db")]
lo = 1
for hi, name in cuts:
    c.executemany("INSERT INTO events VALUES (?,?,?,?)",
                  [row(i) for i in range(lo, hi + 1)])
    db.commit()
    out = os.path.join(res, name)
    if os.path.exists(out):
        os.remove(out)
    # VACUUM-free copy: DELETE mode + committed means the file is the
    # snapshot; copy with the connection open is fine post-commit
    shutil.copyfile(tmp, out)
    q = c.execute("SELECT count(*), max(id), sum(grp), sum(length(payload))"
                  " FROM events").fetchone()
    print(name, "->", q, os.path.getsize(out), "bytes")
    lo = hi + 1
db.close()

# ---- sequence 2: live-WAL growth ------------------------------------
tmpw = "/tmp/graft_cdc_wal_fixture.db"
for p in (tmpw, tmpw + "-wal", tmpw + "-journal"):
    if os.path.exists(p):
        os.remove(p)

db = sqlite3.connect(tmpw)
c = db.cursor()
c.execute("PRAGMA page_size = 512")
c.execute("PRAGMA journal_mode = DELETE")
c.execute("""CREATE TABLE events (
  id INTEGER PRIMARY KEY, grp INTEGER, payload TEXT, score REAL)""")
c.executemany("INSERT INTO events VALUES (?,?,?,?)",
              [row(i) for i in range(1, 301)])
db.commit()
db.close()

db = sqlite3.connect(tmpw)
c = db.cursor()
assert c.execute("PRAGMA journal_mode = WAL").fetchone()[0] == "wal"
c.execute("PRAGMA wal_autocheckpoint = 0")

c.executemany("INSERT INTO events VALUES (?,?,?,?)",
              [row(i) for i in range(301, 361)])
db.commit()
for name in ("cdc_wal_v1.db",):
    out = os.path.join(res, name)
    for p in (out, out + "-wal"):
        if os.path.exists(p):
            os.remove(p)
    shutil.copyfile(tmpw, out)
    shutil.copyfile(tmpw + "-wal", out + "-wal")
    print(name, "->",
          c.execute("SELECT count(*), max(id) FROM events").fetchone(),
          "main", os.path.getsize(out),
          "wal", os.path.getsize(out + "-wal"))

c.executemany("INSERT INTO events VALUES (?,?,?,?)",
              [row(i) for i in range(361, 421)])
db.commit()
for name in ("cdc_wal_v2.db",):
    out = os.path.join(res, name)
    for p in (out, out + "-wal"):
        if os.path.exists(p):
            os.remove(p)
    shutil.copyfile(tmpw, out)
    shutil.copyfile(tmpw + "-wal", out + "-wal")
    print(name, "->",
          c.execute("SELECT count(*), max(id) FROM events").fetchone(),
          "main", os.path.getsize(out),
          "wal", os.path.getsize(out + "-wal"))
db.close()

# the two main files must be byte-identical (growth lives in the wal)
a = open(os.path.join(res, "cdc_wal_v1.db"), "rb").read()
b = open(os.path.join(res, "cdc_wal_v2.db"), "rb").read()
print("wal-growth main files identical:", a == b)
