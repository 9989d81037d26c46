#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/cdc_alter_*.db and
cdc_multi_*.db — round-15 CDC fixtures (schema evolution + catalog
streams), written by CPython's stdlib sqlite3 so the bytes are
canonical.

1. ALTER evolution (single-table typed stream):
   cdc_alter_v1.db: ev(id PK, grp, payload), 400 rows.
   cdc_alter_v2.db: v1 + ALTER TABLE ev ADD COLUMN note TEXT
                    + 300 appended rows (note set on the new rows).
   cdc_rename_v2.db: v1 + RENAME COLUMN grp TO grp2 + 100 rows —
                    the drift the stream must refuse loudly.

2. Catalog growth (multi-table envelope stream):
   cdc_multi_v1.db: a(300 rows), b(150 rows).
   cdc_multi_v2.db: v1 + 100 appended to a + NEW TABLE c (50 rows)
                    + 50 appended to b.

Prints the invariants SqliteCdcEvolutionSpec pins.
"""
import os, shutil, sqlite3

res = "src/test/resources/sqlite"
os.makedirs(res, exist_ok=True)


def fresh(path):
    for p in (path, path + "-journal", path + "-wal"):
        if os.path.exists(p):
            os.remove(p)
    return sqlite3.connect(path)


def ev_row(i):
    return (i, i % 17, "alter-payload-%06d-%s" % (i, "y" * (i % 7)))


# ---- 1. ALTER evolution ---------------------------------------------
v1 = os.path.join(res, "cdc_alter_v1.db")
db = fresh(v1)
c = db.cursor()
c.execute("PRAGMA page_size = 512")
c.execute("CREATE TABLE ev (id INTEGER PRIMARY KEY, grp INTEGER, "
          "payload TEXT)")
c.executemany("INSERT INTO ev VALUES (?,?,?)", [ev_row(i) for i in range(1, 401)])
db.commit()
db.close()

v2 = os.path.join(res, "cdc_alter_v2.db")
shutil.copy(v1, v2)
db = sqlite3.connect(v2)
c = db.cursor()
c.execute("ALTER TABLE ev ADD COLUMN note TEXT")
c.executemany("INSERT INTO ev VALUES (?,?,?,?)",
              [ev_row(i) + ("note-%d" % i,) for i in range(401, 701)])
db.commit()
print("alter_v2: rows=%d sum_grp=%d notes=%d" % c.execute(
    "SELECT count(*), sum(grp), count(note) FROM ev").fetchone())
db.close()

bad = os.path.join(res, "cdc_rename_v2.db")
shutil.copy(v1, bad)
db = sqlite3.connect(bad)
c = db.cursor()
c.execute("ALTER TABLE ev RENAME COLUMN grp TO grp2")
c.executemany("INSERT INTO ev VALUES (?,?,?)",
              [ev_row(i) for i in range(401, 501)])
db.commit()
db.close()

# ---- 2. catalog growth ----------------------------------------------
m1 = os.path.join(res, "cdc_multi_v1.db")
db = fresh(m1)
c = db.cursor()
c.execute("PRAGMA page_size = 512")
c.execute("CREATE TABLE a (id INTEGER PRIMARY KEY, x INTEGER, s TEXT)")
c.execute("CREATE TABLE b (id INTEGER PRIMARY KEY, v REAL)")
c.executemany("INSERT INTO a VALUES (?,?,?)",
              [(i, i * 3, "a-%04d" % i) for i in range(1, 301)])
c.executemany("INSERT INTO b VALUES (?,?)",
              [(i, i / 4.0) for i in range(1, 151)])
db.commit()
db.close()

m2 = os.path.join(res, "cdc_multi_v2.db")
shutil.copy(m1, m2)
db = sqlite3.connect(m2)
c = db.cursor()
c.executemany("INSERT INTO a VALUES (?,?,?)",
              [(i, i * 3, "a-%04d" % i) for i in range(301, 401)])
c.executemany("INSERT INTO b VALUES (?,?)",
              [(i, i / 4.0) for i in range(151, 201)])
c.execute("CREATE TABLE c (id INTEGER PRIMARY KEY, blob_v BLOB)")
c.executemany("INSERT INTO c VALUES (?,?)",
              [(i, bytes([i % 256, (i * 7) % 256])) for i in range(1, 51)])
db.commit()
print("multi_v2: a=%d b=%d c=%d sum_a_x=%d" % (
    c.execute("SELECT count(*) FROM a").fetchone()[0],
    c.execute("SELECT count(*) FROM b").fetchone()[0],
    c.execute("SELECT count(*) FROM c").fetchone()[0],
    c.execute("SELECT sum(x) FROM a").fetchone()[0]))
db.close()

for f in (v1, v2, bad, m1, m2):
    print("wrote", f, os.path.getsize(f), "bytes")
