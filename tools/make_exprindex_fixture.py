#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/exprindex_fixture.db — committed
fixture for round-16 expression indexes (the r15 verdict's #3 item,
smallest honest slice): `lower(col)` / `upper(col)` / `col {+,-,*} n`
terms parse into usable IndexDefs — the index STORES the expression's
values, so the probe walk needs no evaluator, only the key's
collation/direction. Everything outside the closed set refuses by
name. Prints sqlite's ground truth SqliteExprIndexSpec pins.
"""
import os, sqlite3

out = "src/test/resources/sqlite/exprindex_fixture.db"
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)

db = sqlite3.connect(out)
c = db.cursor()
c.execute("PRAGMA page_size = 1024")
c.execute("CREATE TABLE e (id INTEGER PRIMARY KEY, s TEXT, n INTEGER)")
CASES = ["Word-%05d", "WORD-%05d", "word-%05d"]
c.executemany("INSERT INTO e VALUES (?,?,?)",
              [(i, CASES[i % 3] % i, i * 2) for i in range(1, 4001)])
c.execute("CREATE INDEX e_lower ON e(lower(s))")
c.execute("CREATE INDEX e_arith ON e(n + 1000)")
c.execute("CREATE INDEX e_upper_desc ON e(upper(s) DESC)")
c.execute("CREATE INDEX e_substr ON e(substr(s, 1, 4))")  # refuses
db.commit()

print("lower probe word-00777:", c.execute(
    "SELECT id FROM e WHERE lower(s) = 'word-00777'").fetchall())
print("lower plan:", c.execute(
    "EXPLAIN QUERY PLAN SELECT id FROM e WHERE lower(s) = 'word-00777'")
    .fetchall())
print("lower range [word-01000, word-01010):", c.execute(
    "SELECT count(*), sum(id) FROM e WHERE lower(s) >= 'word-01000' "
    "AND lower(s) < 'word-01010'").fetchone())
print("arith probe n+1000 = 2500:", c.execute(
    "SELECT id, n FROM e WHERE n + 1000 = 2500").fetchall())
print("upper desc range [WORD-02000, WORD-02005]:", c.execute(
    "SELECT count(*), sum(id) FROM e WHERE upper(s) >= 'WORD-02000' "
    "AND upper(s) <= 'WORD-02005'").fetchone())
print("pages:", c.execute("PRAGMA page_count").fetchone()[0])
db.close()
print("wrote", out, os.path.getsize(out), "bytes")
