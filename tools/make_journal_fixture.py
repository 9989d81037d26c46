#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/fixture_journal.db{,-journal} —
the HOT-ROLLBACK-JOURNAL fixture for graft.sources.SqliteJournal
(round 14; the symmetric twin of make_wal_fixture.py). Built with
CPython's stdlib sqlite3 so the journal bytes come from the canonical
library.

Construction:
  1. baseline table committed in DELETE journal mode — these are the
     aggregates the reader must reproduce;
  2. cache_size=2 (pages) so an in-flight transaction SPILLS dirty
     pages into the main file mid-transaction (sqlite journals each
     page's pre-image first — that ordering is the whole recovery
     contract);
  3. one BIG uncommitted transaction: UPDATE over most rows (dirties
     data pages), big INSERTs (APPENDS pages past the baseline size),
     DROP-less schema change via CREATE TABLE (dirties page 1);
  4. db + -journal copied aside WHILE THE TRANSACTION IS OPEN: the
     main-file copy contains uncommitted spilled pages AND is longer
     than the baseline — NOT a readable snapshot on its own;
  5. the connection then rolls back, and we print sqlite's own
     post-rollback aggregates — they must equal the baseline, and the
     reader must reproduce them FROM THE TORN COPY.

Prints the invariants the spec pins.
"""
import os, shutil, sqlite3

tmp = "/tmp/graft_journal_fixture.db"
out = "src/test/resources/sqlite/fixture_journal.db"
os.makedirs(os.path.dirname(out), exist_ok=True)
for p in (tmp, tmp + "-journal", out, out + "-journal"):
    if os.path.exists(p):
        os.remove(p)

db = sqlite3.connect(tmp)
c = db.cursor()
c.execute("PRAGMA page_size = 4096")
c.execute("PRAGMA journal_mode = DELETE")
c.execute("""CREATE TABLE acct (
  id INTEGER PRIMARY KEY, grp INTEGER, label TEXT, bal REAL)""")
c.executemany("INSERT INTO acct VALUES (?,?,?,?)",
              [(i, i % 11, "acct-%05d" % i, (i % 401) / 4.0)
               for i in range(1, 4001)])
db.commit()

baseline = {}
for name, q in [
    ("agg", "SELECT count(*), sum(grp), sum(length(label)), sum(bal) FROM acct"),
    ("ids", "SELECT min(id), max(id) FROM acct"),
    ("tables", "SELECT count(*) FROM sqlite_master WHERE type='table'"),
]:
    baseline[name] = c.execute(q).fetchone()
    print("baseline", name, "->", baseline[name])
main_size_before = os.path.getsize(tmp)

# tiny page cache -> the big transaction below MUST spill to the main
# file mid-flight (after journaling pre-images)
c.execute("PRAGMA cache_size = 2")
c.execute("BEGIN")
c.execute("UPDATE acct SET label = 'dirty-' || id, bal = bal + 1000 "
          "WHERE id % 2 = 0")
c.executemany("INSERT INTO acct VALUES (?,?,?,?)",
              [(i, i % 11, "uncommitted-%05d" % i, 0.0)
               for i in range(4001, 6001)])
c.execute("CREATE TABLE ghost (k INTEGER PRIMARY KEY, v TEXT)")
c.executemany("INSERT INTO ghost VALUES (?,?)",
              [(i, "g%d" % i) for i in range(1, 501)])

# copy WHILE the transaction is open: torn main + hot journal
shutil.copyfile(tmp, out)
shutil.copyfile(tmp + "-journal", out + "-journal")
main_mid = os.path.getsize(out)
jrn_size = os.path.getsize(out + "-journal")

db.rollback()
# sqlite's own recovery answer — must equal the baseline
for name, q in [
    ("agg", "SELECT count(*), sum(grp), sum(length(label)), sum(bal) FROM acct"),
    ("ids", "SELECT min(id), max(id) FROM acct"),
    ("tables", "SELECT count(*) FROM sqlite_master WHERE type='table'"),
]:
    got = c.execute(q).fetchone()
    assert got == baseline[name], (name, got, baseline[name])
print("post-rollback == baseline (sqlite's own recovery)")
db.close()

dirty = main_mid > main_size_before
print(f"main baseline={main_size_before} mid-txn-copy={main_mid} "
      f"(grew: {dirty}) journal={jrn_size}")
assert dirty, "transaction did not spill/append - fixture would be trivial"
