#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/fixture_utf16le.db and
fixture_utf16be.db — CPython-sqlite3-written databases in the two
UTF-16 text encodings (PRAGMA encoding), for graft.sources.SqliteFile's
round-14 encoding support. Text serial types then store raw UTF-16
bytes (the serial-type length stays a BYTE count); sqlite_master's own
sql column is UTF-16 too, so schema parsing exercises the decode as
well.

Content exercises what UTF-8 fixtures cannot:
  - non-ASCII across the BMP (accents, CJK) and ABOVE it (emoji —
    surrogate PAIRS in UTF-16),
  - a ~20 KB text -> overflow chain whose page cuts can fall MID
    code unit (decode happens after payload reassembly, but the cut
    positions differ from the UTF-8 twin),
  - NULL / int / float / blob columns alongside (unaffected by
    encoding — proves the decode branch only touches text).

Prints sqlite's OWN aggregates for the spec to pin.
"""
import os
import sqlite3

ROWS = [
    (1, "héllo wörld", "café", 10, 2.5),
    (2, "中文文本",        # CJK
     "\U0001F600\U0001F680 pair",          # emoji = surrogate pairs
     -20, -0.25),
    (3, "plain ascii", None, 30, 0.0),
    (4, "", "mixed ßå世界\U0001F409", 40, 1e10),
]


def build(path: str, encoding: str) -> None:
    if os.path.exists(path):
        os.remove(path)
    db = sqlite3.connect(path)
    c = db.cursor()
    c.execute(f"PRAGMA encoding = '{encoding}'")
    c.execute("PRAGMA page_size = 4096")
    c.execute("PRAGMA journal_mode = DELETE")
    c.execute("""CREATE TABLE tx (
      id INTEGER PRIMARY KEY, t TEXT, u TEXT, n INTEGER, r REAL)""")
    c.executemany("INSERT INTO tx VALUES (?,?,?,?,?)", ROWS)
    # overflow-chain text: 2500 CJK chars = 5000 UTF-16 bytes + a long
    # ascii run -> multi-page payload
    big = "汉" * 2500 + "x" * 18000
    c.execute("INSERT INTO tx VALUES (5, ?, 'tail', 50, 3.5)", (big,))
    c.execute("CREATE TABLE bin (id INTEGER PRIMARY KEY, b BLOB)")
    c.execute("INSERT INTO bin VALUES (1, x'DEADBEEF')")
    db.commit()

    # sqlite's own numbers for the spec to pin
    enc = c.execute("PRAGMA encoding").fetchone()[0]
    n, sn = c.execute("SELECT count(*), sum(n) FROM tx").fetchone()
    # length() counts CODE POINTS in sqlite (like python len)
    lt = c.execute("SELECT sum(length(t)) FROM tx").fetchone()[0]
    t2, u2 = c.execute("SELECT t, u FROM tx WHERE id = 2").fetchone()
    print(f"{path}: encoding={enc} rows={n} sum_n={sn} "
          f"sum_len_t={lt} t2={t2!r} u2={u2!r} big_len={len(big)}")
    db.close()


os.makedirs("src/test/resources/sqlite", exist_ok=True)
build("src/test/resources/sqlite/fixture_utf16le.db", "UTF-16le")
build("src/test/resources/sqlite/fixture_utf16be.db", "UTF-16be")
