#!/usr/bin/env python3
"""Auto-vacuum SQLite fixtures for SqliteFileSpec (round 14).

Databases created with PRAGMA auto_vacuum=FULL / INCREMENTAL carry
POINTER-MAP (ptrmap) pages at fixed intervals (file-format doc §1.5:
first at page 2, then every (usable/5)+1 pages) and relocate b-tree
pages on vacuum, rewriting rootpage numbers in sqlite_schema. A reader
that walks ROOTPAGE POINTERS (like graft's SqliteFile) must be immune;
a reader that walked pages sequentially would decode a ptrmap page as
a b-tree page and produce garbage. These fixtures pin the immunity
against CPython's canonical sqlite3:

  autovac_full.db   auto_vacuum=FULL, bulk insert + delete half +
                    re-insert (forces page churn + truncation), two
                    tables incl. overflow-length rows
  autovac_incr.db   auto_vacuum=INCREMENTAL, same churn, then
                    PRAGMA incremental_vacuum (explicit relocation)

Expected values are sqlite's own aggregates, printed for the spec.
"""
import os
import sqlite3
import struct
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/sqlite"


def build(path: str, mode: str):
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute(f"PRAGMA auto_vacuum={mode}")
    cur.execute("PRAGMA page_size=1024")  # small pages → many ptrmap entries
    cur.execute("VACUUM")  # apply auto_vacuum before first table
    cur.execute("CREATE TABLE items(id INTEGER PRIMARY KEY, k INTEGER, "
                "s TEXT)")
    cur.execute("CREATE TABLE blobs(id INTEGER PRIMARY KEY, payload TEXT)")
    # enough rows to span many pages (ptrmap interval at 1 KiB pages is
    # ~205 pages, so force well past the second ptrmap page)
    cur.executemany("INSERT INTO items(k, s) VALUES (?, ?)",
                    [(i * 7 % 1000, f"value-{i:05d}-" + "x" * (i % 40))
                     for i in range(8000)])
    # overflow rows: > usable page size forces overflow chains
    cur.executemany("INSERT INTO blobs(payload) VALUES (?)",
                    [(f"B{i}:" + ("ab" * 2500),) for i in range(40)])
    con.commit()
    # churn: delete half, re-insert some → freelist or vacuum moves
    cur.execute("DELETE FROM items WHERE id % 2 = 0")
    cur.executemany("INSERT INTO items(k, s) VALUES (?, ?)",
                    [(i, f"re-{i}") for i in range(500)])
    cur.execute("DELETE FROM blobs WHERE id <= 10")
    con.commit()
    if mode == "INCREMENTAL":
        cur.execute("PRAGMA incremental_vacuum")
        con.commit()
    expect = {
        "items_n": cur.execute("SELECT count(*) FROM items").fetchone()[0],
        "items_sum_k": cur.execute("SELECT sum(k) FROM items").fetchone()[0],
        "items_sum_len": cur.execute(
            "SELECT sum(length(s)) FROM items").fetchone()[0],
        "blobs_n": cur.execute("SELECT count(*) FROM blobs").fetchone()[0],
        "blobs_sum_len": cur.execute(
            "SELECT sum(length(payload)) FROM blobs").fetchone()[0],
        "roots": dict(cur.execute(
            "SELECT name, rootpage FROM sqlite_schema "
            "WHERE type='table'").fetchall()),
    }
    con.close()
    hdr = open(path, "rb").read(100)
    expect["autovac_hdr"] = struct.unpack(">I", hdr[52:56])[0]
    expect["incr_hdr"] = struct.unpack(">I", hdr[64:68])[0]
    assert expect["autovac_hdr"] != 0, "auto_vacuum did not engage"
    return expect


for name, mode in [("autovac_full.db", "FULL"),
                   ("autovac_incr.db", "INCREMENTAL")]:
    e = build(os.path.join(OUT, name), mode)
    print(name, e)
