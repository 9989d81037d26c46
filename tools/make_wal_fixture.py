#!/usr/bin/env python3
"""Generate src/test/resources/sqlite/fixture_wal.db{,-wal} — the
committed WAL-mode test fixture for graft.sources.SqliteWal +
SqliteFile (round 13). Built with CPython's stdlib sqlite3 so the wal
bytes are produced by the canonical library.

Construction:
  1. base table written + committed in DELETE journal mode -> the main
     file holds the pre-WAL state;
  2. journal_mode=WAL, wal_autocheckpoint=0 (nothing migrates back);
  3. three committed WAL transactions: UPDATE (overrides existing
     pages), INSERT (appends pages past the main file's end), DELETE +
     CREATE TABLE (page-1 / sqlite_master override) + inserts into the
     new table;
  4. db + wal copied aside WHILE THE CONNECTION IS OPEN (closing would
     checkpoint and delete the wal — exactly the state a live
     application leaves on disk);
  5. two synthetic frames appended to the COPY: one checksum-VALID
     non-commit frame (an in-flight transaction's spill — must be
     ignored: it follows the last commit) and one salt-mismatched
     garbage frame (a stale/torn tail — must cut validation there).

The main file is NOT a readable snapshot on its own (its sqlite_master
still lacks `walnew`, its rows are pre-update) — which is the point:
only the wal replay sees the committed state. Prints the invariants
the spec pins.
"""
import os, shutil, sqlite3, struct

tmp = "/tmp/graft_wal_fixture.db"
out = "src/test/resources/sqlite/fixture_wal.db"
os.makedirs(os.path.dirname(out), exist_ok=True)
for p in (tmp, tmp + "-wal", out, out + "-wal"):
    if os.path.exists(p):
        os.remove(p)

db = sqlite3.connect(tmp)
c = db.cursor()
c.execute("PRAGMA page_size = 4096")
c.execute("PRAGMA journal_mode = DELETE")
c.execute("""CREATE TABLE kv (
  id INTEGER PRIMARY KEY, grp INTEGER, v TEXT, amount REAL)""")
c.executemany("INSERT INTO kv VALUES (?,?,?,?)",
              [(i, i % 13, "base-%04d" % i, (i % 101) / 4.0)
               for i in range(1, 3001)])
db.commit()
db.close()
main_size_before = os.path.getsize(tmp)

db = sqlite3.connect(tmp)
c = db.cursor()
assert c.execute("PRAGMA journal_mode = WAL").fetchone()[0] == "wal"
c.execute("PRAGMA wal_autocheckpoint = 0")
# txn 1: override existing pages
c.execute("UPDATE kv SET v = 'upd-' || id, amount = amount + 0.5 "
          "WHERE id % 10 = 0")
db.commit()
# txn 2: append pages past the main file's end
c.executemany("INSERT INTO kv VALUES (?,?,?,?)",
              [(i, i % 13, "wal-%04d" % i, (i % 101) / 4.0)
               for i in range(3001, 3501)])
db.commit()
# txn 3: delete + schema change (page-1 override) + new-table rows
c.execute("DELETE FROM kv WHERE id % 97 = 0")
c.execute("CREATE TABLE walnew (k INTEGER PRIMARY KEY, label TEXT)")
c.executemany("INSERT INTO walnew VALUES (?,?)",
              [(i, "w%d" % (i * i)) for i in range(1, 201)])
db.commit()

# invariants for the spec, read through the SAME live wal state
for q in [
    "SELECT count(*), sum(grp), sum(length(v)), sum(amount) FROM kv",
    "SELECT count(*) FROM kv WHERE v LIKE 'upd-%'",
    "SELECT count(*), min(id), max(id) FROM kv",
    "SELECT count(*), sum(k), sum(length(label)) FROM walnew",
]:
    print(q, "->", c.execute(q).fetchone())

# copy BEFORE close (close checkpoints + deletes the wal)
shutil.copyfile(tmp, out)
shutil.copyfile(tmp + "-wal", out + "-wal")
db.close()

print("main before WAL:", main_size_before,
      "main now:", os.path.getsize(out),
      "wal:", os.path.getsize(out + "-wal"))

# ---- append synthetic tail frames to the committed copy ----------
wal = bytearray(open(out + "-wal", "rb").read())
magic = struct.unpack(">I", wal[0:4])[0]
big = magic == 0x377F0683
ps = struct.unpack(">I", wal[8:12])[0]
salt1, salt2 = struct.unpack(">II", wal[16:24])
fmt = ">" if big else "<"

def cksum(s0, s1, buf):
    n = len(buf)
    for i in range(0, n, 8):
        x0, x1 = struct.unpack(fmt + "II", buf[i:i + 8])
        s0 = (s0 + x0 + s1) & 0xFFFFFFFF
        s1 = (s1 + x1 + s0) & 0xFFFFFFFF
    return s0, s1

# replay the real frames to get the running checksum at the tail
s0, s1 = cksum(0, 0, wal[0:24])
assert (s0, s1) == struct.unpack(">II", wal[24:32]), "hdr cksum replay"
frame_size = 24 + ps
nframes = (len(wal) - 32) // frame_size
for i in range(nframes):
    off = 32 + i * frame_size
    fh = wal[off:off + 24]
    assert struct.unpack(">II", fh[8:16]) == (salt1, salt2)
    t0, t1 = cksum(s0, s1, fh[0:8])
    u0, u1 = cksum(t0, t1, wal[off + 24:off + frame_size])
    assert (u0, u1) == struct.unpack(">II", fh[16:24]), f"frame {i}"
    s0, s1 = u0, u1
print("replayed", nframes, "frames, cumulative cksum ok")

# frame A: checksum-VALID, commit size 0 (uncommitted spill) — content
# is a bogus copy of some page; the reader must NOT apply it
pageA = bytes((i * 7 + 3) & 0xFF for i in range(ps))
fhA = struct.pack(">IIII", 2, 0, salt1, salt2)
t0, t1 = cksum(s0, s1, fhA)
u0, u1 = cksum(t0, t1, pageA)
wal += fhA + struct.pack(">II", u0, u1) + pageA

# frame B: salt-mismatched garbage (stale tail) — validation must cut
pageB = bytes((i * 13 + 1) & 0xFF for i in range(ps))
fhB = struct.pack(">IIII", 3, 1, salt1 ^ 0xDEADBEEF, salt2)
wal += fhB + struct.pack(">II", 0, 0) + pageB

open(out + "-wal", "wb").write(bytes(wal))
print("wrote", out, os.path.getsize(out), "bytes;",
      out + "-wal", os.path.getsize(out + "-wal"), "bytes",
      "(%d real + 2 synthetic tail frames)" % nframes)
