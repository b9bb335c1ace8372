"""sources/sqlite: pure-Python b-tree reader validated against REAL
databases produced by Python's stdlib sqlite3 engine — multi-page
tables, overflow chains, all serial types, rowid aliasing, gates."""

from __future__ import annotations

import os
import sqlite3

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.sources.sqlite import (
    SqliteError,
    _Db,
    read_sqlite,
)


def _make_db(path, rows=3000, with_blob=True):
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE docs (id INTEGER PRIMARY KEY, name TEXT, score REAL,"
        " n INTEGER, payload BLOB)"
    )
    data = [
        (
            i,
            f"name-{i}" * (1 + i % 3),
            i / 7.0,
            i * 1000,
            (b"\x00\x01" * (i % 5)) if with_blob else None,
        )
        for i in range(1, rows + 1)
    ]
    con.executemany("INSERT INTO docs VALUES (?,?,?,?,?)", data)
    con.commit()
    con.close()
    return data


def test_sqlite_reads_real_engine_files(spark, tmp_path):
    d = tmp_path / "dbs"
    d.mkdir()
    data1 = _make_db(str(d / "a.sqlite"), rows=2500)   # multi-page b-tree
    data2 = _make_db(str(d / "b.sqlite"), rows=40)
    df = read_sqlite(spark, str(d), "docs")
    assert df.count() == len(data1) + len(data2)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string", "double", "bigint", "binary",
    ]
    got = {(r.id, r.name, round(r.score, 9), r.n) for r in df.collect() if r.id <= 40}
    want = {(i, n, round(s, 9), num) for i, n, s, num, _ in data1 if i <= 40} | {
        (i, n, round(s, 9), num) for i, n, s, num, _ in data2 if i <= 40
    }
    # both dbs contribute ids <= 40 (identical content by construction)
    assert {g[0] for g in got} == set(range(1, 41))
    assert got <= want


def test_sqlite_overflow_and_negative_and_null(spark, tmp_path):
    """A row whose TEXT spans multiple overflow pages decodes intact;
    negative ints and NULLs survive; 8/9 serial types (0/1 literals)
    decode."""
    p = str(tmp_path / "o.sqlite")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, body TEXT, k INTEGER)")
    big = "xyz" * 50000  # 150 KB >> page size -> overflow chain
    con.execute("INSERT INTO t VALUES (1, ?, -987654321)", (big,))
    con.execute("INSERT INTO t VALUES (2, NULL, 0)")
    con.execute("INSERT INTO t VALUES (3, 'small', 1)")
    con.commit()
    con.close()
    d = tmp_path  # glob matches o.sqlite
    df = read_sqlite(spark, str(d), "t")
    rows = {r.id: (r.body, r.k) for r in df.collect()}
    assert rows[1] == (big, -987654321)
    assert rows[2] == (None, 0)
    assert rows[3] == ("small", 1)


def test_sqlite_gates(spark, tmp_path):
    p = str(tmp_path / "w.sqlite")
    con = sqlite3.connect(p)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("CREATE TABLE t (a INTEGER)")
    con.execute("INSERT INTO t VALUES (1)")
    con.commit()
    con.close()
    # a checkpointed WAL-mode database (close() checkpoints) reads from
    # the main file alone — exactly SQLite's own behavior
    df = read_sqlite(spark, str(tmp_path), "t", glob="w.sqlite*")
    assert [r.a for r in df.collect()] == [1]
    p2 = str(tmp_path / "wr.sqlite")
    con = sqlite3.connect(p2)
    con.execute("CREATE TABLE t2 (a TEXT PRIMARY KEY, b INT) WITHOUT ROWID")
    con.execute("INSERT INTO t2 VALUES ('x', 1)")
    con.commit()
    con.close()
    # round 10: WITHOUT ROWID reads (index b-tree, PK-first records)
    df2 = read_sqlite(spark, str(tmp_path), "t2", glob="wr.sqlite")
    assert [(r.a, r.b) for r in df2.collect()] == [("x", 1)]
    with pytest.raises(SqliteError, match="not found"):
        read_sqlite(spark, str(tmp_path), "nope", glob="wr.sqlite")


def test_sqlite_typeless_columns(spark, tmp_path):
    """SQLite allows columns with NO declared type; the parser must not
    crash and values surface via sampling-inferred types."""
    p = str(tmp_path / "nt.sqlite")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE t (a, b)")
    con.execute("INSERT INTO t VALUES ('x', 1)")
    con.execute("INSERT INTO t VALUES ('y', 2)")
    con.commit()
    con.close()
    df = read_sqlite(spark, str(tmp_path), "t", glob="nt.sqlite")
    got = sorted((r.a, r.b) for r in df.collect())
    assert got == [("x", 1), ("y", 2)]


def test_sqlite_wal_replay_matches_checkpointed_form(spark, tmp_path):
    """A LIVE WAL-mode database written by the real engine — frames
    committed but NOT checkpointed — must read identically to its
    checkpointed form: the pure-Python frame replay IS the read-only
    checkpoint. Covers multi-commit chains, page overwrites (UPDATE),
    deletes, and growth beyond the main file's page count."""
    import shutil

    src = str(tmp_path / "live.sqlite")
    con = sqlite3.connect(src)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    con.execute("CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT, c REAL)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, f"row{i}", i * 0.5) for i in range(1, 201)],
    )
    con.commit()
    # force a checkpoint so the BASE image holds the first 200 rows
    con.execute("PRAGMA wal_checkpoint(TRUNCATE)")
    # now mutate WITHOUT checkpointing: these pages live only in -wal
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, f"row{i}", i * 0.5) for i in range(201, 901)],
    )
    con.execute("UPDATE t SET b = 'patched' WHERE a <= 10")
    con.execute("DELETE FROM t WHERE a BETWEEN 50 AND 60")
    con.commit()
    want = sorted(con.execute("SELECT a, b, c FROM t").fetchall())
    # copy main + wal while the connection is still open (unflushed)
    live_dir = tmp_path / "livecopy"
    live_dir.mkdir()
    shutil.copy(src, live_dir / "live.sqlite")
    shutil.copy(src + "-wal", live_dir / "live.sqlite-wal")
    import os as _os
    assert _os.path.getsize(src + "-wal") > 32, "fixture must carry frames"
    # sanity: the stale main file ALONE lacks the new rows
    with open(live_dir / "live.sqlite", "rb") as f:
        stale = _Db(f.read())
    sroot, _, _, _ = __import__(
        "graph_db_clustering_spark.sources.sqlite", fromlist=["_table_info"]
    )._table_info(stale, "t")
    stale_n = sum(1 for _ in stale.rows(sroot))
    assert stale_n == 200

    df = read_sqlite(spark, str(live_dir), "t", glob="live.sqlite*")
    got = sorted((r.a, r.b, r.c) for r in df.collect())
    assert len(got) == len(want) == 889
    assert got == [tuple(w) for w in want]
    assert got[0][1] == "patched"
    con.close()


def test_sqlite_wal_ignores_uncommitted_tail(spark, tmp_path):
    """Frames after the last commit frame (or salt/checksum breaks) are
    not durable — a torn WAL tail must not surface phantom rows."""
    import shutil
    import struct as _struct

    src = str(tmp_path / "torn.sqlite")
    con = sqlite3.connect(src)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    con.execute("CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, f"r{i}") for i in range(1, 51)]
    )
    con.commit()
    live_dir = tmp_path / "torncopy"
    live_dir.mkdir()
    shutil.copy(src, live_dir / "torn.sqlite")
    with open(src + "-wal", "rb") as f:
        wal = bytearray(f.read())
    # corrupt the LAST frame's checksum: the chain must stop before it
    psz = _struct.unpack(">I", wal[8:12])[0]
    last = len(wal) - (24 + psz)
    wal[last + 16] ^= 0xFF
    with open(live_dir / "torn.sqlite-wal", "wb") as f:
        f.write(bytes(wal))
    df = read_sqlite(spark, str(live_dir), "t", glob="torn.sqlite*")
    n = df.count()
    # strictly fewer rows than committed (the torn commit dropped), and
    # no crash; with the intact wal the full 50 surface
    shutil.copy(src + "-wal", live_dir / "torn.sqlite-wal")
    assert read_sqlite(spark, str(live_dir), "t", glob="torn.sqlite*").count() == 50
    assert n < 50
    con.close()


def test_sqlite_wal_sibling_found_with_narrow_glob(spark, tmp_path):
    """ADVICE r9: a glob like '*.db' lists main files but not their
    'x.db-wal' siblings; the reader must load the -wal explicitly or a
    live database silently reads its stale pre-checkpoint image."""
    import shutil

    src = str(tmp_path / "live.db")
    con = sqlite3.connect(src)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    con.execute("CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, f"r{i}") for i in range(1, 51)]
    )
    con.commit()
    con.execute("PRAGMA wal_checkpoint(TRUNCATE)")
    # frames that live ONLY in the -wal sibling
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, f"r{i}") for i in range(51, 101)]
    )
    con.execute("DELETE FROM t WHERE a <= 5")
    con.commit()
    want = sorted(con.execute("SELECT a, b FROM t").fetchall())
    d = tmp_path / "narrow"
    d.mkdir()
    shutil.copy(src, d / "live.db")
    shutil.copy(src + "-wal", d / "live.db-wal")
    con.close()
    # the narrow glob does NOT match the -wal name itself
    df = read_sqlite(spark, str(d), "t", glob="*.db")
    got = sorted((r.a, r.b) for r in df.collect())
    assert got == [tuple(w) for w in want]
    assert len(got) == 95 and got[0][0] == 6


def test_sqlite_without_rowid_matches_rowid_twin(spark, tmp_path):
    """Round 10: a WITHOUT ROWID table written by the real engine reads
    identically to its rowid twin — multi-page index b-tree (interior
    cells carry real records), composite PRIMARY KEY declared mid-table
    (record order is PK-first; the reader permutes back), overflow
    payloads, WAL frames included."""
    import shutil

    p = str(tmp_path / "wor.db")
    con = sqlite3.connect(p)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    # PK columns NOT first in declaration, composite, table-level
    con.execute(
        "CREATE TABLE t (v TEXT, k1 INTEGER, w REAL, k2 TEXT, big BLOB,"
        " PRIMARY KEY (k1, k2)) WITHOUT ROWID"
    )
    con.execute(
        "CREATE TABLE twin (v TEXT, k1 INTEGER, w REAL, k2 TEXT, big BLOB,"
        " PRIMARY KEY (k1, k2))"
    )
    rows = [
        (
            f"val{i}" * (i % 4),
            i,
            i / 3.0,
            f"k{i % 997}",
            b"\x01\x02" * (2000 if i % 251 == 0 else i % 7),  # overflow
        )
        for i in range(1, 1501)
    ]
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
    con.executemany("INSERT INTO twin VALUES (?,?,?,?,?)", rows)
    con.commit()
    con.execute("PRAGMA wal_checkpoint(TRUNCATE)")
    # WAL-only mutations on the WITHOUT ROWID tree too
    con.execute("DELETE FROM t WHERE k1 BETWEEN 100 AND 120")
    con.execute("DELETE FROM twin WHERE k1 BETWEEN 100 AND 120")
    con.execute("UPDATE t SET v = 'patched' WHERE k1 <= 5")
    con.execute("UPDATE twin SET v = 'patched' WHERE k1 <= 5")
    con.commit()
    want = sorted(con.execute("SELECT v, k1, w, k2, big FROM t").fetchall())
    d = tmp_path / "live"
    d.mkdir()
    shutil.copy(p, d / "wor.db")
    shutil.copy(p + "-wal", d / "wor.db-wal")
    con.close()

    got_t = read_sqlite(spark, str(d), "t", glob="*.db")
    got_twin = read_sqlite(spark, str(d), "twin", glob="*.db")
    t_rows = sorted(
        (r.v, r.k1, r.w, r.k2, bytes(r.big)) for r in got_t.collect()
    )
    twin_rows = sorted(
        (r.v, r.k1, r.w, r.k2, bytes(r.big)) for r in got_twin.collect()
    )
    assert len(t_rows) == len(want) == 1479
    assert t_rows == [tuple(w) for w in want]
    assert t_rows == twin_rows
    assert got_t.columns == ["v", "k1", "w", "k2", "big"]


def test_sqlite_utf16_encodings(spark, tmp_path):
    """Round 10: databases created with PRAGMA encoding='UTF-16le/be'
    (the real engine writes genuinely UTF-16 records) read identically
    to their UTF-8 twin, non-ASCII text included."""
    rows = [(i, f"näme-{i}-é中") for i in range(1, 101)]
    for enc in ("UTF-16le", "UTF-16be", "UTF-8"):
        p = str(tmp_path / f"e_{enc}.db")
        con = sqlite3.connect(p)
        con.execute(f"PRAGMA encoding='{enc}'")
        con.execute("CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        con.commit()
        con.close()
        df = read_sqlite(spark, str(tmp_path), "t", glob=f"e_{enc}.db")
        got = sorted((r.a, r.b) for r in df.collect())
        assert got == rows, enc
