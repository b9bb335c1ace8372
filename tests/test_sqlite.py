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
    with open(p, "rb") as f:
        blob = f.read()
    with pytest.raises(NotImplementedError, match="WAL"):
        _Db(blob)
    p2 = str(tmp_path / "wr.sqlite")
    con = sqlite3.connect(p2)
    con.execute("CREATE TABLE t2 (a TEXT PRIMARY KEY, b INT) WITHOUT ROWID")
    con.execute("INSERT INTO t2 VALUES ('x', 1)")
    con.commit()
    con.close()
    with pytest.raises(NotImplementedError, match="WITHOUT ROWID"):
        read_sqlite(spark, str(tmp_path), "t2", glob="wr.sqlite")
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
