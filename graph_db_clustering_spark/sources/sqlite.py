"""SQLite database source: pure-Python b-tree walk, no drivers.

The SQLite file format (sqlite.org/fileformat2.html — public, frozen)
is a paged b-tree: a 100-byte header fixes the page size, page 1 holds
the `sqlite_master` catalog (table name -> root page + CREATE sql),
and each table is a b-tree of leaf cells carrying (rowid, record),
records self-describing via serial-type codes (text in the header's
declared encoding — UTF-8 or UTF-16le/be, round 10). This reader walks
interior/leaf table pages, follows overflow chains, decodes records,
and aliases INTEGER PRIMARY KEY columns to the rowid (the format
stores them as NULL) — enough to lift ordinary tables out of the
billions of .sqlite files in the wild.

Unlike the repo's self-paired codecs, the FIXTURES here come from the
real engine: tests build databases with Python's stdlib sqlite3 and
this reader must agree — external validation, not roundtrip
self-consistency.

WAL mode (round 9): a database in journal_mode=WAL keeps committed-but
-not-yet-checkpointed pages in a sibling `<db>-wal` file
(sqlite.org/walformat.html — public, frozen). The reader pairs each
database with its -wal sibling and replays the valid frame chain — a
read-only checkpoint: salts must match the WAL header, the cumulative
s0/s1 checksum chain must hold (byte order per the magic), frames past
the last commit frame are discarded, and the last commit frame's
db-size truncates/extends the page image. A WAL-mode database with no
(or an empty/invalid-header) -wal file reads from the main file alone,
exactly as SQLite itself does.

Distribution: binaryFile + a groupBy(database-stem) applyInPandas so a
database and its -wal land in the same task; each task decodes its own
blob(s). WITHOUT ROWID tables (round 10) read too: they live in an
INDEX b-tree (interior cells carry real records — each key appears
exactly once in the tree) whose record order is PRIMARY KEY columns
first; the reader permutes back to declared order. Hot -journal
siblings are ignored (rollback journals carry pre-images, not new
data).
"""

from __future__ import annotations

import io
import re
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from graph_db_clustering_spark.sources.files import read_binary_dir


class SqliteError(ValueError):
    pass


def _varint(b: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for i in range(8):
        byte = b[pos + i]
        v = (v << 7) | (byte & 0x7F)
        if not byte & 0x80:
            return v, pos + i + 1
    return (v << 8) | b[pos + 8], pos + 9


def _wal_cksum(data: bytes, s0: int, s1: int, big: bool) -> tuple[int, int]:
    """The WAL cumulative checksum: pairs of u32 words (byte order per
    the WAL magic), s0 += x0 + s1; s1 += x1 + s0, mod 2^32."""
    fmt = ">II" if big else "<II"
    for i in range(0, len(data), 8):
        x0, x1 = struct.unpack(fmt, data[i : i + 8])
        s0 = (s0 + x0 + s1) & 0xFFFFFFFF
        s1 = (s1 + x1 + s0) & 0xFFFFFFFF
    return s0, s1


def _wal_replay(wal: bytes, page_size: int) -> tuple[dict, int | None]:
    """Parse a -wal file into {page_number: page_bytes} for every frame
    in the valid committed chain, plus the final committed database
    size in pages (None if no commit frame). Invalid header / salt
    mismatch / broken checksum chain ends the chain, per the format:
    such frames were never committed."""
    if len(wal) < 32:
        return {}, None
    magic, _ver, psz, _ckpt, salt1, salt2, c1, c2 = struct.unpack(
        ">8I", wal[:32]
    )
    if magic not in (0x377F0682, 0x377F0683):
        raise SqliteError(f"sqlite: bad WAL magic {magic:#x}")
    big = magic == 0x377F0683
    if psz != page_size:
        raise SqliteError(
            f"sqlite: WAL page size {psz} != database page size {page_size}"
        )
    s0, s1 = _wal_cksum(wal[:24], 0, 0, big)
    if (s0, s1) != (c1, c2):
        return {}, None  # stale/zeroed header: WAL holds nothing live
    pages: dict = {}
    pending: dict = {}
    dbsize = None
    off = 32
    while off + 24 + psz <= len(wal):
        pno, dbs, fs1, fs2, fc1, fc2 = struct.unpack(">6I", wal[off : off + 24])
        if (fs1, fs2) != (salt1, salt2):
            break
        s0, s1 = _wal_cksum(wal[off : off + 8], s0, s1, big)
        s0, s1 = _wal_cksum(wal[off + 24 : off + 24 + psz], s0, s1, big)
        if (s0, s1) != (fc1, fc2):
            break
        pending[pno] = wal[off + 24 : off + 24 + psz]
        if dbs:  # commit frame: everything pending becomes durable
            pages.update(pending)
            pending = {}
            dbsize = dbs
        off += 24 + psz
    return pages, dbsize


class _Db:
    def __init__(self, blob: bytes, wal: bytes | None = None):
        if blob[:16] != b"SQLite format 3\x00":
            raise SqliteError("sqlite: bad magic")
        self.page_size = struct.unpack(">H", blob[16:18])[0]
        if self.page_size == 1:
            self.page_size = 65536
        if blob[18] == 2 and wal:  # WAL mode with live frames: replay
            pages, dbsize = _wal_replay(wal, self.page_size)
            if pages:
                npages = max(
                    dbsize or 0,
                    len(blob) // self.page_size,
                    max(pages),
                )
                img = bytearray(npages * self.page_size)
                img[: len(blob)] = blob
                for pno, data in pages.items():
                    img[(pno - 1) * self.page_size : pno * self.page_size] = data
                if dbsize:
                    img = img[: dbsize * self.page_size]
                blob = bytes(img)
        self.blob = blob
        self.reserved = blob[20]
        self.usable = self.page_size - self.reserved
        enc = struct.unpack(">I", blob[56:60])[0]
        if enc not in (0, 1, 2, 3):
            raise SqliteError(f"sqlite: unknown text encoding {enc}")
        # 1 = UTF-8 (0 only in empty/legacy headers), 2/3 = UTF-16le/be
        self.text_enc = {2: "utf-16-le", 3: "utf-16-be"}.get(enc, "utf-8")

    def page(self, n: int) -> bytes:
        off = (n - 1) * self.page_size
        return self.blob[off : off + self.page_size]

    # -- record decoding ----------------------------------------------------

    def _payload(
        self, page: bytes, pos: int, plen: int, base_off: int,
        index: bool = False,
    ) -> bytes:
        """Assemble a cell payload, following the overflow chain. The
        max-local threshold X differs by tree kind (fileformat2 §B-tree
        Pages): table leaves spill past U-35; INDEX pages (both levels)
        past ((U-12)*64/255)-23."""
        u = self.usable
        x = ((u - 12) * 64) // 255 - 23 if index else u - 35
        if plen <= x:
            return self.blob[base_off + pos : base_off + pos + plen]
        m = ((u - 12) * 32) // 255 - 23
        k = m + (plen - m) % (u - 4)
        local = k if k <= x else m
        out = bytearray(self.blob[base_off + pos : base_off + pos + local])
        nxt = struct.unpack(
            ">I", self.blob[base_off + pos + local : base_off + pos + local + 4]
        )[0]
        while nxt and len(out) < plen:
            pg = self.page(nxt)
            nxt = struct.unpack(">I", pg[:4])[0]
            out += pg[4 : 4 + min(u - 4, plen - len(out))]
        return bytes(out)

    def _record(self, payload: bytes, rowid: int) -> list:
        hlen, pos = _varint(payload, 0)
        types = []
        while pos < hlen:
            t, pos = _varint(payload, pos)
            types.append(t)
        out = []
        for t in types:
            if t == 0:
                out.append(None)
            elif 1 <= t <= 6:
                n = {1: 1, 2: 2, 3: 3, 4: 4, 5: 6, 6: 8}[t]
                out.append(int.from_bytes(payload[pos : pos + n], "big", signed=True))
                pos += n
            elif t == 7:
                out.append(struct.unpack(">d", payload[pos : pos + 8])[0])
                pos += 8
            elif t in (8, 9):
                out.append(t - 8)
            elif t >= 12 and t % 2 == 0:
                n = (t - 12) // 2
                out.append(payload[pos : pos + n])
                pos += n
            elif t >= 13:
                n = (t - 13) // 2
                out.append(payload[pos : pos + n].decode(self.text_enc))
                pos += n
            else:
                raise SqliteError(f"sqlite: reserved serial type {t}")
        return out

    # -- b-tree walk --------------------------------------------------------

    def rows(self, root: int):
        """Yield (rowid, values) for every row of the table b-tree."""
        stack = [root]
        while stack:
            pno = stack.pop()
            base = (pno - 1) * self.page_size
            pg = self.page(pno)
            hdr = 100 if pno == 1 else 0
            ptype = pg[hdr]
            ncells = struct.unpack(">H", pg[hdr + 3 : hdr + 5])[0]
            ptr0 = hdr + (12 if ptype in (2, 5) else 8)
            ptrs = [
                struct.unpack(">H", pg[ptr0 + 2 * i : ptr0 + 2 * i + 2])[0]
                for i in range(ncells)
            ]
            if ptype == 5:  # interior table page
                for p in ptrs:
                    stack.append(struct.unpack(">I", pg[p : p + 4])[0])
                stack.append(struct.unpack(">I", pg[hdr + 8 : hdr + 12])[0])
            elif ptype == 13:  # leaf table page
                for p in ptrs:
                    plen, pos = _varint(pg, p)
                    rowid, pos = _varint(pg, pos)
                    payload = self._payload(pg, pos, plen, base)
                    yield rowid, self._record(payload, rowid)
            elif ptype == 2:  # interior INDEX page (WITHOUT ROWID)
                # index b-trees store each key exactly ONCE: interior
                # cells carry real records too, not just separators
                for p in ptrs:
                    stack.append(struct.unpack(">I", pg[p : p + 4])[0])
                    plen, pos = _varint(pg, p + 4)
                    payload = self._payload(pg, pos, plen, base, index=True)
                    yield None, self._record(payload, 0)
                stack.append(struct.unpack(">I", pg[hdr + 8 : hdr + 12])[0])
            elif ptype == 10:  # leaf INDEX page (WITHOUT ROWID)
                for p in ptrs:
                    plen, pos = _varint(pg, p)
                    payload = self._payload(pg, pos, plen, base, index=True)
                    yield None, self._record(payload, 0)
            else:
                raise SqliteError(f"sqlite: unexpected page type {ptype}")

    def master(self) -> list[tuple]:
        """(type, name, rootpage, sql) rows from sqlite_master."""
        out = []
        for _rid, rec in self.rows(1):
            out.append((rec[0], rec[1], rec[3], rec[4]))
        return out


def _table_info(
    db: _Db, table: str
) -> tuple[int, list[str], int | None, list[int] | None]:
    """-> (root page, declared column names, integer-pk index or None,
    record-order permutation or None). Ordinary tables store records
    in declared order (perm None) with the INTEGER PRIMARY KEY
    aliased to the rowid (ipk). WITHOUT ROWID tables store rows in an
    INDEX b-tree whose record puts the PRIMARY KEY columns FIRST (in
    PK-declaration order) followed by the rest in declared order —
    perm[i] = the declared position of record column i; no rowid
    aliasing exists there."""
    for typ, name, root, sql in db.master():
        if typ == "table" and name == table:
            cols = _parse_columns(sql or "")
            names = [c for c, _ in cols]
            if sql and re.search(r"WITHOUT\s+ROWID", sql, re.I):
                pk = _pk_columns(sql, cols)
                if not pk:
                    raise SqliteError(
                        f"sqlite: WITHOUT ROWID table {table!r} has no "
                        "parseable PRIMARY KEY"
                    )
                order = pk + [c for c in names if c not in pk]
                perm = [names.index(c) for c in order]
                return root, names, None, perm
            ipk = next(
                (
                    i
                    for i, (cname, ctype) in enumerate(cols)
                    if ctype.split()
                    and re.fullmatch(r"INTEGER", ctype.split()[0], re.I)
                    and re.search(r"PRIMARY\s+KEY", ctype, re.I)
                ),
                None,
            )
            return root, names, ipk, None
    raise SqliteError(f"sqlite: table {table!r} not found")


def _pk_columns(sql: str, cols: list[tuple[str, str]]) -> list[str]:
    """PRIMARY KEY column names in PK order: a table-level
    PRIMARY KEY(a, b ...) constraint wins; else the column-level
    marker. DESC/ASC/COLLATE decorations are stripped."""
    body = sql[sql.index("(") + 1 : sql.rindex(")")]
    m = re.search(
        r"(?:CONSTRAINT\s+\S+\s+)?PRIMARY\s+KEY\s*\(([^)]*)\)", body, re.I
    )
    if m:
        out = []
        for part in m.group(1).split(","):
            name = part.strip().split()[0]
            out.append(name.strip('"`[]'))
        return out
    return [
        c
        for c, ctype in cols
        if re.search(r"PRIMARY\s+KEY", ctype, re.I)
    ]


def _apply_perm(rec: list, perm: list | None, n: int) -> list:
    """Record -> declared order, padded: ordinary tables (perm None)
    pass through; WITHOUT ROWID records are PK-first and permute back.
    Missing trailing columns (added by ALTER, or NULL-suppressed) pad
    as None."""
    rec = (rec + [None] * n)[:n]
    if perm is None:
        return rec
    out = [None] * n
    for rpos, dpos in enumerate(perm):
        out[dpos] = rec[rpos]
    return out


def _parse_columns(sql: str) -> list[tuple[str, str]]:
    """CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT, ...) -> column
    (name, tail) pairs — depth-aware comma split, table constraints
    (PRIMARY KEY(..), UNIQUE(..), CHECK, FOREIGN KEY) skipped."""
    body = sql[sql.index("(") + 1 : sql.rindex(")")]
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    cols = []
    for p in parts:
        p = p.strip()
        if re.match(r"(PRIMARY|UNIQUE|CHECK|FOREIGN|CONSTRAINT)\b", p, re.I):
            continue
        m = re.match(r'(?:"([^"]+)"|\[([^\]]+)\]|`([^`]+)`|(\w+))\s*(.*)', p, re.S)
        name = next(g for g in m.groups()[:4] if g is not None)
        cols.append((name, m.group(5) or ""))
    return cols


_SIBLING_RE = r"(-wal|-shm|-journal)$"


def read_sqlite(
    spark: SparkSession, path: str, table: str, glob: str = "*.sqlite*"
) -> DataFrame:
    """Read `table` from every SQLite file under `path` as one
    all-strings-free DataFrame: columns surface with their decoded
    Python types mapped to (long/double/string/binary) per SQLite's
    dynamic typing — a column mixing ints and text raises (pick one).
    The driver decodes only the FIRST file's catalog; table pages
    decode in each file's own executor task. A database and its -wal
    sibling are grouped into the same task (groupBy on the filename
    stem) so WAL frames replay next to their main file; -shm files
    (just an index over the -wal) and -journal files (rollback
    pre-images) are ignored."""
    from pyspark.sql import functions as F

    files = read_binary_dir(spark, path, glob)
    if glob and not glob.endswith("*"):
        # A glob like '*.db' lists main files but NOT their 'x.db-wal'
        # siblings; without the WAL a live database silently reads its
        # stale pre-checkpoint image (committed rows missing, deleted
        # rows resurrected). List the -wal siblings explicitly and
        # union; dropDuplicates keeps globs that already matched them
        # (the default '*.sqlite*') from double-counting.
        wal_sibs = read_binary_dir(spark, path, glob + "-wal")
        files = files.unionByName(wal_sibs).dropDuplicates(["path"])
    firsts = (
        files.filter(~F.col("path").rlike(_SIBLING_RE))
        .select("path", "content")
        .orderBy("path")
        .limit(1)
        .collect()
    )
    if not firsts:
        raise SqliteError(f"sqlite: no files matching {glob!r} under {path}")
    first = firsts[0]
    wal0 = (
        files.filter(F.col("path") == first["path"] + "-wal")
        .select("content")
        .first()
    )
    db0 = _Db(
        bytes(first["content"]),
        wal=bytes(wal0["content"]) if wal0 else None,
    )
    root0, cols, ipk, perm0 = _table_info(db0, table)
    sample = []
    for _rid, rec in db0.rows(root0):
        sample.append(_apply_perm(rec, perm0, len(cols)))
        if len(sample) >= 100:
            break
    types = []
    for i, c in enumerate(cols):
        vals = [r[i] for r in sample if i < len(r) and r[i] is not None]
        if i == ipk:
            types.append("long")
        elif all(isinstance(v, int) for v in vals) and vals:
            types.append("long")
        elif all(isinstance(v, (int, float)) for v in vals) and vals:
            types.append("double")
        elif all(isinstance(v, bytes) for v in vals) and vals:
            types.append("binary")
        else:
            types.append("string")
    ddl = ", ".join(f"{c} {t}" for c, t in zip(cols, types))
    n_cols = len(cols)

    def decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        main = wal = None
        for p, blob in zip(pdf["path"], pdf["content"]):
            if p.endswith("-wal"):
                wal = bytes(blob)
            elif p.endswith("-shm") or p.endswith("-journal"):
                continue
            else:
                main = bytes(blob)
        if main is None:  # orphan sibling files: nothing to read
            return pd.DataFrame({c: [] for c in cols})
        db = _Db(main, wal=wal)
        root, _cols, ipk_i, perm_i = _table_info(db, table)
        data = []
        for rowid, rec in db.rows(root):
            rec = _apply_perm(rec, perm_i, n_cols)
            if ipk_i is not None and rowid is not None:
                rec[ipk_i] = rowid
            data.append(rec)
        out = pd.DataFrame(data, columns=cols, dtype=object)
        for c, t in zip(cols, types):
            if t == "double":
                out[c] = out[c].astype("float64")
        return out

    grouped = files.select(
        F.regexp_replace("path", _SIBLING_RE, "").alias("stem"),
        "path",
        "content",
    )
    return grouped.groupBy("stem").applyInPandas(decode_group, ddl)
