"""Minimal Apache Iceberg table READER: metadata + Avro-manifest
replay, no iceberg-spark runtime.

The Iceberg spec (iceberg.apache.org/spec — public) stores a table as
parquet data files plus a metadata tree: `metadata/vN.metadata.json`
(current snapshot pointer) -> a manifest LIST (Avro) -> manifest FILES
(Avro) -> data-file entries. The live file set of a snapshot is every
manifest entry with status ADDED(1)/EXISTING(0); DELETED(2) entries
drop out. All the Avro plumbing is the repo's own pure-Python
object-container codec (sources/avro) — the same machinery that makes
the Avro source work makes Iceberg's metadata readable.

Row-level deletes (round 9, format v2 merge-on-read):
- POSITION deletes (data_file.content == 1): parquet files of
  (file_path, pos) pairs; applied as a broadcast anti-join against the
  scan's hidden `_metadata` (file_path, row_index) columns — the scan
  stays one distributed parquet read, the delete side is the small one.
- EQUALITY deletes (content == 2): parquet files whose `equality_ids`
  name schema field-ids; a row is deleted when an older data file's
  row matches a delete row on those columns (null-safe) AND the data
  file's sequence number is strictly below the delete's. The scan is
  grouped by data sequence number (one union branch per distinct seq,
  bounded by commit count, not file count) so the inequality rides the
  anti-join condition JVM-side.

Partitioning (round 10): identity AND the spec's non-identity
transforms are supported — `bucket[N]` (32-bit Murmur3 over the
spec's per-type byte encodings, Appendix B), `truncate[W]`,
`year`/`month`/`day`/`hour` (epoch ordinals), and `void`. Per the
spec, Iceberg data files RETAIN source columns (unlike hive layouts),
so reads need no column injection regardless of transform; the
transform matters for PRUNING: `read_iceberg_pruned` maps source
bounds through monotonic transforms (truncate, time ordinals) to
manifest-value bounds, and point queries through `bucket`. Unknown
transforms still raise loudly.

Round 11: row-level deletes over ORC data files WORK — per-file row
ordinals are synthesized from split-block offsets
(_orc_scan_with_pos; proven equal to parquet's real row_index by a
property test). Remaining loud gates: row-level deletes over AVRO
data files (the repo's Avro decode path has no per-file ordinal
surface yet); mixed-format snapshots; unknown transforms.

Like sources/delta: only the KB-scale metadata replays on the driver;
the data scan is handed to the native parquet reader, fully
distributed.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_db_clustering_spark.sources.avro import decode_container


class IcebergError(ValueError):
    pass


def _strip_scheme(p: str) -> str:
    # Collapse ANY number of scheme slashes (file:/x, file:///x) to one
    # canonical leading slash so both sides of a delete-file anti-join
    # normalize identically regardless of the writer's URI rendering.
    return re.sub(r"^file:/*", "/", p) if p.startswith("file:") else p


def _murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (public-domain algorithm; the hash the
    Iceberg spec's bucket transform mandates, Appendix B). Returns the
    SIGNED int32, matching the spec's published test vectors."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    for i in range(0, n - n % 4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[n - n % 4 :]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= 1 << 31 else h


def _bucket_bytes(v) -> bytes:
    """The spec's per-type byte encoding for bucket hashing (Appendix
    B): int/long/date/time/timestamp as the little-endian 8-byte long,
    string as UTF-8, decimal as minimal big-endian two's complement of
    the unscaled value, uuid as its 16 bytes, binary raw; double bits
    for floats (-0.0 normalized)."""
    import datetime
    import struct
    import uuid as _uuid
    from decimal import Decimal

    if isinstance(v, bool):
        raise NotImplementedError("iceberg: bucket over boolean")
    if isinstance(v, int):
        return (v & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, datetime.datetime):
        # timestamptz hashes as micros since the UTC epoch (spec
        # Appendix B): an aware value with a +05:00 offset must NOT be
        # differenced against a +05:00 epoch, which would shift the
        # micros by the offset (ADVICE r10). Naive values stay naive.
        if v.tzinfo is not None:
            epoch = datetime.datetime(
                1970, 1, 1, tzinfo=datetime.timezone.utc
            )
        else:
            epoch = datetime.datetime(1970, 1, 1)
        micros = (v - epoch) // datetime.timedelta(microseconds=1)
        return (micros & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    if isinstance(v, datetime.date):
        days = (v - datetime.date(1970, 1, 1)).days
        return (days & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    if isinstance(v, Decimal):
        unscaled = int(v.scaleb(-v.as_tuple().exponent).to_integral_value())
        for length in range(1, 33):
            try:
                return unscaled.to_bytes(length, "big", signed=True)
            except OverflowError:
                continue
        raise IcebergError("iceberg: decimal unscaled value too wide")
    if isinstance(v, float):
        if v == 0.0:
            v = 0.0  # normalize -0.0, per spec
        (bits,) = struct.unpack("<q", struct.pack("<d", v))
        return (bits & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    if isinstance(v, _uuid.UUID):
        return v.bytes
    raise NotImplementedError(f"iceberg: bucket over {type(v).__name__}")


_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNC_RE = re.compile(r"^truncate\[(\d+)\]$")
_TIME_TRANSFORMS = {
    "year": "year", "years": "year",
    "month": "month", "months": "month",
    "day": "day", "days": "day",
    "hour": "hour", "hours": "hour",
}


def iceberg_transform(transform: str, v):
    """Apply a partition transform to a source VALUE, per the spec:
    identity; void -> null; bucket[N] = (murmur3 & MAX_INT) % N over
    the type's byte encoding; truncate[W] floors ints to W-multiples
    and prefixes strings/binary to W units; year/month/day/hour map
    date/timestamp to their ordinal since epoch (floored, so pre-1970
    values are negative). Used by pruning to map query bounds into
    manifest partition-value space."""
    import datetime

    if v is None:
        return None
    if transform == "identity":
        return v
    if transform == "void":
        return None
    m = _BUCKET_RE.match(transform)
    if m:
        return (_murmur3_32(_bucket_bytes(v)) & 0x7FFFFFFF) % int(m.group(1))
    m = _TRUNC_RE.match(transform)
    if m:
        w = int(m.group(1))
        if w <= 0:
            raise IcebergError(f"iceberg: truncate width {w}")
        if isinstance(v, bool):
            raise NotImplementedError("iceberg: truncate over boolean")
        if isinstance(v, int):
            return v - (v % w)  # Python % is floored: spec semantics
        if isinstance(v, str):
            return v[:w]
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)[:w]
        from decimal import Decimal

        if isinstance(v, Decimal):
            scale = -v.as_tuple().exponent
            unscaled = int(v.scaleb(scale).to_integral_value())
            return Decimal(unscaled - (unscaled % w)).scaleb(-scale)
        raise NotImplementedError(
            f"iceberg: truncate over {type(v).__name__}"
        )
    gran = _TIME_TRANSFORMS.get(transform)
    if gran:
        if isinstance(v, datetime.datetime):
            d, hh = v.date(), v.hour
        elif isinstance(v, datetime.date):
            d, hh = v, 0
        else:
            raise NotImplementedError(
                f"iceberg: {transform} over {type(v).__name__}"
            )
        if gran == "year":
            return d.year - 1970
        if gran == "month":
            return (d.year - 1970) * 12 + (d.month - 1)
        days = (d - datetime.date(1970, 1, 1)).days
        return days if gran == "day" else days * 24 + hh
    raise NotImplementedError(
        f"iceberg: partition transform {transform!r} not supported"
    )


def _validate_transform(transform: str) -> None:
    if (
        transform in ("identity", "void")
        or transform in _TIME_TRANSFORMS
        or _BUCKET_RE.match(transform)
        or _TRUNC_RE.match(transform)
    ):
        return
    raise NotImplementedError(
        f"iceberg: partition transform {transform!r} not supported"
    )


def _spec_fields(meta: dict) -> list[dict]:
    """Partition-spec fields of the table's default (or only) spec."""
    specs = meta.get("partition-specs") or []
    if not specs:
        return []
    sid = meta.get("default-spec-id")
    spec = next((s for s in specs if s.get("spec-id") == sid), specs[-1])
    return spec.get("fields") or []


def _metadata_file(path: str) -> str:
    mdir = os.path.join(path, "metadata")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = f.read().strip()
        return os.path.join(mdir, f"v{v}.metadata.json")
    try:
        cands = [
            n for n in os.listdir(mdir) if re.fullmatch(r"v\d+\.metadata\.json", n)
        ]
    except FileNotFoundError:
        raise IcebergError(f"no metadata directory under {path}") from None
    if not cands:
        raise IcebergError(f"no vN.metadata.json under {mdir}")
    return os.path.join(mdir, max(cands, key=lambda n: int(n[1:].split(".")[0])))


def _avro_rows(path: str) -> list[dict]:
    with open(_strip_scheme(path), "rb") as f:
        _fields, rows = decode_container(f.read())
    return rows


def _field_names_by_id(meta: dict) -> dict:
    """schema field-id -> column name, from the current schema (v2
    `schemas` list) or the v1 inline `schema`."""
    fields = None
    schemas = meta.get("schemas")
    if schemas:
        cur = meta.get("current-schema-id")
        sch = next(
            (s for s in schemas if s.get("schema-id") == cur), schemas[-1]
        )
        fields = sch.get("fields")
    elif meta.get("schema"):
        fields = meta["schema"].get("fields")
    return {f["id"]: f["name"] for f in (fields or [])}


def _snapshot_entries(
    path: str, snapshot_id: int | None = None
) -> tuple[list, list, dict]:
    """Replay metadata -> manifest list -> manifests. Returns
    (data_files, delete_files, metadata-json): each file is
    {'path', 'seq', 'content', 'equality_ids'} with sequence numbers
    inherited from the manifest-list entry when the manifest entry
    leaves them null (v2 inheritance rule)."""
    with open(_metadata_file(path)) as f:
        meta = json.load(f)
    for spec in meta.get("partition-specs", []) or []:
        for fld in spec.get("fields") or []:
            _validate_transform(fld.get("transform") or "identity")
    snaps = meta.get("snapshots", []) or []
    if not snaps:
        raise IcebergError(f"iceberg: no snapshots in {path}")
    target = (
        snapshot_id
        if snapshot_id is not None
        else meta.get("current-snapshot-id")
    )
    snap = next((s for s in snaps if s["snapshot-id"] == target), None)
    if snap is None:
        raise IcebergError(f"iceberg: snapshot {target} not found")
    data, dels = [], []
    for m in _avro_rows(snap["manifest-list"]):
        mseq = m.get("sequence_number")
        mseq = 0 if mseq is None else mseq
        # round 14: the manifest-list entry records which partition
        # spec the manifest's files were written under — carried onto
        # every file so pruning (and CoW carry-forward) can resolve
        # partition values per-file under the RIGHT spec after
        # partition evolution. Absent (older fixtures) -> spec 0,
        # the only spec the create-only writer emits.
        mspec = m.get("partition_spec_id")
        mspec = 0 if mspec is None else mspec
        for entry in _avro_rows(m["manifest_path"]):
            if entry.get("status") == 2:  # DELETED entry: drops out
                continue
            dfile = entry["data_file"]
            fmt = (dfile.get("file_format") or "").upper()
            seq = entry.get("sequence_number")
            seq = mseq if seq is None else seq
            content = dfile.get("content") or 0
            if fmt == "PUFFIN":
                # format v3: a deletion vector — valid ONLY as a
                # position-delete entry referencing a data file
                if content != 1 or not dfile.get("referenced_data_file"):
                    raise IcebergError(
                        "iceberg: PUFFIN entry must be a position "
                        "delete with referenced_data_file (v3 DV)"
                    )
            elif fmt not in ("PARQUET", "ORC", "AVRO"):
                raise NotImplementedError(f"iceberg: file format {fmt!r}")
            rec = {
                "path": _strip_scheme(dfile["file_path"]),
                "seq": seq,
                "content": content,
                "fmt": fmt,
                "equality_ids": dfile.get("equality_ids"),
                "partition": dfile.get("partition") or {},
                "record_count": dfile.get("record_count"),
                "file_size": dfile.get("file_size_in_bytes"),
                "manifest": m["manifest_path"],
                "spec_id": mspec,
            }
            if dfile.get("referenced_data_file"):
                rec["referenced_data_file"] = _strip_scheme(
                    dfile["referenced_data_file"]
                )
                rec["content_offset"] = dfile.get("content_offset")
                rec["content_size"] = dfile.get("content_size_in_bytes")
            if content == 0:
                data.append(rec)
            elif content in (1, 2):
                dels.append(rec)
            else:
                raise IcebergError(f"iceberg: unknown content {content}")
    return data, dels, meta


def iceberg_live_files(path: str, snapshot_id: int | None = None) -> list[str]:
    """Replay metadata -> manifest list -> manifests into the live
    DATA-file paths (absolute, scheme-stripped) for the current or a
    pinned snapshot (time travel). Delete files don't appear here —
    they are applied by read_iceberg, not listed as data."""
    data, _dels, _meta = _snapshot_entries(path, snapshot_id)
    return sorted({d["path"] for d in data})


_FP_NORM = r"^file:/*"


def iceberg_resolve_ref(path: str, ref: str) -> int:
    """Resolve a named BRANCH or TAG (the metadata `refs` map —
    `VERSION AS OF 'tag'` / branch reads) to its snapshot id."""
    with open(_metadata_file(path)) as f:
        meta = json.load(f)
    refs = meta.get("refs") or {}
    if ref not in refs:
        raise IcebergError(
            f"iceberg: no branch or tag {ref!r} "
            f"(known: {sorted(refs) or 'none'})"
        )
    return int(refs[ref]["snapshot-id"])


def iceberg_set_ref(
    path: str, name: str, snapshot_id: int | None = None,
    ref_type: str = "tag",
) -> int:
    """CREATE/UPDATE a named ref (tag or branch) pointing at
    `snapshot_id` (default: the current snapshot). Rolls the metadata
    file forward like every other commit; snapshot expiry must keep
    ref'd snapshots alive (iceberg_expire_snapshots enforces that)."""
    if ref_type not in ("tag", "branch"):
        raise IcebergError(f"iceberg: ref type {ref_type!r}")
    mfile = _metadata_file(path)
    with open(mfile) as f:
        meta = json.load(f)
    snaps = {s["snapshot-id"] for s in meta.get("snapshots") or []}
    sid = (
        int(snapshot_id)
        if snapshot_id is not None
        else int(meta["current-snapshot-id"])
    )
    if sid not in snaps:
        raise IcebergError(f"iceberg: snapshot {sid} does not exist")
    meta = dict(meta)
    refs = dict(meta.get("refs") or {})
    refs[name] = {"snapshot-id": sid, "type": ref_type}
    meta["refs"] = refs
    ver = int(re.match(r"v(\d+)", os.path.basename(mfile)).group(1)) + 1
    with open(
        os.path.join(path, "metadata", f"v{ver}.metadata.json"), "w"
    ) as f:
        json.dump(meta, f)
    with open(
        os.path.join(path, "metadata", "version-hint.text"), "w"
    ) as f:
        f.write(str(ver))
    return sid


def read_iceberg(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Read an Iceberg table at the current (or pinned) snapshot via
    native parquet scans over the manifest-resolved live files, with
    v2 position and equality delete files applied merge-on-read style
    (broadcast anti-joins; the big data scan never re-shuffles).
    `ref` names a branch/tag (mutually exclusive with snapshot_id)."""
    if ref is not None:
        if snapshot_id is not None:
            raise IcebergError(
                "iceberg: pass snapshot_id OR ref, not both"
            )
        snapshot_id = iceberg_resolve_ref(path, ref)
    data, dels, meta = _snapshot_entries(path, snapshot_id)
    return _scan_with_deletes(spark, path, data, dels, meta)


def read_iceberg_pruned(
    spark: SparkSession,
    path: str,
    column: str,
    lo,
    hi,
    snapshot_id: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Manifest-level partition pruning by SOURCE column bounds: a data
    file is skipped when its manifest-entry `partition` value proves
    no row can satisfy `column` in [lo, hi]:
    - identity: the value is an exact point — skip if outside [lo, hi];
    - truncate / year / month / day / hour (monotonic transforms): map
      the bounds through the transform and skip if the stored value
      falls outside [t(lo), t(hi)];
    - bucket[N] (not order-preserving): point queries only — when
      lo == hi, skip every file whose value != bucket(lo);
    - void (or any conversion failure): never skip.
    Files without a value are always kept — skipping must never drop
    unknown data. Delete files are NOT pruned — a position delete
    aimed at a pruned file matches nothing, and equality deletes still
    apply to the surviving scan, so merge-on-read is preserved.
    Returns (df, files_read, files_skipped). The 100 TB win is the
    manifest's: the pruned files never become scan tasks.

    Partition evolution (round 14, VERDICT r13 #3): each file is
    pruned under the spec its MANIFEST records (`partition_spec_id`),
    not the table default — a file written before an evolution keeps
    pruning under its own spec, and a file under a spec that never
    partitioned by `column` is simply kept (safe)."""
    data, dels, meta = _snapshot_entries(path, snapshot_id)
    names = _field_names_by_id(meta)
    # per-spec partition fields computed FROM `column` (source-id
    # match); fall back to a same-named identity field when a spec is
    # silent about the column
    fallback = [{"name": column, "transform": "identity"}]
    by_spec: dict = {}
    for s in meta.get("partition-specs") or []:
        by_spec[s.get("spec-id", 0)] = [
            {
                "name": f.get("name"),
                "transform": f.get("transform") or "identity",
            }
            for f in (s.get("fields") or [])
            if names.get(f.get("source-id")) == column
        ] or fallback
    keep, skipped = [], 0
    for rec in data:
        pfields = by_spec.get(rec.get("spec_id", 0), fallback)
        pv = rec.get("partition") or {}
        disjoint = False
        for f in pfields:
            v = pv.get(f["name"])
            if v is None:
                continue
            t = f["transform"]
            try:
                if t == "identity":
                    disjoint = v < lo or v > hi
                elif _BUCKET_RE.match(t):
                    if lo == hi:  # bucket prunes point queries only
                        disjoint = v != iceberg_transform(t, lo)
                elif t != "void":
                    tlo, thi = (
                        iceberg_transform(t, lo),
                        iceberg_transform(t, hi),
                    )
                    disjoint = v < tlo or v > thi
            except (TypeError, ValueError, NotImplementedError):
                disjoint = False  # unconvertible: never skip
            if disjoint:
                break
        if disjoint:
            skipped += 1
        else:
            keep.append(rec)
    df = _scan_with_deletes(spark, path, keep, dels, meta)
    return df, len(keep), skipped


def _read_avro_files(spark: SparkSession, paths: list) -> DataFrame:
    """AVRO-format data files (round 10) scan through the repo's own
    distributed container decoder: schema probed from the first file's
    header, every file row-decoded executor-side."""
    from graph_db_clustering_spark.sources.avro import (
        parse_avro_blobs,
        read_header,
    )

    paths = sorted(set(paths))
    with open(paths[0], "rb") as f:
        fields, _c, _sync, _pos = read_header(f.read(1 << 20))
    blobs = spark.read.format("binaryFile").load(paths)
    return parse_avro_blobs(blobs, fields)


def _avro_scan_with_pos(spark: SparkSession, paths: list) -> DataFrame:
    """Avro scan with EXACT per-file row ordinals (`__fp`, `__pos`):
    the repo's own container decoder (sources/avro.parse_avro_blobs)
    counts rows in decode order during the executor-side decode —
    cheaper and stronger than the ORC synthesis, which must trust the
    reader's split ordering (VERDICT r11 Next #3)."""
    from graph_db_clustering_spark.sources.avro import (
        parse_avro_blobs,
        read_header,
    )

    paths = sorted(set(paths))
    with open(paths[0], "rb") as f:
        fields, _c, _sync, _pos = read_header(f.read(1 << 20))
    blobs = spark.read.format("binaryFile").load(paths)
    df = parse_avro_blobs(blobs, fields, with_pos=True)
    return df.withColumn(
        "__fp", F.regexp_replace(F.col("__fp"), _FP_NORM, "/")
    )


def _orc_scan_with_pos(spark: SparkSession, paths: list) -> DataFrame:
    """Native ORC scan with SYNTHESIZED per-file row ordinals
    (`__fp`, `__pos` — the columns parquet gets from
    _metadata.row_index, which Spark's ORC reader does not expose).

    Two passes over the data: (1) per-(file, split-block) row counts
    aggregate to the driver — O(splits), the same scale class as the
    manifest replay — and cumulative offsets per file broadcast back;
    (2) an Arrow-batched pass attaches block-local running indexes on
    executors. Correct iff the reader emits each split's rows in file
    order, which Spark's ORC scan does for filterless scans (stripes
    stream sequentially); the property is PINNED by a test comparing
    the synthesized ordinals against a parquet twin's real row_index
    on identical data (tests/test_iceberg.py) — if a Spark upgrade
    ever reorders, that test fails before any silent wrong delete."""
    # NB: unlike read.parquet(*paths), read.orc's extra POSITIONAL
    # args are option values (mergeSchema, ...) — pass ONE list
    base = spark.read.orc(sorted(set(paths))).withColumns({
        "__fp": F.regexp_replace(
            F.col("_metadata.file_path"), _FP_NORM, "/"
        ),
        "__blk": F.col("_metadata.file_block_start"),
    })
    counts = base.groupBy("__fp", "__blk").count().collect()
    by_fp: dict = {}
    for r in counts:
        by_fp.setdefault(r["__fp"], []).append((r["__blk"], r["count"]))
    offsets: dict = {}
    for fp, blocks in by_fp.items():
        run = 0
        for blk, cnt in sorted(blocks):
            offsets[(fp, blk)] = run
            run += cnt

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [f for f in base.schema.fields if f.name != "__blk"]
        + [StructField("__pos", LongType())]
    )

    def attach(it):
        import numpy as np

        seen: dict = {}
        for pdf in it:
            pos = np.empty(len(pdf), dtype=np.int64)
            groups = pdf.groupby(["__fp", "__blk"], sort=False).indices
            for key, idx in groups.items():
                done = seen.get(key, 0)
                pos[idx] = offsets[key] + done + np.arange(len(idx))
                seen[key] = done + len(idx)
            out = pdf.drop(columns=["__blk"])
            out["__pos"] = pos
            yield out

    return base.mapInPandas(attach, schema)


def _dv_pairs_df(spark: SparkSession, dvs: list) -> DataFrame:
    """Expand v3 deletion vectors into (__dfp, __dpos) pairs ON THE
    EXECUTORS: the descriptor frame (one row per DV — puffin path,
    offset, length, referenced file) is metadata-sized; each task
    reads its blobs' byte ranges and decodes the roaring bitmap where
    the rows are needed, so the driver never holds positions (the
    shape sources/delta's DV expansion uses)."""
    rows = [
        (
            d["path"],
            int(d["content_offset"]),
            int(d["content_size"]),
            "/" + d["referenced_data_file"].lstrip("/"),
        )
        for d in dvs
    ]
    desc = spark.createDataFrame(
        rows, "puffin string, off long, size long, ref string"
    )

    def expand(batches):
        import pandas as pd

        from graph_db_clustering_spark.functions.puffin import (
            decode_dv_blob,
        )

        for pdf in batches:
            refs, poss = [], []
            for puffin, off, size, ref in pdf.itertuples(index=False):
                with open(puffin, "rb") as f:
                    f.seek(off)
                    blob = f.read(size)
                for pos in decode_dv_blob(blob):
                    refs.append(ref)
                    poss.append(pos)
            yield pd.DataFrame(
                {
                    "__dfp": pd.Series(refs, dtype="object"),
                    "__dpos": pd.Series(poss, dtype="int64"),
                }
            )

    return desc.mapInPandas(expand, "__dfp string, __dpos long")


def _scan_with_deletes(
    spark: SparkSession, path: str, data: list, dels: list, meta: dict
) -> DataFrame:
    if not data:
        raise IcebergError(f"iceberg: snapshot has no data files at {path}")
    dv_dels = [
        d for d in dels
        if d["content"] == 1 and d.get("fmt") == "PUFFIN"
    ]
    pos_dels = [
        d for d in dels
        if d["content"] == 1 and d.get("fmt") != "PUFFIN"
    ]
    eq_dels = [d for d in dels if d["content"] == 2]
    if dv_dels:
        # format v3 invariant: at most ONE live DV per data file — a
        # writer must merge (iceberg_add_deletion_vectors does); two
        # live DVs for one file is a corrupt table, not a union
        by_ref: dict = {}
        for d in dv_dels:
            by_ref.setdefault(d["referenced_data_file"], []).append(d)
        multi = {k: v for k, v in by_ref.items() if len(v) > 1}
        if multi:
            raise IcebergError(
                "iceberg: multiple live deletion vectors reference "
                f"{sorted(multi)[0]!r} — v3 requires writers to merge"
            )
    # round 12: MIXED data-file formats per snapshot are supported —
    # every scan below groups by format and unions (the ex-gate
    # narrowed to nothing once all three formats carry row ordinals)
    by_fmt: dict = {}
    for d in data:
        by_fmt.setdefault(d.get("fmt", "PARQUET"), []).append(d["path"])

    def fmt_plain(fmt: str, paths: list) -> DataFrame:
        if fmt == "AVRO":
            return _read_avro_files(spark, paths)
        # read.orc treats extra positional args as OPTIONS, not paths
        # (latent multi-file bug found by the round-11 property test) —
        # it takes ONE path-or-list; read.parquet takes *paths
        paths = sorted(set(paths))
        return (
            spark.read.parquet(*paths) if fmt == "PARQUET"
            else spark.read.orc(paths)
        )

    if not dels:
        out = None
        for fmt, paths in sorted(by_fmt.items()):
            part = fmt_plain(fmt, paths)
            out = part if out is None else out.unionByName(part)
        return out
    # row-level deletes need per-file row ordinals — parquet's
    # _metadata.row_index, a SYNTHESIZED ordinal for ORC (round 11,
    # whose _metadata carries no row_index in Spark), or (round 12,
    # VERDICT r11 #3) the EXACT decode-order ordinal the repo's own
    # Avro container reader emits
    path_fmt = {d["path"]: d.get("fmt", "PARQUET") for d in data}

    def fmt_scan_with_meta(fmt: str, paths: list) -> DataFrame:
        if fmt == "AVRO":
            return _avro_scan_with_pos(spark, paths)
        if fmt == "ORC":
            return _orc_scan_with_pos(spark, paths)
        df = spark.read.parquet(*sorted(set(paths)))
        return df.withColumns(
            {
                "__fp": F.regexp_replace(
                    F.col("_metadata.file_path"), _FP_NORM, "/"
                ),
                "__pos": F.col("_metadata.row_index"),
            }
        )

    def scan_with_meta(paths: list) -> DataFrame:
        groups: dict = {}
        for p in paths:
            groups.setdefault(path_fmt[p], []).append(p)
        out = None
        for fmt, ps in sorted(groups.items()):
            part = fmt_scan_with_meta(fmt, ps)
            out = part if out is None else out.unionByName(part)
        return out

    if eq_dels:
        # equality deletes see only STRICTLY OLDER data: group the scan
        # by data sequence number (one branch per distinct seq — commit-
        # bounded) so `data_seq < delete_seq` rides the join condition.
        by_seq: dict = {}
        for d in data:
            by_seq.setdefault(d["seq"], []).append(d["path"])
        scan = None
        for seq, paths in sorted(by_seq.items()):
            part = scan_with_meta(paths).withColumn(
                "__seq", F.lit(int(seq)).cast("long")
            )
            scan = part if scan is None else scan.unionByName(part)
    else:
        scan = scan_with_meta([d["path"] for d in data])

    if pos_dels or dv_dels:
        # (file_path, pos) pairs; normalized the same way as _metadata
        pd_df = None
        if pos_dels:
            pd_df = (
                spark.read.parquet(*sorted({d["path"] for d in pos_dels}))
                .select(
                    F.regexp_replace(
                        F.col("file_path"), _FP_NORM, "/"
                    ).alias("__dfp"),
                    F.col("pos").alias("__dpos"),
                )
            )
        if dv_dels:
            dv_df = _dv_pairs_df(spark, dv_dels)
            pd_df = dv_df if pd_df is None else pd_df.unionByName(dv_df)
        scan = scan.join(
            F.broadcast(pd_df),
            (F.col("__fp") == F.col("__dfp"))
            & (F.col("__pos") == F.col("__dpos")),
            "left_anti",
        )

    if eq_dels:
        names = _field_names_by_id(meta)
        for d in eq_dels:
            ids = d["equality_ids"] or []
            if not ids:
                raise IcebergError(
                    f"iceberg: equality delete {d['path']} missing equality_ids"
                )
            cols = []
            for fid in ids:
                if fid not in names:
                    raise IcebergError(
                        f"iceberg: equality field id {fid} not in schema"
                    )
                cols.append(names[fid])
            del_df = (
                spark.read.parquet(d["path"])
                .select(*[F.col(c).alias(f"__d_{c}") for c in cols])
                .withColumn("__dseq", F.lit(int(d["seq"])).cast("long"))
            )
            cond = F.col("__seq") < F.col("__dseq")
            for c in cols:
                cond = cond & F.col(c).eqNullSafe(F.col(f"__d_{c}"))
            scan = scan.join(F.broadcast(del_df), cond, "left_anti")

    return scan.drop("__fp", "__pos", "__seq")


def iceberg_add_position_deletes(
    spark: SparkSession, path: str, deletes: DataFrame
) -> int:
    """Commit a new snapshot whose manifest carries the current data
    files (EXISTING) plus one v2 POSITION-delete file built from
    `deletes` — a DataFrame of (file_path string, pos bigint) pairs,
    typically produced by scanning the table with `_metadata` and
    filtering. The delete parquet is data-sized work done by Spark;
    only the manifest/metadata rewrite is driver-side. Mirrors
    sources/delta's single-writer commit contract. Returns the new
    snapshot id."""
    if set(deletes.columns) != {"file_path", "pos"}:
        raise IcebergError(
            "iceberg: deletes must be (file_path string, pos bigint)"
        )
    return _commit_delete_snapshot(spark, path, deletes, 1, [])


def iceberg_add_equality_deletes(
    spark: SparkSession, path: str, deletes: DataFrame
) -> int:
    """Round 11: the write-side twin for EQUALITY deletes — `deletes`
    carries key-column VALUES (column names resolved to schema field
    ids); the committed delete file applies to every STRICTLY OLDER
    data file (its sequence number is max_seq+1, so all current files
    qualify; files added later do not — the v2 rule the reader
    enforces). Returns the new snapshot id."""
    _data, _dels, meta = _snapshot_entries(path)
    names = _field_names_by_id(meta)
    by_name = {v: k for k, v in names.items()}
    ids = []
    for c in deletes.columns:
        if c not in by_name:
            raise IcebergError(
                f"iceberg: equality-delete column {c!r} not in schema"
            )
        ids.append(by_name[c])
    if not ids:
        raise IcebergError("iceberg: equality delete needs key columns")
    return _commit_delete_snapshot(spark, path, deletes, 2, ids)


def _commit_delete_snapshot(
    spark: SparkSession,
    path: str,
    deletes: DataFrame,
    content: int,
    equality_ids: list,
) -> int:
    data, dels, meta = _snapshot_entries(path)
    snaps = meta.get("snapshots") or []
    new_id = max(s["snapshot-id"] for s in snaps) + 1
    max_seq = max([d["seq"] for d in data + dels] or [0])

    stage = os.path.join(path, f".stage_del_{new_id}")
    deletes.coalesce(1).write.mode("overwrite").parquet(stage)
    src = [p for p in os.listdir(stage) if p.endswith(".parquet")][0]
    dest = os.path.join(path, "data", f"delete-{new_id:05d}.parquet")
    os.replace(os.path.join(stage, src), dest)
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    import pyarrow.parquet as pq

    new_rec = {
        "path": dest, "seq": max_seq + 1, "content": content,
        "fmt": "PARQUET",
        "record_count": pq.read_metadata(dest).num_rows,
        "equality_ids": list(equality_ids), "partition": {},
    }
    return _write_delete_commit(path, meta, data, dels, [new_rec], new_id)


def iceberg_add_deletion_vectors(
    spark: SparkSession, path: str, deletes: DataFrame
) -> int:
    """Commit format-v3 DELETION VECTORS for `deletes` — a DataFrame
    of (file_path string, pos bigint) pairs, the same contract as
    iceberg_add_position_deletes, but the positions land as one
    roaring bitmap PER DATA FILE inside a single Puffin file
    (delete-vector-v1 blobs), and the manifest entries carry
    referenced_data_file + content_offset/content_size instead of a
    parquet delete scan. An existing live DV on a touched file is
    MERGED into the new one and superseded (the v3 single-DV-per-file
    invariant the reader enforces); parquet position deletes and
    equality deletes are carried unchanged. The commit bumps the
    table's format-version to 3. Positions fold on the driver —
    bounded by the DELETED row count, the same posture as
    sources/delta.delta_add_deletion_vectors. Returns the snapshot id."""
    if set(deletes.columns) != {"file_path", "pos"}:
        raise IcebergError(
            "iceberg: deletes must be (file_path string, pos bigint)"
        )
    from graph_db_clustering_spark.functions.puffin import (
        decode_dv_blob,
        encode_dv_blob,
        write_puffin,
    )

    data, dels, meta = _snapshot_entries(path)
    snaps = meta.get("snapshots") or []
    new_id = max(s["snapshot-id"] for s in snaps) + 1
    max_seq = max([d["seq"] for d in data + dels] or [0])
    live = {d["path"] for d in data}

    pairs = (
        deletes.withColumn(
            "file_path",
            F.regexp_replace(F.col("file_path"), _FP_NORM, "/"),
        )
        .groupBy("file_path")
        .agg(F.collect_set("pos").alias("positions"))
        .collect()
    )
    by_file = {r["file_path"]: sorted(r["positions"]) for r in pairs}
    unknown = sorted(set(by_file) - live)
    if unknown:
        raise IcebergError(
            f"iceberg: DV references non-live data file {unknown[0]!r}"
        )

    # merge + supersede existing DVs on the touched files
    carried, merged_from = [], {}
    for d in dels:
        ref = d.get("referenced_data_file")
        if d.get("fmt") == "PUFFIN" and ref in by_file:
            with open(d["path"], "rb") as f:
                f.seek(int(d["content_offset"]))
                blob = f.read(int(d["content_size"]))
            merged_from[ref] = d["path"]
            by_file[ref] = sorted(
                set(by_file[ref]) | set(decode_dv_blob(blob))
            )
        else:
            carried.append(d)

    puffin_path = os.path.join(path, "data", f"dv-{new_id:05d}.puffin")
    blobs = [
        {
            "type": "deletion-vector-v1",
            "data": encode_dv_blob(poss),
            "snapshot_id": new_id,
            "sequence_number": max_seq + 1,
            "properties": {
                "referenced-data-file": ref,
                "cardinality": str(len(poss)),
            },
        }
        for ref, poss in sorted(by_file.items())
    ]
    entries = write_puffin(path=puffin_path, blobs=blobs)
    new_recs = [
        {
            "path": puffin_path,
            "seq": max_seq + 1,
            "content": 1,
            "fmt": "PUFFIN",
            "record_count": int(e["properties"]["cardinality"]),
            "equality_ids": [],
            "partition": {},
            "referenced_data_file": e["properties"][
                "referenced-data-file"
            ],
            "content_offset": e["offset"],
            "content_size": e["length"],
        }
        for e in entries
    ]
    return _write_delete_commit(
        path, meta, data, carried, new_recs, new_id, format_version=3
    )


def _write_delete_commit(
    path: str,
    meta: dict,
    data: list,
    dels: list,
    new_recs: list,
    new_id: int,
    format_version: int | None = None,
) -> int:
    """Shared tail of a data/delete-file commit: relist every carried
    entry plus `new_recs`, write the manifest list, and roll the
    metadata file forward. Round 14: entries are grouped into ONE
    MANIFEST PER PARTITION SPEC (rec['spec_id'], default 0) and the
    manifest-list entry records each manifest's `partition_spec_id`,
    so per-file spec resolution survives the commit — the invariant
    spec-aware pruning depends on after partition evolution."""

    def _avro_val_type(v):
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "long"
        if isinstance(v, float):
            return "double"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        return "string"

    def _entry_fields(pnames, ptypes):
        return [
            {"name": "status", "type": "int"},
            {"name": "sequence_number", "type": "long"},
            {"name": "data_file", "type": {
                "type": "record", "name": "data_file", "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "content", "type": "int"},
                    {"name": "equality_ids",
                     "type": {"type": "array", "items": "int"}},
                    # format v3 deletion-vector fields (null for all
                    # non-DV entries; field ids 143-145 in the spec)
                    {"name": "referenced_data_file",
                     "type": ["null", "string"], "default": None},
                    {"name": "content_offset",
                     "type": ["null", "long"], "default": None},
                    {"name": "content_size_in_bytes",
                     "type": ["null", "long"], "default": None},
                ] + ([{"name": "partition", "type": {
                    "type": "record", "name": "r102", "fields": [
                        {"name": n, "type": ["null", ptypes[n]]}
                        for n in pnames
                    ]}}] if pnames else []),
            }},
        ]

    def _entry(rec, status, pnames):
        # Carry the entry's ACTUAL format: _snapshot_entries accepts
        # ORC/AVRO data files, and rewriting them as "PARQUET" here
        # would corrupt the new snapshot's metadata and bypass the
        # non-parquet row-level-delete gate on every future read
        # (ADVICE r10).
        e = {
            "status": status, "sequence_number": rec["seq"],
            "data_file": {
                "file_path": rec["path"],
                "file_format": rec.get("fmt", "PARQUET"),
                # carry the TRUE count ('or 1' would corrupt a 0-row
                # entry; 0 only when an external manifest omitted it)
                "record_count": (
                    rec["record_count"]
                    if rec.get("record_count") is not None
                    else 0
                ),
                "content": rec["content"],
                "equality_ids": rec.get("equality_ids") or [],
                "referenced_data_file": rec.get("referenced_data_file"),
                "content_offset": rec.get("content_offset"),
                "content_size_in_bytes": rec.get("content_size"),
            }}
        if pnames:
            pv = rec.get("partition") or {}
            e["data_file"]["partition"] = {
                n: pv.get(n) for n in pnames
            }
        return e

    groups: dict = {}
    for r in data + dels:
        groups.setdefault(r.get("spec_id", 0) or 0, []).append((r, 0))
    for r in new_recs:
        groups.setdefault(r.get("spec_id", 0) or 0, []).append((r, 1))

    from graph_db_clustering_spark.sources.avro import encode_container

    manifests = []
    for sid in sorted(groups):
        recs = groups[sid]
        # one partition-record schema spanning this spec's tuples
        pnames: list = []
        ptypes: dict = {}
        for rec, _st in recs:
            for k, v in (rec.get("partition") or {}).items():
                if k not in ptypes:
                    pnames.append(k)
                    ptypes[k] = _avro_val_type(v)
        man_schema = {
            "type": "record", "name": "manifest_entry",
            "fields": _entry_fields(pnames, ptypes),
        }
        rows = [_entry(r, st, pnames) for r, st in recs]
        m = os.path.join(
            path, "metadata", f"m-del-{new_id:05d}-{sid}.avro"
        )
        with open(m, "wb") as f:
            f.write(encode_container(man_schema, rows, codec="null"))
        manifests.append({"manifest_path": m, "partition_spec_id": sid})
    ml = _write_manifest_list(path, f"snap-{new_id}.avro", manifests)
    meta = dict(meta)
    snaps = meta.get("snapshots") or []
    meta["snapshots"] = snaps + [
        {"snapshot-id": new_id, "manifest-list": ml}
    ]
    meta["current-snapshot-id"] = new_id
    if format_version is not None:
        meta["format-version"] = max(
            int(meta.get("format-version") or 2), format_version
        )
    mfile = _metadata_file(path)
    ver = int(re.match(r"v(\d+)", os.path.basename(mfile)).group(1)) + 1
    with open(
        os.path.join(path, "metadata", f"v{ver}.metadata.json"), "w"
    ) as f:
        json.dump(meta, f)
    with open(
        os.path.join(path, "metadata", "version-hint.text"), "w"
    ) as f:
        f.write(str(ver))
    return new_id


_SPARK_TO_ICE = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "long",
    "float": "float", "double": "double", "string": "string",
    "boolean": "boolean", "binary": "binary", "date": "date",
    "timestamp": "timestamptz", "timestamp_ntz": "timestamp",
}

_SPARK_TO_AVRO = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "long",
    "float": "float", "double": "double", "string": "string",
    "boolean": "boolean", "binary": "bytes",
}


def _transform_expr(transform: str, src: str, dtype: str):
    """Spark Column computing `transform(src)` JVM-side, or None when
    the transform needs the spec's Murmur3 (bucket — computed via a
    small broadcast mapping instead)."""
    if transform == "identity":
        return F.col(src)
    if transform == "void":
        return F.lit(None).cast("int")
    gran = _TIME_TRANSFORMS.get(transform)
    if gran:
        epoch = F.lit("1970-01-01").cast("date")
        if gran == "year":
            return (F.year(src) - F.lit(1970)).cast("int")
        if gran == "month":
            return (
                (F.year(src) - F.lit(1970)) * 12 + F.month(src) - 1
            ).cast("int")
        days = F.datediff(F.col(src).cast("date"), epoch)
        if gran == "day":
            return days.cast("int")
        return (days * 24 + F.hour(src)).cast("int")
    m = _TRUNC_RE.match(transform)
    if m:
        w = int(m.group(1))
        if dtype in ("tinyint", "smallint", "int", "bigint"):
            return F.col(src) - F.pmod(F.col(src), F.lit(w))
        if dtype == "string":
            return F.substring(F.col(src), 1, w)
        raise NotImplementedError(
            f"iceberg: writer truncate over {dtype}"
        )
    if _BUCKET_RE.match(transform):
        return None
    raise NotImplementedError(f"iceberg: transform {transform!r}")


def _compute_partition_cols(
    spark: SparkSession, work: DataFrame, partition_by: list, dtypes: dict
) -> tuple:
    """Append hidden __pN partition-value columns for `partition_by`
    [(pname, transform, src)] — JVM-side (`_transform_expr`) except
    bucket[N], whose spec-mandated Murmur3 is applied to the DISTINCT
    source values on the driver and broadcast back (bounded by the
    bucketed column's cardinality). Returns (work, pcols, ptypes)."""
    pcols, ptypes = [], []
    for i, (pname, transform, src) in enumerate(partition_by):
        _validate_transform(transform)
        if src not in dtypes:
            raise IcebergError(f"iceberg: partition source {src!r}")
        pc = f"__p{i}"
        expr = _transform_expr(transform, src, dtypes[src])
        if expr is None:  # bucket[N]: Murmur3 via broadcast mapping
            vals = [r[0] for r in work.select(src).distinct().collect()]
            mapping = spark.createDataFrame(
                [(v, iceberg_transform(transform, v)) for v in vals],
                f"`{src}__k` {dtypes[src]}, `{pc}` int",
            )
            work = work.join(
                F.broadcast(mapping),
                F.col(src).eqNullSafe(F.col(f"{src}__k")),
                "left",
            ).drop(f"{src}__k")
            avro_t = "int"
        elif transform == "identity" or _TRUNC_RE.match(transform):
            work = work.withColumn(pc, expr)
            avro_t = _SPARK_TO_AVRO.get(dtypes[src])
            if avro_t is None:
                raise NotImplementedError(
                    f"iceberg: writer partition over {dtypes[src]}"
                )
        else:  # time ordinals / void -> int
            work = work.withColumn(pc, expr)
            avro_t = "int"
        pcols.append(pc)
        ptypes.append(avro_t)
    return work, pcols, ptypes


def _stage_data_files(
    spark: SparkSession,
    work: DataFrame,
    path: str,
    pcols: list,
    pnames: list,
    ptypes: list,
    prefix: str,
    seq: int,
) -> list:
    """Write `work`'s rows as table data files under <path>/data and
    return their manifest entries (status 1, sequence_number=`seq`).
    Partitioned writes go through ONE partitionBy job (hive-layout
    stage; __p key columns dropped from the files, SOURCE columns
    retained per the Iceberg spec) and partition values are harvested
    back from the directory names — no per-tuple job, no driver
    enumeration of tuples before the write."""
    import shutil
    import urllib.parse

    import pyarrow.parquet as pq

    entries = []
    stage = os.path.join(path, f".stage_{prefix or 'w'}")
    j = 0
    if pcols:
        work.write.mode("overwrite").partitionBy(*pcols).parquet(stage)
        for dirpath, dirnames, filenames in os.walk(stage):
            dirnames.sort()
            for fn in sorted(filenames):
                if not fn.endswith(".parquet"):
                    continue
                rel = os.path.relpath(dirpath, stage)
                kv = {}
                for comp in rel.split(os.sep):
                    if "=" in comp:
                        k, _, v = comp.partition("=")
                        v = urllib.parse.unquote(v)
                        kv[k] = (
                            None if v == "__HIVE_DEFAULT_PARTITION__" else v
                        )
                record = {}
                for pc, pn, t in zip(pcols, pnames, ptypes):
                    v = kv.get(pc)
                    if v is not None and t in ("int", "long"):
                        v = int(v)
                    elif v is not None and t in ("float", "double"):
                        v = float(v)
                    elif v is not None and t == "boolean":
                        v = v == "true"
                    record[pn] = v
                dest = os.path.join(
                    path, "data", f"{prefix}{j:05d}.parquet"
                )
                os.replace(os.path.join(dirpath, fn), dest)
                j += 1
                entries.append({
                    "status": 1, "sequence_number": seq, "data_file": {
                        "file_path": dest, "file_format": "PARQUET",
                        "record_count": pq.read_metadata(dest).num_rows,
                        "content": 0, "equality_ids": [],
                        "partition": record,
                    }})
    else:
        work.write.mode("overwrite").parquet(stage)
        for p in sorted(
            x for x in os.listdir(stage) if x.endswith(".parquet")
        ):
            nrows = pq.read_metadata(os.path.join(stage, p)).num_rows
            if nrows == 0:
                continue  # real writers never commit empty data files
            dest = os.path.join(path, "data", f"{prefix}{j:05d}.parquet")
            os.replace(os.path.join(stage, p), dest)
            j += 1
            entries.append({
                "status": 1, "sequence_number": seq, "data_file": {
                    "file_path": dest, "file_format": "PARQUET",
                    "record_count": nrows,
                    "content": 0, "equality_ids": [],
                }})
    shutil.rmtree(stage, ignore_errors=True)
    return entries


def _manifest_entry_schema(pnames: list, ptypes: list) -> dict:
    """Avro schema for this writer's manifest entries — the minimal
    v2 subset `_snapshot_entries` reads back (spec fields only)."""
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "sequence_number", "type": "long"},
            {"name": "data_file", "type": {
                "type": "record", "name": "data_file", "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "content", "type": "int"},
                    {"name": "equality_ids",
                     "type": {"type": "array", "items": "int"}},
                ] + ([{"name": "partition", "type": {
                    "type": "record", "name": "r102", "fields": [
                        {"name": n, "type": ["null", t]}
                        for n, t in zip(pnames, ptypes)
                    ]}}] if pnames else []),
            }},
        ]}


def _write_manifest(
    path: str, fname: str, entries: list, pnames: list, ptypes: list
) -> str:
    from graph_db_clustering_spark.sources.avro import encode_container

    m = os.path.join(path, "metadata", fname)
    with open(m, "wb") as f:
        f.write(encode_container(
            _manifest_entry_schema(pnames, ptypes), entries, codec="null"
        ))
    return m


# manifest-list schema for multi-snapshot commits: partition_spec_id
# tags each manifest with the spec its files were written under (the
# spec's manifest_file field; pruning resolves per-file specs from it)
_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": ["null", "int"]},
    ],
}


def _write_manifest_list(path: str, fname: str, manifests: list) -> str:
    """`manifests`: [{'manifest_path', 'partition_spec_id'}] — length
    is statted here; spec id may be None (reads back as spec 0)."""
    from graph_db_clustering_spark.sources.avro import encode_container

    rows = [
        {
            "manifest_path": m["manifest_path"],
            "manifest_length": os.path.getsize(m["manifest_path"]),
            "partition_spec_id": m.get("partition_spec_id"),
        }
        for m in manifests
    ]
    ml = os.path.join(path, "metadata", fname)
    with open(ml, "wb") as f:
        f.write(encode_container(_MANIFEST_LIST_SCHEMA, rows, codec="null"))
    return ml


def _bump_metadata(path: str, meta: dict) -> None:
    """Write the next vN.metadata.json + version-hint (the commit)."""
    mfile = _metadata_file(path)
    ver = int(re.match(r"v(\d+)", os.path.basename(mfile)).group(1)) + 1
    with open(
        os.path.join(path, "metadata", f"v{ver}.metadata.json"), "w"
    ) as f:
        json.dump(meta, f)
    with open(
        os.path.join(path, "metadata", "version-hint.text"), "w"
    ) as f:
        f.write(str(ver))


def _pb_from_spec(meta: dict, spec: dict) -> list:
    """A spec's fields as the writer's [(pname, transform, src_col)]
    triples, source ids resolved against the current schema."""
    names = _field_names_by_id(meta)
    out = []
    for f in spec.get("fields") or []:
        src = names.get(f.get("source-id"))
        if src is None:
            raise IcebergError(
                f"iceberg: partition source id {f.get('source-id')} "
                "not in the current schema"
            )
        out.append((f["name"], f.get("transform") or "identity", src))
    return out


def write_iceberg(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_by: list | None = None,
) -> int:
    """CREATE an Iceberg v2 table at `path` from `df` — parquet data
    files + repo-written Avro manifests + vN.metadata.json. This is an
    interchange/fixture writer (single snapshot, create-only), the
    mirror of sources/delta.delta_append: big-table appends belong to
    a real catalog; the READ side is the scale path.

    `partition_by`: [(partition_field_name, transform, source_col)].
    Transforms compute JVM-side (`_transform_expr`) except bucket[N],
    whose spec-mandated Murmur3 is applied to the DISTINCT source
    values on the driver and broadcast back — bounded by the bucketed
    column's cardinality, which a sane bucket spec keeps small
    relative to the data. One data file per distinct partition tuple;
    data files RETAIN source columns per the spec."""
    partition_by = list(partition_by or [])
    os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    dtypes = dict(df.dtypes)
    cols = df.columns

    def _ice_type(dtype: str) -> str:
        m = re.fullmatch(r"decimal\((\d+),(\d+)\)", dtype)
        if m:
            return f"decimal({m.group(1)}, {m.group(2)})"
        t = _SPARK_TO_ICE.get(dtype)
        if t is None:
            raise NotImplementedError(f"iceberg: writer type {dtype}")
        return t

    schema_fields = [
        {"id": i + 1, "name": c, "type": _ice_type(dtypes[c]),
         "required": False}
        for i, c in enumerate(cols)
    ]

    work, pcols, ptypes = _compute_partition_cols(
        spark, df, partition_by, dtypes
    )
    pspec = [
        {
            "name": pname, "transform": transform,
            "source-id": cols.index(src) + 1, "field-id": 1000 + i,
        }
        for i, (pname, transform, src) in enumerate(partition_by)
    ]
    pnames = [f["name"] for f in pspec]
    entries = _stage_data_files(
        spark, work, path, pcols, pnames, ptypes, "", 1
    )
    m = _write_manifest(path, "m-00000.avro", entries, pnames, ptypes)
    ml = _write_manifest_list(
        path, "snap-1.avro",
        [{"manifest_path": m, "partition_spec_id": 0}],
    )
    meta = {
        "format-version": 2,
        "current-snapshot-id": 1,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "fields": schema_fields}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": pspec}],
        "snapshots": [{"snapshot-id": 1, "manifest-list": ml}],
    }
    with open(os.path.join(path, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(
        os.path.join(path, "metadata", "version-hint.text"), "w"
    ) as f:
        f.write("1")
    return 1


def _default_spec(meta: dict) -> tuple:
    """(spec-id, spec dict) of the table's default partition spec."""
    specs = meta.get("partition-specs") or [{"spec-id": 0, "fields": []}]
    sid = meta.get("default-spec-id", 0)
    spec = next((s for s in specs if s.get("spec-id") == sid), specs[-1])
    return spec.get("spec-id", 0), spec


def _entries_to_recs(entries: list, sid: int) -> list:
    """Staged manifest entries -> the carry-forward rec shape
    `_write_delete_commit` consumes, tagged with their spec id."""
    return [
        {
            "path": e["data_file"]["file_path"],
            "seq": e["sequence_number"],
            "content": 0,
            "fmt": "PARQUET",
            "record_count": e["data_file"]["record_count"],
            "equality_ids": [],
            "partition": e["data_file"].get("partition") or {},
            "spec_id": sid,
        }
        for e in entries
    ]


def iceberg_evolve_spec(path: str, partition_by: list) -> int:
    """ALTER TABLE ... partition EVOLUTION (metadata-only): register
    a new partition spec and make it the default. Existing data files
    keep the spec their manifest records — readers prune each file
    under its OWN spec (read_iceberg_pruned), and future appends /
    merge rewrites land under the new default. `partition_by`:
    [(partition_field_name, transform, source_col)] (empty list =
    evolve to unpartitioned). Returns the new spec id.

    Iceberg spec parity: 'Partition evolution' — specs are immutable
    and append-only; data written under an old spec is never
    rewritten by an evolution (cite: apache/iceberg spec §Partition
    Evolution)."""
    with open(_metadata_file(path)) as f:
        meta = json.load(f)
    names = _field_names_by_id(meta)
    ids = {v: k for k, v in names.items()}
    specs = list(meta.get("partition-specs") or [])
    new_sid = max([s.get("spec-id", 0) for s in specs] or [0]) + 1
    maxf = max(
        [
            f.get("field-id", 999)
            for s in specs
            for f in (s.get("fields") or [])
        ]
        or [999]
    )
    fields = []
    for i, (pname, transform, src) in enumerate(partition_by):
        _validate_transform(transform)
        if src not in ids:
            raise IcebergError(
                f"iceberg: partition source {src!r} not in schema"
            )
        fields.append({
            "name": pname, "transform": transform,
            "source-id": ids[src], "field-id": maxf + 1 + i,
        })
    meta = dict(meta)
    meta["partition-specs"] = specs + [
        {"spec-id": new_sid, "fields": fields}
    ]
    meta["default-spec-id"] = new_sid
    _bump_metadata(path, meta)
    return new_sid


def iceberg_append(spark: SparkSession, df: DataFrame, path: str) -> int:
    """APPEND `df` as a new snapshot under the table's CURRENT
    default partition spec. Carried files keep their original
    manifests' spec attribution (one manifest per spec in the new
    manifest list); sequence numbers advance so existing equality
    deletes never apply to the appended rows. Returns the snapshot
    id. The write is one distributed partitionBy job; only manifest
    and metadata assembly run on the driver."""
    data, dels, meta = _snapshot_entries(path)
    snaps = meta.get("snapshots") or []
    new_id = max(s["snapshot-id"] for s in snaps) + 1
    max_seq = max([d["seq"] for d in data + dels] or [0])
    sid, spec = _default_spec(meta)
    pb = _pb_from_spec(meta, spec)
    work, pcols, ptypes = _compute_partition_cols(
        spark, df, pb, dict(df.dtypes)
    )
    entries = _stage_data_files(
        spark, work, path, pcols, [p[0] for p in pb], ptypes,
        f"a{new_id}-", max_seq + 1,
    )
    return _write_delete_commit(
        path, meta, data, dels, _entries_to_recs(entries, sid), new_id
    )


def read_iceberg_incremental(
    spark: SparkSession,
    path: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Rows ADDED between two snapshots — Iceberg's incremental
    append scan (from exclusive, to inclusive; `to` defaults to the
    current snapshot). The scan reads exactly the data files present
    at `to` but not at `from`; existing delete files still apply to
    them. APPEND-ONLY ranges only: if any file was removed in the
    range or the delete-file set changed (a merge/compaction/row
    delete happened), this raises — the same restriction Iceberg's
    own incremental scan declares (a changelog scan would be needed
    to represent those; cite: apache/iceberg IncrementalAppendScan).

    Scale shape: the diff is a driver-side set difference over
    manifest metadata (KB-scale); the data read plans only the added
    files, so an incremental consumer never rescans history."""
    data_a, dels_a, _meta_a = _snapshot_entries(path, from_snapshot_id)
    data_b, dels_b, meta_b = _snapshot_entries(path, to_snapshot_id)
    paths_a = {r["path"] for r in data_a}
    paths_b = {r["path"] for r in data_b}

    def dkey(d):
        return (d["path"], d["seq"])

    if (paths_a - paths_b) or (
        {dkey(d) for d in dels_a} != {dkey(d) for d in dels_b}
    ):
        raise NotImplementedError(
            "iceberg: incremental read supports APPEND-ONLY snapshot "
            "ranges (a file was removed or a delete file landed in "
            "range — replay the snapshots individually or read the "
            "full snapshot)"
        )
    added = [r for r in data_b if r["path"] not in paths_a]
    if not added:
        # empty range: zero rows with the table's schema
        return _scan_with_deletes(
            spark, path, data_b, dels_b, meta_b
        ).limit(0)
    return _scan_with_deletes(spark, path, added, dels_b, meta_b)


def iceberg_merge(
    spark: SparkSession, path: str, source: DataFrame, key: str
) -> dict:
    """MERGE INTO (upsert) as a COPY-ON-WRITE snapshot commit:
    matched target rows are replaced by source rows, unmatched source
    rows are inserted. Only the files that CONTAIN a matched key are
    rewritten (their surviving rows + every source row land as new
    data files under the current default spec); untouched files are
    carried forward with their original sequence numbers and spec
    attribution, so existing equality/position deletes keep applying
    to them and pruning keeps working across partition evolution.
    Shares MERGE semantics with sources/delta.delta_merge — the
    lakehouse format provably doesn't change the answer, so the two
    share one oracle.

    Scale shape: the match probe is ONE column-pruned distributed
    scan of (key, _metadata.file_path) joined against the BROADCAST
    source keys (MERGE's source is the small side by convention);
    the driver receives only the matched-file path set and a count.
    The rewrite scans only the touched files. No data-sized driver
    transit. Returns {snapshot_id, n_updated, n_inserted,
    files_rewritten}."""
    data, dels, meta = _snapshot_entries(path)
    bad = sorted({r["fmt"] for r in data if r["fmt"] != "PARQUET"})
    if bad:
        raise NotImplementedError(
            f"iceberg: MERGE over {bad} data files is not supported "
            "(parquet only — the rewrite scan needs _metadata file "
            "attribution)"
        )
    tcols = list(_field_names_by_id(meta).values())
    if key not in tcols:
        raise IcebergError(f"iceberg: merge key {key!r} not in schema")
    if set(source.columns) != set(tcols):
        raise IcebergError(
            "iceberg: merge source must carry exactly the table's "
            f"columns {tcols}"
        )
    # ONE aggregate replaces the separate duplicate-key probe and the
    # source count (r14); the null-aware distinct mirrors groupBy(key)
    # semantics (a single null key is one group, not a duplicate)
    sstats = source.agg(
        F.count(F.lit(1)).alias("n_src"),
        (
            F.count_distinct(key)
            + F.coalesce(
                F.max(F.when(F.col(key).isNull(), 1).otherwise(0)),
                F.lit(0),
            )
        ).alias("n_keys"),
    ).first()
    if sstats["n_src"] > sstats["n_keys"]:
        raise IcebergError("iceberg: merge source keys must be unique")
    keys = source.select(F.col(key).alias("__mk")).distinct()
    n_src = int(sstats["n_src"])

    touched_paths: set = set()
    n_matched = 0
    if data:
        scan = spark.read.parquet(*[r["path"] for r in data]).select(
            F.col(key),
            F.col("_metadata.file_path").alias("__fp"),
        )
        probe = scan.join(F.broadcast(keys), F.col(key) == F.col("__mk"))
        row = probe.agg(
            F.count_distinct(F.col(key)).alias("nk"),
            F.collect_set("__fp").alias("fps"),
        ).collect()[0]
        n_matched = row["nk"] or 0
        touched_paths = {_strip_scheme(p) for p in (row["fps"] or [])}
    touched = [r for r in data if r["path"] in touched_paths]
    untouched = [r for r in data if r["path"] not in touched_paths]
    if dels and touched:
        # merge-on-read target: a matched row may already be deleted
        # — recount matches against the DELETES-APPLIED live rows of
        # the touched files (matches exist nowhere else)
        live = _scan_with_deletes(spark, path, touched, dels, meta)
        n_matched = (
            live.join(F.broadcast(keys), F.col(key) == F.col("__mk"))
            .select(key).distinct().count()
        )

    if touched:
        surv = _scan_with_deletes(spark, path, touched, dels, meta)
        surv = surv.join(
            F.broadcast(keys), F.col(key) == F.col("__mk"), "left_anti"
        )
        out = surv.select(*tcols).unionByName(source.select(*tcols))
    else:
        out = source.select(*tcols)

    snaps = meta.get("snapshots") or []
    new_id = max(s["snapshot-id"] for s in snaps) + 1
    max_seq = max([d["seq"] for d in data + dels] or [0])
    sid, spec = _default_spec(meta)
    pb = _pb_from_spec(meta, spec)
    work, pcols, ptypes = _compute_partition_cols(
        spark, out, pb, dict(out.dtypes)
    )
    entries = _stage_data_files(
        spark, work, path, pcols, [p[0] for p in pb], ptypes,
        f"merge-{new_id}-", max_seq + 1,
    )
    # deletion vectors aimed at a rewritten file are dead — drop them
    # rather than carry no-op entries forward
    live_dels = [
        d for d in dels
        if not d.get("referenced_data_file")
        or d["referenced_data_file"] not in touched_paths
    ]
    _write_delete_commit(
        path, meta, untouched, live_dels,
        _entries_to_recs(entries, sid), new_id,
    )
    return {
        "snapshot_id": new_id,
        "n_updated": n_matched,
        "n_inserted": n_src - n_matched,
        "files_rewritten": len(touched),
    }


def iceberg_compact(spark: SparkSession, path: str) -> int:
    """OPTIMIZE-style compaction: rewrite the current snapshot's data
    files (deletes applied merge-on-read during the rewrite, one
    output file per partition tuple) and commit a new snapshot whose
    manifest carries ONLY the compacted files — position/equality
    delete files are folded in and drop out of the live set. Older
    snapshots still time-travel to the uncompacted form until
    iceberg_expire_snapshots removes them. The rewrite is distributed;
    only the manifest/metadata assembly is driver work. Returns the
    new snapshot id."""
    import shutil

    import pyarrow.parquet as pq

    data, dels, meta = _snapshot_entries(path)
    snaps = meta.get("snapshots") or []
    new_id = max(s["snapshot-id"] for s in snaps) + 1
    max_seq = max([d["seq"] for d in data + dels] or [0])

    groups: dict = {}
    for rec in data:
        key = tuple(sorted((rec.get("partition") or {}).items()))
        groups.setdefault(key, []).append(rec)

    def _avro_val_type(v):
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "long"
        if isinstance(v, float):
            return "double"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        return "string"

    entries, pnames, ptypes = [], [], {}
    for key, recs in sorted(groups.items(), key=lambda kv: repr(kv[0])):
        for k, v in key:
            if k not in ptypes:
                pnames.append(k)
                ptypes[k] = _avro_val_type(v)
    j = 0
    for key, recs in sorted(groups.items(), key=lambda kv: repr(kv[0])):
        df = _scan_with_deletes(spark, path, recs, dels, meta)
        stage = os.path.join(path, f".compact_{new_id}_{j}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = [p for p in os.listdir(stage) if p.endswith(".parquet")][0]
        dest = os.path.join(path, "data", f"compact-{new_id}-{j:05d}.parquet")
        os.replace(os.path.join(stage, part), dest)
        shutil.rmtree(stage, ignore_errors=True)
        e = {
            "status": 1, "sequence_number": max_seq + 1, "data_file": {
                "file_path": dest, "file_format": "PARQUET",
                "record_count": pq.read_metadata(dest).num_rows,
                "content": 0, "equality_ids": [],
            }}
        if pnames:
            pv = dict(key)
            e["data_file"]["partition"] = {n: pv.get(n) for n in pnames}
        entries.append(e)
        j += 1

    from graph_db_clustering_spark.sources.avro import encode_container

    man_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "sequence_number", "type": "long"},
            {"name": "data_file", "type": {
                "type": "record", "name": "data_file", "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "content", "type": "int"},
                    {"name": "equality_ids",
                     "type": {"type": "array", "items": "int"}},
                ] + ([{"name": "partition", "type": {
                    "type": "record", "name": "r102", "fields": [
                        {"name": n, "type": ["null", ptypes[n]]}
                        for n in pnames
                    ]}}] if pnames else []),
            }},
        ]}
    m = os.path.join(path, "metadata", f"m-compact-{new_id:05d}.avro")
    with open(m, "wb") as f:
        f.write(encode_container(man_schema, entries, codec="null"))
    ml = os.path.join(path, "metadata", f"snap-{new_id}.avro")
    with open(ml, "wb") as f:
        f.write(encode_container(
            {"type": "record", "name": "manifest_file", "fields": [
                {"name": "manifest_path", "type": "string"},
                {"name": "manifest_length", "type": "long"},
            ]},
            [{"manifest_path": m, "manifest_length": os.path.getsize(m)}],
            codec="null",
        ))
    meta = dict(meta)
    meta["snapshots"] = snaps + [
        {"snapshot-id": new_id, "manifest-list": ml}
    ]
    meta["current-snapshot-id"] = new_id
    mfile = _metadata_file(path)
    ver = int(re.match(r"v(\d+)", os.path.basename(mfile)).group(1)) + 1
    with open(
        os.path.join(path, "metadata", f"v{ver}.metadata.json"), "w"
    ) as f:
        json.dump(meta, f)
    with open(
        os.path.join(path, "metadata", "version-hint.text"), "w"
    ) as f:
        f.write(str(ver))
    return new_id


def iceberg_expire_snapshots(
    path: str, keep_last: int = 1, dry_run: bool = False
) -> list[str]:
    """Expire all but the newest `keep_last` snapshots: rewrite the
    metadata with the retained snapshot list, then physically delete
    every file under data/ and metadata/ that no RETAINED snapshot
    references (data files, delete files, manifests, manifest lists) —
    the Iceberg analog of delta_vacuum after retention. Time travel
    into retained snapshots keeps working; expired ids raise. Returns
    the deleted paths (or those that WOULD be, with dry_run)."""
    with open(_metadata_file(path)) as f:
        meta = json.load(f)
    snaps = meta.get("snapshots") or []
    if keep_last < 1:
        raise IcebergError("iceberg: keep_last must be >= 1")
    # named refs (branches/tags) pin their snapshots: a tag must keep
    # resolving after expiry, like Iceberg's own expire_snapshots
    ref_ids = {
        int(r["snapshot-id"])
        for r in (meta.get("refs") or {}).values()
    }
    keep = [
        s for s in snaps
        if s in snaps[-keep_last:] or s["snapshot-id"] in ref_ids
    ]
    referenced: set = set()
    for s in keep:
        ml = s["manifest-list"]
        referenced.add(os.path.abspath(_strip_scheme(ml)))
        for m in _avro_rows(ml):
            referenced.add(
                os.path.abspath(_strip_scheme(m["manifest_path"]))
            )
            for entry in _avro_rows(m["manifest_path"]):
                referenced.add(os.path.abspath(
                    _strip_scheme(entry["data_file"]["file_path"])
                ))
    victims = []
    for sub in ("data", "metadata"):
        d = os.path.join(path, sub)
        for fn in sorted(os.listdir(d)):
            full = os.path.abspath(os.path.join(d, fn))
            if fn.endswith(".metadata.json") or fn == "version-hint.text":
                continue  # metadata versions are their own history
            if not os.path.isfile(full):
                continue  # never recurse into foreign sub-layouts
            if full not in referenced:
                victims.append(full)
    if not dry_run:
        meta = dict(meta)
        meta["snapshots"] = keep
        mfile = _metadata_file(path)
        ver = int(re.match(r"v(\d+)", os.path.basename(mfile)).group(1)) + 1
        with open(
            os.path.join(path, "metadata", f"v{ver}.metadata.json"), "w"
        ) as f:
            json.dump(meta, f)
        with open(
            os.path.join(path, "metadata", "version-hint.text"), "w"
        ) as f:
            f.write(str(ver))
        for v in victims:
            os.remove(v)
    return victims


def iceberg_metadata_table(
    spark: SparkSession, path: str, name: str
) -> DataFrame:
    """The inspection tables every migrating Iceberg user queries first
    (round 11, VERDICT r10 #5): `SELECT * FROM t.snapshots / files /
    manifests / history` as DataFrames built from the already-parsed
    metadata/manifest structures — driver-side work proportional to
    the METADATA (one row per snapshot/manifest/file entry), never
    touching data bytes, exactly like Iceberg's own metadata tables.

    - snapshots: snapshot_id, parent_id, timestamp_ms, operation,
      manifest_list (operation/summary fields null when the writer
      recorded none)
    - files: one row per live entry of the CURRENT snapshot — content
      (0 data / 1 position deletes / 2 equality deletes), file_path,
      file_format, record_count, file_size_in_bytes, sequence_number,
      partition as a JSON string
    - manifests: path, length, and the snapshot that listed them
    - history: snapshot-log entries (made_current_at, snapshot_id,
      is_current_ancestor), synthesized from snapshot order when the
      metadata carries no snapshot-log
    """
    with open(_metadata_file(path)) as f:
        meta = json.load(f)
    snaps = meta.get("snapshots", []) or []
    current = meta.get("current-snapshot-id")
    if name == "snapshots":
        rows = [
            (
                int(s["snapshot-id"]),
                s.get("parent-snapshot-id"),
                s.get("timestamp-ms"),
                (s.get("summary") or {}).get("operation"),
                s.get("manifest-list"),
            )
            for s in snaps
        ]
        return spark.createDataFrame(
            rows,
            "snapshot_id long, parent_id long, timestamp_ms long, "
            "operation string, manifest_list string",
        )
    if name == "files":
        data, dels, _meta = _snapshot_entries(path)
        rows = [
            (
                int(r["content"]),
                r["path"],
                r["fmt"],
                r.get("record_count"),
                r.get("file_size"),
                int(r["seq"]),
                json.dumps(r.get("partition") or {}, sort_keys=True),
            )
            for r in data + dels
        ]
        return spark.createDataFrame(
            rows,
            "content int, file_path string, file_format string, "
            "record_count long, file_size_in_bytes long, "
            "sequence_number long, partition string",
        )
    if name == "partitions":
        # per-partition-tuple rollup of the CURRENT snapshot's live
        # entries — `SELECT * FROM t.partitions`: data record/file
        # counts plus delete-file counts per tuple (round 11)
        data, dels, _meta = _snapshot_entries(path)
        agg: dict = {}
        for r in data:
            key = json.dumps(r.get("partition") or {}, sort_keys=True)
            a = agg.setdefault(
                key, {"records": 0, "files": 0, "dels": 0}
            )
            a["records"] += int(r.get("record_count") or 0)
            a["files"] += 1
        for r in dels:
            key = json.dumps(r.get("partition") or {}, sort_keys=True)
            a = agg.setdefault(
                key, {"records": 0, "files": 0, "dels": 0}
            )
            a["dels"] += 1
        rows = [
            (k, v["records"], v["files"], v["dels"])
            for k, v in sorted(agg.items())
        ]
        return spark.createDataFrame(
            rows,
            "partition string, record_count long, file_count long, "
            "delete_file_count long",
        )
    if name == "refs":
        rows = [
            (n, r.get("type"), int(r["snapshot-id"]))
            for n, r in sorted((meta.get("refs") or {}).items())
        ]
        return spark.createDataFrame(
            rows, "name string, type string, snapshot_id long"
        )
    if name == "manifests":
        rows = []
        for s in snaps:
            for m in _avro_rows(s["manifest-list"]):
                rows.append((
                    m["manifest_path"],
                    m.get("manifest_length"),
                    int(s["snapshot-id"]),
                ))
        return spark.createDataFrame(
            rows,
            "path string, length long, added_snapshot_id long",
        )
    if name == "history":
        log = meta.get("snapshot-log") or [
            {"timestamp-ms": s.get("timestamp-ms"),
             "snapshot-id": s["snapshot-id"]}
            for s in snaps
        ]
        ancestors = set()
        sid = current
        by_id = {s["snapshot-id"]: s for s in snaps}
        while sid is not None and sid in by_id:
            ancestors.add(sid)
            sid = by_id[sid].get("parent-snapshot-id")
        rows = [
            (
                e.get("timestamp-ms"),
                int(e["snapshot-id"]),
                e["snapshot-id"] in ancestors,
            )
            for e in log
        ]
        return spark.createDataFrame(
            rows,
            "made_current_at long, snapshot_id long, "
            "is_current_ancestor boolean",
        )
    raise IcebergError(
        f"iceberg: unknown metadata table {name!r} "
        "(snapshots | files | partitions | refs | manifests | history)"
    )
