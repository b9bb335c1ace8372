"""Apache Hudi COPY-ON-WRITE table format: reader + writer, no
hudi-spark dependency — completing the lakehouse trio beside
sources/delta.py and sources/iceberg.py.

The Hudi layout (hudi.apache.org/tech-specs — public spec) stores a
table as base parquet files named ``<fileId>_<writeToken>_<instant>
.parquet`` under partition directories, plus a ``.hoodie/`` TIMELINE
of instant files ``<instant>.<action>[.<state>]``. Visibility is
timeline-driven: a base file is readable iff the instant embedded in
its NAME is a COMPLETED commit/replacecommit, and within a file group
(partition, fileId) the latest committed slice wins. Base files carry
the five Hudi meta columns (`_hoodie_commit_time`, `_hoodie_commit_
seqno`, `_hoodie_record_key`, `_hoodie_partition_path`,
`_hoodie_file_name`) ahead of the user schema.

Scope (loud gates, not silent wrong answers):
- This module owns the COPY_ON_WRITE paths; MERGE_ON_READ tables
  (round 12) dispatch to sources/hudi_mor.py for snapshot/incremental
  reads, log-block upsert/delete, compaction, AND slice-aware
  maintenance (clean/rollback/restore). Clustering, pruned reads and
  log compaction still gate loudly on MoR tables.
- replacecommit (clustering / insert_overwrite) IS handled on read:
  file groups named in ``partitionToReplaceFileIds`` become invisible
  from that instant onward, and the replacement files it wrote become
  visible — this is exactly the snapshot rule clustering relies on.
- pending instants (``.requested`` / ``.inflight``) and orphan files
  from failed writes are excluded by construction: their instants are
  not completed, so the filename test fails. Table-version-6+
  completed names (``<start>_<completion>.commit``) are accepted.
- clean / rollback / savepoint instants are visibility-neutral and
  skipped during replay (their effects are physical file removal).

Write side (`hudi_create` / `hudi_upsert` / `hudi_delete`) is the
interchange mirror of delta_append/write_iceberg: one staged
hive-partitioned Spark write routed by (partition, fileId) so every
file group lands as exactly one parquet file, then a driver-side
rename walk and one JSON commit — upserts rewrite ONLY the touched
file groups (that is what copy-on-write means) and PRESERVE
`_hoodie_commit_time` on carried-over rows, which is what makes
`read_hudi_incremental` exact rather than a superset.

Scale shape: the timeline replay is O(commits) driver-side JSON (KBs,
the same Snapshot cost every Hudi client pays); file listing is
O(files); the data scan, the upsert tagging join, and the survivor
anti-join are all distributed DataFrame plans over only the affected
file groups. Nothing row-wise ever touches the driver.

Reference parity: the reference persists every working set through an
external store and re-reads it per stage (database.py throughout);
this module is the third interchange format for that pattern at lake
scale.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class HudiError(ValueError):
    pass


_META_COLS = [
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
]

# completed instant file: <instant>[_<completionTime>].<action>
_COMPLETED_RE = re.compile(
    r"^(\d{10,})(?:_(\d+))?\."
    r"(commit|replacecommit|deltacommit|clean|rollback|savepoint|"
    r"restore|compaction|logcompaction|indexing)$"
)

# base file: <fileId>_<writeToken>_<instant>.parquet — fileId may
# itself contain '_' (hudi appends '-N' suffixes, not '_', but be
# permissive): anchor the LAST two '_' separated fields.
_BASE_RE = re.compile(r"^(.+)_(\d+-\d+-\d+)_(\d+)(?:\.\w+)?\.parquet$")

_WRITE_TOKEN = "0-0-0"
_INSTANT_BASE = 20240101000000000  # yyyyMMddHHmmssSSS-shaped, monotonic


# ---------------------------------------------------------------------------
# timeline
# ---------------------------------------------------------------------------


def _hoodie_dir(path: str) -> str:
    d = os.path.join(path, ".hoodie")
    if not os.path.isdir(d):
        raise HudiError(f"not a hudi table (no .hoodie/): {path}")
    return d


def hudi_properties(path: str) -> dict:
    """Parse ``.hoodie/hoodie.properties`` (java-properties k=v)."""
    props: dict = {}
    p = os.path.join(_hoodie_dir(path), "hoodie.properties")
    if not os.path.exists(p):
        return props
    with open(p, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            k, _, v = line.partition("=")
            props[k.strip()] = v.strip()
    return props


def hudi_timeline(path: str) -> list[dict]:
    """Completed instants, ascending: [{'instant', 'action'}].
    Pending (.requested/.inflight) and auxiliary dirs are skipped.
    ``deltacommit`` (MERGE_ON_READ) is returned since round 12
    (sources/hudi_mor.py consumes it); ``logcompaction`` since round
    13 — merged log files order at max(COMPACTED_BLOCK_TIMES) in the
    slice merge (see hudi_mor._make_log_decoder). A completed
    ``compaction`` action still gates: real Hudi completes full
    compaction as a plain 'commit' (which IS supported), so such a
    file signals a writer this reader does not know."""
    out = []
    for fname in sorted(os.listdir(_hoodie_dir(path))):
        m = _COMPLETED_RE.match(fname)
        if not m:
            continue
        action = m.group(3)
        if action == "compaction":
            raise NotImplementedError(
                "hudi: completed timeline action "
                f"{action!r} ({fname}) — real Hudi completes full "
                "compaction as a plain 'commit' (supported); a "
                "completed '.compaction' file signals an unknown writer"
            )
        out.append({"instant": m.group(1), "action": action})
    out.sort(key=lambda r: r["instant"])
    return out


def _commit_meta(path: str, instant: str, action: str) -> dict:
    hd = _hoodie_dir(path)
    for fname in os.listdir(hd):
        m = _COMPLETED_RE.match(fname)
        if m and m.group(1) == instant and m.group(3) == action:
            with open(os.path.join(hd, fname), encoding="utf-8") as f:
                body = f.read().strip()
            return json.loads(body) if body else {}
    raise HudiError(f"hudi: no completed {action} at {instant}")


def _next_instant(path: str) -> str:
    hd = os.path.join(path, ".hoodie")
    mx = _INSTANT_BASE
    if os.path.isdir(hd):
        for fname in os.listdir(hd):
            m = re.match(r"^(\d{10,})", fname)
            if m:
                mx = max(mx, int(m.group(1)))
    return str(mx + 1)


# ---------------------------------------------------------------------------
# file-group view (read side)
# ---------------------------------------------------------------------------


def _list_base_files(path: str, allow_logs: bool = False) -> list[dict]:
    """Walk partition dirs (everything but .hoodie/) for base files:
    [{'pp', 'file_id', 'instant', 'abs'}]. ``.log.`` siblings gate on
    CoW-only call sites (``allow_logs=False``); the MERGE_ON_READ
    reader (sources/hudi_mor.py) passes ``allow_logs=True`` and lists
    log files separately via ``_list_log_files``."""
    out = []
    for dirpath, dirnames, filenames in os.walk(path):
        # dot-dirs: .hoodie (timeline) and transient .stage_* writes
        dirnames[:] = sorted(d for d in dirnames if not d.startswith("."))
        rel = os.path.relpath(dirpath, path)
        pp = "" if rel == "." else rel.replace(os.sep, "/")
        for fname in sorted(filenames):
            if ".log." in fname:
                if allow_logs:
                    continue
                raise NotImplementedError(
                    "hudi: MERGE_ON_READ log file "
                    f"{fname!r} under {pp or '<root>'} — this "
                    "operation supports only COPY_ON_WRITE tables "
                    "(snapshot/incremental MoR reads live in "
                    "sources/hudi_mor.py)"
                )
            if fname.startswith("."):
                continue
            m = _BASE_RE.match(fname)
            if not m:
                continue
            out.append({
                "pp": pp,
                "file_id": m.group(1),
                "instant": m.group(3),
                "abs": os.path.join(dirpath, fname),
            })
    return out


# MoR log file: .<fileId>_<baseInstant>.log.<version>_<writeToken>
_LOG_RE = re.compile(r"^\.(.+)_(\d+)\.log\.(\d+)_(.+)$")


def _list_log_files(path: str) -> list[dict]:
    """Walk partition dirs for MERGE_ON_READ log files:
    [{'pp', 'file_id', 'base_instant', 'version', 'abs'}]."""
    out = []
    for dirpath, dirnames, filenames in os.walk(path):
        dirnames[:] = sorted(d for d in dirnames if not d.startswith("."))
        rel = os.path.relpath(dirpath, path)
        pp = "" if rel == "." else rel.replace(os.sep, "/")
        for fname in sorted(filenames):
            m = _LOG_RE.match(fname)
            if not m:
                continue
            out.append({
                "pp": pp,
                "file_id": m.group(1),
                "base_instant": m.group(2),
                "version": int(m.group(3)),
                "abs": os.path.join(dirpath, fname),
            })
    return out


def _table_type(path: str) -> str:
    return hudi_properties(path).get("hoodie.table.type", "COPY_ON_WRITE")




def hudi_live_files(path: str, as_of: str | None = None) -> list[str]:
    """Latest committed base file per file group at ``as_of``
    (inclusive; default latest): the snapshot file list."""
    timeline = hudi_timeline(path)
    valid: set = set()
    replaced: set = set()  # (pp, file_id)
    for t in timeline:
        if as_of is not None and t["instant"] > str(as_of):
            break
        # deltacommit accepted for cross-type robustness: a proper
        # CoW table has none, and MoR snapshot reads dispatch to
        # sources/hudi_mor before reaching here
        if t["action"] in ("commit", "replacecommit", "deltacommit"):
            valid.add(t["instant"])
        if t["action"] == "replacecommit":
            meta = _commit_meta(path, t["instant"], "replacecommit")
            for pp, fids in (
                meta.get("partitionToReplaceFileIds") or {}
            ).items():
                for fid in fids:
                    replaced.add((pp, fid))
    best: dict = {}
    for bf in _list_base_files(path):
        if bf["instant"] not in valid:
            continue  # pending / failed / future write
        if (bf["pp"], bf["file_id"]) in replaced:
            continue
        k = (bf["pp"], bf["file_id"])
        if k not in best or bf["instant"] > best[k]["instant"]:
            best[k] = bf
    return sorted(b["abs"] for b in best.values())


def read_hudi(
    spark: SparkSession,
    path: str,
    as_of: str | None = None,
    drop_meta: bool = False,
) -> DataFrame:
    """Snapshot read of a Hudi table (optionally time-travelled to
    the completed instant ``as_of``). MERGE_ON_READ tables dispatch to
    the log-merging reader (sources/hudi_mor.py); for CoW only the
    timeline replay and the file-group resolution run on the driver —
    the scan is Spark's native parquet reader over the resolved live
    set."""
    if _table_type(path) == "MERGE_ON_READ":
        from graph_db_clustering_spark.sources.hudi_mor import (
            read_hudi_mor,
        )

        return read_hudi_mor(spark, path, as_of, drop_meta)
    files = hudi_live_files(path, as_of)
    if not files:
        raise HudiError(
            f"hudi: no live base files at {path}"
            + (f" as of {as_of}" if as_of else "")
        )
    df = spark.read.parquet(*files)
    if drop_meta:
        df = df.drop(*_META_COLS)
    return df


def read_hudi_pruned(
    spark: SparkSession,
    path: str,
    column: str,
    lo,
    hi,
    as_of: str | None = None,
) -> tuple[DataFrame, int, int]:
    """Snapshot read with FILE-LEVEL pruning on ``column`` before the
    scan plan exists: hive-style partition directories whose value
    falls outside [lo, hi] are dropped by name, then the survivors'
    parquet footers prune on min/max (sources/parquet_stats — footer
    reads are distributed). Returns (df, files_read, files_skipped);
    the caller still applies the row predicate. MERGE_ON_READ tables
    dispatch to the slice-aware pruner (sources/hudi_mor.py, round
    13): partition-dir pruning drops whole slices, footer stats drop
    only BASE files (their logs keep merging from empty)."""
    if _table_type(path) == "MERGE_ON_READ":
        from graph_db_clustering_spark.sources.hudi_mor import (
            read_hudi_mor_pruned,
        )

        return read_hudi_mor_pruned(spark, path, column, lo, hi, as_of)
    from graph_db_clustering_spark.sources.parquet_stats import (
        parquet_file_stats,
    )

    files = hudi_live_files(path, as_of)
    if not files:
        raise HudiError(f"hudi: no live base files at {path}")
    keep, skipped = [], 0
    prefix = f"{column}="
    for p in files:
        rel = os.path.relpath(p, path)
        pruned = False
        for seg in rel.split(os.sep)[:-1]:
            if seg.startswith(prefix):
                raw = seg[len(prefix):]
                try:
                    v = type(lo)(raw) if lo is not None else raw
                except (TypeError, ValueError):
                    break  # untyped partition value: never skip
                if (lo is not None and v < lo) or (
                    hi is not None and v > hi
                ):
                    pruned = True
                break
        if pruned:
            skipped += 1
        else:
            keep.append(p)
    if not keep:
        raise HudiError("hudi: every file pruned — empty selection")
    lo_b = lo if lo is not None else float("-inf")
    hi_b = hi if hi is not None else float("inf")
    final = []
    for s in parquet_file_stats(spark, keep, [column]):
        mv, xv = s["min_values"], s["max_values"]
        disjoint = False
        try:
            if column in mv and column in xv:
                disjoint = xv[column] < lo_b or mv[column] > hi_b
        except TypeError:
            disjoint = False
        if disjoint:
            skipped += 1
        else:
            final.append(s["path"])
    if not final:
        raise HudiError("hudi: every file pruned — empty selection")
    return spark.read.parquet(*final), len(final), skipped


def _incremental_slices(
    path: str, begin: str, end: str | None, raise_on_empty: bool = True
) -> list[dict]:
    """Shared slice selection for incremental pulls (batch and
    streaming): newest in-range base file per file group, EXCLUDING
    groups retired by a replacecommit at an instant <= ``end``.
    Without the exclusion, a range spanning an upsert and a later
    clustering replacecommit would return the updated rows twice —
    once from the old group's slice and once from the replacement
    slice, whose carried rows preserve the original commit time."""
    timeline = hudi_timeline(path)
    in_range = {
        t["instant"]
        for t in timeline
        if t["action"] in ("commit", "replacecommit")
        and t["instant"] > str(begin)
        and (end is None or t["instant"] <= str(end))
    }
    if not in_range:
        raise HudiError(
            f"hudi: no completed commits in ({begin}, {end or 'latest'}]"
        )
    # (pp, file_id) -> instant of the replacecommit that retired it.
    # A replacecommit always post-dates the writes it replaces, so any
    # replacement of an in-range write is itself > begin; bounding by
    # ``end`` keeps groups replaced only AFTER the window alive in it.
    replaced_by: dict = {}
    for t in timeline:
        if t["action"] != "replacecommit":
            continue
        if end is not None and t["instant"] > str(end):
            continue
        meta = _commit_meta(path, t["instant"], "replacecommit")
        for pp, fids in (
            meta.get("partitionToReplaceFileIds") or {}
        ).items():
            for fid in fids:
                k = (pp, fid)
                if k not in replaced_by or t["instant"] > replaced_by[k]:
                    replaced_by[k] = t["instant"]
    best: dict = {}
    for bf in _list_base_files(path):
        if bf["instant"] not in in_range:
            continue
        k = (bf["pp"], bf["file_id"])
        if k in replaced_by:
            continue
        if k not in best or bf["instant"] > best[k]["instant"]:
            best[k] = bf
    # clean-safety: a slice written by an in-range commit may have been
    # physically cleaned; that is fine ONLY when a LATER in-range slice
    # of the same group carries its rows (commit times are preserved),
    # or when the group was retired by a replacecommit — replacement
    # slices carry its rows and are themselves covered by the
    # replacecommit's own write stats in this loop. A cleaned slice
    # with neither would silently drop changes — raise instead, like
    # Hudi's incremental-beyond-retained contract.
    for t in sorted(in_range):
        meta = _commit_meta(
            path, t,
            next(
                e["action"] for e in timeline if e["instant"] == t
            ),
        )
        for pp, stats in (meta.get("partitionToWriteStats") or {}).items():
            for s in stats:
                k = (pp, s.get("fileId"))
                if replaced_by.get(k, "") >= t:
                    continue
                got = best.get(k)
                if got is None or got["instant"] < t:
                    raise HudiError(
                        f"hudi: commit {t}'s slice of file group "
                        f"{k} was cleaned and no later in-range slice "
                        "covers it — the incremental range exceeds "
                        "the retained history"
                    )
    if not best:
        # streaming callers pass raise_on_empty=False: a no-op
        # upsert/delete that matched nothing still lands a commit with
        # empty write stats, and a micro-batch covering only such
        # commits must emit an empty batch, not kill the query. The
        # batch API keeps the loud error.
        if raise_on_empty:
            raise HudiError("hudi: in-range commits wrote no base files")
        return []
    return sorted(best.values(), key=lambda b: b["abs"])


def read_hudi_incremental(
    spark: SparkSession,
    path: str,
    begin: str,
    end: str | None = None,
) -> DataFrame:
    """Incremental pull: the LATEST state of every record written by a
    commit in (begin, end] — Hudi's incremental query semantics. Reads
    only the newest in-range slice per live (non-replaced) file group
    and filters on `_hoodie_commit_time`; carried-over rows keep their
    original commit time (see hudi_upsert) so they are excluded
    exactly. MERGE_ON_READ tables dispatch to the log-merging
    incremental reader (sources/hudi_mor.py)."""
    if _table_type(path) == "MERGE_ON_READ":
        from graph_db_clustering_spark.sources.hudi_mor import (
            read_hudi_incremental_mor,
        )

        return read_hudi_incremental_mor(spark, path, begin, end)
    best = _incremental_slices(path, begin, end)
    df = spark.read.parquet(*sorted(b["abs"] for b in best))
    cond = F.col("_hoodie_commit_time") > str(begin)
    if end is not None:
        cond = cond & (F.col("_hoodie_commit_time") <= str(end))
    return df.filter(cond)


# ---------------------------------------------------------------------------
# write side
# ---------------------------------------------------------------------------


def _uuid_from(*parts) -> str:
    """Deterministic uuid-shaped fileId from an md5 of the parts —
    matching what the `_hoodie_file_name` column computes JVM-side."""
    import hashlib

    h = hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def _uuid_col(*cols):
    """The same md5 → uuid formatting as _uuid_from, as a Column."""
    h = F.md5(F.concat_ws("|", *cols))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def _write_properties(path: str, props: dict) -> None:
    hd = os.path.join(path, ".hoodie")
    os.makedirs(hd, exist_ok=True)
    with open(os.path.join(hd, "hoodie.properties"), "w") as f:
        f.write("#Updated at gdc-spark\n")
        for k in sorted(props):
            f.write(f"{k}={props[k]}\n")


def _land_hudi_stage(
    path: str, stage: str, instant: str
) -> dict:
    """Move the staged ``_pp=<hive>/_fid=<uuid>`` write into the table
    root as ``<pp>/<fid>_0-0-0_<instant>.parquet`` and return
    {(pp, fid): {'path', 'bytes', 'rows'}} for the commit metadata."""
    import shutil
    import urllib.parse

    import pyarrow.parquet as pq

    landed: dict = {}
    for dirpath, _dirs, fnames in sorted(os.walk(stage)):
        parts = [p for p in dirpath[len(stage):].split(os.sep) if p]
        kv = {}
        for seg in parts:
            k, _, v = seg.partition("=")
            kv[k] = urllib.parse.unquote(v)
        if "_fid" not in kv:
            continue
        pp = kv.get("_pp", "")
        if pp == "__HIVE_DEFAULT_PARTITION__":
            pp = ""
        fid = kv["_fid"]
        pfiles = [f for f in sorted(fnames) if f.endswith(".parquet")]
        if not pfiles:
            continue
        if len(pfiles) > 1:
            raise HudiError(
                f"hudi: file group ({pp!r}, {fid}) staged as "
                f"{len(pfiles)} files — routing repartition missing"
            )
        rel = f"{pp}/{fid}_{_WRITE_TOKEN}_{instant}.parquet" if pp else (
            f"{fid}_{_WRITE_TOKEN}_{instant}.parquet"
        )
        dest = os.path.join(path, *rel.split("/"))
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        src = os.path.join(dirpath, pfiles[0])
        md = pq.read_metadata(src)
        os.replace(src, dest)
        pmeta = os.path.join(os.path.dirname(dest),
                             ".hoodie_partition_metadata")
        if not os.path.exists(pmeta):
            depth = rel.count("/")
            with open(pmeta, "w") as f:
                f.write(
                    "#partition metadata\n"
                    f"commitTime={instant}\npartitionDepth={depth}\n"
                )
        landed[(pp, fid)] = {
            "path": rel,
            "bytes": os.path.getsize(dest),
            "rows": md.num_rows,
        }
    shutil.rmtree(stage, ignore_errors=True)
    return landed


def _commit(
    path: str,
    instant: str,
    landed: dict,
    op: str,
    counters: dict | None = None,
    extra: dict | None = None,
    action: str = "commit",
    replace: dict | None = None,
) -> None:
    """Write the requested→inflight→completed instant triplet with a
    HoodieCommitMetadata-shaped JSON body."""
    hd = os.path.join(path, ".hoodie")
    os.makedirs(hd, exist_ok=True)
    p2ws: dict = {}
    counters = counters or {}
    for (pp, fid), st in sorted(landed.items()):
        c = counters.get((pp, fid), {})
        p2ws.setdefault(pp, []).append({
            "fileId": fid,
            "path": st["path"],
            "prevCommit": c.get("prevCommit", "null"),
            "numWrites": st["rows"],
            "numDeletes": c.get("numDeletes", 0),
            "numUpdateWrites": c.get("numUpdateWrites", 0),
            "numInserts": c.get(
                "numInserts",
                st["rows"] - c.get("numUpdateWrites", 0),
            ),
            "totalWriteBytes": st["bytes"],
            "fileSizeInBytes": st["bytes"],
        })
    meta = {
        "partitionToWriteStats": p2ws,
        "compacted": False,
        "operationType": op,
        "extraMetadata": extra or {},
    }
    if replace is not None:
        meta["partitionToReplaceFileIds"] = replace
    open(os.path.join(hd, f"{instant}.{action}.requested"), "w").close()
    open(os.path.join(hd, f"{instant}.inflight"), "w").close()
    tmp = os.path.join(hd, f".{instant}.{action}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(hd, f"{instant}.{action}"))


def _stage_write(
    spark: SparkSession, df: DataFrame, path: str, instant: str
) -> dict:
    """Route every row to its file group and write ONE staged parquet
    per (partition-path, fileId) in a single distributed job. `df`
    must already carry `_pp` (hive partition path, '' allowed) and
    `_fid` columns plus the five meta columns and the user schema."""
    stage = os.path.join(path, f".stage_{instant}")
    (
        df.repartition("_pp", "_fid")
        .write.mode("overwrite")
        .partitionBy("_pp", "_fid")
        .parquet(stage)
    )
    return _land_hudi_stage(path, stage, instant)


def _check_partition_values(df: DataFrame, partition_field: str) -> None:
    """Hive-style partition paths are built verbatim (`field=value/`):
    NULL values would silently land under __HIVE_DEFAULT_PARTITION__
    and re-land at the table root, and separator characters would
    corrupt the directory layout — both gate loudly instead. One
    early-exit filter job, metadata-scale next to the write itself."""
    bad = df.filter(
        F.col(partition_field).isNull()
        | F.col(partition_field).cast("string").rlike("[/=%\\n\\r]")
    ).limit(1)
    if bad.count():
        raise HudiError(
            f"hudi: partition value of {partition_field!r} is NULL or "
            "contains one of / = % newline — hive-style escaping is "
            "not implemented; clean or recode the partition column"
        )


def _with_meta(
    df: DataFrame,
    instant: str,
    key_col,
    pp_col,
    fid_col,
    user_cols: list,
) -> DataFrame:
    """Attach the five Hudi meta columns + the _pp/_fid routing
    columns, meta-first like a real Hudi base file."""
    fname = F.concat(
        fid_col, F.lit(f"_{_WRITE_TOKEN}_{instant}.parquet")
    )
    return df.select(
        F.lit(instant).alias("_hoodie_commit_time"),
        F.concat(
            F.lit(f"{instant}_0_"),
            (F.monotonically_increasing_id() + 1).cast("string"),
        ).alias("_hoodie_commit_seqno"),
        key_col.cast("string").alias("_hoodie_record_key"),
        pp_col.alias("_hoodie_partition_path"),
        fname.alias("_hoodie_file_name"),
        *[F.col(c) for c in user_cols],
        pp_col.alias("_pp"),
        fid_col.alias("_fid"),
    )


def hudi_create(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    record_key: str,
    partition_field: str | None = None,
    precombine: str | None = None,
    n_file_groups: int = 1,
    table_name: str = "gdc_table",
    table_type: str = "COPY_ON_WRITE",
) -> str:
    """CREATE a Hudi table from `df` (bulk insert, first commit).
    Hive-style partitioning on `partition_field`; `n_file_groups`
    file groups per partition (keys hash-routed). ``table_type``
    MERGE_ON_READ lands the bulk insert under a deltacommit and
    routes later upserts/deletes to log blocks (sources/hudi_mor.py).
    Returns the commit instant."""
    if table_type not in ("COPY_ON_WRITE", "MERGE_ON_READ"):
        raise HudiError(f"hudi: unknown table type {table_type!r}")
    if record_key not in df.columns:
        raise HudiError(f"hudi: record key {record_key!r} not in schema")
    if partition_field is not None and partition_field not in df.columns:
        raise HudiError(f"hudi: partition field {partition_field!r}")
    if os.path.isdir(os.path.join(path, ".hoodie")):
        raise HudiError(f"hudi: table already exists at {path}")
    os.makedirs(path, exist_ok=True)
    instant = _next_instant(path)
    user_cols = df.columns
    key_col = F.col(record_key)
    if partition_field is not None:
        _check_partition_values(df, partition_field)
        pp_col = F.concat(
            F.lit(f"{partition_field}="),
            F.col(partition_field).cast("string"),
        )
    else:
        pp_col = F.lit("")
    fg = F.pmod(F.xxhash64(key_col.cast("string")), n_file_groups)
    fid_col = _uuid_col(pp_col, fg.cast("string"), F.lit(instant))
    work = _with_meta(df, instant, key_col, pp_col, fid_col, user_cols)
    landed = _stage_write(spark, work, path, instant)
    _write_properties(path, {
        "hoodie.table.name": table_name,
        "hoodie.table.type": table_type,
        "hoodie.table.version": "5",
        "hoodie.timeline.layout.version": "1",
        "hoodie.table.base.file.format": "PARQUET",
        "hoodie.table.recordkey.fields": record_key,
        "hoodie.table.partition.fields": partition_field or "",
        "hoodie.table.precombine.field": precombine or "",
        "hoodie.datasource.write.hive_style_partitioning": "true",
        "hoodie.populate.meta.fields": "true",
    })
    _commit(
        path, instant, landed, "BULK_INSERT",
        action=("deltacommit" if table_type == "MERGE_ON_READ"
                else "commit"),
        extra={"gdc.spark.schema": df.schema.json()},
    )
    return instant


def _snapshot_with_groups(spark: SparkSession, path: str) -> DataFrame:
    """Current snapshot + `_pp`/`_fid` restored from the file list —
    the upsert/delete tagging source. One distributed scan; the
    path→(pp, fid) mapping is O(files) and broadcast."""
    files = hudi_live_files(path)
    if not files:
        raise HudiError(f"hudi: no live base files at {path}")
    rows = []
    for p in files:
        rel = os.path.relpath(p, path).replace(os.sep, "/")
        m = _BASE_RE.match(rel.rsplit("/", 1)[-1])
        pp = rel.rsplit("/", 1)[0] if "/" in rel else ""
        rows.append((f"file:{p}" if not p.startswith("file:") else p,
                     pp, m.group(1)))
    mapping = spark.createDataFrame(
        rows, "_fpath string, _pp string, _fid string"
    )
    # _metadata.file_path is a file: URI on local fs; normalize the
    # authority-less and triple-slash spellings to file:/<path>
    scan = spark.read.parquet(*files).withColumn(
        "_fpath",
        F.regexp_replace(
            F.col("_metadata.file_path"), "^file:(//)?", "file:"
        ),
    )
    return scan.join(F.broadcast(mapping), "_fpath", "inner").drop("_fpath")


def _apply_row_changes(
    spark: SparkSession,
    path: str,
    upserts: DataFrame | None,
    delete_keys: DataFrame | None,
    op: str,
) -> str:
    """Shared CoW rewrite: tag incoming keys to file groups, rewrite
    ONLY the touched groups (survivors keep their original meta
    columns — commit time preserved), route inserts to new groups.
    Exactly one commit; returns its instant."""
    props = hudi_properties(path)
    record_key = props.get("hoodie.table.recordkey.fields")
    if not record_key:
        raise HudiError("hudi: hoodie.properties lacks recordkey.fields")
    partition_field = props.get("hoodie.table.partition.fields") or None
    precombine = props.get("hoodie.table.precombine.field") or None
    instant = _next_instant(path)

    snap = _snapshot_with_groups(spark, path)
    user_cols = [
        c for c in snap.columns
        if c not in _META_COLS and c not in ("_pp", "_fid")
    ]

    if upserts is not None:
        missing = [c for c in user_cols if c not in upserts.columns]
        if missing:
            raise HudiError(f"hudi: upsert source lacks columns {missing}")
        upserts = upserts.select(*user_cols)
        dup_gate = not precombine
        if precombine:
            from pyspark.sql import Window

            w = Window.partitionBy(record_key).orderBy(
                F.col(precombine).desc()
            )
            upserts = (
                upserts.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        keys = upserts.select(
            F.col(record_key).cast("string").alias("_k")
        )
    else:
        delete_keys = delete_keys.select(
            F.col(record_key).cast("string").alias("_k")
        ).distinct()
        keys = delete_keys

    # tag: which file group currently holds each incoming key
    located = (
        snap.select(
            F.col("_hoodie_record_key").alias("_k"), "_pp", "_fid"
        )
        .join(keys, "_k", "inner")
        .select("_k", "_pp", "_fid")
    )

    # ONE tagging job (r14 optimization — was up to five separate
    # driver jobs: duplicate-key gate, touched-group collect,
    # update/insert counts, insert partition-value gate, delete count):
    # every gate and counter rides a single aggregate whose collected
    # payload is the touched-group list the commit needs anyway.
    n_upd = n_ins = n_del = 0
    if upserts is not None:
        tagged = (
            upserts.withColumn("_k", F.col(record_key).cast("string"))
            .join(located, "_k", "left")
            .localCheckpoint(eager=False)
        )
        if partition_field is not None:
            _bad_pp = (
                F.col(partition_field).isNull()
                | F.col(partition_field).cast("string").rlike("[/=%\\n\\r]")
            )
        else:
            _bad_pp = F.lit(False)
        stats = tagged.agg(
            F.count(F.lit(1)).alias("n_rows"),
            # distinct KEY GROUPS incl. a null group, matching the old
            # groupBy(key) gate (count_distinct alone ignores nulls)
            (
                F.count_distinct("_k")
                + F.coalesce(
                    F.max(F.when(F.col("_k").isNull(), 1).otherwise(0)),
                    F.lit(0),
                )
            ).alias("n_keys"),
            F.count("_fid").alias("n_upd"),
            F.max(
                F.when(F.col("_fid").isNull() & _bad_pp, 1).otherwise(0)
            ).alias("bad_pp"),
            F.collect_set(F.struct("_pp", "_fid")).alias("touched"),
        ).first()
        if dup_gate and stats["n_rows"] > stats["n_keys"]:
            raise HudiError(
                "hudi: duplicate record keys in upsert source and no "
                "precombine field declared"
            )
        if partition_field is not None and (stats["bad_pp"] or 0):
            raise HudiError(
                f"hudi: partition value of {partition_field!r} is NULL "
                "or contains one of / = % newline — hive-style escaping "
                "is not implemented; clean or recode the partition column"
            )
        n_upd = int(stats["n_upd"])
        n_ins = int(stats["n_rows"]) - n_upd
        touched = sorted(
            (t["_pp"], t["_fid"])
            for t in stats["touched"]
            if t["_fid"] is not None
        )
    else:
        grp = (
            located.groupBy("_pp", "_fid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        touched = sorted((r["_pp"], r["_fid"]) for r in grp)
        n_del = sum(r["n"] for r in grp)
    touched_df = spark.createDataFrame(
        touched or [("", "")], "_pp string, _fid string"
    )
    if not touched:
        touched_df = touched_df.limit(0)

    # survivors: rows of touched groups whose key is NOT incoming —
    # keep their original meta columns, only the file name advances
    survivors = (
        snap.join(F.broadcast(touched_df), ["_pp", "_fid"], "semi")
        .join(
            keys,
            snap["_hoodie_record_key"] == keys["_k"],
            "anti",
        )
        .select(
            "_hoodie_commit_time",
            "_hoodie_commit_seqno",
            "_hoodie_record_key",
            "_hoodie_partition_path",
            F.concat(
                F.col("_fid"),
                F.lit(f"_{_WRITE_TOKEN}_{instant}.parquet"),
            ).alias("_hoodie_file_name"),
            *[F.col(c) for c in user_cols],
            "_pp",
            "_fid",
        )
    )

    parts = [survivors]
    if upserts is not None:
        # `tagged` is the lazily-checkpointed tagging join from the
        # fused aggregate above: the landing write below re-reads the
        # checkpointed partitions instead of recomputing the join
        updates = tagged.filter(F.col("_fid").isNotNull()).drop("_k")
        inserts = tagged.filter(F.col("_fid").isNull()).drop(
            "_k", "_pp", "_fid"
        )
        parts.append(
            _with_meta(
                updates, instant, F.col(record_key), F.col("_pp"),
                F.col("_fid"), user_cols,
            )
        )
        if n_ins:
            # partition values already gated by the fused aggregate
            if partition_field is not None:
                pp_col = F.concat(
                    F.lit(f"{partition_field}="),
                    F.col(partition_field).cast("string"),
                )
            else:
                pp_col = F.lit("")
            fid_col = _uuid_col(pp_col, F.lit("ins"), F.lit(instant))
            parts.append(
                _with_meta(
                    inserts, instant, F.col(record_key), pp_col,
                    fid_col, user_cols,
                )
            )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    landed = _stage_write(spark, out, path, instant)

    # a fully-emptied file group (all rows deleted) produces no staged
    # file: land an explicit EMPTY slice so the old one stops being
    # the latest — metadata-sized, driver-side by construction
    emptied = [k for k in touched if k not in landed]
    if emptied:
        import pyarrow.parquet as pq

        by_group = {}
        for bf in _list_base_files(path):
            k = (bf["pp"], bf["file_id"])
            if k in emptied and (
                k not in by_group
                or bf["instant"] > by_group[k]["instant"]
            ):
                by_group[k] = bf
        for (pp, fid), bf in sorted(by_group.items()):
            schema = pq.read_schema(bf["abs"])
            rel = (
                f"{pp}/{fid}_{_WRITE_TOKEN}_{instant}.parquet"
                if pp else f"{fid}_{_WRITE_TOKEN}_{instant}.parquet"
            )
            dest = os.path.join(path, *rel.split("/"))
            pq.write_table(schema.empty_table(), dest)
            landed[(pp, fid)] = {
                "path": rel,
                "bytes": os.path.getsize(dest),
                "rows": 0,
            }

    counters: dict = {}
    for k in landed:
        counters[k] = {
            "prevCommit": "unknown" if k in touched else "null"
        }
    # per-group update counts are not tracked individually (one
    # distributed job writes all groups); record totals on the commit
    _commit(
        path, instant, landed, op,
        counters=counters,
        extra={
            "gdc.numUpdateWrites": str(n_upd),
            "gdc.numInserts": str(n_ins),
            "gdc.numDeletes": str(n_del),
        },
    )
    return instant


def hudi_cluster(spark: SparkSession, path: str) -> str:
    """CLUSTERING as a replacecommit: every live file group is
    rewritten into ONE new group per partition and the old groups are
    recorded in ``partitionToReplaceFileIds`` — the small-file
    compaction a long-lived upsert table needs, and the read-side
    replace rule's own fixture. Rows keep their original meta columns
    (commit time included) so incremental pulls stay exact. On a
    MERGE_ON_READ table (round 13, VERDICT r12 Next #3) the input is
    the slice-MERGED snapshot and the replaced set is every live file
    SLICE (log-only groups included) — their log files die with the
    group, since a replaced group's logs are skipped by every reader.
    Returns the replacecommit instant."""
    mor = _table_type(path) == "MERGE_ON_READ"
    instant = _next_instant(path)
    if mor:
        from graph_db_clustering_spark.sources.hudi_mor import (
            _file_slices,
            _mor_snapshot,
        )

        snap = _mor_snapshot(spark, path, with_groups=True)
    else:
        snap = _snapshot_with_groups(spark, path)
    user_cols = [
        c for c in snap.columns
        if c not in _META_COLS and c not in ("_pp", "_fid")
    ]
    # replace EVERY live group — from the file/slice listing, not the
    # snapshot rows, so fully-emptied slices are retired too
    replaced: dict = {}
    if mor:
        for s in _file_slices(path)[0]:
            replaced.setdefault(s["pp"], []).append(s["fid"])
    else:
        for p in hudi_live_files(path):
            rel = os.path.relpath(p, path).replace(os.sep, "/")
            m = _BASE_RE.match(rel.rsplit("/", 1)[-1])
            pp = rel.rsplit("/", 1)[0] if "/" in rel else ""
            replaced.setdefault(pp, []).append(m.group(1))
    replaced = {pp: sorted(fids) for pp, fids in replaced.items()}
    fid_col = _uuid_col(F.col("_pp"), F.lit("clu"), F.lit(instant))
    out = snap.select(
        "_hoodie_commit_time",
        "_hoodie_commit_seqno",
        "_hoodie_record_key",
        "_hoodie_partition_path",
        F.concat(
            fid_col, F.lit(f"_{_WRITE_TOKEN}_{instant}.parquet")
        ).alias("_hoodie_file_name"),
        *[F.col(c) for c in user_cols],
        "_pp",
        fid_col.alias("_fid"),
    )
    landed = _stage_write(spark, out, path, instant)
    _commit(
        path, instant, landed, "CLUSTER",
        counters={k: {"prevCommit": "null"} for k in landed},
        action="replacecommit", replace=replaced,
    )
    return instant


def hudi_metadata_table(
    spark: SparkSession, path: str, name: str
) -> DataFrame:
    """Inspection tables (the `call show_commits` / timeline surface a
    migrating Hudi user queries first; the Hudi twin of
    iceberg_metadata_table). Driver-side work proportional to the
    TIMELINE, never touching data bytes.

    - timeline: instant, action, operation type
    - commits: one row per write-stat of each completed
      commit/deltacommit/replacecommit — instant, partition, file_id,
      path, num_writes, num_inserts, num_update_writes, bytes
    - files: the CURRENT snapshot's live base files — partition,
      file_id, instant (of the live slice), path, size; on a
      MERGE_ON_READ table, every live file SLICE's base and log files
      (round 12)
    """
    if name == "timeline":
        rows = []
        for t in hudi_timeline(path):
            op = None
            if t["action"] in ("commit", "replacecommit",
                               "deltacommit"):
                op = _commit_meta(path, t["instant"], t["action"]).get(
                    "operationType"
                )
            rows.append((t["instant"], t["action"], op))
        return spark.createDataFrame(
            rows, "instant string, action string, operation string"
        )
    if name == "commits":
        rows = []
        for t in hudi_timeline(path):
            if t["action"] not in ("commit", "replacecommit",
                                   "deltacommit"):
                continue
            meta = _commit_meta(path, t["instant"], t["action"])
            for pp, stats in sorted(
                (meta.get("partitionToWriteStats") or {}).items()
            ):
                for s in stats:
                    rows.append((
                        t["instant"], pp, s.get("fileId"),
                        s.get("path"), s.get("numWrites"),
                        s.get("numInserts"), s.get("numUpdateWrites"),
                        s.get("totalWriteBytes"),
                    ))
        return spark.createDataFrame(
            rows,
            "instant string, partition string, file_id string, "
            "path string, num_writes long, num_inserts long, "
            "num_update_writes long, bytes long",
        )
    if name == "files":
        rows = []
        if _table_type(path) == "MERGE_ON_READ":
            from graph_db_clustering_spark.sources.hudi_mor import (
                _file_slices,
            )

            slices, _valid = _file_slices(path)
            for s_ in sorted(
                slices, key=lambda s: (s["pp"], s["fid"])
            ):
                if s_["base"]:
                    rel = os.path.relpath(
                        s_["base"], path
                    ).replace(os.sep, "/")
                    rows.append((
                        s_["pp"], s_["fid"], s_["base_instant"], rel,
                        os.path.getsize(s_["base"]),
                    ))
                for lf in s_["logs"]:
                    rel = os.path.relpath(
                        lf["abs"], path
                    ).replace(os.sep, "/")
                    rows.append((
                        s_["pp"], s_["fid"], s_["base_instant"], rel,
                        os.path.getsize(lf["abs"]),
                    ))
        else:
            for p in hudi_live_files(path):
                rel = os.path.relpath(p, path).replace(os.sep, "/")
                fname = rel.rsplit("/", 1)[-1]
                m = _BASE_RE.match(fname)
                pp = rel.rsplit("/", 1)[0] if "/" in rel else ""
                rows.append((
                    pp, m.group(1), m.group(3), rel,
                    os.path.getsize(p),
                ))
        return spark.createDataFrame(
            rows,
            "partition string, file_id string, instant string, "
            "path string, size long",
        )
    raise HudiError(
        f"hudi: unknown metadata table {name!r} "
        "(timeline | commits | files)"
    )


def hudi_savepoint(path: str, instant: str) -> None:
    """SAVEPOINT a completed commit: `<instant>.savepoint` lands on
    the timeline and hudi_clean then PRESERVES, per file group, the
    latest slice at-or-before every savepoint — so time travel to a
    savepointed instant survives cleaning (Hudi's savepoint
    contract). Restore back to it with hudi_restore."""
    timeline = hudi_timeline(path)
    if not any(
        t["instant"] == str(instant)
        and t["action"] in ("commit", "replacecommit", "deltacommit")
        for t in timeline
    ):
        raise HudiError(
            f"hudi: {instant} is not a completed commit to savepoint"
        )
    with open(
        os.path.join(_hoodie_dir(path), f"{instant}.savepoint"), "w"
    ) as f:
        json.dump({"savepointedInstant": str(instant)}, f)


def hudi_restore(spark_or_path, path: str | None = None) -> list[str]:
    """RESTORE the table to its latest SAVEPOINT: every base file of a
    commit later than the savepoint is deleted, those commits'
    timeline files are removed, and a completed `<instant>.restore`
    records the action. Requires a savepoint (that is what makes the
    pre-image guaranteed present under cleaning). Accepts (path) or
    (spark, path) for API symmetry. Returns the deleted paths."""
    p = path if path is not None else spark_or_path
    if _table_type(p) == "MERGE_ON_READ":
        from graph_db_clustering_spark.sources.hudi_mor import (
            hudi_restore_mor,
        )

        return hudi_restore_mor(p)
    timeline = hudi_timeline(p)
    sps = [t["instant"] for t in timeline if t["action"] == "savepoint"]
    if not sps:
        raise HudiError("hudi: restore needs a savepoint")
    sp = max(sps)
    deleted = []
    for bf in _list_base_files(p):
        if bf["instant"] > sp:
            os.remove(bf["abs"])
            deleted.append(bf["abs"])
    hd = _hoodie_dir(p)
    for fname in list(os.listdir(hd)):
        m = re.match(r"^(\d{10,})(?:_(\d+))?\.(\w+)", fname)
        if m and m.group(1) > sp and m.group(3) not in (
            "savepoint", "clean", "rollback", "restore"
        ):
            os.remove(os.path.join(hd, fname))
    instant = _next_instant(p)
    with open(os.path.join(hd, f"{instant}.restore"), "w") as f:
        json.dump({"restoredToSavepoint": sp}, f)
    return deleted


def hudi_clean(path: str, retain_slices: int = 1) -> list[str]:
    """CLEAN: physically delete superseded base-file slices, keeping
    the newest `retain_slices` committed slices per file group (plus
    any files of pending instants, which are not ours to judge) AND,
    per savepoint, the group's latest slice at-or-before it. Lands a
    completed `<instant>.clean` on the timeline. Time travel to
    unprotected instants older than the retained window stops working
    — that is what cleaning means; snapshot and incremental reads of
    the retained window are untouched. Driver-side O(files) like every
    other timeline op. Returns the deleted paths. MERGE_ON_READ
    tables dispatch to the slice-aware cleaner (sources/hudi_mor)."""
    if _table_type(path) == "MERGE_ON_READ":
        from graph_db_clustering_spark.sources.hudi_mor import (
            hudi_clean_mor,
        )

        return hudi_clean_mor(path, retain_slices)
    if retain_slices < 1:
        raise HudiError("hudi: clean must retain at least one slice")
    timeline = hudi_timeline(path)
    valid = {
        t["instant"] for t in timeline
        if t["action"] in ("commit", "replacecommit")
    }
    savepoints = sorted(
        t["instant"] for t in timeline if t["action"] == "savepoint"
    )
    groups: dict = {}
    for bf in _list_base_files(path):
        if bf["instant"] not in valid:
            continue  # pending/foreign: leave alone
        groups.setdefault((bf["pp"], bf["file_id"]), []).append(bf)
    deleted = []
    for _k, slices in sorted(groups.items()):
        slices.sort(key=lambda b: b["instant"], reverse=True)
        protected = set()
        for sp in savepoints:
            eligible = [b["instant"] for b in slices if b["instant"] <= sp]
            if eligible:
                protected.add(max(eligible))
        for bf in slices[retain_slices:]:
            if bf["instant"] in protected:
                continue
            os.remove(bf["abs"])
            deleted.append(bf["abs"])
    instant = _next_instant(path)
    hd = os.path.join(path, ".hoodie")
    open(os.path.join(hd, f"{instant}.clean.requested"), "w").close()
    open(os.path.join(hd, f"{instant}.clean.inflight"), "w").close()
    with open(os.path.join(hd, f"{instant}.clean"), "w") as f:
        json.dump({
            "totalFilesDeleted": len(deleted),
            "policy": "KEEP_LATEST_FILE_VERSIONS",
            "retained": retain_slices,
        }, f)
    return deleted


def hudi_rollback(path: str) -> str:
    """ROLLBACK the latest completed commit: its base-file slices are
    deleted (older slices become the live ones again), its timeline
    triplet is removed, and a completed `<instant>.rollback` records
    the action. Replacecommits are not rolled back (their replaced
    groups' visibility cannot be restored once a clean may have run) —
    gate loudly. Returns the rolled-back instant. MERGE_ON_READ
    tables dispatch to the stats-driven rollback (sources/hudi_mor)."""
    if _table_type(path) == "MERGE_ON_READ":
        from graph_db_clustering_spark.sources.hudi_mor import (
            hudi_rollback_mor,
        )

        return hudi_rollback_mor(path)
    timeline = hudi_timeline(path)
    commits = [t for t in timeline if t["action"] in ("commit",
                                                      "replacecommit")]
    if not commits:
        raise HudiError("hudi: nothing to roll back")
    last = commits[-1]
    if last["action"] == "replacecommit":
        raise NotImplementedError(
            "hudi: rollback of a replacecommit is not supported "
            "(replaced-group visibility cannot be safely restored)"
        )
    if len(commits) == 1:
        raise HudiError("hudi: will not roll back the table's only commit")
    target = last["instant"]
    # clean-safety: rolling back a commit whose PREDECESSOR slices were
    # cleaned would leave touched file groups with no slice at all —
    # silent data loss. A group is safe when the commit CREATED it
    # (prevCommit "null") or an older slice still exists on disk.
    meta = _commit_meta(path, target, "commit")
    older: set = set()
    for bf in _list_base_files(path):
        if bf["instant"] < target:
            older.add((bf["pp"], bf["file_id"]))
    for pp, stats in (meta.get("partitionToWriteStats") or {}).items():
        for s in stats:
            if s.get("prevCommit") != "null" and (
                (pp, s.get("fileId")) not in older
            ):
                raise HudiError(
                    f"hudi: cannot roll back {target} — file group "
                    f"({pp!r}, {s.get('fileId')}) has no older slice "
                    "left (cleaned); rollback would lose its rows"
                )
    for bf in _list_base_files(path):
        if bf["instant"] == target:
            os.remove(bf["abs"])
    hd = os.path.join(path, ".hoodie")
    for fname in list(os.listdir(hd)):
        m = re.match(r"^(\d{10,})(?:_(\d+))?\.", fname)
        if m and m.group(1) == target:
            os.remove(os.path.join(hd, fname))
    instant = _next_instant(path)
    with open(os.path.join(hd, f"{instant}.rollback"), "w") as f:
        json.dump({"rolledBackInstant": target}, f)
    return target


def hudi_upsert(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    log_block_format: str = "avro",
) -> str:
    """UPSERT into a CoW table: matched keys replace their stored row
    inside their existing file group (copy-on-write rewrite of ONLY
    the touched groups), unmatched keys land in fresh file groups.
    Incoming duplicates resolve latest-wins on the table's precombine
    field (duplicates without one raise). Like Hudi's default
    (non-partition-updating) index, an update whose PAYLOAD changes
    the partition column keeps its original placement: the row stays
    in its file group and `_hoodie_partition_path`, so a
    partition-pruned read can miss its new value — recode the key or
    delete+insert to genuinely move partitions. On a MERGE_ON_READ
    table, matched keys append a log block to their file slice
    instead (sources/hudi_mor.py); log_block_format picks its data
    layout — 'avro' (Hudi's default) or 'parquet'
    (hoodie.logfile.data.block.format=parquet). Returns the commit
    instant."""
    if _table_type(path) == "MERGE_ON_READ":
        from graph_db_clustering_spark.sources.hudi_mor import (
            _apply_row_changes_mor,
        )

        return _apply_row_changes_mor(
            spark, path, df, None, "UPSERT",
            log_block_format=log_block_format,
        )
    if log_block_format != "avro":
        raise HudiError(
            "hudi: log_block_format applies to MERGE_ON_READ tables "
            "(CoW writes no log files)"
        )
    return _apply_row_changes(spark, path, df, None, "UPSERT")


def hudi_delete(spark: SparkSession, path: str, keys: DataFrame) -> str:
    """DELETE by record key: touched file groups are rewritten without
    the keys; a fully-emptied group lands an explicit empty slice so
    the delete is visible. On a MERGE_ON_READ table, touched slices
    append a delete log block instead (sources/hudi_mor.py). Returns
    the commit instant."""
    if _table_type(path) == "MERGE_ON_READ":
        from graph_db_clustering_spark.sources.hudi_mor import (
            _apply_row_changes_mor,
        )

        return _apply_row_changes_mor(spark, path, None, keys, "DELETE")
    return _apply_row_changes(spark, path, None, keys, "DELETE")
