"""Snapshot maintenance: keyed upsert (MERGE emulation) over parquet.

The reference mutates node properties in place with per-row Cypher SET
statements (image_classification.py:499-503). Parquet snapshots are
immutable, so the engine's property update is copy-on-write MERGE:
new snapshot = (current ANTI-JOIN updated keys) UNION updates, written to
a fresh directory and atomically swapped in. Batched and columnar — never
per-row — and the anti-join/union is one distributed plan. (On a lakehouse
deployment the same call maps onto Delta/Iceberg MERGE INTO, which adds
file-level pruning; the semantics here are identical.)
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _cow_swap(path: str, tmp: str) -> None:
    """Two-rename copy-on-write swap shared by upsert/delete/compact.

    Contract (documented, not hidden): SINGLE WRITER, and readers must
    have opened their file handles before the swap — there is an
    unavoidable instant between the two renames where ``path`` does not
    exist, so a concurrent reader LISTING the directory in that gap
    fails with FileNotFound (readers that already enumerated files keep
    working: the old directory's inodes survive until rmtree). ``tmp``
    must live on the same filesystem as ``path`` (os.rename cannot
    cross devices) — it always does here because it is a sibling path.
    Deployments needing concurrent list-time readers should use
    ``snapshot_write``'s versioned-pointer scheme instead, which never
    unlinks the live directory."""
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> None:
    """MERGE: rows in `updates` replace current rows with the same key;
    unmatched keys are inserted. Swap is write-to-sibling + rename, so a
    failure mid-write leaves the current snapshot untouched (readers of
    the old path are unaffected; this is snapshot isolation at directory
    granularity, the same contract GraphStore gives — see _cow_swap for
    the single-writer/no-list-in-gap caveat)."""
    current = spark.read.parquet(path)
    missing = set(key_cols) - set(current.columns)
    if missing:
        raise ValueError(f"key columns not in snapshot: {sorted(missing)}")
    kept = current.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = kept.unionByName(updates, allowMissingColumns=False)

    tmp = f"{path}.__merge_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    _cow_swap(path, tmp)


def delete_where(
    spark: SparkSession, path: str, condition
) -> None:
    """Keyed/predicate delete with the same copy-on-write swap
    (DETACH DELETE analog at row granularity, database.py:42-48)."""
    current = spark.read.parquet(path)
    remaining = current.filter(~condition)
    tmp = f"{path}.__del_{uuid.uuid4().hex[:8]}"
    remaining.write.mode("overwrite").parquet(tmp)
    _cow_swap(path, tmp)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ceil(total_bytes / target_bytes) evenly sized files with the same
    copy-on-write swap as upsert_parquet. Returns the new file count.

    The operational story at scale: streaming/foreachBatch sinks and
    fine-grained upserts accumulate small files, and every downstream
    scan then pays per-file open/footer costs plus tiny tasks.
    Compaction is the standard lakehouse OPTIMIZE pass; target_bytes
    ~= one HDFS/object-store block keeps scans block-aligned."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, -(-total // target_bytes))
    current = spark.read.parquet(path)
    tmp = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    current.repartition(n_files).write.mode("overwrite").parquet(tmp)
    _cow_swap(path, tmp)
    return n_files


def snapshot_write(df: DataFrame, path: str) -> int:
    """Versioned snapshot write (time travel, single-writer): data lands
    in ``{path}/v=N`` and ``{path}/_LATEST`` flips to N atomically
    (os.replace) only AFTER the write completes. Readers pinned to a
    version are never disturbed; a crash mid-write leaves a dangling
    v-dir but the pointer — and therefore every reader — still sees the
    last complete snapshot. Returns the new version number.

    This is the directory-level core of what Delta/Iceberg do with
    transaction logs; on a lakehouse deployment the same call maps to a
    table write creating a new snapshot. Single writer by contract — a
    distributed committer needs the real table formats."""
    os.makedirs(path, exist_ok=True)
    version = latest_version(path) + 1
    df.write.mode("overwrite").parquet(os.path.join(path, f"v={version}"))
    tmp = os.path.join(path, f"_LATEST.tmp.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(path, "_LATEST"))
    return version


def latest_version(path: str) -> int:
    """Current committed version (0 = no snapshot yet)."""
    try:
        with open(os.path.join(path, "_LATEST")) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def snapshot_versions(path: str) -> list[int]:
    """All COMMITTED versions on disk (dangling > _LATEST dirs from
    crashed writes are excluded)."""
    latest = latest_version(path)
    out = []
    for name in os.listdir(path):
        if name.startswith("v="):
            v = int(name[2:])
            if v <= latest:
                out.append(v)
    return sorted(out)


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot: the committed latest by default, or a pinned
    historical version (time travel)."""
    v = latest_version(path) if version is None else version
    if v < 1 or (version is not None and v not in snapshot_versions(path)):
        raise ValueError(f"no committed snapshot version {version} at {path}")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def snapshot_vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` committed versions (plus
    any dangling uncommitted dirs). Returns the removed versions."""
    versions = snapshot_versions(path)
    latest = latest_version(path)
    drop = set(versions[:-keep_last]) if keep_last > 0 else set(versions)
    removed = []
    for name in list(os.listdir(path)):
        if not name.startswith("v="):
            continue
        v = int(name[2:])
        if v > latest or v in drop:
            shutil.rmtree(os.path.join(path, name))
            removed.append(v)
    return sorted(v for v in removed if v <= latest)


def column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style per-column statistics -> one row per column:
    (column, n_rows, n_null, n_distinct, min_value, max_value) with the
    extrema stringified so heterogeneous column types share one schema.

    ONE aggregate job computes every column's stats (the agg list is
    built per column; Catalyst evaluates them in a single pass with
    map-side partials) — the stats pass a warehouse runs after loads to
    feed pruning decisions and data-quality dashboards."""
    from pyspark.sql import functions as F

    # one shared row count (column-independent — no duplicate aggregate
    # per column) + per-column null/ndv/extrema; every SUM coalesces so
    # an EMPTY frame yields zeros, not int(None)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
            ).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__ndv"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).first()
    spark = df.sparkSession
    out = [
        (
            c,
            int(row["__n"]),
            int(row[f"{c}__nulls"]),
            int(row[f"{c}__ndv"]),
            row[f"{c}__min"],
            row[f"{c}__max"],
        )
        for c in cols
    ]
    return spark.createDataFrame(
        out,
        "column string, n_rows bigint, n_null bigint, n_distinct bigint, "
        "min_value string, max_value string",
    )


def check_constraints(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Deequ-style data-quality checks -> one row per rule:
    (rule, violations, passed). Rules:
      ("not_null", col)            null entries
      ("unique", col)              rows beyond one per value
      ("in_range", col, lo, hi)    non-null values outside [lo, hi]
      ("matches", col, regex)      non-null values not fully matching
      ("non_negative", col)        negative values

    Violation counts for every rule except `unique` come from ONE
    aggregate pass (conditional sums, map-side partials); each unique
    rule adds one countDistinct in the same pass (violations =
    non-null rows - distinct values). All codegen — a 100 TB
    quality gate is one scan."""
    from pyspark.sql import functions as F

    aggs = []
    names = []
    for i, rule in enumerate(rules):
        kind, col = rule[0], rule[1]
        names.append(f"{kind}({', '.join(str(x) for x in rule[1:])})")
        if kind == "not_null":
            expr = F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
        elif kind == "unique":
            expr = (
                F.sum(F.when(F.col(col).isNotNull(), 1).otherwise(0))
                - F.countDistinct(col)
            )
        elif kind == "in_range":
            lo, hi = rule[2], rule[3]
            expr = F.sum(
                F.when(
                    F.col(col).isNotNull()
                    & ((F.col(col) < lo) | (F.col(col) > hi)),
                    1,
                ).otherwise(0)
            )
        elif kind == "matches":
            # FULL match, not rlike's substring-find: anchor the pattern
            expr = F.sum(
                F.when(
                    F.col(col).isNotNull()
                    & ~F.col(col).rlike(f"^(?:{rule[2]})$"),
                    1,
                ).otherwise(0)
            )
        elif kind == "non_negative":
            expr = F.sum(F.when(F.col(col) < 0, 1).otherwise(0))
        else:
            raise ValueError(f"unknown constraint kind {kind!r}")
        aggs.append(F.coalesce(expr, F.lit(0)).alias(f"r{i}"))
    row = df.agg(*aggs).first()
    spark = df.sparkSession
    out = [
        (names[i], int(row[f"r{i}"]), int(row[f"r{i}"]) == 0)
        for i in range(len(rules))
    ]
    return spark.createDataFrame(
        out, "rule string, violations bigint, passed boolean"
    )


def scd2_history(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    dedup_consecutive: bool = True,
) -> DataFrame:
    """Slowly-Changing-Dimension type 2: a change feed (one row per
    observed attribute state, keyed + timestamped) -> the versioned
    history table with validity intervals (round 7).

    Returns every input column plus (valid_from, valid_to, is_current):
    valid_from = the row's own timestamp, valid_to = the NEXT change's
    timestamp for the same key (NULL while current), is_current on the
    key's latest row. With ``dedup_consecutive`` (the SCD contract),
    a change row whose attribute values equal the key's previous state
    is dropped first, so intervals only break on real changes.

    Plan: one window pass partitioned by the key (lag to drop no-op
    changes, lead for the interval end) — the per-key window is the
    canonical distributed SCD2 build; keys hash-partition
    independently, so 100 TB of history scales by key cardinality,
    and AQE handles hot keys."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    attrs = [c for c in changes.columns if c not in (key_col, ts_col)]
    w = Window.partitionBy(key_col).orderBy(ts_col)
    df = changes
    if dedup_consecutive and attrs:
        state = F.struct(*attrs)
        df = (
            df.withColumn("__prev", F.lag(state).over(w))
            .filter(
                F.col("__prev").isNull() | ~state.eqNullSafe(F.col("__prev"))
            )
            .drop("__prev")
        )
    out = (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    return out


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC feed (Debezium-style I/U/D rows, round 7) to a
    snapshot: for each key, the change with the highest ``seq_col``
    wins — an I/U upserts the row's attributes, a D deletes the key;
    keys never mentioned in the feed pass through unchanged.

    ``changes`` columns: key_col, seq_col, op_col ('I' | 'U' | 'D'),
    plus the attribute columns (ignored on 'D'). Returns the new
    snapshot with the snapshot's column set.

    Plan: ONE max(struct(seq, op, attrs...)) hash aggregate collapses
    the feed to its per-key latest change (map-side partials — the
    feed shuffles once, pre-reduced), then one key-keyed anti-join +
    union against the snapshot. No windows; the aggregate IS the
    latest-wins rule. Malformed op values raise before anything
    executes... via a runtime assert_true guard inside the aggregate
    (controlled failure on corrupt feeds, the repo contract)."""
    from pyspark.sql import functions as F

    attrs = [c for c in snapshot.columns if c != key_col]
    missing = set([key_col, seq_col, op_col]) - set(changes.columns)
    if missing:
        raise ValueError(f"cdc_apply: feed missing columns {sorted(missing)}")
    guarded_op = F.when(
        F.col(op_col).isin("I", "U", "D"), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(F.lit("cdc_apply: bad op value: "), F.col(op_col))
        )
    )
    latest = (
        changes.withColumn(op_col, guarded_op)
        .groupBy(key_col)
        .agg(
            F.max(
                F.struct(
                    F.col(seq_col).alias("seq"),
                    F.col(op_col).alias("op"),
                    *[F.col(c).alias(c) for c in attrs],
                )
            ).alias("m")
        )
        .select(key_col, "m.op", *[F.col(f"m.{c}").alias(c) for c in attrs])
    )
    upserts = latest.filter(F.col("op") != "D").drop("op")
    touched = latest.select(key_col)
    kept = snapshot.join(touched, key_col, "left_anti")
    return kept.unionByName(upserts.select(key_col, *attrs))


def snapshot_diff(
    spark: SparkSession,
    path: str,
    v_old: int,
    v_new: int,
    key_cols: list,
) -> DataFrame:
    """Row-level diff between two snapshot versions: (change, keys...)
    with change in {'added', 'removed', 'changed'} — the audit readout
    a time-travel store owes its users ("what did yesterday's load
    actually do"). Rows are compared by an md5 over the full row's
    canonical JSON (sorted column order), so any non-key column change
    counts; the diff itself is one full-outer join keyed by key_cols —
    never a row-by-row driver loop."""
    from pyspark.sql import functions as F

    old = snapshot_read(spark, path, v_old)
    new = snapshot_read(spark, path, v_new)
    cols = sorted(old.columns)

    def fingerprint(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *key_cols,
            F.md5(F.to_json(F.struct(*[F.col(c) for c in cols]))).alias(f"_h_{tag}"),
        )

    j = fingerprint(old, "o").join(fingerprint(new, "n"), key_cols, "full_outer")
    return (
        j.select(
            F.when(F.col("_h_o").isNull(), F.lit("added"))
            .when(F.col("_h_n").isNull(), F.lit("removed"))
            .when(F.col("_h_o") != F.col("_h_n"), F.lit("changed"))
            .alias("change"),
            *key_cols,
        )
        .filter(F.col("change").isNotNull())
    )


# ---------------------------------------------------------------------------
# incremental materialized aggregate
# ---------------------------------------------------------------------------

_MV_FNS = {"sum", "count", "min", "max"}


def mv_build(
    df: DataFrame,
    path: str,
    keys: list,
    measures: dict,
) -> None:
    """Materialize an aggregate view: measures maps output name ->
    (source column, fn) with fn in {sum, count, min, max} — the
    ALGEBRAIC aggregates, chosen precisely because partial states merge
    by a pure function (sum/count add, min/max fold), which is what
    makes mv_apply_delta possible without re-reading the fact table.
    (avg = sum/count at read time; holistic aggregates — median,
    distinct — need sketches, not this.)"""
    _mv_agg(df, keys, measures).write.mode("overwrite").parquet(path)


def _mv_agg(df: DataFrame, keys: list, measures: dict) -> DataFrame:
    from pyspark.sql import functions as F

    aggs = []
    for name, (col, fn) in measures.items():
        if fn not in _MV_FNS:
            raise ValueError(f"mv: unsupported aggregate {fn!r}")
        if fn == "count":
            aggs.append(F.count(col).alias(name))
        else:
            aggs.append(getattr(F, fn)(col).alias(name))
    return df.groupBy(*keys).agg(*aggs)


def mv_apply_delta(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list,
    measures: dict,
) -> None:
    """Fold an INSERT delta into the materialized view: aggregate the
    delta (small), full-outer-merge with the state by key, combine
    per-measure (sum/count add, min/max fold via least/greatest), and
    COW-swap the state dir. Cost scales with delta + state size, never
    the history — the whole point of maintaining the view."""
    from pyspark.sql import functions as F

    state = spark.read.parquet(path)
    d = _mv_agg(delta, keys, measures)
    merged = state.alias("s").join(d.alias("d"), keys, "full_outer")
    exprs = []
    for name, (_, fn) in measures.items():
        s, dd = F.col(f"s.{name}"), F.col(f"d.{name}")
        if fn in ("sum", "count"):
            exprs.append(
                (F.coalesce(s, F.lit(0)) + F.coalesce(dd, F.lit(0))).alias(name)
            )
        elif fn == "min":
            # Spark's least/greatest skip NULL inputs (a key absent from
            # one side has a NULL partial); coalesce is belt-and-braces
            # for the all-null case
            exprs.append(F.coalesce(F.least(s, dd), s, dd).alias(name))
        else:
            exprs.append(F.coalesce(F.greatest(s, dd), s, dd).alias(name))
    out = merged.select(*keys, *exprs)
    tmp = path + ".tmp_swap"
    out.write.mode("overwrite").parquet(tmp)
    _cow_swap(path, tmp)


def mv_read(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
