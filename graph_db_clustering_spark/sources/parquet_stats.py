"""Footer-statistics file skipping for PLAIN parquet directories —
the Delta/Iceberg pruning win without any table format.

Parquet files carry per-row-group min/max/null-count statistics in
their FOOTER (the format spec's ColumnMetaData); a directory of files
range-clustered on some column (e.g. written via repartitionByRange,
or naturally time-ordered logs) can answer a range predicate by
opening only the intersecting files. Spark's own scan prunes ROW
GROUPS after opening every file; this prunes the FILE LIST before the
scan plan is even built, which also prunes the driver's task list.

Scale shape: footer reads are DISTRIBUTED (one mapInPandas task batch
per slice of the file list — each task reads only its files' footers,
a few KB each); the driver receives one (path, stats-JSON) row per
file — O(files), the same cost any FileIndex pays — and hands the
surviving paths to the native reader.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class ParquetStatsError(ValueError):
    pass


def parquet_file_stats(
    spark: SparkSession, path: str, columns: list, glob: str = "*.parquet"
) -> list[dict]:
    """Per-file footer stats for `columns`: [{'path', 'num_rows',
    'min_values', 'max_values', 'null_counts'}] — min/max maps omit a
    column when any row group lacks statistics for it (absent stats
    must widen, never narrow, the keep-set)."""
    import fnmatch

    if isinstance(path, (list, tuple)):  # explicit file list (hudi reuse)
        names = sorted(path)
    else:
        names = sorted(
            os.path.join(path, n)
            for n in os.listdir(path)
            if fnmatch.fnmatch(n, glob)
        )
    if not names:
        raise ParquetStatsError(f"no files matching {glob!r} under {path}")

    def footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                md = pq.read_metadata(p)
                arrow_names = md.schema.to_arrow_schema().names
                mins: dict = {}
                maxs: dict = {}
                nulls: dict = {}
                complete: dict = {c: True for c in columns}
                for rg in range(md.num_row_groups):
                    for ci in range(md.num_columns):
                        col = md.row_group(rg).column(ci)
                        name = (
                            arrow_names[ci]
                            if ci < len(arrow_names)
                            else col.path_in_schema
                        )
                        if name not in columns:
                            continue
                        st = col.statistics
                        if st is None or st.min is None or st.max is None:
                            complete[name] = False
                            continue
                        mins[name] = min(mins.get(name, st.min), st.min)
                        maxs[name] = max(maxs.get(name, st.max), st.max)
                        nulls[name] = nulls.get(name, 0) + (st.null_count or 0)
                for c in columns:
                    if not complete.get(c):
                        mins.pop(c, None)
                        maxs.pop(c, None)
                out.append(
                    (
                        p,
                        md.num_rows,
                        json.dumps(
                            {
                                "min": {k: str(v) for k, v in mins.items()},
                                "max": {k: str(v) for k, v in maxs.items()},
                                "raw_min": mins
                                if all(
                                    isinstance(v, (int, float))
                                    for v in mins.values()
                                )
                                else None,
                                "raw_max": maxs
                                if all(
                                    isinstance(v, (int, float))
                                    for v in maxs.values()
                                )
                                else None,
                                "nulls": nulls,
                            },
                            default=str,
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=["path", "num_rows", "stats"])

    paths = spark.createDataFrame(
        [(n,) for n in names], "path string"
    ).repartition(min(len(names), 32))
    rows = paths.mapInPandas(
        footers, "path string, num_rows long, stats string"
    ).collect()
    out = []
    for r in sorted(rows, key=lambda x: x["path"]):
        st = json.loads(r["stats"])
        mins = st["raw_min"] if st.get("raw_min") is not None else st["min"]
        maxs = st["raw_max"] if st.get("raw_max") is not None else st["max"]
        out.append(
            {
                "path": r["path"],
                "num_rows": r["num_rows"],
                "min_values": mins or {},
                "max_values": maxs or {},
                "null_counts": st.get("nulls") or {},
            }
        )
    return out


def read_parquet_pruned(
    spark: SparkSession,
    path: str,
    column: str,
    lo,
    hi,
    glob: str = "*.parquet",
) -> tuple[DataFrame, int, int]:
    """Read only the files whose footer [min, max] for `column`
    intersects [lo, hi]; files without usable stats for the column are
    always kept. Returns (df, files_read, files_skipped) — the caller
    still applies the row-level predicate; this prunes I/O and tasks,
    it does not replace the filter."""
    stats = parquet_file_stats(spark, path, [column], glob)
    keep, skipped = [], 0
    for s in stats:
        mv, xv = s["min_values"], s["max_values"]
        disjoint = False
        try:
            if column in mv and column in xv:
                disjoint = xv[column] < lo or mv[column] > hi
        except TypeError:
            disjoint = False  # incomparable types: never skip
        if disjoint:
            skipped += 1
        else:
            keep.append(s["path"])
    if not keep:
        raise ParquetStatsError(
            "parquet_stats: every file pruned — empty selection"
        )
    return spark.read.parquet(*keep), len(keep), skipped
