"""Iceberg append-scan as a Structured Streaming SOURCE (round 14 —
completes the lakehouse streaming trio beside delta_cdf_source and
hudi_source):

    spark.dataSource.register(IcebergAppendDataSource)
    df = (spark.readStream.format("iceberg_incremental")
          .option("path", "/data/my_table")
          .option("startingSnapshotId", "1").load())

Offsets are SNAPSHOT IDS ({"snapshot_id": s}): each micro-batch
covers the snapshot range (start, end] and emits exactly the rows of
the data files ADDED in that range — the same append-only contract
`sources/iceberg.read_iceberg_incremental` enforces batch-side (a
file removal or a new delete file in range raises; Iceberg's own
incremental scan declares the identical restriction). `partitions()`
is a driver-side manifest diff (KB-scale); `read()` runs ON
EXECUTORS, reading each added parquet file with pyarrow — every row
of an added file is new by definition, so no row-level filter is
needed, and a row is emitted exactly once, by the snapshot whose
manifest added its file.

startingSnapshotId (default 0 = before the first snapshot) is
EXCLUSIVE, mirroring the batch reader's `from_snapshot_id`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


@dataclass
class _IcebergPartition(InputPartition):
    path: str  # absolute parquet data-file path ('' -> empty marker)
    columns: tuple = ()


def _snapshot_ids(path: str) -> list:
    """Snapshot ids in COMMIT ORDER (the metadata `snapshots` list is
    append-ordered; ids themselves need not be monotonic in general
    Iceberg, so order comes from the list, not the id values)."""
    import json

    from graph_db_clustering_spark.sources.iceberg import _metadata_file

    with open(_metadata_file(path)) as f:
        meta = json.load(f)
    return [s["snapshot-id"] for s in meta.get("snapshots") or []]


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                "iceberg_incremental: option 'path' is required"
            )
        self._schema = schema
        self._start = int(options.get("startingsnapshotid", 0))

    def initialOffset(self) -> dict:
        return {"snapshot_id": self._start}

    def latestOffset(self) -> dict:
        ids = _snapshot_ids(self._path)
        return {"snapshot_id": ids[-1] if ids else self._start}

    def partitions(self, start: dict, end: dict):
        from graph_db_clustering_spark.sources.iceberg import (
            _snapshot_entries,
        )

        lo = int(start["snapshot_id"])
        hi = int(end["snapshot_id"])
        cols = tuple(f.name for f in self._schema.fields)
        out = []
        if lo != hi:
            # the same append-only diff the batch reader runs — lo=0
            # (before the first snapshot) diffs against the empty set
            data_b, dels_b, _ = _snapshot_entries(self._path, hi)
            if lo == 0:
                paths_a: set = set()
                dels_a: list = []
            else:
                data_a, dels_a, _ = _snapshot_entries(self._path, lo)
                paths_a = {r["path"] for r in data_a}
            if {(d["path"], d["seq"]) for d in dels_a} != {
                (d["path"], d["seq"]) for d in dels_b
            } or paths_a - {r["path"] for r in data_b}:
                raise NotImplementedError(
                    "iceberg_incremental: the snapshot range contains "
                    "a non-append commit (file removal or delete "
                    "file) — append-only streaming only"
                )
            for r in data_b:
                if r["path"] in paths_a:
                    continue
                if r["fmt"] != "PARQUET":
                    raise NotImplementedError(
                        "iceberg_incremental: streaming reads parquet "
                        f"data files only, got {r['fmt']}"
                    )
                out.append(_IcebergPartition(r["path"], cols))
        if not out:
            out.append(_IcebergPartition("", cols))
        return out

    def read(self, partition):  # noqa: D102 (interface method)
        import pyarrow.parquet as pq

        if not partition.path:
            return iter(())
        tbl = pq.read_table(partition.path)
        want = list(partition.columns)
        missing = [c for c in want if c not in tbl.column_names]
        if missing:
            raise ValueError(
                f"iceberg_incremental: file {partition.path} missing "
                f"columns {missing}"
            )
        return iter(tbl.select(want).to_batches())

    def commit(self, end: dict) -> None:
        pass  # offsets are durable snapshot ids


class IcebergAppendDataSource(DataSource):
    """`spark.readStream.format("iceberg_incremental")` — module
    docstring."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_incremental"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        from graph_db_clustering_spark.sources.iceberg import (
            IcebergError,
            iceberg_live_files,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError(
                "iceberg_incremental: option 'path' is required"
            )
        files = iceberg_live_files(path)
        if not files:
            raise IcebergError(
                f"iceberg_incremental: no live data files at {path}"
            )
        return from_arrow_schema(pq.read_schema(sorted(files)[0]))

    def streamReader(self, schema: StructType):
        return _IcebergStreamReader(schema, dict(self.options))
