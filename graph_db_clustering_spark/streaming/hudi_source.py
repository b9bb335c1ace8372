"""Hudi incremental pull as a Structured Streaming SOURCE (round 11
continuation — the CoW twin of streaming/delta_cdf_source):

    spark.dataSource.register(HudiIncrementalDataSource)
    df = (spark.readStream.format("hudi_incremental")
          .option("path", "/data/my_table")
          .option("startingInstant", "20240101000000001").load())

Offsets are completed commit INSTANTS ({"instant": s}): each
micro-batch covers the commit range (start, end]. `partitions()`
enumerates one input partition per base file WRITTEN by an in-range
commit (driver-side timeline walk — the same KB-scale cost
sources/hudi.read_hudi_incremental pays); `read()` runs ON EXECUTORS,
decoding the parquet slice with pyarrow and filtering to rows whose
`_hoodie_commit_time` falls in the range — copy-on-write rewrites
PRESERVE carried rows' commit times (sources/hudi.hudi_upsert), so a
survivor copied into an in-range slice is excluded exactly and a row
is emitted once, by the commit that wrote it. Deletes emit nothing
(Hudi CoW incremental semantics). MERGE_ON_READ tables gate loudly via
hudi_timeline before any batch is planned.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


def _gate_mor(path: str) -> None:
    from graph_db_clustering_spark.sources.hudi import hudi_properties

    if hudi_properties(path).get(
        "hoodie.table.type"
    ) == "MERGE_ON_READ":
        raise NotImplementedError(
            "hudi_incremental: MERGE_ON_READ streaming source — the "
            "batch incremental MoR reader exists "
            "(sources/hudi_mor.read_hudi_incremental_mor) but log-"
            "block micro-batch planning is not implemented"
        )


@dataclass
class _HudiPartition(InputPartition):
    path: str  # absolute base-file path ('' -> empty marker)
    lo: str  # exclusive lower commit-time bound
    hi: str  # inclusive upper bound
    columns: tuple = ()


class _HudiStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("hudi_incremental: option 'path' is required")
        _gate_mor(self._path)
        self._schema = schema
        # rows written AFTER this instant (exclusive), i.e. the
        # batch-side read_hudi_incremental(begin) contract
        self._start = str(options.get("startinginstant", "0"))

    def _instants(self) -> list:
        from graph_db_clustering_spark.sources.hudi import hudi_timeline

        return [
            t["instant"]
            for t in hudi_timeline(self._path)
            if t["action"] in ("commit", "replacecommit")
        ]

    def initialOffset(self) -> dict:
        return {"instant": self._start}

    def latestOffset(self) -> dict:
        ins = self._instants()
        return {"instant": ins[-1] if ins else self._start}

    def partitions(self, start: dict, end: dict):
        from graph_db_clustering_spark.sources.hudi import (
            _incremental_slices,
        )

        lo, hi = str(start["instant"]), str(end["instant"])
        in_range = {i for i in self._instants() if lo < i <= hi}
        cols = tuple(f.name for f in self._schema.fields)
        out = []
        if in_range:
            # shared replaced-group-aware selection: a batch spanning
            # an upsert and a later clustering replacecommit must not
            # emit the updated rows twice (sources/hudi docstring)
            for bf in _incremental_slices(self._path, lo, hi):
                out.append(_HudiPartition(bf["abs"], lo, hi, cols))
        if not out:
            out.append(_HudiPartition("", lo, hi, cols))
        return out

    def read(self, partition):  # noqa: D102 (interface method)
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if not partition.path:
            return iter(())
        tbl = pq.read_table(partition.path)
        ct = tbl.column("_hoodie_commit_time")
        mask = pc.and_(
            pc.greater(ct, partition.lo),
            pc.less_equal(ct, partition.hi),
        )
        tbl = tbl.filter(mask)
        want = list(partition.columns)
        missing = [c for c in want if c not in tbl.column_names]
        if missing:
            raise ValueError(
                f"hudi_incremental: file {partition.path} missing "
                f"columns {missing}"
            )
        return iter(tbl.select(want).to_batches())

    def commit(self, end: dict) -> None:
        pass  # offsets are durable timeline instants


class HudiIncrementalDataSource(DataSource):
    """`spark.readStream.format("hudi_incremental")` — module docstring."""

    @classmethod
    def name(cls) -> str:
        return "hudi_incremental"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        from graph_db_clustering_spark.sources.hudi import (
            HudiError,
            hudi_live_files,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError("hudi_incremental: option 'path' is required")
        files = hudi_live_files(path)
        if not files:
            raise HudiError(f"hudi_incremental: no live base files at {path}")
        return from_arrow_schema(pq.read_schema(files[0]))

    def streamReader(self, schema: StructType):
        return _HudiStreamReader(schema, dict(self.options))
