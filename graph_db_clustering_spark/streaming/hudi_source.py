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
(Hudi CoW incremental semantics). MERGE_ON_READ tables (round 12)
dispatch to _HudiMorStreamReader: one InputPartition per live file
slice, slice-local base+log merge on executors — see that class's
docstring.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


def _is_mor(path: str) -> bool:
    from graph_db_clustering_spark.sources.hudi import hudi_properties

    return hudi_properties(path).get(
        "hoodie.table.type"
    ) == "MERGE_ON_READ"


@dataclass
class _HudiMorPartition(InputPartition):
    """One FILE SLICE of a MERGE_ON_READ micro-batch: base file (may
    be None for log-only groups) + its version-ordered log files. The
    slice-local merge equals the batch reader's global merge because a
    record key lives in exactly one file group."""
    base: str  # '' -> no base file
    logs: tuple  # (abs, version) pairs, version-ordered
    lo: str
    hi: str
    valid: tuple  # completed instants at hi (block filter)
    columns: tuple


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
            for bf in _incremental_slices(
                self._path, lo, hi, raise_on_empty=False
            ):
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


class _HudiMorStreamReader(DataSourceStreamReader):
    """MERGE_ON_READ incremental source (round 12): offsets are
    completed commit/deltacommit/replacecommit instants; each
    micro-batch plans ONE InputPartition per live-at-`hi` file slice
    (metadata-sized driver work), and `read()` runs the SLICE-LOCAL
    merge on executors — base rows and decoded log rows filtered to
    in-range commit times, newest event per key wins, keys whose
    newest event is a delete emit nothing. Slice-local == global
    because a record key lives in exactly one file group (the same
    argument sources/hudi_mor.read_hudi_incremental_mor's window
    distributes)."""

    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("hudi_incremental: option 'path' is required")
        self._schema = schema
        self._start = str(options.get("startinginstant", "0"))

    def _instants(self) -> list:
        from graph_db_clustering_spark.sources.hudi import hudi_timeline

        return [
            t["instant"]
            for t in hudi_timeline(self._path)
            if t["action"] in ("commit", "deltacommit",
                               "replacecommit", "logcompaction")
        ]

    def initialOffset(self) -> dict:
        return {"instant": self._start}

    def latestOffset(self) -> dict:
        ins = self._instants()
        return {"instant": ins[-1] if ins else self._start}

    def partitions(self, start: dict, end: dict):
        from graph_db_clustering_spark.sources.hudi_mor import (
            _file_slices,
        )

        lo, hi = str(start["instant"]), str(end["instant"])
        in_range = {i for i in self._instants() if lo < i <= hi}
        cols = tuple(f.name for f in self._schema.fields)
        out = []
        if in_range:
            slices, valid = _file_slices(self._path, as_of=hi)
            for s in slices:
                # a slice can contribute only if its base was written
                # in range or it carries log files (whose block
                # instants are unknown until decode)
                if s["base_instant"] not in in_range and not s["logs"]:
                    continue
                out.append(_HudiMorPartition(
                    s["base"] or "",
                    tuple((lf["abs"], lf["version"])
                          for lf in s["logs"]),
                    lo, hi, tuple(sorted(valid)), cols,
                ))
        if not out:
            out.append(_HudiMorPartition("", (), lo, hi, (), cols))
        return out

    def read(self, partition):  # noqa: D102 (interface method)
        import json as _json

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from graph_db_clustering_spark.sources.hudi_mor import (
            AVRO_DATA_BLOCK,
            COMMAND_BLOCK,
            DELETE_BLOCK,
            H_COMPACTED_BLOCK_TIMES,
            H_INSTANT_TIME,
            H_SCHEMA,
            H_TARGET_INSTANT_TIME,
            decode_avro_block_content,
            decode_delete_block_content,
            decode_log_file,
            parse_schema,
        )

        p = partition
        if not p.base and not p.logs:
            return iter(())
        valid = frozenset(p.valid)
        lo, hi = p.lo, p.hi
        # per key: newest event by (instant, log version, block, rec)
        best: dict = {}

        def offer(key, sort_key, deleted, row):
            cur = best.get(key)
            if cur is None or sort_key > cur[0]:
                best[key] = (sort_key, deleted, row)

        if p.base:
            tbl = pq.read_table(p.base)
            ct = tbl.column("_hoodie_commit_time")
            mask = pc.and_(pc.greater(ct, lo), pc.less_equal(ct, hi))
            for row in tbl.filter(mask).to_pylist():
                offer(
                    row["_hoodie_record_key"],
                    (row["_hoodie_commit_time"], -1, -1, -1),
                    False, row,
                )
        for abs_path, version in p.logs:
            with open(abs_path, "rb") as f:
                blocks = decode_log_file(f.read())
            recs: list = []
            for b_idx, b in enumerate(blocks):
                hdr = b["header"]
                instant = hdr.get(H_INSTANT_TIME)
                if b["type"] == COMMAND_BLOCK:
                    tgt = hdr.get(H_TARGET_INSTANT_TIME)
                    recs = [r for r in recs if r[1] != tgt]
                    continue
                if instant not in valid or not (lo < instant <= hi):
                    continue
                # round 13: a log-compacted block orders at the newest
                # instant it compacted, and its rows are CARRIED
                # COPIES — only those whose preserved commit time is
                # itself in range may emit (a copy of an event a
                # previous micro-batch already delivered must not
                # re-emit)
                eff = instant
                cbt = hdr.get(H_COMPACTED_BLOCK_TIMES)
                if cbt:
                    eff = max(x.strip() for x in cbt.split(",") if x)
                if b["type"] == AVRO_DATA_BLOCK:
                    fields = parse_schema(_json.loads(hdr[H_SCHEMA]))
                    for r_idx, r in enumerate(
                        decode_avro_block_content(b["content"], fields)
                    ):
                        ct = r.get("_hoodie_commit_time")
                        if cbt and not (
                            ct is not None and lo < ct <= hi
                        ):
                            continue
                        recs.append((
                            (eff, version, b_idx, r_idx),
                            instant, False, r,
                        ))
                elif b["type"] == DELETE_BLOCK:
                    if cbt and not (lo < eff <= hi):
                        continue
                    for r_idx, d in enumerate(
                        decode_delete_block_content(b["content"])
                    ):
                        recs.append((
                            (eff, version, b_idx, r_idx),
                            instant, True,
                            {"_hoodie_record_key": d["recordKey"]},
                        ))
                else:
                    raise NotImplementedError(
                        f"hudi_incremental: log block type {b['type']}"
                    )
            for sort_key, _own, deleted, row in recs:
                offer(row["_hoodie_record_key"], sort_key, deleted, row)
        cols = list(p.columns)
        return iter(
            tuple(row.get(c) for c in cols)
            for _sk, deleted, row in sorted(
                best.values(), key=lambda t: t[0]
            )
            if not deleted
        )

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
        if _is_mor(path):
            from graph_db_clustering_spark.sources.hudi_mor import (
                _file_slices,
            )

            slices, _valid = _file_slices(path)
            bases = sorted(s["base"] for s in slices if s["base"])
            if not bases:
                raise HudiError(
                    f"hudi_incremental: no base files at {path} — "
                    "schema inference for log-only MoR tables needs "
                    "an explicit .schema(...)"
                )
            return from_arrow_schema(pq.read_schema(bases[0]))
        files = hudi_live_files(path)
        if not files:
            raise HudiError(f"hudi_incremental: no live base files at {path}")
        return from_arrow_schema(pq.read_schema(files[0]))

    def streamReader(self, schema: StructType):
        path = self.options.get("path", "")
        cls = _HudiMorStreamReader if _is_mor(path) else _HudiStreamReader
        return cls(schema, dict(self.options))
