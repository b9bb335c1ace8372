"""File sources and sinks (SURVEY §2.1).

The reference's ingestion is a driver-side directory listing fed through
``sc.parallelize`` (image_classification.py:57-63, 75) — the file list AND
the bytes transit the driver. Here every source is an executor-side scan:
the driver only holds the plan, listing and reading happen in tasks, and
Catalyst prunes columns/partitions before any byte is read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Directory of opaque files -> DataFrame(path, modificationTime,
    length, content: binary). The binaryFile source replaces the
    reference's driver-side listdir + parallelize
    (image_classification.py:57-75); listing and IO are distributed and
    `pathGlobFilter` prunes at the source."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True
) -> DataFrame:
    """CSV with an explicit schema — never inferSchema (inference is a
    full extra pass over the data and nondeterministic on dirty input)."""
    return spark.read.csv(path, schema=schema, header=header)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """JSON-lines with an explicit schema; unparseable rows land in
    `_corrupt_record` (PERMISSIVE) instead of failing the scan."""
    return spark.read.schema(schema).json(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sort-ordered) table: rows are
    hash-clustered into `buckets` files per partition by `bucket_cols`.
    Two tables bucketed the same way join WITHOUT an exchange — the
    shuffle is paid once at write time instead of per query, which is the
    right trade for fact tables joined on the same key repeatedly (the
    100 TB posture: lineitem/orders both bucketed by orderkey)."""
    w = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink with optional hive-style partitioning — the layout that
    makes partition pruning work for downstream readers (e.g. events
    partitioned by day: a one-day query scans one directory)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (columnar alternative to parquet, zlib by default) —
    same partitioning semantics as the parquet sink; Spark's vectorized
    ORC reader gives the same predicate-pushdown/column-pruning behavior
    asserted for parquet in tests/test_plans.py."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False, line_sep: str | None = None
) -> DataFrame:
    """Plain-text source -> DataFrame(value: string), one row per line
    (or per file with whole_file — the raw-document ingest shape for the
    text pipeline: pair with input_file_name() for ids). Splittable by
    line, so a 100 TB text corpus parallelizes across tasks without any
    driver-side listing."""
    reader = spark.read
    if line_sep:
        reader = reader.option("lineSep", line_sep)
    return reader.text(path, wholetext=whole_file)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Text sink: df must be a single string column."""
    df.write.mode(mode).text(path)


def _avro_available(spark: SparkSession) -> bool:
    try:
        spark.read.format("avro").schema("x int").load("/nonexistent-avro-probe")
        return True
    except Exception as ex:  # classify: missing data source vs missing path
        return "Failed to find data source" not in str(ex)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro source. Prefers Spark's JVM reader when the external
    spark-avro module is on the classpath (fastest path); in this
    container it is not deployed, so the call FALLS BACK to the
    pure-Python object-container reader (sources/avro.read_avro —
    zigzag/union/deflate decoding in Arrow batches, one task per file).
    The former NotImplementedError gate is gone: flat-record Avro now
    reads natively either way; nested schemas keep a scoped gate inside
    the fallback."""
    if _avro_available(spark):
        return spark.read.format("avro").load(path)  # pragma: no cover
    from graph_db_clustering_spark.sources.avro import read_avro as _py_read

    return _py_read(spark, path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    if not _avro_available(df.sparkSession):
        raise NotImplementedError(
            "avro data source not on the classpath (needs the spark-avro "
            "package); use parquet/orc in this environment"
        )
    df.write.mode(mode).format("avro").save(path)  # pragma: no cover


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """XML source (native in Spark 4 — the former spark-xml package is
    built in): one row per `row_tag` element. Pass an explicit schema
    for production scans — like CSV/JSON, inference is a full extra pass
    over the data. Splittable parse, so large XML dumps (e.g. wiki
    exports — a standard pretraining-corpus ingest) parallelize across
    tasks."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """XML sink (round-trips read_xml)."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)
