"""Streaming crawl ingestion: WARC shards landing in a directory parse
incrementally (SURVEY §2.10 + the sources/warc ingest path).

A crawler drops ``*.warc.gz`` shards into a landing directory; the file
stream source picks each new shard up exactly once (checkpointed file
log), the record parser and HTML text extraction run IN the streaming
plan — stateless projections, so append mode, no watermark, no state
store — and micro-batch outputs reuse the batch parquet layout via
foreachBatch. On a real deployment the same transformations run over
any incremental source; the directory is the natural one because WARC
shards ARE files (the unit Common Crawl publishes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graph_db_clustering_spark.operators.text import html_text_expr
from graph_db_clustering_spark.sources.warc import parse_warc_records

# binaryFile's fixed schema, restated because file STREAM sources require
# an explicit schema (no inference step in a running stream)
_BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def read_warc_stream(
    spark: SparkSession,
    landing_dir: str,
    glob: str = "*.warc*",
    max_files_per_trigger: int | None = None,
    record_types: tuple[str, ...] | None = ("response",),
) -> DataFrame:
    """Streaming analog of sources/warc.read_warc: each micro-batch
    parses the newly arrived shard files where they are read (the shard
    stays the unit of parallelism). max_files_per_trigger pins batch
    composition for deterministic replay tests."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_warc_records(reader.load(landing_dir), record_types=record_types)


def extract_pages_stream(records: DataFrame) -> DataFrame:
    """WARC response records -> (target_uri, http_status, text) with the
    codegen HTML extraction chain applied in-stream. Stateless — appends
    one row per successful HTML response."""
    return records.filter(
        (F.col("http_status") == 200)
        # servers send mixed-case content-type values ('Text/HTML')
        & F.lower(F.col("http_content_type")).startswith("text/html")
    ).select(
        "warc_file",
        "target_uri",
        "http_status",
        html_text_expr(F.col("payload").cast("string")).alias("text"),
    )


def read_avro_stream(
    spark: SparkSession,
    landing_dir: str,
    fields: list,
    glob: str = "*.avro",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming analog of sources/avro.read_avro: Avro container files
    landing in a directory decode incrementally, one task per shard.
    Streams cannot infer schema, so the writer-field layout (from
    sources.avro.parse_schema, usually probed once from an existing
    file) is explicit — exactly the file-stream contract every Spark
    source has."""
    from graph_db_clustering_spark.sources.avro import parse_avro_blobs

    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_avro_blobs(reader.load(landing_dir), fields)
