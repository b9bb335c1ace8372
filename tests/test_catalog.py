from pyspark.sql import types as T

from graph_db_clustering_spark.catalog import TABLES, load_table, register_views

EXPECTED_MIN_ROWS = {
    "region": 5,
    "nation": 25,
    "customer": 100,
    "supplier": 10,
    "part": 100,
    "orders": 1000,
    "lineitem": 5000,
    "events": 500,
    "documents": 100,
    "embeddings": 100,
}


def test_all_tables_load(spark, sf_dir):
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        assert df.count() >= EXPECTED_MIN_ROWS[name], name


def test_events_ts_is_timestamp(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    row = df.selectExpr("min(ts) AS lo", "max(ts) AS hi").first()
    assert row.lo.year == 2024 and row.hi.year == 2024


def test_register_views(spark, sf_dir):
    register_views(spark, sf_dir)
    got = spark.sql("SELECT count(*) AS c FROM lineitem").first().c
    assert got >= 5000


def _write_ntz_events(tmp_path):
    """Two events with tz-less timestamp[us] ts — the file shape the
    driver's sf tables use."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime([0, 3_600_000_000], unit="us"),  # tz-less
            "user_id": [10, 20],
            "event_type": ["a", "b"],
            "value": [1.0, 2.0],
            "props": ["{}", "{}"],
        }
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    table = table.set_column(
        table.schema.get_field_index("ts"),
        pa.field("ts", pa.timestamp("us")),  # tz-less us, as the sf tables store
        table.column("ts").cast(pa.timestamp("us")),
    )
    assert str(table.schema.field("ts").type) == "timestamp[us]"  # no tz
    pq.write_table(table, str(tmp_path / "events.parquet"))


def test_events_ntz_conf_branch(spark, tmp_path):
    """Normal path: ensure_confs turns inferTimestampNTZ off, so the
    tz-less us file scans straight to TimestampType with the stored wall
    clock interpreted in the UTC session zone."""
    _write_ntz_events(tmp_path)
    df = load_table(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = sorted(int(r.e) for r in df.selectExpr("unix_timestamp(ts) AS e").collect())
    assert got == [0, 3600]


def test_events_ntz_defensive_cast_branch(spark, tmp_path, monkeypatch):
    """Defensive path (VERDICT r5 Next #6): in a deployment where the
    inferTimestampNTZ conf could NOT be applied, the scan yields
    TIMESTAMP_NTZ and catalog.load_table's cast must still normalize to
    TimestampType at the same wall clock (UTC session zone)."""
    from graph_db_clustering_spark import catalog

    _write_ntz_events(tmp_path)
    # simulate the non-settable-conf deployment: ensure_confs skips the
    # NTZ conf, and the session has Spark's default (NTZ inference on)
    monkeypatch.setattr(
        catalog,
        "RUNTIME_CONFS",
        {
            k: v
            for k, v in catalog.RUNTIME_CONFS.items()
            if k != "spark.sql.parquet.inferTimestampNTZ.enabled"
        },
    )
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        raw = spark.read.parquet(str(tmp_path / "events.parquet"))
        assert isinstance(raw.schema["ts"].dataType, T.TimestampNTZType)  # branch armed
        df = catalog.load_table(spark, str(tmp_path), "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)
        got = sorted(
            int(r.e) for r in df.selectExpr("unix_timestamp(ts) AS e").collect()
        )
        assert got == [0, 3600]
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
