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
