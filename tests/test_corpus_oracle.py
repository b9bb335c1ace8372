"""Gate every declared query against the DuckDB oracle at sf0.001 —
a local mirror of the driver's t2 check (row count + schema + values)."""

import pytest

from graph_db_clustering_spark.oracle import compare
from graph_db_clustering_spark.queries import ORACLE, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    if name not in ORACLE:
        # rows-only queries: just assert they run and return a stable schema
        df = QUERIES[name](spark, sf_dir)
        assert df.columns
        assert df.count() >= 0
        return
    report = compare(QUERIES[name](spark, sf_dir), ORACLE[name], sf_dir)
    assert report.get("match"), f"{name}: {report}"
