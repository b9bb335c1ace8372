"""Gate every declared query against the DuckDB oracle at sf0.001 —
a local mirror of the driver's t2 check (row count + schema + values)."""

import pytest

from graph_db_clustering_spark.oracle import compare
from graph_db_clustering_spark.queries import ORACLE, QUERIES

pytestmark = pytest.mark.slow  # heavy tier (r15): run with -m slow


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


def test_order_by_detection():
    from graph_db_clustering_spark.oracle import has_toplevel_order_by

    assert has_toplevel_order_by("SELECT a FROM t ORDER BY a")
    assert has_toplevel_order_by("SELECT a FROM t ORDER BY a\n")
    assert has_toplevel_order_by(
        "SELECT * FROM (SELECT a FROM t ORDER BY b) s ORDER BY a"
    )
    assert not has_toplevel_order_by("SELECT a FROM t")
    # subquery-only ORDER BY does not order the outer result
    assert not has_toplevel_order_by(
        "SELECT * FROM (SELECT a FROM t ORDER BY a) s"
    )


def test_most_declared_oracles_are_order_checked():
    """The determinism rule says declared queries end with ORDER BY; the
    ordered-compare mode must actually engage for them (a regression to
    canonical-only comparison would silently weaken the local gate)."""
    from graph_db_clustering_spark.oracle import has_toplevel_order_by

    ordered = [n for n in ORACLE if has_toplevel_order_by(ORACLE[n])]
    assert len(ordered) >= 0.9 * len(ORACLE), sorted(set(ORACLE) - set(ordered))


def test_dropped_order_by_now_fails(spark, sf_dir):
    """Mutation test (VERDICT r6 Next #5): a Spark query whose ordering
    disagrees with its declared ORDER BY must FAIL the local harness."""
    from pyspark.sql import functions as F

    from graph_db_clustering_spark.catalog import load_table

    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    wrong = nat.orderBy(F.desc("n_nationkey"))  # declared: ascending
    report = compare(
        wrong, "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey", sf_dir
    )
    assert report["ordered_compare"] and not report["match"]
    right = nat.orderBy("n_nationkey")
    assert compare(
        right, "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey", sf_dir
    )["match"]
