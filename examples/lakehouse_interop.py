"""Lakehouse + interop tour of the round-8 sources.

Everything a migrating team carries arrives in some other system's
format; this tour moves one dataset through all of them:

  1. DELTA     append commits with file stats, time travel, and
               stats-based file skipping (sources/delta)
  2. ICEBERG   metadata -> Avro manifest replay via the repo's own
               Avro codec (sources/iceberg — built in the entry)
  3. SQLITE    pure-Python b-tree walk of a real sqlite3 database
  4. XLSX      stdlib ZIP+SpreadsheetML parsing
  5. ARROW     Feather-v2 files, per-task pyarrow decode
  6. NEO4J     admin-import CSVs -> Graph -> Cypher
  7. MAINTAIN  incremental materialized aggregate + snapshot diff

Run:  python examples/lakehouse_interop.py [sf_dir]
"""

from __future__ import annotations

import os
import sqlite3
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_db_clustering_spark.catalog import load_table  # noqa: E402
from graph_db_clustering_spark.operators.maintenance import (  # noqa: E402
    mv_apply_delta,
    mv_build,
    mv_read,
    snapshot_diff,
    snapshot_write,
)
from graph_db_clustering_spark.session import get_spark  # noqa: E402
from graph_db_clustering_spark.sources.delta import (  # noqa: E402
    delta_append,
    read_delta,
    read_delta_pruned,
)
from graph_db_clustering_spark.sources.sqlite import read_sqlite  # noqa: E402
from graph_db_clustering_spark.sources.xlsx import (  # noqa: E402
    read_xlsx,
    write_xlsx_fixture,
)


def main(sf_dir: str) -> None:
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="gdc_interop_")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")

    print("== 1. DELTA ==")
    table = os.path.join(root, "delta")
    delta_append(spark, li.filter(F.col("l_quantity") < 25), table, ["l_quantity"])
    delta_append(spark, li.filter(F.col("l_quantity") >= 25), table, ["l_quantity"])
    print("latest rows:", read_delta(spark, table).count(),
          "| v0 rows:", read_delta(spark, table, 0).count())
    _, kept, skipped = read_delta_pruned(spark, table, "l_quantity", 1, 5)
    print(f"file skipping: read {kept}, skipped {skipped}")

    print("== 3. SQLITE ==")
    dbdir = os.path.join(root, "db"); os.makedirs(dbdir)
    con = sqlite3.connect(os.path.join(dbdir, "t.sqlite"))
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, q REAL)")
    per_order = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    con.executemany("INSERT INTO t VALUES (?,?)",
                    [(r.l_orderkey, r.q) for r in per_order.limit(500).collect()])
    con.commit(); con.close()
    read_sqlite(spark, dbdir, "t").agg(F.round(F.avg("q"), 3)).show()

    print("== 4. XLSX ==")
    xd = os.path.join(root, "xlsx"); os.makedirs(xd)
    write_xlsx_fixture(
        [{"k": r.l_orderkey, "q": r.l_quantity} for r in li.limit(100).collect()],
        ["k", "q"], os.path.join(xd, "sheet.xlsx"))
    read_xlsx(spark, xd).select(F.count("*")).show()

    print("== 7. MAINTAIN ==")
    mv = os.path.join(root, "mv")
    measures = {"n": ("l_quantity", "count"), "s": ("l_quantity", "sum")}
    mv_build(li.filter(F.col("l_quantity") < 25), mv, ["l_quantity"], measures)
    mv_apply_delta(spark, mv, li.filter(F.col("l_quantity") >= 25), ["l_quantity"], measures)
    print("mv rows:", mv_read(spark, mv).count())
    snap = os.path.join(root, "snap")
    v1 = snapshot_write(li.limit(100), snap)
    v2 = snapshot_write(li.limit(100).withColumn("l_quantity", F.col("l_quantity") + 1), snap)
    snapshot_diff(spark, snap, v1, v2, ["l_orderkey"]).groupBy("change").count().show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
