"""Warehouse analytics + corpus-curation tour of the round-7 families.

Composes the operators a data team runs daily, all on the synthetic
testdata tables:

  1. CLASSIFY   multinomial Naive Bayes trained on half the corpus,
                scored on the other half (operators/classify.nb_*)
  2. WEIGHT     DSIR importance log-weights tilting the corpus toward
                a target domain (classify.dsir_weights)
  3. FUNNEL     ordered view -> click -> purchase depth per user
                (timeseries.funnel_depth)
  4. RETAIN     first-activity cohorts x day offsets
                (timeseries.cohort_retention)
  5. DIMENSION  SCD2 validity intervals from a change feed, then a CDC
                I/U/D feed applied latest-wins (maintenance.scd2_history
                / cdc_apply)
  6. GRAPH      harmonic + betweenness centrality on the customer
                chain graph (graph_algos)

Run:  python examples/warehouse_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from graph_db_clustering_spark.catalog import load_table  # noqa: E402
from graph_db_clustering_spark.operators import classify  # noqa: E402
from graph_db_clustering_spark.operators import maintenance  # noqa: E402
from graph_db_clustering_spark.operators import timeseries  # noqa: E402
from graph_db_clustering_spark.operators.graph import Graph  # noqa: E402
from graph_db_clustering_spark.operators.graph_algos import (  # noqa: E402
    betweenness_centrality,
    harmonic_centrality,
)
from graph_db_clustering_spark.session import get_spark  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("warehouse-analytics-example")
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")

    # 1. classify: language model trained on the even-id half
    tm, lm = classify.nb_train(
        docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text", "lang"
    )
    pred = classify.nb_predict(
        docs.filter(F.col("doc_id") % 2 == 1), tm, lm, "doc_id", "text"
    )
    print("-- nb_predict: label distribution over the held-out half")
    pred.groupBy("label").count().orderBy("label").show()

    # 2. DSIR: tilt toward sources src0-3
    srcs = ["src0", "src1", "src2", "src3"]
    w = classify.dsir_weights(
        docs.filter(~F.col("source").isin(srcs)),
        docs.filter(F.col("source").isin(srcs)),
        "doc_id",
        "text",
    )
    print("-- dsir_weights: top-5 target-like documents")
    w.orderBy(F.desc("log_weight")).show(5)

    # 3 + 4. event analytics
    print("-- funnel: users by completed depth")
    timeseries.funnel_depth(
        events, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).groupBy("depth").count().orderBy("depth").show()
    print("-- retention: first cohort's day offsets")
    ret = timeseries.cohort_retention(events, "user_id", "ts")
    first = ret.agg(F.min("cohort_date")).collect()[0][0]
    ret.filter(F.col("cohort_date") == first).orderBy("day_offset").show()

    # 5. dimension maintenance
    orders = load_table(spark, sf_dir, "orders")
    changes = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("ts"),
        F.col("o_orderstatus").alias("status"),
    )
    hist = maintenance.scd2_history(changes, "key", "ts")
    print("-- scd2: version counts")
    hist.groupBy("is_current").count().show()
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_mktsegment").alias("segment"),
    )
    feed = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 11 == 0, "D").otherwise("U").alias("op"),
        F.col("o_orderpriority").alias("segment"),
    )
    applied = maintenance.cdc_apply(cust, feed, "key", "seq")
    print(
        f"-- cdc_apply: {cust.count()} snapshot rows -> {applied.count()} "
        "after the feed (deletes removed, updates applied)"
    )

    # 6. centrality on the per-nation custkey chain
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 120)
        .select(F.col("c_custkey").alias("id"), F.col("c_nationkey").alias("n"))
    )
    win = Window.partitionBy("n").orderBy("id")
    edges = (
        c.withColumn("nxt", F.lead("id").over(win))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("id").alias("src"), F.col("nxt").alias("dst"))
    )
    g = Graph(c.select("id"), edges)
    print("-- centrality: top-5 by harmonic, with betweenness")
    (
        harmonic_centrality(g)
        .join(betweenness_centrality(g), "id")
        .orderBy(F.desc("harmonic"))
        .show(5)
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
