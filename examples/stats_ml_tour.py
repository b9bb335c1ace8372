"""Statistics + ML tour of the round-8 families.

The profiling-and-modeling session a data team runs before training,
all on the synthetic testdata tables:

  1. PROFILE    per-dimension embedding moments, one-pass correlation
                matrix, chi-squared/MI independence (operators/stats)
  2. TEST       two-sample KS on the range-partitioned scale path and
                Welch-free exact OLS via the normal equations
  3. REDUCE     distributed PCA — moments pass + driver eigh, codegen
                projection (stats.pca_fit / pca_transform)
  4. CLUSTER    diagonal-GMM EM posteriors, cluster medoids (PAM step),
                simplified silhouette (operators/gmm, stats)
  5. GRAPH      clustering coefficient, modularity, assortativity,
                Louvain communities, link prediction (graph_algos)
  6. SAMPLE     Efraimidis-Spirakis weighted draw + half-life-decayed
                popularity (traindata.weighted_sample,
                timeseries.decayed_counts)

Later round-8 family members not toured here (see their entries and
tests): DBSCAN + Power Iteration Clustering (stats.dbscan_2d /
pic_cluster), the GLM triple (ols_fit+ridge, logreg_fit,
poisson_fit), AUC/PSI/bootstrap-CI evaluation metrics, and the
CMS sketch.

Run:  python examples/stats_ml_tour.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_db_clustering_spark.catalog import load_table  # noqa: E402
from graph_db_clustering_spark.operators import stats  # noqa: E402
from graph_db_clustering_spark.operators.gmm import gmm_fit, gmm_predict  # noqa: E402
from graph_db_clustering_spark.operators.graph import Graph  # noqa: E402
from graph_db_clustering_spark.operators.graph_algos import (  # noqa: E402
    common_neighbor_link_prediction,
    local_clustering_coefficient,
    louvain,
    modularity,
)
from graph_db_clustering_spark.operators.timeseries import decayed_counts  # noqa: E402
from graph_db_clustering_spark.operators.traindata import weighted_sample  # noqa: E402
from graph_db_clustering_spark.session import get_spark  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark()
    emb = load_table(spark, sf_dir, "embeddings")
    events = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents")

    print("== 1. PROFILE ==")
    stats.contingency_stats(orders, "o_orderstatus", "o_orderpriority").show()
    li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price"),
        F.round(F.corr("l_discount", "l_tax"), 4).alias("disc_tax"),
    ).show()

    print("== 2. TEST ==")
    ev = events.select("value", (F.col("user_id") % 2).cast("int").alias("grp"))
    stats.ks_statistic_scale(ev, "value", "grp").show()
    m = stats.ols_fit(li, ["l_quantity", "l_discount"], "l_extendedprice")
    print(f"OLS coef={m['coef'].round(2).tolist()} r2={m['r2']:.4f} n={m['n']}")

    print("== 3. REDUCE ==")
    pca = stats.pca_fit(emb, "embedding", k=4)
    print("explained variance:", pca.explained_var.round(4).tolist())
    stats.pca_transform(emb.select("vec_id", "embedding"), "embedding", pca).show(3)

    print("== 4. CLUSTER ==")
    gm = gmm_fit(emb, "embedding", k=3, max_iter=5)
    gmm_predict(emb, "embedding", gm).orderBy(F.desc("prob")).show(3)
    labeled = emb.select("vec_id", "embedding", (F.col("vec_id") % 4).alias("c"))
    stats.cluster_medoids(labeled, "vec_id", "embedding", "c").show()
    sil = stats.simplified_silhouette(labeled, "vec_id", "embedding", "c")
    sil.agg(F.round(F.avg("silhouette"), 4).alias("avg_silhouette")).show()

    print("== 5. GRAPH ==")
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 300)
        .select(F.col("c_custkey").alias("id"), F.col("c_nationkey").alias("nation"))
    )
    a = c.select(F.col("id").alias("src"), "nation")
    b = c.select(F.col("id").alias("dst"), "nation")
    edges = (
        a.join(b, "nation")
        .filter((F.col("src") < F.col("dst")) & (F.col("dst") - F.col("src") <= 3))
        .select("src", "dst", F.lit("near").alias("relationship"))
    )
    g = Graph(c, edges)
    local_clustering_coefficient(g).orderBy(F.desc("clustcoef")).show(3)
    comm = louvain(g)
    print("communities:", comm.select("community").distinct().count())
    modularity(g, comm).show()
    common_neighbor_link_prediction(g).orderBy(F.desc("jaccard"), "x", "y").show(3)

    print("== 6. SAMPLE ==")
    weighted_sample(docs, "doc_id", "n_chars", 5).select("doc_id", "n_chars").show()
    decayed_counts(events, "event_type", "ts", 3600.0).orderBy(
        F.desc("decayed")
    ).show(5)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
