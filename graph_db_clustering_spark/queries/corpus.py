"""The declared oracle-query corpus (SURVEY.md §2.12, Q01–Q41).

Each query is implemented with the DataFrame API (so the logical plan is
declared and Catalyst plans it — pushdown, pruning, join selection, AQE all
apply) and paired with the ANSI/DuckDB SQL oracle the driver hash-checks at
sf0.01.

Determinism rules (SURVEY §2.12): every query ends with ORDER BY over a
unique key set, floats are rounded in-query, no rand()/approx_*/current_*,
explicit NULLS FIRST where a sort key is nullable, no raw array indexing
(Spark 0-based vs DuckDB 1-based), arithmetic hash instead of engine hash.
Column names are aliased identically on both sides — the driver's compare
sorts columns by name before hashing.

Scale notes are given per-query; the general posture (SURVEY §4.3): dims
(region/nation/supplier, centroid sets) are broadcast; fact-fact joins
shuffle on their keys with AQE handling skew; window functions partition on
high-cardinality keys; nothing materializes on the driver.
"""

from __future__ import annotations

import datetime
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.functions.vectors import cosine_similarity, vec_sum

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def declared(name: str, oracle: str | None = None):
    """Register a declared query; ``oracle`` is the DuckDB-dialect SQL.

    The registered callable first sweeps every surviving operator pin
    (operators/pins.py): pins are bounded-accretion persists whose FINAL
    instance outlives its query (the returned result is lazy), and the
    sweep guarantees no query can ever be served — even partially — from
    a previous query's cache, and that repeat invocations of the same
    query recompute from source (honest bench repeats). Unpersisting a
    still-lazy predecessor is safe: Spark recomputes. The original
    function stays importable/unwrapped for module-internal reuse."""

    def deco(fn):
        import functools

        from graph_db_clustering_spark.operators import pins

        @functools.wraps(fn)
        def run(spark, sf_dir):
            pins.release_all()
            return fn(spark, sf_dir)

        QUERIES[name] = run
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# §2.1/2.2 — scans, projections, filters, predicates
# ---------------------------------------------------------------------------


@declared("q01", "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")
def q01(spark, sf_dir):
    """Scan + project (full node scan analog, image_classification.py:373-380)."""
    return _t(spark, sf_dir, "region").select("r_regionkey", "r_name").orderBy("r_regionkey")


@declared(
    "q02",
    "SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING' "
    "ORDER BY c_custkey",
)
def q02(spark, sf_dir):
    """Project + label-equality predicate (MATCH (i:Image) analog). The
    filter and the 3-column projection both push down to the parquet scan."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@declared(
    "q03",
    "SELECT event_id, user_id FROM events "
    "WHERE value IS NOT NULL AND event_type = 'click' ORDER BY event_id",
)
def q03(spark, sf_dir):
    """Null + equality predicates (RDD .filter(x[1] is not None) analog,
    image_classification.py:97)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(F.col("value").isNotNull() & (F.col("event_type") == "click"))
        .select("event_id", "user_id")
        .orderBy("event_id")
    )


@declared(
    "q04",
    "SELECT p_partkey, LOWER(p_name) AS pname FROM part "
    "WHERE LOWER(p_name) LIKE '%a%' ORDER BY p_partkey",
)
def q04(spark, sf_dir):
    """Substring predicate ('cat' in label.lower() analog,
    image_classification.py:205-208)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select("p_partkey", F.lower("p_name").alias("pname"))
        .filter(F.col("pname").contains("a"))
        .orderBy("p_partkey")
    )


@declared(
    "q05",
    "SELECT l_orderkey, l_linenumber FROM lineitem "
    "WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A','R') "
    "AND NOT l_linestatus = 'O' ORDER BY l_orderkey, l_linenumber",
)
def q05(spark, sf_dir):
    """Compound predicate (AND / IN / BETWEEN / NOT) — all pushed to scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").between(10, 20)
            & F.col("l_returnflag").isin("A", "R")
            & (F.col("l_linestatus") != "O")
        )
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


@declared(
    "q06",
    "SELECT event_id, COALESCE(CAST(value AS VARCHAR), 'none') AS v FROM events "
    "ORDER BY event_id",
)
def q06(spark, sf_dir):
    """IS NULL handling via COALESCE."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.coalesce(F.col("value").cast("string"), F.lit("none")).alias("v")
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# §2.3 — joins
# ---------------------------------------------------------------------------


@declared(
    "q07",
    "SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n "
    "ORDER BY r.r_name, n.n_name",
)
def q07(spark, sf_dir):
    """Cartesian product (MATCH (a),(b) analog, database.py:64). Both sides
    tiny -> BroadcastNestedLoopJoin; at scale you'd broadcast the small side."""
    r = _t(spark, sf_dir, "region").select("r_name")
    n = _t(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(F.broadcast(n)).orderBy("r_name", "n_name")


@declared(
    "q08",
    """SELECT c_custkey, s_suppkey FROM (
  SELECT c.c_custkey, s.s_suppkey,
         ROW_NUMBER() OVER (PARTITION BY c.c_custkey
                            ORDER BY ABS(c.c_acctbal - s.s_acctbal), s.s_suppkey) AS rn
  FROM customer c CROSS JOIN supplier s) t
WHERE rn = 1 ORDER BY c_custkey""",
)
def q08(spark, sf_dir):
    """Per-left argmin "nearest supplier by acctbal" (the reference's
    driver nested loop, image_classification.py:417-433). Delegates to
    operators.joins.nearest_1d_join: the metric is 1-D, so the fast plan
    is sorted-search (Bucketizer binary-search into floor/ceiling
    neighbors, O(N log k), measured 4.7s vs 13.8s cold for the crossJoin
    expansion at sf0.1) — but that plan collects the distinct dim values
    to the driver, so the operator counts them first and falls back to the
    fully-distributed crossJoin + min(struct) argmin above 1e6 distinct
    values. min(struct(diff, key)) lexicographic ordering == the oracle's
    ROW_NUMBER ORDER BY (diff, s_suppkey) tie-break; the equidistant case
    keeps both neighbors in the candidate set, so the tie-break is exact."""
    from ..operators.joins import nearest_1d_join

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    return nearest_1d_join(
        c, s, "c_custkey", "c_acctbal", "s_suppkey", "s_acctbal"
    ).orderBy("c_custkey")


@declared(
    "q09",
    "SELECT o.o_orderkey, c.c_name FROM orders o "
    "JOIN customer c ON o.o_custkey = c.c_custkey ORDER BY o.o_orderkey",
)
def q09(spark, sf_dir):
    """Equi-join edge->node analog (MATCH (i)-[:CLOSEST_TO]->(c),
    image_classification.py:465-468). Catalyst picks broadcast-hash here;
    at 100 TB both sides shuffle on the key and AQE splits skew."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    )


@declared(
    "q10",
    """SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY revenue DESC, n.n_name""",
)
def q10(spark, sf_dir):
    """Multi-way join + agg (TPC-H Q5 flavor). Join order: fact-fact
    (lineitem x orders) shuffles on orderkey; customer and nation are
    dimension-sized and broadcast. The final agg is 25 groups — partial
    (map-side) aggregation collapses it before the shuffle."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@declared(
    "q11",
    "SELECT c.c_custkey, o.o_orderkey FROM customer c "
    "LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
    "ORDER BY c.c_custkey, o.o_orderkey NULLS FIRST",
)
def q11(spark, sf_dir):
    """Left outer join."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", "o_orderkey")
        .orderBy(F.col("c_custkey"), F.col("o_orderkey").asc_nulls_first())
    )


@declared(
    "q12",
    """SELECT c_custkey FROM customer c WHERE EXISTS
  (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
ORDER BY c_custkey""",
)
def q12(spark, sf_dir):
    """Left-semi join (EXISTS)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").orderBy("c_custkey")


@declared(
    "q13",
    """SELECT p_partkey FROM part p WHERE NOT EXISTS
  (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
ORDER BY p_partkey""",
)
def q13(spark, sf_dir):
    """Left-anti join (NOT EXISTS)."""
    p = _t(spark, sf_dir, "part").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").orderBy("p_partkey")


@declared(
    "q14",
    """SELECT s.s_suppkey, c.c_custkey FROM supplier s JOIN customer c
  ON c.c_acctbal >= s.s_acctbal - 100 AND c.c_acctbal < s.s_acctbal + 100
ORDER BY s.s_suppkey, c.c_custkey""",
)
def q14(spark, sf_dir):
    """Range (non-equi) join. Supplier is small -> broadcast nested loop;
    a fact-fact range join at scale would bucketize the range into an
    equi-join key first (see operators/joins.py banded strategy)."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    cond = (c.c_acctbal >= s.s_acctbal - 100) & (c.c_acctbal < s.s_acctbal + 100)
    return (
        c.join(F.broadcast(s), cond, "inner")
        .select("s_suppkey", "c_custkey")
        .orderBy("s_suppkey", "c_custkey")
    )


_CUTOFFS = [
    datetime.datetime(2024, 1, 8),
    datetime.datetime(2024, 1, 15),
    datetime.datetime(2024, 1, 22),
]


@declared(
    "q15",
    """SELECT u.user_id, c.cutoff,
  (SELECT MAX(e.ts) FROM events e WHERE e.user_id = u.user_id AND e.ts <= c.cutoff) AS last_ts
FROM (SELECT DISTINCT user_id FROM events) u
CROSS JOIN (VALUES (TIMESTAMP '2024-01-08 00:00:00'),
                   (TIMESTAMP '2024-01-15 00:00:00'),
                   (TIMESTAMP '2024-01-22 00:00:00')) AS c(cutoff)
ORDER BY u.user_id, c.cutoff""",
)
def q15(spark, sf_dir):
    """As-of join: latest event per user at or before each checkpoint.
    Implemented as (users x cutoffs) left-join events on (key, ts<=cutoff)
    + max — one distributed plan; at scale the cutoff set stays small and
    broadcasts, so events shuffles once on user_id."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts")
    users = e.select("user_id").distinct()
    cutoffs = spark.createDataFrame([(c,) for c in _CUTOFFS], "cutoff timestamp")
    ev = e.select(F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"))
    grid = users.crossJoin(F.broadcast(cutoffs))
    return (
        grid.join(
            ev,
            (grid.user_id == ev.e_user) & (ev.e_ts <= grid.cutoff),
            "left",
        )
        .groupBy("user_id", "cutoff")
        .agg(F.max("e_ts").alias("last_ts"))
        .orderBy("user_id", "cutoff")
    )


@declared(
    "q16",
    """WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
             FROM embeddings WHERE vec_id <= 50),
cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cemb
          FROM embeddings WHERE vec_id IN (1, 2)),
sims AS (
  SELECT p.vec_id, c.cid, list_cosine_similarity(p.emb, c.cemb) AS sim
  FROM pts p CROSS JOIN cents c)
SELECT vec_id, cid FROM (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
  FROM sims) t
WHERE rn = 1 ORDER BY vec_id""",
)
def q16(spark, sf_dir):
    """Exact cosine top-1 — the corrected k-means assignment step (the
    reference's connectToCentroid takes the LEAST similar centroid,
    image_classification.py:422-433; SURVEY §7.4.1 fixes it to argmax).
    Cosine is a pure Catalyst higher-order-function expression (functions/
    vectors.py) — runs in codegen, no Python. Centroids broadcast; the big
    side never shuffles for the join; the argmax is min(struct(-sim, cid))
    — a hash aggregate with map-side partial combine, no per-group sort
    (see q08 note; the oracle's ROW_NUMBER ORDER BY sim DESC, cid has the
    same tie-break)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pts = emb.filter(F.col("vec_id") <= 50)
    cents = emb.filter(F.col("vec_id").isin(1, 2)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    sims = pts.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", cosine_similarity(F.col("embedding"), F.col("cemb")).alias("sim")
    )
    return (
        sims.groupBy("vec_id")
        .agg(F.min(F.struct((-F.col("sim")).alias("nsim"), F.col("cid"))).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cid"))
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# §2.4 — aggregations
# ---------------------------------------------------------------------------


@declared(
    "q17",
    "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM orders "
    "GROUP BY o_custkey ORDER BY o_custkey",
)
def q17(spark, sf_dir):
    """Group-by count — the count_connections / in-degree analog
    (image_classification.py:513-522). Partial+final hash agg automatic."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
        .orderBy("o_custkey")
    )


@declared(
    "q18",
    """SELECT l_returnflag, ROUND(AVG(l_quantity),4) AS avg_qty,
       ROUND(AVG(l_extendedprice),4) AS avg_price,
       ROUND(AVG(l_discount),4) AS avg_disc, ROUND(AVG(l_tax),4) AS avg_tax
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def q18(spark, sf_dir):
    """Group-by multi-avg — the recalcCentroid analog
    (image_classification.py:471-492): one hash-aggregate pass computes all
    means, vs the reference's per-property Python loop."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.round(F.avg("l_tax"), 4).alias("avg_tax"),
        )
        .orderBy("l_returnflag")
    )


@declared(
    "q19",
    """SELECT label % 2 AS cluster,
  CAST(SUM(CASE WHEN label >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS hi,
  CAST(SUM(CASE WHEN label < 5 THEN 1 ELSE 0 END) AS BIGINT) AS lo,
  ROUND(ABS(SUM(CASE WHEN label >= 5 THEN 1 ELSE 0 END) - SUM(CASE WHEN label < 5 THEN 1 ELSE 0 END))
        / CAST(COUNT(*) AS DOUBLE), 4) AS purity
FROM embeddings GROUP BY label % 2 ORDER BY cluster""",
)
def q19(spark, sf_dir):
    """Conditional agg + purity score — the scoreClusters analog
    (image_classification.py:524-555; the reference's 'silhouette' is
    actually label purity |a-b|/(a+b))."""
    e = _t(spark, sf_dir, "embeddings")
    hi = F.sum(F.when(F.col("label") >= 5, 1).otherwise(0))
    lo = F.sum(F.when(F.col("label") < 5, 1).otherwise(0))
    return (
        e.groupBy((F.col("label") % 2).alias("cluster"))
        .agg(
            hi.alias("hi"),
            lo.alias("lo"),
            F.round(F.abs(hi - lo) / F.count("*").cast("double"), 4).alias("purity"),
        )
        .orderBy("cluster")
    )


@declared(
    "q20",
    "SELECT n_regionkey, ARRAY_TO_STRING(LIST_SORT(LIST(n_name)), '|') AS names "
    "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey",
)
def q20(spark, sf_dir):
    """collect_list, made deterministic with sort_array (Cypher collect()
    analog, image_classification.py:346).

    The declared output joins the sorted list into one '|'-separated string:
    the external gate canonicalizes rows via pandas sort/hash, and an
    array<string> column is unhashable there (round-1 red row). The list
    semantics are unchanged — only the declared surface is scalar.
    """
    return (
        _t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias("names")
        )
        .orderBy("n_regionkey")
    )


@declared(
    "q21",
    """SELECT ROUND(AVG(l_quantity),4) AS avg_qty, ROUND(STDDEV_SAMP(l_quantity),4) AS std_qty,
       ROUND(MIN(l_quantity),4) AS min_qty, ROUND(MAX(l_quantity),4) AS max_qty,
       CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem""",
)
def q21(spark, sf_dir):
    """Global stats — the extract_features 7-stat analog
    (image_classification.py:185), as one aggregate pass."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.round(F.min("l_quantity"), 4).alias("min_qty"),
        F.round(F.max("l_quantity"), 4).alias("max_qty"),
        F.count("*").alias("cnt"),
    )


@declared(
    "q22",
    "SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS cnt FROM orders",
)
def q22(spark, sf_dir):
    """Count distinct (expands to a two-phase agg — partial distinct then
    final count — so it scales without collecting keys anywhere)."""
    return _t(spark, sf_dir, "orders").agg(F.count_distinct("o_custkey").alias("cnt"))


@declared(
    "q23",
    """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
)
def q23(spark, sf_dir):
    """Rollup (grouping sets)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


@declared("q24", "SELECT ROUND(MEDIAN(l_quantity),4) AS med_qty FROM lineitem")
def q24(spark, sf_dir):
    """Exact median (np.median analog, image_classification.py:185). Spark's
    exact interpolated percentile(0.5) == DuckDB MEDIAN."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("med_qty")
    )


# ---------------------------------------------------------------------------
# §2.5 — window functions
# ---------------------------------------------------------------------------


@declared(
    "q25",
    """SELECT c_custkey, CAST(RANK() OVER (PARTITION BY c_nationkey
       ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rk
FROM customer ORDER BY c_custkey""",
)
def q25(spark, sf_dir):
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", F.rank().over(w).alias("rk"))
        .orderBy("c_custkey")
    )


@declared(
    "q26",
    """SELECT event_id, LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
FROM events ORDER BY event_id""",
)
def q26(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", F.lag("event_type").over(w).alias("prev"))
        .orderBy("event_id")
    )


@declared(
    "q27",
    """SELECT o_orderkey, ROUND(SUM(o_totalprice) OVER
  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run
FROM orders ORDER BY o_orderkey""",
)
def q27(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("run"))
        .orderBy("o_orderkey")
    )


@declared(
    "q28",
    """SELECT o_orderkey, CAST(COUNT(*) OVER
  (PARTITION BY o_custkey ORDER BY o_totalprice
   RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS near
FROM orders ORDER BY o_orderkey""",
)
def q28(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-1000, 0)
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", F.count("*").over(w).alias("near"))
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# §2.6 — sorts / limits / top-k
# ---------------------------------------------------------------------------


@declared(
    "q29",
    "SELECT vec_id FROM embeddings "
    "ORDER BY (vec_id * 2654435761) % 4294967296, vec_id LIMIT 2",
)
def q29(spark, sf_dir):
    """Deterministic 'random' k-sample — the initCentroids analog
    (image_classification.py:233-238) with Knuth multiplicative hash
    replacing rand() so the oracle can check it. Plans as
    TakeOrderedAndProject (per-partition top-k, then k-row merge on the
    driver — no global sort)."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id")
        .orderBy((F.col("vec_id") * F.lit(2654435761)) % F.lit(4294967296), F.col("vec_id"))
        .limit(2)
    )


@declared(
    "q30",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
)
def q30(spark, sf_dir):
    """Top-k (ORDER BY + LIMIT -> TakeOrderedAndProject, no global sort)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.7 — set operations
# ---------------------------------------------------------------------------


@declared(
    "q31",
    "SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY k",
)
def q31(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionByName(s).distinct().orderBy("k")


@declared(
    "q32_intersect",
    "SELECT n_nationkey FROM nation INTERSECT SELECT c_nationkey FROM customer "
    "ORDER BY n_nationkey",
)
def q32_intersect(spark, sf_dir):
    n = _t(spark, sf_dir, "nation").select("n_nationkey")
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    return n.intersect(c).orderBy("n_nationkey")


@declared(
    "q32_except",
    "SELECT n_nationkey FROM nation EXCEPT SELECT s_nationkey FROM supplier "
    "ORDER BY n_nationkey",
)
def q32_except(spark, sf_dir):
    n = _t(spark, sf_dir, "nation").select("n_nationkey")
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey"))
    return n.exceptAll(s).distinct().orderBy("n_nationkey")


# ---------------------------------------------------------------------------
# §2.8 — scalar functions
# ---------------------------------------------------------------------------


@declared(
    "q33",
    """SELECT CAST(FLOOR(l_quantity / 10) AS INT) AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem GROUP BY CAST(FLOOR(l_quantity / 10) AS INT) ORDER BY bucket""",
)
def q33(spark, sf_dir):
    """Histogram binning — the extract_color_histogram relational analog
    (image_classification.py:136-171): bucket + groupBy replaces
    cv2.calcHist."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_quantity") / 10).cast("int").alias("bucket")
    return li.groupBy(bucket).agg(F.count("*").alias("cnt")).orderBy("bucket")


@declared(
    "q34",
    """SELECT p_partkey, CONCAT(UPPER(SUBSTRING(p_brand, 1, 5)), '-', TRIM(p_type)) AS s,
       CAST(LENGTH(p_name) AS INT) AS ln, REPLACE(p_type, ' ', '_') AS r
FROM part ORDER BY p_partkey""",
)
def q34(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(
            F.upper(F.substring("p_brand", 1, 5)), F.lit("-"), F.trim(F.col("p_type"))
        ).alias("s"),
        F.length("p_name").alias("ln"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("r"),
    ).orderBy("p_partkey")


@declared(
    "q35",
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m, CAST(COUNT(*) AS BIGINT) AS cnt
FROM orders GROUP BY 1, 2 ORDER BY y, m""",
)
def q35(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("y", "m")
    )


@declared(
    "q36",
    """SELECT l_orderkey, l_linenumber, ROUND(SQRT(l_extendedprice), 4) AS sq,
       ROUND(LN(l_extendedprice), 4) AS lg, ROUND(POWER(l_discount + 1, 2), 4) AS pw,
       CAST(MOD(l_orderkey, 7) AS BIGINT) AS md
FROM lineitem ORDER BY l_orderkey, l_linenumber""",
)
def q36(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 4).alias("sq"),
        F.round(F.log("l_extendedprice"), 4).alias("lg"),
        F.round(F.pow(F.col("l_discount") + 1, 2), 4).alias("pw"),
        (F.col("l_orderkey") % 7).alias("md"),
    ).orderBy("l_orderkey", "l_linenumber")


@declared(
    "q37",
    """SELECT vec_id, CAST(LEN(embedding) AS INT) AS n,
       ROUND(LIST_SUM(CAST(embedding AS DOUBLE[])), 4) AS s
FROM embeddings ORDER BY vec_id""",
)
def q37(spark, sf_dir):
    """Array functions (size + lambda-HOF reduction) over the embedding
    column — no Python, pure codegen."""
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("n"),
        F.round(vec_sum(F.col("embedding")), 4).alias("s"),
    ).orderBy("vec_id")


@declared(
    "q38",
    "SELECT event_id, props->>'$.k' AS k FROM events ORDER BY event_id",
)
def q38(spark, sf_dir):
    """JSON extraction from the events.props payload column."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").alias("k")
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# §2.10 — streaming operators, declared in batch form (stream-batch
# consistency is asserted separately in tests/test_streaming.py)
# ---------------------------------------------------------------------------


@declared(
    "q39",
    """SELECT DATE_TRUNC('HOUR', ts) AS w, event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(SUM(value), 4) AS sv
FROM events GROUP BY 1, 2 ORDER BY w, event_type""",
)
def q39(spark, sf_dir):
    """Tumbling-window agg, batch form (streaming form: streaming/windows.py)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("HOUR", "ts").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sv"))
        .orderBy("w", "event_type")
    )


@declared(
    "q40",
    """SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
  SELECT DATE_TRUNC('HOUR', ts) AS w FROM events
  UNION ALL
  SELECT DATE_TRUNC('HOUR', ts - INTERVAL '30 minutes') + INTERVAL '30 minutes' FROM events) t
GROUP BY w ORDER BY w""",
)
def q40(spark, sf_dir):
    """Sliding-window agg (1h window / 30m slide), batch form via two
    phase-shifted truncations."""
    e = _t(spark, sf_dir, "events")
    half = F.expr("INTERVAL 30 MINUTE")
    a = e.select(F.date_trunc("HOUR", "ts").alias("w"))
    b = e.select((F.date_trunc("HOUR", F.col("ts") - half) + half).alias("w"))
    return a.unionAll(b).groupBy("w").agg(F.count("*").alias("cnt")).orderBy("w")


@declared(
    "q41",
    """SELECT user_id, event_type, MIN(event_id) AS first_id FROM events
GROUP BY user_id, event_type ORDER BY user_id, event_type""",
)
def q41(spark, sf_dir):
    """Stateful-dedup batch form: first event per (user, type)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_id"))
        .orderBy("user_id", "event_type")
    )


@declared(
    "q44_cube",
    """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(SUM(l_quantity), 4) AS sq
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
)
def q44_cube(spark, sf_dir):
    """CUBE grouping sets (all 4 combinations in one pass — Expand +
    single hash aggregate, not 4 scans)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 4).alias("sq"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@declared(
    "q43_rollup",
    """SELECT 'MINUTE' AS level, DATE_TRUNC('MINUTE', ts) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt, ROUND(SUM(value), 4) AS sv
FROM events GROUP BY 2
UNION ALL
SELECT 'HOUR', DATE_TRUNC('HOUR', ts), CAST(COUNT(*) AS BIGINT), ROUND(SUM(value), 4)
FROM events GROUP BY 2
UNION ALL
SELECT 'DAY', DATE_TRUNC('DAY', ts), CAST(COUNT(*) AS BIGINT), ROUND(SUM(value), 4)
FROM events GROUP BY 2
ORDER BY level, bucket""",
)
def q43_rollup(spark, sf_dir):
    """Hypertable-style multi-resolution rollup (minute/hour/day) in ONE
    scan + ONE shuffle (operators/timeseries.rollup_time_series): each
    event fans out to its tier buckets map-side, partial aggregation
    collapses before the shuffle. The oracle is the naive 3-scan UNION —
    same answer, 3x the reads (the point of the operator)."""
    from graph_db_clustering_spark.operators.timeseries import rollup_time_series

    e = _t(spark, sf_dir, "events")
    return rollup_time_series(e, "ts", "value").orderBy("level", "bucket")


@declared(
    "q42_sessions",
    """WITH lagged AS (
  SELECT user_id, ts, event_id,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev IS NULL OR EPOCH(ts) - EPOCH(prev) >= 1800 THEN 1 ELSE 0 END AS new_s
  FROM lagged),
sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged)
SELECT user_id, CAST(sid AS BIGINT) AS sid, MIN(ts) AS s_start,
       MAX(ts) + INTERVAL 30 MINUTE AS s_end, CAST(COUNT(*) AS BIGINT) AS cnt
FROM sess GROUP BY user_id, sid ORDER BY user_id, sid""",
)
def q42_sessions(spark, sf_dir):
    """Gap-based sessionization (30-minute gap), batch form of
    session_window (streaming/ops.session_counts): new session when the
    gap to the previous event is >= 30 min (session_window merges events
    with ts < previous-window end = last_ts + gap, so >= is the exact
    batch rule); s_end = last_ts + gap matches session_window's end.
    Plan: two windows over (user_id) — lag then running sum — then one
    hash aggregate; partitions on user_id, so it scales with users."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = 30 * 60
    lagged = e.withColumn("prev", F.lag("ts").over(w))
    flagged = lagged.withColumn(
        "new_s",
        F.when(
            F.col("prev").isNull()
            | (F.col("ts").cast("double") - F.col("prev").cast("double") >= gap_s),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("s_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTE")).alias("s_end"),
            F.count("*").alias("cnt"),
        )
        .orderBy("user_id", "sid")
    )


# ---------------------------------------------------------------------------
# §2.4/2.5/2.8 extensions — pivot, correlated EXISTS, lateral explode,
# distribution windows, edit-distance blocking
# ---------------------------------------------------------------------------


@declared(
    "q45_pivot",
    """SELECT o_orderpriority,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS cnt_f,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS cnt_o,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS cnt_p,
  ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0), 2) AS sum_f,
  ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0), 2) AS sum_o,
  ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 0), 2) AS sum_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
)
def q45_pivot(spark, sf_dir):
    """Pivot (wide conditional aggregation): order counts and totals per
    priority, one column pair per order status. Explicit pivot values keep
    the output schema static (no extra distinct-values job) and compile to
    a single hash aggregate with FILTER-style partial aggregation — one
    scan, one shuffle on o_orderpriority, same plan shape at any scale."""
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("o_totalprice").alias("sum"))
    )
    return p.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"{s}_cnt"), F.lit(0)).alias(f"cnt_{s.lower()}")
            for s in ("F", "O", "P")
        ],
        *[
            F.round(F.coalesce(F.col(f"{s}_sum"), F.lit(0.0)), 2).alias(f"sum_{s.lower()}")
            for s in ("F", "O", "P")
        ],
    ).orderBy("o_orderpriority")


@declared(
    "q46_exists",
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
)
def q46_exists(spark, sf_dir):
    """Correlated EXISTS (TPC-H Q4 shape): orders with at least one
    returned line, counted per priority. Declared as a left-semi join —
    the decorrelated plan EXISTS compiles to — so the filter on lineitem
    pushes to its scan and the semi-join stops probing an orderkey after
    the first match; no duplicate-elimination step is needed."""
    o = _t(spark, sf_dir, "orders")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@declared(
    "q47_words",
    """WITH words AS (
  SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM words
WHERE LENGTH(word) >= 4 GROUP BY word HAVING COUNT(*) >= 5 ORDER BY word""",
)
def q47_words(spark, sf_dir):
    """Lateral explode (UNNEST / LATERAL VIEW analog): whitespace word
    counts over the documents corpus with a HAVING threshold. explode is
    generate-side (no shuffle); the single shuffle keys on the word, and
    partial aggregation collapses per-partition duplicates before it —
    the canonical distributed word-count plan."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    return (
        words.filter(F.length("word") >= 4)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 5)
        .orderBy("word")
    )


@declared(
    "q48_dist",
    """SELECT c_custkey, CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
  ROUND(CUME_DIST() OVER w, 6) AS cdist
FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey""",
)
def q48_dist(spark, sf_dir):
    """Distribution window functions (ntile / percent_rank / cume_dist)
    per market segment. Partitioning on c_mktsegment keeps every window
    computation local to its shuffle partition (no global sort, unlike an
    unpartitioned ranking); the (c_acctbal, c_custkey) order key is unique
    so every rank is deterministic."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            F.ntile(4).over(w).cast("int").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .orderBy("c_custkey")
    )


@declared(
    "q49_editdist",
    """SELECT a.p_partkey AS k1, b.p_partkey AS k2,
  CAST(LEVENSHTEIN(a.p_name, b.p_name) AS INTEGER) AS dist
FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_size = b.p_size
  AND a.p_partkey < b.p_partkey
WHERE LEVENSHTEIN(a.p_name, b.p_name) <= 5
ORDER BY k1, k2""",
)
def q49_editdist(spark, sf_dir):
    """Edit-distance near-duplicate pairs with blocking: candidate pairs
    are generated only within a (p_brand, p_size) block — an equi-join
    Catalyst executes as a shuffled hash join — and levenshtein runs
    JVM-side on the O(block²) candidates, never on the full cross
    product. Same blocked-verify shape as the MinHash dedup family
    (operators/dedup), with edit distance as the verifier."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand", "p_size")
    a = p.select(
        F.col("p_partkey").alias("k1"),
        F.col("p_name").alias("n1"),
        "p_brand",
        "p_size",
    )
    b = p.select(
        F.col("p_partkey").alias("k2"),
        F.col("p_name").alias("n2"),
        "p_brand",
        "p_size",
    )
    return (
        a.join(b, ["p_brand", "p_size"])
        .filter(F.col("k1") < F.col("k2"))
        .select(
            "k1",
            "k2",
            F.levenshtein("n1", "n2").cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= 5)
        .orderBy("k1", "k2")
    )


@declared(
    "q50_gsets",
    """SELECT l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag) AS INTEGER) AS gf,
  CAST(GROUPING(l_linestatus) AS INTEGER) AS gs,
  CAST(COUNT(*) AS BIGINT) AS cnt, ROUND(SUM(l_quantity), 2) AS sq
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
ORDER BY gf, gs, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
)
def q50_gsets(spark, sf_dir):
    """Explicit GROUPING SETS (beyond q23 ROLLUP / q44 CUBE) with
    GROUPING() markers disambiguating real NULLs from subtotal rows.
    Catalyst plans one Expand (3 replicas, one per set) above a single
    scan feeding one partial+final hash aggregate — one shuffle for all
    three granularities, the same one-pass shape a 100 TB rollup needs."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("gf"),
            F.grouping("l_linestatus").cast("int").alias("gs"),
            F.count("*").alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sq"),
        )
        .orderBy(
            "gf",
            "gs",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@declared(
    "q51_firstlast",
    """SELECT event_id, FIRST_VALUE(event_type) OVER w AS first_t,
  LAST_VALUE(event_type) OVER w AS last_t,
  NTH_VALUE(event_type, 2) OVER w AS second_t
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY event_id""",
)
def q51_firstlast(spark, sf_dir):
    """Navigation window functions (first_value / last_value / nth_value)
    over the full-partition frame — session entry/exit event per user.
    The explicit unbounded frame matters: the default frame ends at
    CURRENT ROW, which would make last_value degenerate. One shuffle on
    user_id; the (ts, event_id) order key is unique so all three values
    are deterministic."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        e.select(
            "event_id",
            F.first_value("event_type").over(w).alias("first_t"),
            F.last_value("event_type").over(w).alias("last_t"),
            F.nth_value("event_type", 2).over(w).alias("second_t"),
        )
        .orderBy("event_id")
    )


@declared(
    "q52_stragg",
    """SELECT o_orderstatus,
  STRING_AGG(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS prios,
  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prios
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
)
def q52_stragg(spark, sf_dir):
    """Ordered string aggregation (LISTAGG/STRING_AGG analog): Spark has
    no ordered string_agg, so the declared form is
    concat_ws over sort_array(collect_set(...)) — same result under
    binary string ordering. collect_set keeps per-group state bounded by
    the distinct count (5 here), so the agg stays one partial+final
    hash-aggregate pass even on a 100 TB fact table."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("o_orderpriority"))).alias("prios"),
            F.countDistinct("o_orderpriority").alias("n_prios"),
        )
        .orderBy("o_orderstatus")
    )


@declared(
    "q53_quantiles",
    """SELECT l_returnflag,
  ROUND(QUANTILE_CONT(l_quantity, 0.25), 4) AS q25,
  ROUND(QUANTILE_CONT(l_quantity, 0.50), 4) AS q50,
  ROUND(QUANTILE_CONT(l_quantity, 0.75), 4) AS q75,
  ROUND(QUANTILE_CONT(l_quantity, 0.95), 4) AS q95
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def q53_quantiles(spark, sf_dir):
    """Multi-quantile in one pass: Spark's percentile(col, array(...))
    computes all four exact interpolated quantiles in a single aggregate
    buffer (one shuffle), then projects them to four scalar columns (the
    external gate can't canonicalize array outputs). The scale path swaps
    percentile -> approx_percentile (t-digest, mergeable, bounded memory)
    with identical plan shape."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_quantity, array(0.25D, 0.5D, 0.75D, 0.95D))"
            ).alias("_qs")
        )
        .select(
            "l_returnflag",
            F.round(F.col("_qs")[0], 4).alias("q25"),
            F.round(F.col("_qs")[1], 4).alias("q50"),
            F.round(F.col("_qs")[2], 4).alias("q75"),
            F.round(F.col("_qs")[3], 4).alias("q95"),
        )
        .orderBy("l_returnflag")
    )


@declared(
    "q54_corr",
    """SELECT l_returnflag,
  ROUND(CORR(l_quantity, l_extendedprice), 3) + 0 AS corr_qp,
  ROUND(COVAR_SAMP(l_quantity, l_discount), 3) + 0 AS cov_qd,
  ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 2) + 0 AS slope,
  ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 2) + 0 AS icept
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def q54_corr(spark, sf_dir):
    """Bivariate statistical aggregates (corr / covar_samp / regr_*) —
    single-pass mergeable moment sketches, one shuffle for all four.
    The `+ 0` normalizes IEEE -0.0 (DuckDB rounds tiny negatives to
    -0.0, which string-sorts differently from 0.0 in canonicalization)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.round(F.corr("l_quantity", "l_extendedprice"), 3) + F.lit(0)).alias("corr_qp"),
            (F.round(F.covar_samp("l_quantity", "l_discount"), 3) + F.lit(0)).alias("cov_qd"),
            (F.round(F.regr_slope("l_extendedprice", "l_quantity"), 2) + F.lit(0)).alias(
                "slope"
            ),
            (F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2) + F.lit(0)).alias(
                "icept"
            ),
        )
        .orderBy("l_returnflag")
    )


@declared(
    "q55_scalar_subq",
    """SELECT c_custkey,
  CAST((SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS BIGINT)
    AS n_orders,
  ROUND((SELECT MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey), 2)
    AS max_price
FROM customer c ORDER BY c_custkey""",
)
def q55_scalar_subq(spark, sf_dir):
    """Correlated scalar subqueries in SELECT — exercised through Spark
    SQL so Catalyst's RewriteCorrelatedScalarSubquery decorrelates both
    into one left-outer aggregate join (SURVEY §4.2); the COUNT subquery
    additionally gets the null->0 fixup on non-matching customers. The
    {c}/{o} DataFrame templating keeps the query self-contained (no
    session-global temp views)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return spark.sql(
        """SELECT c_custkey,
  (SELECT COUNT(*) FROM {o} o WHERE o.o_custkey = c.c_custkey) AS n_orders,
  ROUND((SELECT MAX(o_totalprice) FROM {o} o WHERE o.o_custkey = c.c_custkey), 2)
    AS max_price
FROM {c} c ORDER BY c_custkey""",
        c=c,
        o=o,
    )


@declared(
    "q56_gapfill",
    """WITH b AS (SELECT user_id, DATE_TRUNC('hour', MIN(ts)) AS t0,
                 DATE_TRUNC('hour', MAX(ts)) AS t1
           FROM events WHERE user_id < 5 GROUP BY user_id),
grid AS (SELECT user_id, UNNEST(GENERATE_SERIES(t0, t1, INTERVAL '1 hour')) AS h
         FROM b),
agg AS (SELECT user_id, DATE_TRUNC('hour', ts) AS h, ROUND(SUM(value), 4) AS sv
        FROM events WHERE user_id < 5 GROUP BY 1, 2),
j AS (SELECT g.user_id, g.h, a.sv FROM grid g
      LEFT JOIN agg a ON a.user_id = g.user_id AND a.h = g.h)
SELECT user_id, h, COALESCE(sv, LAST_VALUE(sv IGNORE NULLS) OVER
  (PARTITION BY user_id ORDER BY h
   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS filled
FROM j ORDER BY user_id, h""",
)
def q56_gapfill(spark, sf_dir):
    """Time-series gap fill + forward fill (the hypertable resample
    primitive): per-user hourly grid via explode(sequence(...)), left
    join of the real hourly aggregate, then last-non-null carried
    forward with an ignoreNulls window. Plan: the grid generation is
    generate-side (no shuffle); one shuffle keys the join + window on
    user_id — gap filling a 100 TB series never materializes the grid on
    the driver, and the grid size is bounded by time range, not row
    count."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    b = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = b.select(
        "user_id",
        F.explode(F.expr("sequence(t0, t1, interval 1 hour)")).alias("h"),
    )
    agg = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.round(F.sum("value"), 4).alias("sv"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        grid.join(agg, ["user_id", "h"], "left")
        .select(
            "user_id",
            "h",
            F.coalesce(F.col("sv"), F.last("sv", ignorenulls=True).over(w)).alias(
                "filled"
            ),
        )
        .orderBy("user_id", "h")
    )


@declared(
    "q57_split",
    """SELECT doc_id,
  CASE WHEN ((doc_id % 100) * 2654435761) % 100 < 80 THEN 'train' ELSE 'eval' END AS split
FROM documents ORDER BY doc_id""",
)
def q57_split(spark, sf_dir):
    """Deterministic train/eval split by multiplicative hash — the
    reproducible no-shuffle alternative to sample(): pure projection
    (splits never move data, rerun anywhere gives the same assignment),
    Fibonacci-hash constant decorrelates the split from id locality so
    sequential ids don't stripe. Same arithmetic-hash trick as q29
    (engine hash() functions aren't portable). The inner `% 100` bounds
    the product so it can't overflow int64 for ids past ~3.47e9 —
    identical residue, overflow-proof (operators/traindata.id_hash_bucket)."""
    from graph_db_clustering_spark.operators.traindata import id_hash_bucket

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.when(id_hash_bucket("doc_id", 100) < 80, "train")
            .otherwise("eval")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


_Q58_SQL = """SELECT n_name, CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
  ROUND(SUM(o_totalprice), 2) AS revenue,
  COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY n_name, yr"""


@declared("q58_sqlapi", _Q58_SQL)
def q58_sqlapi(spark, sf_dir):
    """The SQL entry point: the engine's tables registered as temp views
    and the query submitted as raw ANSI SQL through spark.sql — the same
    string IS the DuckDB oracle, so this also pins that the SQL surface
    and the DataFrame surface see identical data. Catalyst plans the
    3-way join with both dims broadcast."""
    from graph_db_clustering_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q58_SQL)


@declared(
    "q58_interval_overlap",
    """WITH l AS (SELECT o_orderkey AS lid,
          CAST(o_orderdate AS DATE) AS ls,
          CAST(o_orderdate AS DATE) + CAST((o_orderkey % 20 + 1) AS INT) AS le
     FROM orders WHERE o_custkey < 40),
r AS (SELECT o_orderkey AS rid,
          CAST(o_orderdate AS DATE) AS rs,
          CAST(o_orderdate AS DATE) + CAST((o_orderkey % 15 + 1) AS INT) AS re
     FROM orders WHERE o_custkey >= 40 AND o_custkey < 80)
SELECT lid, rid FROM l JOIN r ON l.ls < r.re AND r.rs < l.le
ORDER BY lid, rid""",
)
def q58_interval_overlap(spark, sf_dir):
    """Interval-overlap join (operators/joins.interval_overlap_join,
    bucket-banded): order validity windows from two customer slices join
    where the half-open windows intersect; the Spark side runs the
    exploded-bin equi-join + verify (days since epoch, 32-day buckets),
    the oracle the plain theta join."""
    from graph_db_clustering_spark.operators.joins import interval_overlap_join

    o = _t(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("double")
    l = o.filter(F.col("o_custkey") < 40).select(
        F.col("o_orderkey").alias("lid"),
        days.alias("ls"),
        (days + (F.col("o_orderkey") % 20 + 1)).alias("le"),
    )
    r = o.filter((F.col("o_custkey") >= 40) & (F.col("o_custkey") < 80)).select(
        F.col("o_orderkey").alias("rid"),
        days.alias("rs"),
        (days + (F.col("o_orderkey") % 15 + 1)).alias("re"),
    )
    out = interval_overlap_join(l, r, "ls", "le", "rs", "re", bucket=32.0)
    return out.select("lid", "rid").orderBy("lid", "rid")


@declared(
    "events_funnel",
    """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
       JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
       JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                 WHEN s2.user_id IS NOT NULL THEN 2
                 WHEN s1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS depth
FROM u
LEFT JOIN s1 ON u.user_id = s1.user_id
LEFT JOIN s2 ON u.user_id = s2.user_id
LEFT JOIN s3 ON u.user_id = s3.user_id
ORDER BY u.user_id""",
)
def events_funnel(spark, sf_dir):
    """Ordered funnel view -> click -> purchase per user
    (operators/timeseries.funnel_depth, round 7): step k counts only
    strictly after the user's first completion of step k-1. The oracle
    rebuilds the same first-touch anchor chain with three conditional
    min-aggregates."""
    from graph_db_clustering_spark.operators.timeseries import funnel_depth

    e = _t(spark, sf_dir, "events")
    return (
        funnel_depth(e, "user_id", "ts", "event_type",
                     ["view", "click", "purchase"])
        .select("user_id", F.col("depth").cast("int").alias("depth"))
        .orderBy("user_id")
    )


@declared(
    "events_retention",
    """WITH c AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT CAST(c.cohort_date AS VARCHAR) AS cohort_date,
       CAST(DATEDIFF('day', c.cohort_date, a.day) AS INT) AS day_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS users
FROM a JOIN c ON a.user_id = c.user_id
WHERE DATEDIFF('day', c.cohort_date, a.day) <= 7
GROUP BY c.cohort_date, 2 ORDER BY 1, 2""",
)
def events_retention(spark, sf_dir):
    """Cohort retention matrix (operators/timeseries.cohort_retention,
    round 7): cohort = first-activity date per user, retained at
    offset d when any event lands exactly d days later; offsets 0..7.
    One min-aggregate, one user-keyed join, one distinct-count — the
    oracle recomputes the same matrix."""
    from graph_db_clustering_spark.operators.timeseries import (
        cohort_retention,
    )

    e = _t(spark, sf_dir, "events")
    return (
        cohort_retention(e, "user_id", "ts", max_offset=7)
        .select(F.col("cohort_date").cast("string").alias("cohort_date"),
                "day_offset", "users")
        .orderBy("cohort_date", "day_offset")
    )


@declared(
    "events_pivot",
    """SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error
FROM events GROUP BY user_id ORDER BY user_id""",
)
def events_pivot(spark, sf_dir):
    """PIVOT: per-user event counts widened to one column per event
    type (df.groupBy().pivot() with the explicit value list — the
    two-pass-free form; Catalyst compiles it to the same conditional
    aggregation the oracle states). Round 7: the classic BI reshape a
    migrating SQL user expects."""
    e = _t(spark, sf_dir, "events")
    types = ["view", "click", "purchase", "signup", "error"]
    wide = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .count()
    )
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types],
    ).orderBy("user_id")


@declared(
    "events_unpivot",
    """WITH wide AS (
  SELECT user_id,
         COUNT(*) FILTER (WHERE event_type = 'view') AS view,
         COUNT(*) FILTER (WHERE event_type = 'click') AS click,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase
  FROM events GROUP BY user_id)
SELECT user_id, kind, CAST(cnt AS BIGINT) AS cnt
FROM wide UNPIVOT (cnt FOR kind IN (view, click, purchase))
ORDER BY user_id, kind""",
)
def events_unpivot(spark, sf_dir):
    """UNPIVOT/melt: the wide per-user count matrix back to long form
    (df.unpivot — Spark's melt; DuckDB replays with its UNPIVOT
    clause). Pivot and unpivot compose to a lossless reshape pair."""
    e = _t(spark, sf_dir, "events")
    types = ["view", "click", "purchase"]
    wide = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types],
        )
    )
    return (
        wide.unpivot("user_id", types, "kind", "cnt")
        .select("user_id", "kind", F.col("cnt").cast("long").alias("cnt"))
        .orderBy("user_id", "kind")
    )


@declared(
    "recursive_cte",
    """SELECT c_custkey AS id,
       CAST(FLOOR(LOG2(c_custkey)) AS INT) AS depth
FROM customer WHERE c_custkey >= 1 ORDER BY id""",
)
def recursive_cte(spark, sf_dir):
    """WITH RECURSIVE (Spark 4's recursive CTE surface): walk every
    customer up the implicit binary-tree hierarchy (parent = id / 2)
    until the root, counting hops. The closed form — depth =
    floor(log2(id)) — is what the DuckDB oracle states, so the
    recursion itself is what is being checked."""
    e = _t(spark, sf_dir, "customer")
    return spark.sql(
        """WITH RECURSIVE walk(id, anc, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM {c} WHERE c_custkey >= 1
  UNION ALL
  SELECT id, CAST(anc / 2 AS BIGINT), depth + 1 FROM walk WHERE anc > 1
)
SELECT id, CAST(MAX(depth) AS INT) AS depth FROM walk
GROUP BY id ORDER BY id""",
        c=e,
    )


@declared(
    "events_abtest",
    """WITH g AS (
  SELECT user_id % 2 AS grp, value FROM events
  WHERE event_type = 'purchase'),
s AS (SELECT grp, COUNT(*) AS n, AVG(value) AS m,
             VAR_SAMP(value) AS v
      FROM g GROUP BY grp),
w AS (SELECT
        MAX(CASE WHEN grp = 0 THEN n END) AS n0,
        MAX(CASE WHEN grp = 1 THEN n END) AS n1,
        MAX(CASE WHEN grp = 0 THEN m END) AS m0,
        MAX(CASE WHEN grp = 1 THEN m END) AS m1,
        MAX(CASE WHEN grp = 0 THEN v END) AS v0,
        MAX(CASE WHEN grp = 1 THEN v END) AS v1
      FROM s)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       ROUND(m0 - m1, 4) AS mean_diff,
       ROUND((m0 - m1) / SQRT(v0 / n0 + v1 / n1), 4) AS t_stat,
       ROUND(POW(v0 / n0 + v1 / n1, 2)
             / (POW(v0 / n0, 2) / (n0 - 1)
                + POW(v1 / n1, 2) / (n1 - 1)), 4) AS dof
FROM w""",
)
def events_abtest(spark, sf_dir):
    """Welch's unequal-variance t-test between two user cohorts on
    purchase values (round 7) — the A/B readout every events warehouse
    computes, expressed as ONE aggregation pass (count/mean/var_samp
    per group, then the closed forms for the t statistic and the
    Welch-Satterthwaite degrees of freedom). No sampling, no SciPy —
    the statistic is pure SQL, and DuckDB recomputes it exactly."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    s = (
        e.select((F.col("user_id") % 2).alias("grp"), "value")
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    w = s.agg(
        *[
            F.max(F.when(F.col("grp") == g, F.col(c))).alias(f"{c}{g}")
            for c in ("n", "m", "v")
            for g in (0, 1)
        ]
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    return w.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(F.col("m0") - F.col("m1"), 4).alias("mean_diff"),
        F.round((F.col("m0") - F.col("m1")) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v0") / F.col("n0"), 2) / (F.col("n0") - 1)
                + F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
            ),
            4,
        ).alias("dof"),
    )


@declared(
    "events_anomaly",
    """WITH w AS (
  SELECT user_id, event_id, value,
    AVG(value) OVER tw AS mu, STDDEV_SAMP(value) OVER tw AS sd,
    COUNT(value) OVER tw AS n
  FROM events
  WINDOW tw AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
SELECT user_id, event_id, value, ROUND((value - mu) / sd, 4) AS zscore
FROM w WHERE n >= 10 AND sd > 0 AND ABS((value - mu) / sd) > 3
ORDER BY user_id, event_id""",
)
def events_anomaly(spark, sf_dir):
    """Trailing-window z-score anomaly detection (round 7): flag events
    whose value sits more than 3 sample standard deviations from the
    mean of the SAME user's previous 20 events — the telemetry-outlier
    readout. The frame excludes the current row (20 PRECEDING .. 1
    PRECEDING) so a spike can't mask itself, and needs >= 10 trailing
    events before it speaks. One window pass partitioned by user — at
    100 TB this shuffles once on user_id and never widens; no
    self-join, no Python."""
    e = _t(spark, sf_dir, "events")
    tw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    z = (F.col("value") - F.avg("value").over(tw)) / F.stddev_samp(
        "value"
    ).over(tw)
    # filter on the UNROUNDED z (matching the declared SQL exactly);
    # round only in the projected output column — filtering on the
    # rounded value suppressed true |z| in (3.0, 3.00005] (round-7 advice)
    return (
        e.select(
            "user_id",
            "event_id",
            "value",
            F.round(z, 4).alias("zscore"),
            z.alias("__z"),
            F.count("value").over(tw).alias("__n"),
            F.stddev_samp("value").over(tw).alias("__sd"),
        )
        .filter(
            (F.col("__n") >= 10) & (F.col("__sd") > 0) & (F.abs("__z") > 3)
        )
        .drop("__z", "__n", "__sd")
        .orderBy("user_id", "event_id")
    )


@declared(
    "events_cusum",
    """WITH p AS (
  SELECT user_id, event_id, ts,
    SUM(value - 75.0) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS pref
  FROM events),
s AS (
  SELECT user_id, event_id,
    pref - LEAST(0, MIN(pref) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING)) AS cusum
  FROM p)
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE cusum > 150.0) AS BIGINT) AS n_alarms,
       MIN(event_id) FILTER (WHERE cusum > 150.0) AS first_alarm,
       ROUND(MAX(cusum), 4) AS peak_cusum
FROM s GROUP BY user_id ORDER BY user_id""",
)
def events_cusum(spark, sf_dir):
    """CUSUM drift detection per user (round 7): the one-sided
    cumulative-sum statistic S_i = max(0, S_{i-1} + (x_i - k)) flags a
    sustained upward shift in event values long before any single point
    is an outlier. The recursion is NOT expressible as a window
    function directly — but its closed form is: S_i = P_i - min(P_j,
    j <= i) where P is the running sum of (value - k). Two stacked
    windows over the SAME (user_id, ts) ordering — Spark plans ONE
    shuffle and one sort for both, which is the whole trick; the naive
    per-user loop (applyInPandasWithState-style) would work but buys
    nothing in batch. k=75 (target + slack), alarm at h=150.

    The running min includes the implicit zero prefix P_0 = 0 (via
    LEAST(0, ...)): without it, S_i was forced to 0 on each user's
    first row and understated whenever every prefix sum is positive —
    delayed alarms that the oracle couldn't catch because both engines
    shared the formula (round-7 advice)."""
    e = _t(spark, sf_dir, "events")
    cw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value") - F.lit(75.0)).over(cw).alias("pref"),
    )
    s = p.select(
        "user_id",
        "event_id",
        (
            F.col("pref")
            - F.least(F.lit(0.0), F.min("pref").over(cw))
        ).alias("cusum"),
    )
    alarmed = F.col("cusum") > 150.0
    return (
        s.groupBy("user_id")
        .agg(
            F.count(F.when(alarmed, 1)).cast("long").alias("n_alarms"),
            F.min(F.when(alarmed, F.col("event_id"))).alias("first_alarm"),
            F.round(F.max("cusum"), 4).alias("peak_cusum"),
        )
        .orderBy("user_id")
    )


@declared(
    "events_ks",
    """WITH p AS (SELECT value AS v, CAST(user_id % 2 AS INT) AS g FROM events),
counts AS (SELECT v,
    SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS c0,
    SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS c1
  FROM p GROUP BY v),
tot AS (SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM counts),
cum AS (SELECT
    SUM(c0) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS a0,
    SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS a1
  FROM counts)
SELECT CAST(tot.n0 AS BIGINT) AS n0, CAST(tot.n1 AS BIGINT) AS n1,
       ROUND(MAX(ABS(a0 * 1.0 / tot.n0 - a1 * 1.0 / tot.n1)), 6) AS ks_d
FROM cum, tot GROUP BY tot.n0, tot.n1""",
)
def events_ks(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov (round 8, operators/stats
    .ks_statistic_scale) between the even- and odd-user event-value
    distributions: D = sup |F0 - F1| over the pooled ECDFs. The heavy
    reduction (per-distinct-value counts) is a fully parallel
    aggregate; the prefix sums run on the RANGE-PARTITIONED scale path
    (ks_statistic_scale): per-bucket windows plus a partitions-row
    offset broadcast — no global sort, no single-partition pass
    anywhere. Ties are handled exactly: counts collapse per distinct
    value BEFORE the cumulative sums, so the ECDF is evaluated after
    each tie group (row-level windows would be nondeterministic within
    ties)."""
    from graph_db_clustering_spark.operators.stats import ks_statistic_scale

    e = _t(spark, sf_dir, "events").select(
        "value", (F.col("user_id") % 2).cast("int").alias("grp")
    )
    return ks_statistic_scale(e, "value", "grp").select(
        "n0", "n1", F.round("ks_d", 6).alias("ks_d")
    )


@declared(
    "lineitem_corr",
    """SELECT ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(CORR(l_quantity, l_discount), 6) AS corr_qty_disc,
       ROUND(CORR(l_quantity, l_tax), 6) AS corr_qty_tax,
       ROUND(CORR(l_extendedprice, l_discount), 6) AS corr_price_disc,
       ROUND(CORR(l_extendedprice, l_tax), 6) AS corr_price_tax,
       ROUND(CORR(l_discount, l_tax), 6) AS corr_disc_tax
FROM lineitem""",
)
def lineitem_corr(spark, sf_dir):
    """Pairwise Pearson correlation matrix of the four lineitem
    measures in ONE aggregation pass (round 8): six corr() aggregates
    share a single scan and a single partial/final HashAggregate —
    the profiling query a feature-engineering pipeline runs before
    picking decorrelated inputs. At 100 TB this is still one
    map-side-combined pass; nothing is quadratic in rows."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice", "corr_qty_price"),
        ("l_quantity", "l_discount", "corr_qty_disc"),
        ("l_quantity", "l_tax", "corr_qty_tax"),
        ("l_extendedprice", "l_discount", "corr_price_disc"),
        ("l_extendedprice", "l_tax", "corr_price_tax"),
        ("l_discount", "l_tax", "corr_disc_tax"),
    ]
    return li.agg(
        *[F.round(F.corr(a, b), 6).alias(n) for a, b, n in pairs]
    )


@declared(
    "orders_independence",
    """WITH joint AS (SELECT o_orderstatus AS a, o_orderpriority AS b,
       COUNT(*) AS o FROM orders GROUP BY a, b),
cells AS (SELECT o,
    SUM(o) OVER (PARTITION BY a) AS ra,
    SUM(o) OVER (PARTITION BY b) AS cb,
    SUM(o) OVER () AS n
  FROM joint),
dims AS (SELECT COUNT(DISTINCT a) AS ka, COUNT(DISTINCT b) AS kb FROM joint),
s AS (SELECT MAX(n) AS n,
    SUM(POWER(o - ra * 1.0 * cb / n, 2) / (ra * 1.0 * cb / n)) AS chi2,
    SUM((o * 1.0 / n) * LN(o * 1.0 * n / (ra * 1.0 * cb))) AS mi
  FROM cells)
SELECT CAST(s.n AS BIGINT) AS n, ROUND(s.chi2, 4) AS chi2,
       CAST((dims.ka - 1) * (dims.kb - 1) AS BIGINT) AS dof,
       ROUND(SQRT(s.chi2 / (s.n * LEAST(dims.ka - 1, dims.kb - 1))), 6)
           AS cramers_v,
       ROUND(s.mi, 6) AS mi
FROM s, dims""",
)
def orders_independence(spark, sf_dir):
    """Chi-squared independence test + Cramer's V + mutual information
    between order status and priority (round 8,
    operators/stats.contingency_stats) — the feature-selection
    profiling pass of a labeling pipeline. ONE data-sized
    groupBy(a, b) (map-side combined); every other step aggregates the
    cells frame (|A| x |B| rows). On independent TPC-H-ish columns the
    statistics hover near 0 — the oracle recomputes the identical
    definitions, so any drift in marginal handling shows as a hash
    mismatch."""
    from graph_db_clustering_spark.operators.stats import contingency_stats

    o = _t(spark, sf_dir, "orders")
    return contingency_stats(o, "o_orderstatus", "o_orderpriority").select(
        "n",
        F.round("chi2", 4).alias("chi2"),
        "dof",
        F.round("cramers_v", 6).alias("cramers_v"),
        F.round("mi", 6).alias("mi"),
    )


@declared(
    "events_decay",
    """WITH per AS (SELECT event_type, epoch_us(ts) AS us,
       MAX(epoch_us(ts)) OVER (PARTITION BY event_type) AS T FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(POWER(0.5, (T - us) / (3600.0 * 1000000))), 6) AS decayed
FROM per GROUP BY event_type ORDER BY event_type""",
)
def events_decay(spark, sf_dir):
    """Half-life-decayed event counts per type (round 8,
    operators/timeseries.decayed_counts): recency-weighted popularity
    evaluated at each key's last event, halflife 1 h. Exponents are
    built from exact epoch-microsecond integers so both engines feed
    POWER identical doubles. The streaming incremental form
    (streaming/stateful.decayed_counts_stream) is pinned equal to this
    batch form by replay in tests/test_streaming.py."""
    from graph_db_clustering_spark.operators.timeseries import decayed_counts

    e = _t(spark, sf_dir, "events")
    out = decayed_counts(e, "event_type", "ts", 3600.0)
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("decayed", 6).alias("decayed"),
    ).orderBy("event_type")


@declared(
    "events_markov",
    """WITH seq AS (SELECT user_id, event_type,
       LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS prev
     FROM events)
SELECT prev, event_type AS next, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev), 6) AS p
FROM seq WHERE prev IS NOT NULL
GROUP BY prev, next ORDER BY prev, next""",
)
def events_markov(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (round 8): P(next | prev) with counts — the
    session-model readout behind next-action prediction and anomaly
    screens. One user-keyed window (lag) + one (prev, next) aggregate;
    the normalizing row sums come from a window over the
    |types|^2-row transition frame, so nothing data-sized moves after
    the first shuffle."""
    e = _t(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(uw).alias("prev")
    ).filter(F.col("prev").isNotNull())
    pw = Window.partitionBy("prev")
    return (
        seq.groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count("*").alias("n"))
        .select(
            "prev",
            "next",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.sum("n").over(pw), 6).alias("p"),
        )
        .orderBy("prev", "next")
    )


@declared(
    "customer_rfm",
    """WITH base AS (SELECT o_custkey, MAX(o_orderdate) AS last_dt,
       COUNT(*) AS freq, SUM(o_totalprice) AS mon
     FROM orders GROUP BY o_custkey),
mx AS (SELECT MAX(o_orderdate) AS ref FROM orders)
SELECT o_custkey, CAST(date_diff('day', last_dt, ref) AS BIGINT)
         AS recency_days,
       CAST(freq AS BIGINT) AS frequency, ROUND(mon, 2) AS monetary,
       CAST(NTILE(5) OVER (ORDER BY last_dt DESC, o_custkey) AS BIGINT)
         AS r_score,
       CAST(NTILE(5) OVER (ORDER BY freq DESC, o_custkey) AS BIGINT)
         AS f_score,
       CAST(NTILE(5) OVER (ORDER BY mon DESC, o_custkey) AS BIGINT)
         AS m_score
FROM base, mx ORDER BY o_custkey""",
)
def customer_rfm(spark, sf_dir):
    """RFM (recency / frequency / monetary) quintile scoring per
    customer (round 8) — the canonical cohort-segmentation readout.
    The data-sized work is one groupBy(custkey); the three NTILE
    windows run over the CUSTOMER-sized aggregate with deterministic
    (metric, custkey) tie-breaks. The global NTILEs are a
    single-partition pass over customers — fine for a dimension-sized
    frame; at billions of customers swap them for fixed quantile
    boundaries from approx_percentile (the scale variant of every
    global-rank scoring)."""
    o = _t(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_dt"),
        F.count("*").alias("freq"),
        F.sum("o_totalprice").alias("mon"),
    )
    ref = o.agg(F.max("o_orderdate").alias("ref"))
    return (
        base.crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff(F.col("ref"), F.col("last_dt")).cast("long").alias("recency_days"),
            F.col("freq").cast("long").alias("frequency"),
            F.round("mon", 2).alias("monetary"),
            F.ntile(5)
            .over(Window.orderBy(F.desc("last_dt"), F.asc("o_custkey")))
            .cast("long")
            .alias("r_score"),
            F.ntile(5)
            .over(Window.orderBy(F.desc("freq"), F.asc("o_custkey")))
            .cast("long")
            .alias("f_score"),
            F.ntile(5)
            .over(Window.orderBy(F.desc("mon"), F.asc("o_custkey")))
            .cast("long")
            .alias("m_score"),
        )
        .orderBy("o_custkey")
    )


@declared(
    "lineitem_ols",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(COVAR_POP(l_quantity, l_extendedprice)
             / VAR_POP(l_quantity), 4) AS slope,
       ROUND(AVG(l_extendedprice)
             - COVAR_POP(l_quantity, l_extendedprice) / VAR_POP(l_quantity)
               * AVG(l_quantity), 4) AS intercept,
       ROUND(POWER(CORR(l_quantity, l_extendedprice), 2), 6) AS r2
FROM lineitem""",
)
def lineitem_ols(spark, sf_dir):
    """Least-squares regression of extended price on quantity (round 8,
    operators/stats.ols_fit): the normal-equation solve over ONE
    moments pass — the distributed exact-OLS shape (Gram matrix per
    Arrow batch, driver solves the (p+1)-dim system). The oracle is
    the closed single-feature form (slope = cov/var, r2 = corr^2),
    which the general matrix path must reproduce to rounding."""
    from graph_db_clustering_spark.operators.stats import ols_fit

    li = _t(spark, sf_dir, "lineitem")
    m = ols_fit(li, ["l_quantity"], "l_extendedprice")
    return spark.createDataFrame(
        [
            (
                m["n"],
                round(float(m["coef"][0]), 4),
                round(m["intercept"], 4),
                round(m["r2"], 6),
            )
        ],
        "n long, slope double, intercept double, r2 double",
    )


@declared(
    "events_seasonal",
    """WITH base AS (SELECT event_type, DATE_PART('dow', ts) AS dow, value
       FROM events),
prof AS (SELECT event_type, dow, COUNT(*) AS n, AVG(value) AS dow_avg
         FROM base GROUP BY event_type, dow),
tot AS (SELECT event_type, AVG(value) AS type_avg FROM base
        GROUP BY event_type)
SELECT p.event_type, CAST(p.dow AS BIGINT) AS dow,
       CAST(p.n AS BIGINT) AS n, ROUND(p.dow_avg, 4) AS dow_avg,
       ROUND(p.dow_avg - t.type_avg, 4) AS seasonal_dev
FROM prof p JOIN tot t USING (event_type)
ORDER BY p.event_type, dow""",
)
def events_seasonal(spark, sf_dir):
    """Day-of-week seasonal profile per event type (round 8): the
    additive-seasonality readout (which weekdays run hot) as two
    partial-aggregated groupBys over one scan — the type-level means
    join back against the |types|*7-row profile, so nothing data-sized
    moves twice. dow is 0=Sunday..6 in both engines (Spark's
    1-based dayofweek shifted)."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        "event_type", (F.dayofweek("ts") - 1).alias("dow"), "value"
    )
    prof = base.groupBy("event_type", "dow").agg(
        F.count("*").alias("n"), F.avg("value").alias("dow_avg")
    )
    tot = base.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
    return (
        prof.join(tot, "event_type")
        .select(
            "event_type",
            F.col("dow").cast("long").alias("dow"),
            F.col("n").cast("long").alias("n"),
            F.round("dow_avg", 4).alias("dow_avg"),
            F.round(F.col("dow_avg") - F.col("type_avg"), 4).alias("seasonal_dev"),
        )
        .orderBy("event_type", "dow")
    )


@declared(
    "events_mad",
    """WITH med AS (SELECT event_type,
       PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY value) AS m
     FROM events GROUP BY event_type),
dev AS (SELECT e.event_type, ABS(e.value - med.m) AS ad, med.m
        FROM events e JOIN med ON e.event_type = med.event_type),
mad AS (SELECT event_type, MAX(m) AS m,
          PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY ad) AS mad
        FROM dev GROUP BY event_type)
SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_outliers,
       ROUND(MAX(mad.mad), 4) AS mad
FROM dev d JOIN mad ON d.event_type = mad.event_type
WHERE d.ad > 3.5 * 1.4826 * mad.mad
GROUP BY d.event_type ORDER BY d.event_type""",
)
def events_mad(spark, sf_dir):
    """Robust outlier counts per event type via the median absolute
    deviation (round 8): |x - median| > 3.5 * 1.4826 * MAD — the
    estimator that survives the very outliers a stddev-based z-score
    lets poison its own threshold (1.4826 scales MAD to sigma under
    normality). Two grouped exact-percentile aggregates + one
    type-keyed join back; the |types|-row medians frame broadcasts."""
    e = _t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("m")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("m")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("ad") > 3.5 * 1.4826 * F.col("mad"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_outliers"),
            F.round(F.max("mad"), 4).alias("mad"),
        )
        .orderBy("event_type")
    )


@declared(
    "user_streaks",
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
       FROM events),
grp AS (SELECT user_id, d,
       CAST(d AS DATE) - CAST(ROW_NUMBER() OVER
         (PARTITION BY user_id ORDER BY d) AS INT) AS island
     FROM days),
streaks AS (SELECT user_id, island, COUNT(*) AS len, MIN(d) AS start_d
            FROM grp GROUP BY user_id, island),
best AS (SELECT user_id, MAX(len) AS longest FROM streaks GROUP BY user_id)
SELECT s.user_id, CAST(b.longest AS BIGINT) AS longest_streak,
       STRFTIME(MIN(s.start_d), '%Y-%m-%d') AS streak_start
FROM streaks s JOIN best b ON s.user_id = b.user_id AND s.len = b.longest
GROUP BY s.user_id, b.longest ORDER BY s.user_id""",
)
def user_streaks(spark, sf_dir):
    """Longest consecutive-day activity streak per user (round 8): the
    classic gaps-and-islands — date minus dense row number is constant
    exactly within a run of consecutive days. Distinct (user, day),
    one user-keyed window, two aggregates; earliest start wins a
    length tie. At 100 TB the distinct collapses events to user-days
    before anything else runs."""
    e = _t(spark, sf_dir, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = grp.groupBy("user_id", "island").agg(
        F.count("*").alias("len"), F.min("d").alias("start_d")
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("longest_streak"))
    return (
        streaks.join(best, "user_id")
        .filter(F.col("len") == F.col("longest_streak"))
        .groupBy("user_id")
        .agg(
            F.max("len").cast("long").alias("longest_streak"),
            F.date_format(F.min("start_d"), "yyyy-MM-dd").alias("streak_start"),
        )
        .select("user_id", "longest_streak", "streak_start")
        .orderBy("user_id")
    )


@declared(
    "attribution",
    """WITH p AS (SELECT user_id, event_id, ts FROM events
       WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id AS click_id, ts AS cts FROM events
      WHERE event_type = 'click')
SELECT p.user_id, p.event_id,
  (SELECT c.click_id FROM c
    WHERE c.user_id = p.user_id AND c.cts <= p.ts
      AND c.cts >= p.ts - INTERVAL 7 DAY
    ORDER BY c.cts DESC, c.click_id DESC LIMIT 1) AS click_id
FROM p ORDER BY p.user_id, p.event_id""",
)
def attribution(spark, sf_dir):
    """Last-touch attribution (round 8): each purchase credits the
    user's most recent click within a 7-day lookback — the
    marketing-analytics as-of pattern. One user-keyed equi-join with
    a range predicate, then a max_by((ts, id)) argmax per purchase
    (deterministic tie-break on the larger click id, matching the
    oracle's ORDER BY ... DESC LIMIT 1); unattributed purchases stay
    as NULL via the left join. Work is bounded by clicks-per-user per
    purchase window, never a cross join."""
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    matched = (
        p.join(c, "user_id")
        .filter(
            (F.col("cts") <= F.col("ts"))
            & (F.col("cts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id", "event_id")
        .agg(
            F.max_by(
                F.col("click_id"), F.struct(F.col("cts"), F.col("click_id"))
            ).alias("click_id")
        )
    )
    return (
        p.join(matched, ["user_id", "event_id"], "left")
        .select("user_id", "event_id", "click_id")
        .orderBy("user_id", "event_id")
    )


@declared(
    "basket_lift",
    """WITH baskets AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d,
       event_type FROM events),
nb AS (SELECT COUNT(DISTINCT (user_id, d)) AS n
       FROM baskets),
sup AS (SELECT event_type, COUNT(*) AS s FROM baskets GROUP BY event_type),
pairs AS (SELECT a.event_type AS x, b.event_type AS y, COUNT(*) AS sxy
          FROM baskets a JOIN baskets b
            ON a.user_id = b.user_id AND a.d = b.d
           AND a.event_type < b.event_type
          GROUP BY a.event_type, b.event_type)
SELECT p.x, p.y, CAST(p.sxy AS BIGINT) AS n_both,
       ROUND(p.sxy * 1.0 * nb.n / (sa.s * sb.s), 6) AS lift
FROM pairs p JOIN sup sa ON p.x = sa.event_type
     JOIN sup sb ON p.y = sb.event_type, nb
ORDER BY p.x, p.y""",
)
def basket_lift(spark, sf_dir):
    """Market-basket lift between event types co-occurring in the same
    (user, day) basket (round 8): lift = P(x,y) / (P(x) P(y)) over
    baskets — the association readout behind 'users who X also Y'.
    The basket frame collapses events to distinct (user, day, type)
    FIRST (the 100 TB reduction); the pair join is keyed by the
    basket, so per-basket work is |types-in-basket|^2, bounded by the
    type vocabulary, never raw event counts."""
    e = _t(spark, sf_dir, "events")
    baskets = e.select(
        "user_id", F.col("ts").cast("date").alias("d"), "event_type"
    ).distinct()
    nb = baskets.select("user_id", "d").distinct().count()
    sup = baskets.groupBy("event_type").agg(F.count("*").alias("s"))
    a = baskets.select("user_id", "d", F.col("event_type").alias("x"))
    b = baskets.select("user_id", "d", F.col("event_type").alias("y"))
    pairs = (
        a.join(b, ["user_id", "d"])
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("sxy"))
    )
    return (
        pairs.join(F.broadcast(sup.select(F.col("event_type").alias("x"), F.col("s").alias("sa"))), "x")
        .join(F.broadcast(sup.select(F.col("event_type").alias("y"), F.col("s").alias("sb"))), "y")
        .select(
            "x",
            "y",
            F.col("sxy").cast("long").alias("n_both"),
            F.round(F.col("sxy") * F.lit(float(nb)) / (F.col("sa") * F.col("sb")), 6).alias("lift"),
        )
        .orderBy("x", "y")
    )


@declared(
    "doc_auc",
    """WITH s AS (SELECT n_chars AS sc,
       CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
counts AS (SELECT sc, SUM(y) AS p, SUM(1 - y) AS n FROM s GROUP BY sc),
cum AS (SELECT p, n,
       SUM(n) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) - n AS nb
     FROM counts)
SELECT CAST(SUM(p) AS BIGINT) AS n_pos, CAST(SUM(n) AS BIGINT) AS n_neg,
       ROUND(SUM(p * (nb + n / 2.0)) / (SUM(p) * SUM(n)), 6) AS auc
FROM cum""",
)
def doc_auc(spark, sf_dir):
    """ROC AUC of document length as an is-English classifier
    (round 8, operators/stats.auc_score): the Mann-Whitney U form with
    exact tie credit (ties count half) — no O(P*N) pair
    materialization, one groupBy(score) plus a distinct-score
    cumulative pass (ks_statistic's posture; range-partitioned prefix
    sum is the 100 TB swap). AUC near 0.5 = length carries little
    language signal, which is itself the check: both engines must
    agree to 6 decimals on a statistic built from every rank."""
    from graph_db_clustering_spark.operators.stats import auc_score

    d = _t(spark, sf_dir, "documents").select(
        "n_chars", (F.col("lang") == "en").cast("int").alias("y")
    )
    return auc_score(d, "n_chars", "y").select(
        "n_pos", "n_neg", F.round("auc", 6).alias("auc")
    )


@declared(
    "events_psi",
    """WITH t AS (SELECT value AS v,
       ts < TIMESTAMP '2024-01-15' AS is_ref FROM events),
e AS (SELECT UNNEST(quantile_cont(v,
       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS edge
     FROM t WHERE is_ref),
g AS (SELECT v, is_ref, COUNT(*) AS cnt FROM t GROUP BY v, is_ref),
bg AS (SELECT g.is_ref, g.cnt,
       SUM(CASE WHEN g.v > e.edge THEN 1 ELSE 0 END) AS bin
     FROM g CROSS JOIN e GROUP BY g.v, g.is_ref, g.cnt),
cells AS (SELECT bin,
       SUM(CASE WHEN is_ref THEN cnt ELSE 0 END) AS r,
       SUM(CASE WHEN NOT is_ref THEN cnt ELSE 0 END) AS c
     FROM bg GROUP BY bin),
tot AS (SELECT SUM(r) AS nr, SUM(c) AS nc FROM cells)
SELECT CAST(tot.nr AS BIGINT) AS n_ref, CAST(tot.nc AS BIGINT) AS n_cur,
       ROUND(SUM(((c + 0.5) / (tot.nc + 5.0) - (r + 0.5) / (tot.nr + 5.0))
             * LN(((c + 0.5) / (tot.nc + 5.0))
                  / ((r + 0.5) / (tot.nr + 5.0)))), 6) AS psi
FROM cells, tot GROUP BY tot.nr, tot.nc""",
)
def events_psi(spark, sf_dir):
    """Population Stability Index of event values, first two weeks of
    January as the reference population vs the rest (round 8,
    operators/stats.psi_drift): decile bins from the reference's EXACT
    quantiles, add-0.5 smoothing so empty bins stay finite — the
    standard model-input drift gate (<0.1 stable, >0.25 drifted).
    One exact-percentile aggregate for the 9 edges, one codegen CASE
    bucketing pass, one bins-sized aggregate."""
    from graph_db_clustering_spark.operators.stats import psi_drift

    e = _t(spark, sf_dir, "events")
    out = psi_drift(
        e, "value", F.col("ts") < F.lit("2024-01-15").cast("timestamp"), 10, 0.5
    )
    return out.select("n_ref", "n_cur", F.round("psi", 6).alias("psi"))


@declared(
    "customer_gini",
    """WITH spend AS (SELECT o_custkey, SUM(o_totalprice) AS x
       FROM orders GROUP BY o_custkey),
ranked AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i,
             COUNT(*) OVER () AS n, SUM(x) OVER () AS tot
           FROM spend)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       ROUND(2.0 * SUM(i * x) / (MAX(n) * MAX(tot))
             - (MAX(n) + 1.0) / MAX(n), 6) AS gini
FROM ranked""",
)
def customer_gini(spark, sf_dir):
    """Gini coefficient of customer spend concentration (round 8): the
    closed rank form G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n over
    ascending-sorted totals — the inequality readout behind 'top 20%
    of customers drive X% of revenue'. The data-sized work is one
    groupBy(custkey); the rank window runs over the customer-sized
    aggregate (same posture as customer_rfm, with the same
    approx-quantile swap at billions of customers)."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("x"))
    w = Window.orderBy("x", "o_custkey")
    ranked = spend.select(
        "x",
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
        F.sum("x").over(Window.partitionBy()).alias("tot"),
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_customers"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")) / (F.max("n") * F.max("tot"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )


@declared(
    "doc_readability",
    """WITH m AS (SELECT doc_id,
    ARRAY_LENGTH(regexp_extract_all(LOWER(text), '[a-z]+')) AS words,
    GREATEST(ARRAY_LENGTH(regexp_extract_all(text, '[.!?]+')), 1)
      AS sentences,
    ARRAY_LENGTH(regexp_extract_all(LOWER(text), '[aeiouy]+')) AS syllables
  FROM documents)
SELECT doc_id, CAST(words AS BIGINT) AS words,
       CAST(sentences AS BIGINT) AS sentences,
       CAST(syllables AS BIGINT) AS syllables,
       ROUND(206.835 - 1.015 * words / sentences
             - 84.6 * syllables / GREATEST(words, 1), 4) AS flesch
FROM m WHERE words > 0 ORDER BY doc_id""",
)
def doc_readability(spark, sf_dir):
    """Flesch reading-ease per document (round 8): 206.835 -
    1.015*(words/sentences) - 84.6*(syllables/words), with the
    standard vowel-group syllable heuristic — the readability axis of
    text-quality filtering (too-hard and too-trivial text both
    correlate with low training value). Three regexp_extract_all
    counts in one codegen pass; both engines run the identical
    regexes."""
    d = _t(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    words = F.size(F.regexp_extract_all(lower, F.lit("[a-z]+"), F.lit(0)))
    sentences = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))), F.lit(1)
    )
    syllables = F.size(F.regexp_extract_all(lower, F.lit("[aeiouy]+"), F.lit(0)))
    return (
        d.select(
            "doc_id",
            words.cast("long").alias("words"),
            sentences.cast("long").alias("sentences"),
            syllables.cast("long").alias("syllables"),
        )
        .filter(F.col("words") > 0)
        .select(
            "doc_id",
            "words",
            "sentences",
            "syllables",
            F.round(
                206.835
                - 1.015 * F.col("words") / F.col("sentences")
                - 84.6 * F.col("syllables") / F.greatest(F.col("words"), F.lit(1)),
                4,
            ).alias("flesch"),
        )
        .orderBy("doc_id")
    )


@declared(
    "corpus_zipf",
    """WITH terms AS (SELECT UNNEST(string_split_regex(LOWER(TRIM(text)),
       '\\s+')) AS w FROM documents),
freq AS (SELECT w, COUNT(*) AS f FROM terms WHERE w <> '' GROUP BY w),
ranked AS (SELECT LN(ROW_NUMBER() OVER (ORDER BY f DESC, w)) AS lr,
             LN(f) AS lf
           FROM freq)
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(COVAR_POP(lr, lf) / VAR_POP(lr), 4) AS zipf_slope,
       ROUND(POWER(CORR(lr, lf), 2), 4) AS r2
FROM ranked""",
)
def corpus_zipf(spark, sf_dir):
    """Zipf's-law fit over the corpus vocabulary (round 8): OLS slope
    of ln(frequency) on ln(rank) — natural text sits near -1; token
    salad and boilerplate-heavy corpora bend away, making the slope a
    corpus-health readout. One term-count aggregate (the data-sized
    work), one vocabulary-sized rank window, closed-form cov/var
    slope — no iteration."""
    d = _t(spark, sf_dir, "documents")
    terms = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    freq = terms.groupBy("w").agg(F.count("*").alias("f"))
    w = Window.orderBy(F.desc("f"), "w")
    ranked = freq.select(
        F.log(F.row_number().over(w).cast("double")).alias("lr"),
        F.log(F.col("f").cast("double")).alias("lf"),
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.round(F.covar_pop("lr", "lf") / F.var_pop("lr"), 4).alias("zipf_slope"),
        F.round(F.pow(F.corr("lr", "lf"), 2), 4).alias("r2"),
    )


@declared(
    "conversion_lag",
    """WITH f AS (SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy
  FROM events GROUP BY user_id),
lag AS (SELECT (epoch_us(first_buy) - epoch_us(first_view)) / 3600e6
          AS hours
        FROM f WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
          AND first_buy >= first_view)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY hours), 4) AS p50_h,
       ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY hours), 4) AS p90_h,
       ROUND(AVG(hours), 4) AS mean_h
FROM lag""",
)
def conversion_lag(spark, sf_dir):
    """Time-to-convert distribution (round 8): hours from a user's
    first view to their first purchase (converters only, purchase not
    before view), summarized as p50/p90/mean — the funnel-latency
    readout. One conditional-min aggregate per user, one exact
    percentile pass over the users-sized lag frame; epoch microseconds
    feed both engines identical doubles."""
    e = _t(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("fb"),
    )
    lag = (
        f.filter(
            F.col("fv").isNotNull()
            & F.col("fb").isNotNull()
            & (F.col("fb") >= F.col("fv"))
        )
        .select(
            ((F.unix_micros("fb") - F.unix_micros("fv")) / 3600e6).alias("hours")
        )
    )
    return lag.agg(
        F.count("*").cast("long").alias("n_converted"),
        F.round(F.percentile("hours", F.lit(0.5)), 4).alias("p50_h"),
        F.round(F.percentile("hours", F.lit(0.9)), 4).alias("p90_h"),
        F.round(F.avg("hours"), 4).alias("mean_h"),
    )


@declared(
    "survival_km",
    """WITH span AS (SELECT user_id,
    date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
      AS lifetime,
    MAX(CAST(ts AS DATE)) >= DATE '2024-01-28' AS censored
  FROM events GROUP BY user_id),
ev AS (SELECT lifetime AS t,
         SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS d,
         COUNT(*) AS leaving
       FROM span GROUP BY lifetime),
ord AS (SELECT t, d,
         SUM(leaving) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
           AS at_risk
        FROM ev),
km AS (SELECT t, d, at_risk,
         EXP(SUM(LN(1.0 - d * 1.0 / at_risk))
             OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) AS s
       FROM ord WHERE d > 0)
SELECT CAST(t AS BIGINT) AS t_days, CAST(d AS BIGINT) AS churned,
       CAST(at_risk AS BIGINT) AS at_risk, ROUND(s, 6) AS survival
FROM km ORDER BY t_days""",
)
def survival_km(spark, sf_dir):
    """Kaplan-Meier survival curve of user lifetimes (round 8):
    lifetime = days between a user's first and last event; users still
    active in the final observed days (last event on/after Jan 28) are
    right-CENSORED — they leave the risk set without counting as
    churn, the estimator's whole point. S(t) = prod over event times
    <= t of (1 - d_i / n_i), computed as exp(cumsum(ln)) over the
    distinct-lifetime frame; the at-risk counts come from one
    descending cumulative sum. Two user-sized aggregates, two
    windows over the lifetime-resolution frame."""
    e = _t(spark, sf_dir, "events")
    span = e.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        ).alias("lifetime"),
        (F.max(F.col("ts").cast("date")) >= F.lit("2024-01-28").cast("date")).alias(
            "censored"
        ),
    )
    ev = span.groupBy("lifetime").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias("d"),
        F.count("*").alias("leaving"),
    )
    wdesc = Window.orderBy(F.desc("lifetime")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ordd = ev.select(
        "lifetime", "d", F.sum("leaving").over(wdesc).alias("at_risk")
    )
    wasc = Window.orderBy("lifetime").rowsBetween(Window.unboundedPreceding, 0)
    km = (
        ordd.filter(F.col("d") > 0)
        .select(
            "lifetime",
            "d",
            "at_risk",
            F.exp(
                F.sum(F.log(1.0 - F.col("d") / F.col("at_risk"))).over(wasc)
            ).alias("s"),
        )
    )
    return km.select(
        F.col("lifetime").cast("long").alias("t_days"),
        F.col("d").cast("long").alias("churned"),
        F.col("at_risk").cast("long").alias("at_risk"),
        F.round("s", 6).alias("survival"),
    ).orderBy("t_days")


@declared(
    "orders_benford",
    """WITH digits AS (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
       AS VARCHAR), 1, 1) AS INT) AS d
     FROM orders WHERE o_totalprice >= 1),
obs AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY d),
tot AS (SELECT SUM(n) AS t FROM obs)
SELECT obs.d AS digit, CAST(obs.n AS BIGINT) AS n,
       ROUND(obs.n * 1.0 / tot.t, 6) AS observed,
       ROUND(LOG10(1.0 + 1.0 / obs.d), 6) AS benford,
       ROUND(obs.n * 1.0 / tot.t - LOG10(1.0 + 1.0 / obs.d), 6) AS dev
FROM obs, tot ORDER BY digit""",
)
def orders_benford(spark, sf_dir):
    """Benford's-law first-digit profile of order totals (round 8):
    observed leading-digit frequencies vs log10(1 + 1/d) — the
    fraud/data-fabrication screen (organic monetary amounts follow
    Benford; synthetic uniform-ish ones deviate visibly, which this
    testdata indeed does — the deviation column IS the signal). One
    digit-keyed aggregate; the leading digit is integer/string
    slicing via an explicit FLOOR (DuckDB ROUNDS double->BIGINT where
    Spark truncates — the repo's cross-engine cast rule), no float log
    tricks that could diverge between engines."""
    o = _t(spark, sf_dir, "orders")
    digits = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        ).cast("int").alias("d")
    )
    obs = digits.groupBy("d").agg(F.count("*").alias("n"))
    tot = obs.agg(F.sum("n").alias("t"))
    benford = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("t"), 6).alias("observed"),
            F.round(benford, 6).alias("benford"),
            F.round(F.col("n") / F.col("t") - benford, 6).alias("dev"),
        )
        .orderBy("digit")
    )


@declared(
    "events_ffill",
    """WITH masked AS (SELECT user_id, event_id, ts,
       CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
     FROM events)
SELECT user_id, event_id,
       ROUND(COALESCE(LAST_VALUE(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING), -1.0), 4) AS filled
FROM masked ORDER BY user_id, event_id""",
)
def events_ffill(spark, sf_dir):
    """Forward-fill imputation (round 8): error events' readings are
    treated as missing and take the user's most recent valid value —
    the gap-filling pass sensor/telemetry pipelines run before any
    aggregate (leaving nulls biases means; global fills leak across
    users). One user-keyed ordered window with last_value(ignorenulls);
    users whose FIRST readings are missing fill with the -1 sentinel
    so the imputation boundary stays visible."""
    e = _t(spark, sf_dir, "events")
    masked = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        masked.select(
            "user_id",
            "event_id",
            F.round(
                F.coalesce(
                    F.last("v", ignorenulls=True).over(w), F.lit(-1.0)
                ),
                4,
            ).alias("filled"),
        )
        .orderBy("user_id", "event_id")
    )


@declared(
    "events_trend",
    """SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(REGR_SLOPE(value, epoch_us(ts) / 3600e6), 6) AS slope_per_hour,
       ROUND(REGR_INTERCEPT(value, epoch_us(ts) / 3600e6), 4) AS intercept,
       ROUND(REGR_R2(value, epoch_us(ts) / 3600e6), 6) AS r2
FROM events GROUP BY event_type ORDER BY event_type""",
)
def events_trend(spark, sf_dir):
    """Per-type linear trend of event values over time (round 8): one
    grouped REGR_SLOPE/INTERCEPT/R2 aggregate — the drift detector's
    first derivative, cheaper than any model. Time enters as exact
    epoch-microsecond hours so both engines regress on identical
    doubles; everything partial-aggregates map-side (regr_* are
    moment-fold aggregates like corr)."""
    e = _t(spark, sf_dir, "events")
    h = F.unix_micros("ts") / 3600e6
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.regr_slope(F.col("value"), h), 6).alias("slope_per_hour"),
            F.round(F.regr_intercept(F.col("value"), h), 4).alias("intercept"),
            F.round(F.regr_r2(F.col("value"), h), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


@declared(
    "events_rolling_corr",
    """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS buys
  FROM events GROUP BY d)
SELECT STRFTIME(d, '%Y-%m-%d') AS day,
       CAST(clicks AS BIGINT) AS clicks, CAST(buys AS BIGINT) AS buys,
       ROUND(CORR(clicks, buys) OVER (ORDER BY d
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS corr7
FROM daily ORDER BY day""",
)
def events_rolling_corr(spark, sf_dir):
    """7-day rolling correlation between daily click and purchase
    volumes (round 8): the co-movement monitor behind 'did the funnel
    decouple this week'. The data-sized work is one daily conditional
    aggregate; the rolling corr runs over the DAYS-sized frame. Spark
    lacks corr as a window function — the window folds the five
    moments (n, sums, product sums) and closes the Pearson formula
    explicitly, which is exactly what CORR OVER does inside DuckDB."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("buys"),
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    n = F.count("clicks").over(w)
    sx = F.sum("clicks").over(w)
    sy = F.sum("buys").over(w)
    sxx = F.sum(F.col("clicks") * F.col("clicks")).over(w)
    syy = F.sum(F.col("buys") * F.col("buys")).over(w)
    sxy = F.sum(F.col("clicks") * F.col("buys")).over(w)
    corr = F.try_divide(
        n * sxy - sx * sy,
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy),
    )
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("clicks").cast("long").alias("clicks"),
            F.col("buys").cast("long").alias("buys"),
            F.round(corr, 6).alias("corr7"),
        )
        .orderBy("day")
    )


@declared(
    "events_trimmed",
    """WITH b AS (SELECT event_type,
    PERCENTILE_CONT(0.05) WITHIN GROUP (ORDER BY value) AS lo,
    PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY value) AS hi
  FROM events GROUP BY event_type)
SELECT e.event_type,
       ROUND(AVG(e.value), 4) AS mean,
       ROUND(AVG(CASE WHEN e.value BETWEEN b.lo AND b.hi
                      THEN e.value END), 4) AS trimmed_mean,
       ROUND(AVG(LEAST(GREATEST(e.value, b.lo), b.hi)), 4)
         AS winsorized_mean
FROM events e JOIN b ON e.event_type = b.event_type
GROUP BY e.event_type ORDER BY e.event_type""",
)
def events_trimmed(spark, sf_dir):
    """Robust central tendency per event type (round 8): the 5-95
    trimmed mean (drop the tails) and winsorized mean (clamp the
    tails) next to the plain mean — the robust aggregates a metrics
    pipeline swaps in when outliers poison averages. One exact
    percentile pass for the bounds (|types| rows, broadcast back),
    one conditional aggregate."""
    e = _t(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    j = e.join(F.broadcast(b), "event_type")
    return (
        j.groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 4).alias("mean"),
            F.round(
                F.avg(
                    F.when(
                        F.col("value").between(F.col("lo"), F.col("hi")),
                        F.col("value"),
                    )
                ),
                4,
            ).alias("trimmed_mean"),
            F.round(
                F.avg(F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))),
                4,
            ).alias("winsorized_mean"),
        )
        .orderBy("event_type")
    )


@declared(
    "source_overlap",
    """WITH tw AS (SELECT DISTINCT source, UNNEST(string_split_regex(
       LOWER(TRIM(text)), '\\s+')) AS w FROM documents),
sizes AS (SELECT source, COUNT(*) AS n FROM tw GROUP BY source),
inter AS (SELECT a.source AS s1, b.source AS s2, COUNT(*) AS i
          FROM tw a JOIN tw b ON a.w = b.w AND a.source < b.source
          GROUP BY a.source, b.source)
SELECT inter.s1, inter.s2, CAST(inter.i AS BIGINT) AS n_shared,
       ROUND(inter.i * 1.0 / (sa.n + sb.n - inter.i), 6) AS jaccard
FROM inter JOIN sizes sa ON inter.s1 = sa.source
     JOIN sizes sb ON inter.s2 = sb.source
ORDER BY s1, s2""",
)
def source_overlap(spark, sf_dir):
    """Vocabulary Jaccard between every source pair (round 8): the
    corpus-comparison readout behind domain-mixing decisions (near-1
    overlap = redundant sources; low overlap = complementary). The
    (source, term) frame collapses to distinct FIRST; the pair
    intersection is a term-keyed self-join — work per term is bounded
    by how many sources share it, never |sources|^2 * |vocab|."""
    d = _t(spark, sf_dir, "documents")
    tw = (
        d.select(
            "source",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    sizes = tw.groupBy("source").agg(F.count("*").alias("n"))
    a = tw.select(F.col("source").alias("s1"), "w")
    b = tw.select(F.col("source").alias("s2"), "w")
    inter = (
        a.join(b, "w")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("s1"), F.col("n").alias("na"))), "s1"
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("s2"), F.col("n").alias("nb"))), "s2"
        )
        .select(
            "s1",
            "s2",
            F.col("i").cast("long").alias("n_shared"),
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6).alias(
                "jaccard"
            ),
        )
        .orderBy("s1", "s2")
    )


@declared(
    "corpus_heaps",
    """WITH toks AS (SELECT doc_id, UNNEST(string_split_regex(LOWER(TRIM(text)),
       '\\s+')) AS w FROM documents),
firsts AS (SELECT w, MIN(doc_id) AS fd FROM toks WHERE w <> '' GROUP BY w),
dtok AS (SELECT doc_id, COUNT(*) AS nt FROM toks WHERE w <> ''
         GROUP BY doc_id),
cp AS (SELECT c.c AS checkpoint,
    (SELECT SUM(nt) FROM dtok WHERE doc_id < c.c) AS tokens,
    (SELECT COUNT(*) FROM firsts WHERE fd < c.c) AS vocab
  FROM (VALUES (100), (200), (300), (400), (500)) c(c))
SELECT CAST(checkpoint AS BIGINT) AS checkpoint,
       CAST(tokens AS BIGINT) AS tokens, CAST(vocab AS BIGINT) AS vocab,
       ROUND(LN(vocab) / LN(tokens), 6) AS heaps_beta_point
FROM cp ORDER BY checkpoint""",
)
def corpus_heaps(spark, sf_dir):
    """Heaps'-law vocabulary growth (round 8): vocabulary size when
    the corpus is cut at doc-id checkpoints, with the pointwise
    beta = ln V / ln N — the companion to corpus_zipf (sub-linear
    vocab growth is what makes hash-feature sizes like DSIR's
    plannable). Each term contributes only its FIRST document (one
    min aggregate); checkpoints then read cumulative counts — no
    per-checkpoint corpus rescan."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    firsts = toks.groupBy("w").agg(F.min("doc_id").alias("fd"))
    dtok = toks.groupBy("doc_id").agg(F.count("*").alias("nt"))
    cps = spark.createDataFrame(
        [(c,) for c in (100, 200, 300, 400, 500)], "checkpoint long"
    )
    tokens = (
        cps.join(dtok, F.col("doc_id") < F.col("checkpoint"))
        .groupBy("checkpoint")
        .agg(F.sum("nt").alias("tokens"))
    )
    vocab = (
        cps.join(firsts, F.col("fd") < F.col("checkpoint"))
        .groupBy("checkpoint")
        .agg(F.count("*").alias("vocab"))
    )
    return (
        tokens.join(vocab, "checkpoint")
        .select(
            F.col("checkpoint").cast("long").alias("checkpoint"),
            F.col("tokens").cast("long").alias("tokens"),
            F.col("vocab").cast("long").alias("vocab"),
            F.round(F.log("vocab") / F.log("tokens"), 6).alias("heaps_beta_point"),
        )
        .orderBy("checkpoint")
    )


@declared(
    "orders_pareto",
    """WITH spend AS (SELECT o_custkey, SUM(o_totalprice) AS x
       FROM orders GROUP BY o_custkey),
r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC, o_custkey) AS rk,
        COUNT(*) OVER () AS n, SUM(x) OVER () AS tot
      FROM spend),
c AS (SELECT rk, n,
        SUM(x) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING) / tot AS share
      FROM r)
SELECT CAST(MIN(rk) AS BIGINT) AS customers_for_80pct,
       CAST(MAX(n) AS BIGINT) AS n_customers,
       ROUND(MIN(rk) * 1.0 / MAX(n), 6) AS fraction
FROM c WHERE share >= 0.8""",
)
def orders_pareto(spark, sf_dir):
    """Pareto concentration (round 8): the smallest top-spender prefix
    covering 80% of revenue — 'how true is the 80/20 rule here'. One
    customer aggregate, one rank + cumulative-share window over the
    customer-sized frame, one scalar readout."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("x"))
    wr = Window.orderBy(F.desc("x"), "o_custkey")
    wall = Window.partitionBy()
    r = spend.select(
        "x",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wall).alias("n"),
        F.sum("x").over(wall).alias("tot"),
    )
    c = r.select(
        "rk",
        "n",
        (
            F.sum("x").over(
                Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
            )
            / F.col("tot")
        ).alias("share"),
    )
    return c.filter(F.col("share") >= 0.8).agg(
        F.min("rk").cast("long").alias("customers_for_80pct"),
        F.max("n").cast("long").alias("n_customers"),
        F.round(F.min("rk") / F.max("n"), 6).alias("fraction"),
    )


@declared(
    "events_new_returning",
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
firsts AS (SELECT user_id, MIN(d) AS fd FROM ud GROUP BY user_id)
SELECT STRFTIME(ud.d, '%Y-%m-%d') AS day,
       CAST(SUM(CASE WHEN ud.d = f.fd THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(SUM(CASE WHEN ud.d > f.fd THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_users
FROM ud JOIN firsts f ON ud.user_id = f.user_id
GROUP BY ud.d ORDER BY day""",
)
def events_new_returning(spark, sf_dir):
    """Daily new vs returning active users (round 8): each (user, day)
    classifies by whether the day is the user's first — the growth
    accountant's split of every DAU curve. The events collapse to the
    distinct user-day frame first; first-seen days are one aggregate
    joined back user-keyed."""
    e = _t(spark, sf_dir, "events")
    ud = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    firsts = ud.groupBy("user_id").agg(F.min("d").alias("fd"))
    return (
        ud.join(firsts, "user_id")
        .groupBy("d")
        .agg(
            F.sum(F.when(F.col("d") == F.col("fd"), 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
            F.sum(F.when(F.col("d") > F.col("fd"), 1).otherwise(0))
            .cast("long")
            .alias("returning_users"),
        )
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "new_users", "returning_users")
        .orderBy("day")
    )


@declared(
    "events_stickiness",
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
days AS (SELECT DISTINCT d FROM ud),
dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d),
mau AS (SELECT days.d, COUNT(DISTINCT ud.user_id) AS mau
        FROM days JOIN ud ON ud.d BETWEEN days.d - 29 AND days.d
        GROUP BY days.d)
SELECT STRFTIME(dau.d, '%Y-%m-%d') AS day, CAST(dau.dau AS BIGINT) AS dau,
       CAST(mau.mau AS BIGINT) AS mau,
       ROUND(dau.dau * 1.0 / mau.mau, 6) AS stickiness
FROM dau JOIN mau ON dau.d = mau.d ORDER BY day""",
)
def events_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per day (round 8): daily actives over
    trailing-30-day actives — the engagement ratio product teams
    steer by. Exact windowed DISTINCT doesn't fold into a window
    function, so the 30-day membership is a day-grid range join over
    the (small) distinct user-day frame; at extreme scale swap the
    exact MAU for an HLL union over daily sketches (the documented
    sketch path, cardinality_sketch's machinery)."""
    e = _t(spark, sf_dir, "events")
    ud = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    days = ud.select("d").distinct()
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    grid = days.alias("g").join(
        ud.alias("u"),
        (F.col("u.d") >= F.date_sub(F.col("g.d"), 29))
        & (F.col("u.d") <= F.col("g.d")),
    )
    mau = grid.groupBy(F.col("g.d").alias("d")).agg(
        F.countDistinct("u.user_id").alias("mau")
    )
    return (
        dau.join(mau, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("mau").cast("long").alias("mau"),
            F.round(F.col("dau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


@declared(
    "skew_report",
    """WITH k AS (SELECT o_custkey AS key, COUNT(*) AS n FROM orders
       GROUP BY o_custkey),
s AS (SELECT COUNT(*) AS n_keys, AVG(n) AS avg_n, MAX(n) AS max_n,
        SUM(n) AS total FROM k),
top AS (SELECT key, n, ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rk
        FROM k)
SELECT top.rk, top.key, CAST(top.n AS BIGINT) AS n,
       ROUND(top.n * 1.0 / s.avg_n, 4) AS x_avg,
       ROUND(s.max_n * 1.0 / s.avg_n, 4) AS skew_factor
FROM top, s WHERE top.rk <= 10 ORDER BY top.rk""",
)
def skew_report(spark, sf_dir):
    """Join-key skew report for orders.o_custkey (round 8): the top-10
    heaviest keys with their multiple of the mean, plus the global
    skew factor max/avg — the diagnostic run BEFORE choosing between a
    plain shuffle join, salting (joins.salted_join), or an AQE skew
    split. One key-count aggregate, one key-sized top-k window."""
    o = _t(spark, sf_dir, "orders")
    k = o.groupBy(F.col("o_custkey").alias("key")).agg(F.count("*").alias("n"))
    s = k.agg(
        F.avg("n").alias("avg_n"), F.max("n").alias("max_n")
    )
    w = Window.orderBy(F.desc("n"), "key")
    top = k.select("key", "n", F.row_number().over(w).alias("rk")).filter(
        F.col("rk") <= 10
    )
    return (
        top.crossJoin(F.broadcast(s))
        .select(
            "rk",
            "key",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("avg_n"), 4).alias("x_avg"),
            F.round(F.col("max_n") / F.col("avg_n"), 4).alias("skew_factor"),
        )
        .orderBy("rk")
    )


@declared(
    "user_entropy",
    """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events
       GROUP BY user_id, event_type),
t AS (SELECT user_id, SUM(n) AS tot FROM c GROUP BY user_id),
h AS (SELECT c.user_id,
        -SUM((c.n * 1.0 / t.tot) * LN(c.n * 1.0 / t.tot)) AS ent,
        MAX(t.tot) AS n_events
      FROM c JOIN t ON c.user_id = t.user_id GROUP BY c.user_id)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       ROUND(ent, 6) AS entropy
FROM h ORDER BY entropy DESC, user_id LIMIT 25""",
)
def user_entropy(spark, sf_dir):
    """Behavioral diversity per user (round 8): Shannon entropy of
    each user's event-type distribution, top-25 most-diverse — the
    exploration/specialization readout (bots and single-purpose
    scripts sit near 0; organic users spread). Two user-keyed
    aggregates; the top-k is TakeOrdered."""
    e = _t(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("tot").cast("long").alias("n_events"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
        .orderBy(F.desc("entropy"), "user_id")
        .limit(25)
    )


@declared(
    "nation_rank_moves",
    """WITH rev AS (SELECT c_nationkey AS nation,
    SUM(CASE WHEN o_orderdate <  TIMESTAMP '2024-01-16' THEN o_totalprice
             ELSE 0 END) AS rev_a,
    SUM(CASE WHEN o_orderdate >= TIMESTAMP '2024-01-16' THEN o_totalprice
             ELSE 0 END) AS rev_b
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey),
rk AS (SELECT nation,
        RANK() OVER (ORDER BY rev_a DESC, nation) AS rank_a,
        RANK() OVER (ORDER BY rev_b DESC, nation) AS rank_b
       FROM rev)
SELECT nation, CAST(rank_a AS BIGINT) AS rank_a,
       CAST(rank_b AS BIGINT) AS rank_b,
       CAST(rank_a - rank_b AS BIGINT) AS moved_up
FROM rk ORDER BY nation""",
)
def nation_rank_moves(spark, sf_dir):
    """Revenue-rank movement per nation between the two halves of the
    order window (round 8): the movers-and-shakers BI readout. One
    conditional-sum join aggregate over the fact table; both rank
    windows run over the 25-row nation frame."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cut = F.lit("2024-01-16").cast("timestamp")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.sum(F.when(F.col("o_orderdate") < cut, F.col("o_totalprice")).otherwise(0)).alias("rev_a"),
            F.sum(F.when(F.col("o_orderdate") >= cut, F.col("o_totalprice")).otherwise(0)).alias("rev_b"),
        )
    )
    wa = Window.orderBy(F.desc("rev_a"), "nation")
    wb = Window.orderBy(F.desc("rev_b"), "nation")
    return (
        rev.select(
            "nation",
            F.rank().over(wa).cast("long").alias("rank_a"),
            F.rank().over(wb).cast("long").alias("rank_b"),
        )
        .withColumn("moved_up", (F.col("rank_a") - F.col("rank_b")).cast("long"))
        .orderBy("nation")
    )


_POIS_CDF = (0.36788, 0.73576, 0.9197, 0.98101, 0.99634, 0.99941, 0.99992)


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 7 END"


@declared(
    "bootstrap_ci",
    f"""WITH reps AS (SELECT UNNEST(generate_series(0, 49)) AS r),
w AS (SELECT e.event_type, e.value, reps.r,
    {_pois_case_sql("(('0x' || substr(md5(CAST(reps.r AS VARCHAR) || ':' ||"
                    " CAST(e.event_id AS VARCHAR)), 1, 8))::UBIGINT + 1.0)"
                    " / 4294967297.0")} AS wt
  FROM events e CROSS JOIN reps),
m AS (SELECT event_type, r, SUM(wt * value) / SUM(wt) AS mean_r
      FROM w GROUP BY event_type, r),
ci AS (SELECT event_type,
    PERCENTILE_CONT(0.025) WITHIN GROUP (ORDER BY mean_r) AS lo,
    PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY mean_r) AS mid,
    PERCENTILE_CONT(0.975) WITHIN GROUP (ORDER BY mean_r) AS hi
  FROM m GROUP BY event_type)
SELECT event_type, ROUND(lo, 4) AS ci_lo, ROUND(mid, 4) AS ci_mid,
       ROUND(hi, 4) AS ci_hi
FROM ci ORDER BY event_type""",
)
def bootstrap_ci(spark, sf_dir):
    """Poisson-bootstrap 95% confidence interval for the mean value
    per event type (round 8): each of 50 replicates reweights every
    row by a Poisson(1) draw — the bootstrap that distributes (Chamandy
    et al. 2012, 'Estimating uncertainty for massive data streams':
    no resampled copies, one weighted aggregate per replicate, and the
    replicate axis is just one more GROUP BY key). The draws are
    DETERMINISTIC: an md5-uniform per (replicate, row) inverted
    through the Poisson(1) CDF — so the oracle rebuilds the identical
    resamples and the identical interval."""
    e = _t(spark, sf_dir, "events")
    reps = spark.range(50).select(F.col("id").cast("int").alias("r"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("r").cast("string"),
                        F.lit(":"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / F.lit(4294967297.0)
    wt = F.lit(7)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        wt = F.when(u < _POIS_CDF[k], k).otherwise(wt)
    m = (
        e.select("event_type", "value", "event_id")
        .crossJoin(F.broadcast(reps))
        .select("event_type", "r", "value", wt.alias("wt"))
        .groupBy("event_type", "r")
        .agg((F.sum(F.col("wt") * F.col("value")) / F.sum("wt")).alias("mean_r"))
    )
    return (
        m.groupBy("event_type")
        .agg(
            F.round(F.percentile("mean_r", F.lit(0.025)), 4).alias("ci_lo"),
            F.round(F.percentile("mean_r", F.lit(0.5)), 4).alias("ci_mid"),
            F.round(F.percentile("mean_r", F.lit(0.975)), 4).alias("ci_hi"),
        )
        .orderBy("event_type")
    )


@declared(
    "lineitem_vif",
    """WITH c AS (SELECT
    CORR(l_quantity, l_extendedprice) AS r12,
    CORR(l_quantity, l_discount) AS r13,
    CORR(l_extendedprice, l_discount) AS r23
  FROM lineitem)
SELECT
  ROUND(1.0 / (1.0 - (r12*r12 + r13*r13 - 2*r12*r13*r23) / (1.0 - r23*r23)), 6)
    AS vif_quantity,
  ROUND(1.0 / (1.0 - (r12*r12 + r23*r23 - 2*r12*r23*r13) / (1.0 - r13*r13)), 6)
    AS vif_extendedprice,
  ROUND(1.0 / (1.0 - (r13*r13 + r23*r23 - 2*r13*r23*r12) / (1.0 - r12*r12)), 6)
    AS vif_discount
FROM c""",
)
def lineitem_vif(spark, sf_dir):
    """Variance inflation factors for the three lineitem regressors
    (round 8): VIF_j = 1 / (1 - R^2_j) with R^2_j the fit of feature j
    on the others — the multicollinearity screen run before trusting
    ols_fit's coefficients. For p = 3 the R^2s close over the three
    pairwise correlations, so ONE corr aggregate feeds everything and
    the oracle replays the identical algebra; for larger p, invert the
    correlation matrix from pca_fit's moments (driver-side, p x p)."""
    li = _t(spark, sf_dir, "lineitem")
    c = li.agg(
        F.corr("l_quantity", "l_extendedprice").alias("r12"),
        F.corr("l_quantity", "l_discount").alias("r13"),
        F.corr("l_extendedprice", "l_discount").alias("r23"),
    )
    r12, r13, r23 = F.col("r12"), F.col("r13"), F.col("r23")

    def vif(a, b, rho):
        return F.round(
            1.0 / (1.0 - (a * a + b * b - 2 * a * b * rho) / (1.0 - rho * rho)), 6
        )

    return c.select(
        vif(r12, r13, r23).alias("vif_quantity"),
        vif(r12, r23, r13).alias("vif_extendedprice"),
        vif(r13, r23, r12).alias("vif_discount"),
    )


@declared(
    "events_acf",
    """WITH daily AS (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
       FROM events GROUP BY d),
lagged AS (SELECT l.lag, d.n AS x,
    LAG(d.n, l.lag) OVER (PARTITION BY l.lag ORDER BY d.d) AS y
  FROM daily d CROSS JOIN (SELECT UNNEST(generate_series(1, 7)) AS lag) l)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(COUNT(y) AS BIGINT) AS n_pairs,
       ROUND(CORR(x, y), 6) AS acf
FROM lagged WHERE y IS NOT NULL GROUP BY lag ORDER BY lag""",
)
def events_acf(spark, sf_dir):
    """Autocorrelation of daily event volume at lags 1-7 (round 8):
    the seasonality fingerprint (a weekly cycle puts a spike at lag
    7) read straight off pairwise correlations of the series with its
    shifts. The data-sized work is one daily aggregate; the lag
    machinery runs over the days-sized frame replicated 7x — one lag
    window per replica, one corr per lag."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("n")
    )
    # Spark's lag() needs a constant offset — one window per lag,
    # unioned (7 constants; the frame is days-sized, this is cheap)
    w = Window.orderBy("d")
    parts = [
        daily.select(
            F.lit(k).alias("lag"),
            F.col("n").alias("x"),
            F.lag("n", k).over(w).alias("y"),
        )
        for k in range(1, 8)
    ]
    from functools import reduce

    lagged = reduce(lambda a, b: a.unionAll(b), parts)
    return (
        lagged.filter(F.col("y").isNotNull())
        .groupBy("lag")
        .agg(
            F.count("y").cast("long").alias("n_pairs"),
            F.round(F.corr("x", "y"), 6).alias("acf"),
        )
        .select(F.col("lag").cast("long").alias("lag"), "n_pairs", "acf")
        .orderBy("lag")
    )


@declared(
    "orders_interarrival",
    """WITH g AS (SELECT o_custkey,
    epoch_us(o_orderdate) - epoch_us(LAG(o_orderdate) OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS gap_us
  FROM orders)
SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY gap_us) / 86400e6,
             4) AS median_gap_days,
       ROUND(AVG(gap_us) / 86400e6, 4) AS mean_gap_days,
       ROUND(MAX(gap_us) / 86400e6, 4) AS max_gap_days
FROM g WHERE gap_us IS NOT NULL""",
)
def orders_interarrival(spark, sf_dir):
    """Customer order inter-arrival distribution (round 8): gaps
    between consecutive orders per customer via one customer-keyed lag
    window, summarized over all gaps — the purchase-cadence readout
    feeding churn models (a customer 3x past their median gap is
    'overdue'). Exact epoch microseconds keep both engines on
    identical doubles."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        (
            F.unix_micros("o_orderdate")
            - F.unix_micros(F.lag("o_orderdate").over(w))
        ).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    day = 86400e6
    return g.agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.round(F.percentile("gap_us", F.lit(0.5)) / day, 4).alias("median_gap_days"),
        F.round(F.avg("gap_us") / day, 4).alias("mean_gap_days"),
        F.round(F.max("gap_us") / day, 4).alias("max_gap_days"),
    )


@declared(
    "events_burstiness",
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
       COUNT(*) AS n FROM events GROUP BY event_type, d)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(AVG(n), 4) AS mean_daily,
       ROUND(VAR_SAMP(n) / AVG(n), 6) AS fano
FROM daily GROUP BY event_type ORDER BY event_type""",
)
def events_burstiness(spark, sf_dir):
    """Burstiness (Fano factor) of daily volume per event type
    (round 8): variance-to-mean of daily counts — 1 under a Poisson
    null, above 1 when traffic clumps (incidents, campaigns), below 1
    when it's throttled. Two tiny aggregates over the (type, day)
    frame."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("n")
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.round(F.avg("n"), 4).alias("mean_daily"),
            F.round(F.var_samp("n") / F.avg("n"), 6).alias("fano"),
        )
        .orderBy("event_type")
    )


@declared(
    "events_ets",
    """WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY d),
idx AS (SELECT d, n, ROW_NUMBER() OVER (ORDER BY d) AS t FROM daily),
ses AS (
  SELECT t, d, n, n AS s FROM idx WHERE t = 1
  UNION ALL
  SELECT i.t, i.d, i.n, 0.3 * i.n + 0.7 * ses.s
  FROM idx i JOIN ses ON i.t = ses.t + 1)
SELECT CAST(d AS VARCHAR) AS d, CAST(n AS BIGINT) AS n,
       ROUND(s, 6) AS smoothed
FROM ses ORDER BY d""",
)
def events_ets(spark, sf_dir):
    """Simple exponential smoothing (alpha=0.3) over daily event volume
    (round 9): s_1 = n_1, s_t = a*n_t + (1-a)*s_{t-1} — the
    level-tracking forecast baseline (the next-day forecast IS the
    last smoothed value). The recurrence is inherently sequential, so
    it runs where sequential work belongs at scale: the data-sized
    pass is the daily aggregate; the smoothing runs per SERIES inside
    one applyInPandas task over the days-sized frame (one task per
    series — here one global series; a per-key forecast would
    partition by key and parallelize across series). The oracle
    replays the identical recurrence with a recursive CTE."""
    import pandas as pd

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("n")
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        s = []
        prev = None
        for v in pdf["n"]:
            prev = v if prev is None else 0.3 * v + 0.7 * prev
            s.append(prev)
        pdf["smoothed"] = [round(x, 6) for x in s]
        return pdf

    return (
        daily.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(smooth, "__g int, d date, n double, smoothed double")
        .select(
            F.col("d").cast("string").alias("d"),
            F.col("n").cast("long").alias("n"),
            "smoothed",
        )
        .orderBy("d")
    )


@declared(
    "events_decompose",
    """WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY d),
tr AS (
  SELECT d, n,
         AVG(n) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS trend,
         COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS w
  FROM daily),
det AS (SELECT isodow(d) AS dow, n - trend AS r FROM tr WHERE w = 7),
s AS (SELECT dow, AVG(r) AS raw, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM det GROUP BY dow)
SELECT CAST(dow AS BIGINT) AS dow,
       ROUND(raw - (SELECT AVG(raw) FROM s), 6) AS seasonal,
       n_days
FROM s ORDER BY dow""",
)
def events_decompose(spark, sf_dir):
    """Classical seasonal decomposition of daily volume (round 9):
    trend = centered 7-day moving average (full windows only),
    residual = volume - trend, weekly seasonal index = mean residual
    per ISO day-of-week, centered to sum to zero — the additive
    trend/seasonal split behind every weekly-cycle dashboard. All
    window + aggregate work over the days-sized frame; the oracle
    restates it verbatim."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("n")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d", "n", F.avg("n").over(w).alias("trend"),
        F.count("*").over(w).alias("w"),
    )
    det = tr.filter(F.col("w") == 7).select(
        (F.weekday("d") + 1).alias("dow"), (F.col("n") - F.col("trend")).alias("r")
    )
    s = det.groupBy("dow").agg(
        F.avg("r").alias("raw"), F.count("*").cast("long").alias("n_days")
    )
    from pyspark.sql.window import Window as W2

    allw = W2.partitionBy()
    return (
        s.select(
            F.col("dow").cast("long").alias("dow"),
            F.round(F.col("raw") - F.avg("raw").over(allw), 6).alias("seasonal"),
            "n_days",
        )
        .orderBy("dow")
    )


@declared(
    "orders_cohort",
    """WITH fo AS (SELECT o_custkey,
       DATE_TRUNC('month', MIN(o_orderdate)) AS cohort
  FROM orders GROUP BY o_custkey),
act AS (SELECT DISTINCT o.o_custkey, f.cohort,
        (EXTRACT(YEAR FROM o.o_orderdate) - EXTRACT(YEAR FROM f.cohort)) * 12
        + (EXTRACT(MONTH FROM o.o_orderdate) - EXTRACT(MONTH FROM f.cohort))
          AS offs
  FROM orders o JOIN fo f ON o.o_custkey = f.o_custkey)
SELECT CAST(cohort AS VARCHAR) AS cohort_month,
       CAST(offs AS BIGINT) AS month_offset,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM act WHERE offs <= 6
GROUP BY cohort, offs ORDER BY cohort, offs""",
)
def orders_cohort(spark, sf_dir):
    """Monthly cohort retention (round 9): customers grouped by their
    FIRST order's month, then counted distinct per (cohort, month
    offset) for the first 6 offsets — the classic retention triangle
    behind every growth dashboard. Two hash aggregates and one
    customer-keyed join; the cohort frame is customer-sized, the
    triangle months-sized."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    fo = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("cohort")
    )
    act = (
        o.join(fo, "o_custkey")
        .select(
            "o_custkey",
            "cohort",
            (
                (F.year("o_orderdate") - F.year("cohort")) * 12
                + (F.month("o_orderdate") - F.month("cohort"))
            ).alias("offs"),
        )
        .distinct()
    )
    return (
        act.filter(F.col("offs") <= 6)
        .groupBy("cohort", "offs")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .select(
            F.col("cohort").cast("string").alias("cohort_month"),
            F.col("offs").cast("long").alias("month_offset"),
            "n_customers",
        )
        .orderBy("cohort_month", "month_offset")
    )


@declared(
    "scd2_intervals",
    """WITH o AS (SELECT user_id, event_type, ts, event_id,
       CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
            THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
r AS (SELECT user_id, event_type, ts,
       SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS run
  FROM o),
runs AS (SELECT user_id, event_type, run, MIN(ts) AS valid_from
         FROM r GROUP BY user_id, event_type, run),
iv AS (SELECT user_id, event_type, valid_from,
        LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
          AS valid_to
  FROM runs)
SELECT user_id, event_type,
       STRFTIME(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       COALESCE(STRFTIME(valid_to, '%Y-%m-%d %H:%M:%S.%f'), 'current')
         AS valid_to
FROM iv ORDER BY user_id, valid_from""",
)
def scd2_intervals(spark, sf_dir):
    """Slowly-changing-dimension type-2 interval builder (round 9):
    each user's event stream collapses into runs of constant
    event_type (gaps-and-islands: a change flag per row, running sum =
    run id), each run becoming one SCD2 row with [valid_from,
    valid_to) — valid_to = the next run's start, 'current' for the
    open run. The warehouse-standard history compaction: one window
    pass + one aggregate, all user-partitioned (no global window at
    100 TB)."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 0
        ).otherwise(1),
    )
    r = o.withColumn(
        "run",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = r.groupBy("user_id", "event_type", "run").agg(
        F.min("ts").alias("valid_from")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w2))
        .select(
            "user_id",
            "event_type",
            F.date_format("valid_from", fmt).alias("valid_from"),
            F.coalesce(
                F.date_format("valid_to", fmt), F.lit("current")
            ).alias("valid_to"),
        )
        .orderBy("user_id", "valid_from")
    )

