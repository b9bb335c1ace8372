"""Join operators Spark lacks as built-ins (SURVEY §2.3 Q14/Q15 rows):
as-of join and a skew-aware range join, composed from existing DataFrame
ops so Catalyst still plans them (option (a) of the custom-operator ladder
— no UDFs, no mapPartitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: list[str],
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts within the same `by` keys (pandas merge_asof
    semantics, direction="backward").

    Plan: tag both sides, union, then one window per key ordered by
    (ts, side): ``last(right value, ignorenulls=True)`` up to the current
    row carries the most recent right value forward onto each left row.
    One shuffle, keyed by `by` — scales with key cardinality and stays
    sorted within partitions, vs the O(L*R)-per-key expansion of the
    naive range join. Right rows sort before left rows at equal ts
    (side 0 < 1), so an exactly-simultaneous right row IS visible to the
    left row, matching <= semantics.

    ``tolerance_seconds`` drops matches older than the window (the match
    column goes NULL), like merge_asof's tolerance.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != right_ts]
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    r_tag = (
        right.select(*by, *value_cols, F.col(right_ts).alias("__ts"))
        .withColumn("__side", F.lit(0))
        .withColumn("__rts", F.col("__ts"))
    )
    # unionByName fills each side's missing columns with NULLs
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"__asof_{c}") for c in value_cols],
        F.last("__rts", ignorenulls=True).over(w).alias("__asof_ts"),
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            F.col("__ts").cast("double") - F.col("__asof_ts").cast("double")
        ) <= tolerance_seconds
        keep = [
            F.when(fresh, F.col(f"__asof_{c}")).alias(c) for c in value_cols
        ]
        asof_ts = F.when(fresh, F.col("__asof_ts")).alias("asof_ts")
    else:
        keep = [F.col(f"__asof_{c}").alias(c) for c in value_cols]
        asof_ts = F.col("__asof_ts").alias("asof_ts")
    return out.select(*left.columns, *keep, asof_ts)


def nearest_1d_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    left_val: str,
    right_key: str,
    right_val: str,
    max_dim_values: int = 1_000_000,
) -> DataFrame:
    """For each left row, the right key minimizing |left_val - right_val|
    (ties -> smallest right_val's min right_key, then smallest right_key —
    the ROW_NUMBER ORDER BY (diff, key) tie-break). Returns
    (left_key, right_key).

    Two plans, guarded by the distinct-value count of the right side:

    - **sorted-search** (distinct right_val <= max_dim_values): collect
      the sorted distinct values (same driver budget as broadcasting the
      dim), binary-search each left row into its floor/ceiling neighbors
      via ML Bucketizer (JVM-side, O(N log k)), argmin over <=2
      candidates with min(struct). Measured ~3x faster than the
      expansion at TPC-H shape (sf0.1: 4.7s vs 13.8s cold).
    - **crossJoin + argmin fallback** (above the threshold): the
      driver-side collect would no longer be "small-dim budget", so the
      plan stays fully distributed: broadcast-free crossJoin expansion
      with min(struct(diff, right_key)) per left key. O(N*k) but never
      driver-bound.

    The guard is a SINGLE job: collect one (value, min key) row per
    distinct right_val, capped at ``max_dim_values + 1`` rows via LIMIT.
    Getting the cap back means the dim side exceeded the driver budget ->
    distributed plan; otherwise the collected rows ARE the dim table, so
    the "count" costs nothing extra (vs the old countDistinct job + a
    second collect job).

    Value columns are cast to double in BOTH branches (nearest-neighbor
    arithmetic is defined at double precision; decimal dims would
    otherwise disagree between plans), and NULL left_val / right_val rows
    are dropped up front in both branches — a NULL has no defined nearest
    neighbor, and leaving them in made the fast path throw (Bucketizer
    handleInvalid='error') while the fallback silently dropped them."""
    r = right.select(
        right_key, F.col(right_val).cast("double").alias(right_val)
    ).dropna(subset=[right_val])
    lf = left.select(
        left_key, F.col(left_val).cast("double").alias(left_val)
    ).dropna(subset=[left_val])

    vals = (
        r.groupBy(right_val)
        .agg(F.min(right_key).alias(right_key))
        .limit(max_dim_values + 1)
        .collect()
    )
    # Empty dim side also takes the distributed branch: Bucketizer needs
    # >= 3 splits, and crossJoin against empty r yields the correct empty
    # result with the right schema.
    if not vals or len(vals) > max_dim_values:
        expanded = lf.crossJoin(r)
        return (
            expanded.withColumn("diff", F.abs(F.col(left_val) - F.col(right_val)))
            .groupBy(left_key)
            .agg(F.min(F.struct("diff", right_key)).alias("m"))
            .select(left_key, F.col(f"m.{right_key}").alias(right_key))
        )

    from pyspark.ml.feature import Bucketizer

    vals.sort(key=lambda row: row[right_val])
    key_type = dict(r.dtypes)[right_key]
    sv = left.sparkSession.createDataFrame(
        [(j, float(row[right_val]), row[right_key]) for j, row in enumerate(vals)],
        f"j int, {right_val} double, {right_key} {key_type}",
    )
    splits = [float("-inf")] + [row[right_val] for row in vals] + [float("inf")]
    bucketed = Bucketizer(splits=splits, inputCol=left_val, outputCol="__b").transform(
        lf
    )
    # bucket b => left_val in [vals[b-1], vals[b]); candidates are those two
    # neighbors; the inner join drops the out-of-range sentinels.
    cand = bucketed.select(
        left_key,
        left_val,
        F.explode(
            F.array(F.col("__b").cast("int") - 1, F.col("__b").cast("int"))
        ).alias("j"),
    )
    return (
        cand.join(F.broadcast(sv), "j")
        .withColumn("diff", F.abs(F.col(left_val) - F.col(right_val)))
        .groupBy(left_key)
        .agg(F.min(F.struct("diff", right_key)).alias("m"))
        .select(left_key, F.col(f"m.{right_key}").alias(right_key))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with manual skew salting: the heavy (left) side gets a
    uniform random salt in [0, salt); the small (right) side is replicated
    `salt` times; the join key becomes (key, salt), splitting each hot
    key's rows across `salt` reducers. Use when one key dominates and the
    right side is too big to broadcast but cheap to replicate; AQE's
    skew-join split handles the sort-merge case automatically, this is the
    explicit form for hash joins / older planners. Results are identical
    to the plain join (salt columns are internal)."""
    lf = left.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    rf = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    return lf.join(rf, [*on, "__salt"], how).drop("__salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    lower: float,
    upper: float,
    bucket: float | None = None,
) -> DataFrame:
    """Non-equi interval join: pairs where
    left_val + lower <= right_val < left_val + upper (Q14 shape).

    Without `bucket` this is the plain theta join (BroadcastNestedLoop for
    a small side). With `bucket` (>= upper - lower) each side is assigned
    to width-`bucket` bins and right rows are exploded into the (at most
    two) bins a match could land in, turning the theta join into an
    equi-join on the bin id + a residual filter — the standard banding
    trick that lets two LARGE sides join without an N*M expansion."""
    cond = (F.col(right_val) >= F.col(left_val) + lower) & (
        F.col(right_val) < F.col(left_val) + upper
    )
    if bucket is None:
        return left.join(right, cond)
    if bucket < (upper - lower):
        raise ValueError("bucket must be >= the interval width")
    lb = left.withColumn("__bin", F.floor((F.col(left_val) + lower) / bucket))
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.array(
                F.floor(F.col(right_val) / bucket),
                F.floor(F.col(right_val) / bucket) - 1,
            )
        ),
    )
    return lb.join(rb, "__bin").filter(cond).drop("__bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket: float | None = None,
) -> DataFrame:
    """Interval-overlap join: pairs where the two HALF-OPEN intervals
    [l_start, l_end) and [r_start, r_end) intersect — the genomic-
    region / session-overlap / time-range reconciliation shape, which
    range_join (point vs window) cannot express.

    Without `bucket`: the plain theta join (BroadcastNestedLoop for a
    small side). With `bucket`: each interval explodes into the
    width-`bucket` bins it SPANS (sequence(floor(start/b),
    floor((end-eps)/b)) — overlapping intervals must share at least one
    bin), the bins equi-join, duplicates from multi-bin overlaps drop
    via distinct, and the exact overlap predicate re-verifies. Per-row
    explode fan-out is ceil(span/bucket)+1 — size `bucket` near the
    typical span so big sides join with bounded expansion and no N*M
    product.

    The banded path's distinct (which removes multi-bin duplicates of
    the SAME pair) also collapses byte-identical duplicate input rows;
    carry unique keys on both sides if duplicate rows are meaningful
    (the theta path keeps them)."""
    lcond = (F.col("__ls") < F.col("__re")) & (F.col("__rs") < F.col("__le"))
    lt = left.withColumn("__ls", F.col(l_start)).withColumn("__le", F.col(l_end))
    rt = right.withColumn("__rs", F.col(r_start)).withColumn("__re", F.col(r_end))
    if bucket is None:
        return (
            lt.join(rt, lcond)
            .drop("__ls", "__le", "__rs", "__re")
        )
    if bucket <= 0:
        raise ValueError("bucket must be positive")
    # plain floor(end/bucket): when `end` sits exactly on (or a float
    # ulp above) a boundary this adds ONE harmless extra candidate bin,
    # which the exact re-verify filter removes — whereas subtracting an
    # epsilon can DROP the true last bin when end lands within the
    # epsilon above a boundary (float noise), silently missing pairs
    lbin = F.explode(
        F.sequence(
            F.floor(F.col("__ls") / bucket), F.floor(F.col("__le") / bucket)
        )
    ).alias("__bin")
    rbin = F.explode(
        F.sequence(
            F.floor(F.col("__rs") / bucket), F.floor(F.col("__re") / bucket)
        )
    ).alias("__bin")
    le = lt.select("*", lbin)
    re_ = rt.select("*", rbin)
    return (
        le.join(re_, "__bin")
        .filter(lcond)
        .drop("__bin")
        .distinct()
        .drop("__ls", "__le", "__rs", "__re")
    )


def grid_radius_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """All pairs of points within euclidean `radius` in 2-D, by grid
    bucketing: each point lands in cell (floor(x/r), floor(y/r)); a
    point can only be within r of points in its own or the 8 adjacent
    cells, so the probe side replicates 9x onto those cells and joins
    the build side's SINGLE home cell — an equi-join on the cell key,
    never a cross join. Each unordered pair is found exactly once: it
    surfaces from the lower-id endpoint's probe (probe.id < build.id
    filters the mirror image), so no distinct pass is needed. Returns
    (id1, id2, dist) with id1 < id2.

    The 2-D analog of range_join's 1-D bucketing, and the standard
    spatial-join shape: per-cell work is bounded by cell occupancy
    (~density * r^2), shuffles are keyed by cell, and a dense hot cell
    degrades to its own occupancy squared — the semantics' true cost —
    without touching any other cell."""
    r = float(radius)
    cx = F.floor(F.col(x_col) / r).cast("long")
    cy = F.floor(F.col(y_col) / r).cast("long")
    home = points.select(
        F.col(id_col).alias("id2"),
        F.col(x_col).alias("x2"),
        F.col(y_col).alias("y2"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = (
        points.select(
            F.col(id_col).alias("id1"),
            F.col(x_col).alias("x1"),
            F.col(y_col).alias("y1"),
            cx.alias("pcx"),
            cy.alias("pcy"),
        )
        .select("*", F.explode(offsets).alias("o"))
        .select(
            "id1",
            "x1",
            "y1",
            (F.col("pcx") + F.col("o.dx")).alias("cx"),
            (F.col("pcy") + F.col("o.dy")).alias("cy"),
        )
    )
    dx = F.col("x1") - F.col("x2")
    dy = F.col("y1") - F.col("y2")
    # explicit products, not pow(): IEEE multiply and sqrt are exactly
    # rounded in every engine, while pow(x, 2) may differ in the last
    # ulp between libm implementations (breaks cross-engine checks)
    d2 = dx * dx + dy * dy
    return (
        probe.join(home, ["cx", "cy"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", F.sqrt(d2).alias("dist"))
        .filter(F.col("dist") <= r)
    )
