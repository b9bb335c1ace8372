"""Distributed text classification for training-data curation.

Two classifiers every large-scale LLM-data pipeline runs over its
corpus, both expressed as pure DataFrame aggregations (no MLlib, no
Python in the hot path) so Catalyst keeps them in codegen and every
number is recomputable in ANSI SQL for the driver's DuckDB oracle:

* Multinomial Naive Bayes (`nb_train` / `nb_score`) — the classic
  fastText-class quality/language classifier (CCNet, GPT-3's WebText
  discriminator, FineWeb-Edu all use linear models of this family).
  Training is two hash aggregates (per-(label, term) counts + per-label
  totals); scoring is one term-keyed join and one sum — both scale as
  plain shuffles on the token stream.

* DSIR importance weights (`dsir_weights`) — Data Selection via
  Importance Resampling (Xie et al. 2023, arXiv:2302.03169): estimate
  hashed-feature unigram distributions over a TARGET corpus and a RAW
  corpus, then weight each raw document by its log importance ratio
  sum_f count_f * log(p_target(f) / p_raw(f)). Documents that "look
  like" the target distribution get high weights; sampling
  proportionally to exp(weight) tilts a web-scale corpus toward the
  target domain. Features are md5-bucketed unigrams (the paper's hashed
  n-grams), with the hash chosen to be engine-portable: the first 8 hex
  chars of md5 as an integer, identical in Spark
  (conv(substring(md5(w),1,8),16,10)) and DuckDB
  (('0x'||substr(md5(w),1,8))::UBIGINT), so the oracle can replay it.

Scale shape: the models (vocab-sized / n_buckets-sized) join on the
term/bucket key — NO broadcast assumption on the vocabulary (web-scale
vocabularies don't fit one executor); only the label table (a handful
of rows) broadcasts. Out-of-vocabulary tokens at score time are
dropped (inner join) — the standard multinomial-NB convention and the
choice the oracle mirrors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graph_db_clustering_spark.operators.text import tokens


def _explode_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")


def _repin(*frames):
    """Persist `frames`, releasing the pins of the previous call
    (bounded accretion via the shared registry — operators/pins.py)."""
    from graph_db_clustering_spark.operators import pins

    return pins.repin("classify", *frames)


def nb_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    smoothing: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Fit a multinomial Naive Bayes model.

    Returns (term_model, label_model):
      term_model  (term, labels: map<label, loglik>) — add-k-smoothed
                  log P(term | label) for every (term, label) seen in
                  training, pre-grouped into one row per term so score
                  time needs a single term-keyed join;
      label_model (label, logprior, default_loglik) — log P(label) and
                  the smoothed log-likelihood of a vocab term NOT seen
                  with this label (k / (total_l + k*V)).

    Plan (r15 — guide §2.4 "fewer driver-blocking jobs", §2.6 "overlap
    independent work"): one explode -> (label, term) hash aggregate,
    pinned (vocab-sized), and ZERO driver-blocking jobs — the vocab
    size, per-label token totals and per-label doc counts ride the
    model plans as broadcast scalar/aggregate subqueries reading the
    pin, instead of the r14 shape's dedicated vocab-count and
    df.count() collects. Blocking collects SERIALIZE the train pass
    before the score pass; in one job the scheduler overlaps the
    independent subtrees (the test-half tokenize runs while the
    broadcast sides build), and every subtree that needs the train
    counts reads the pin, so the train half is still tokenized exactly
    once. The arithmetic is unchanged expression-for-expression —
    `k * vocab` as a double multiplication of the same exact integers,
    `n_docs / n` as the same long/double division — so loglikelihoods
    are bit-identical to the collected-literal shape (verified
    output-equal at sf0.1 and against the DuckDB oracle)."""
    k = float(smoothing)
    base = df.select(
        F.col(label_col).alias("label"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")
    # Persist the vocab-sized (label, term) count table: term_model,
    # totals and the vocab subquery all read it, and without the pin the
    # corpus-sized tokenize+aggregate ran up to 5x per model build/score
    # (r14 optimization — plan diff in plans/r14/nb_language_*). Memory
    # is O(vocab * labels), not corpus-sized, at any scale. Concurrent
    # first readers are safe: block computation is per-partition locked,
    # so parallel stages wait instead of recomputing.
    (tl,) = _repin(
        base.groupBy("label", "term").agg(F.count("*").alias("ctl"))
    )
    totals = tl.groupBy("label").agg(F.sum("ctl").alias("total_l"))
    vocab = tl.agg(F.count_distinct("term").alias("__v"))

    term_model = (
        tl.join(F.broadcast(totals), "label")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "loglik",
            F.log(
                (F.col("ctl") + F.lit(k)) / (F.col("total_l") + F.lit(k) * F.col("__v"))
            ),
        )
        .groupBy("term")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("label", "loglik")))
            ).alias("labels")
        )
    )

    docs_per_label = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_docs")
    )
    ntot = df.agg(F.count("*").alias("__n"))
    label_model = (
        docs_per_label.join(F.broadcast(totals), "label")
        .crossJoin(F.broadcast(ntot))
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            F.log(F.col("n_docs") / F.col("__n").cast("double")).alias("logprior"),
            F.log(F.lit(k) / (F.col("total_l") + F.lit(k) * F.col("__v"))).alias(
                "default_loglik"
            ),
        )
    )
    return term_model, label_model


def nb_score(
    docs: DataFrame,
    term_model: DataFrame,
    label_model: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Score documents against an nb_train model.

    Returns the full (id_col, label, logscore) matrix — one row per
    document per label, logscore = logprior + sum_t tf_t * loglik_t.
    Use nb_predict for the argmax row.

    Plan: doc-term counts (one hash aggregate — the token stream is
    reduced to distinct (doc, term) BEFORE anything joins), ONE
    term-keyed join against the vocab-sized model, a broadcast cross
    with the label table, and a per-(doc, label) sum. OOV terms drop at
    the inner join (multinomial-NB convention)."""
    doc_term = (
        _explode_terms(docs, id_col, text_col)
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    per_label = (
        doc_term.join(term_model, "term")  # vocab-sized, term-keyed
        .crossJoin(F.broadcast(label_model))
        .withColumn(
            "logp",
            F.coalesce(
                F.element_at(F.col("labels"), F.col("label")),
                F.col("default_loglik"),
            ),
        )
    )
    scored = per_label.groupBy("id", "label").agg(
        (F.first("logprior") + F.sum(F.col("tf") * F.col("logp"))).alias(
            "logscore"
        )
    )
    # documents with zero in-vocab tokens still score (= prior alone)
    all_ids = docs.select(F.col(id_col).alias("id")).distinct()
    base = all_ids.crossJoin(F.broadcast(label_model.select("label", "logprior")))
    return (
        base.join(scored, ["id", "label"], "left")
        .select(
            F.col("id").alias(id_col),
            "label",
            F.coalesce("logscore", "logprior").alias("logscore"),
        )
    )


def nb_predict(
    docs: DataFrame,
    term_model: DataFrame,
    label_model: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Argmax row per document: (id_col, label, logscore). Ties break
    on label ascending (deterministic, partitioning-invariant).

    One aggregation pass over a SINGLE evaluation of the score frame:
    min_by over the composite ordering (-logscore, label) picks the max
    logscore and, among exact ties, the MIN label. The previous shape
    (groupBy-max then equi-join back on the float logscore) evaluated
    the scores twice, and a float F.sum's combine order isn't
    guaranteed identical across the two evaluations — an ulp-level
    divergence could silently drop a document (round-7 advice)."""
    m = nb_score(docs, term_model, label_model, id_col, text_col)
    return (
        m.groupBy(id_col)
        .agg(
            F.min_by(
                F.struct("label", "logscore"),
                F.struct((-F.col("logscore")).alias("neg"), F.col("label")),
            ).alias("best")
        )
        .select(id_col, F.col("best.label").alias("label"),
                F.col("best.logscore").alias("logscore"))
    )


def hashed_bucket(col: Column, n_buckets: int) -> Column:
    """Engine-portable feature hash: int(md5(w)[:8], 16) % n_buckets.
    DuckDB replay: ('0x' || substr(md5(w), 1, 8))::UBIGINT % n."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1024,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-document DSIR importance log-weights (Xie et al. 2023).

    log w(doc) = sum over hashed unigram features f of
                 count_doc(f) * log(p_target(f) / p_raw(f)),
    with add-k smoothing over the fixed n_buckets feature space, so
    every bucket has mass in both distributions and the ratio is always
    finite. Returns (id_col, n_feats, log_weight).

    Plan: both corpora reduce to n_buckets-row distributions (one hash
    aggregate each — these are FIXED-size regardless of corpus scale,
    the whole point of hashed features); the raw side's per-doc bucket
    counts join the bucket-keyed ratio table and sum per doc. The
    n_buckets table is small but still joined on its key rather than
    collected — broadcast is the optimizer's call via AQE, not a
    correctness assumption."""
    k = float(smoothing)

    # ONE tokenize pass per corpus (r14 optimization; the previous shape
    # tokenized the raw side three times — raw_total job, ratio subtree,
    # doc_buckets subtree — and the target twice). The per-doc bucket
    # counts are computed first and pinned (spillable MEMORY_AND_DISK;
    # O(docs * min(1024, distinct buckets per doc)) short rows — the
    # decision proxy, never the text); the raw distribution is a
    # 1024-row rollup OF that frame, and the target distribution is
    # 1024 rows by construction. The total jobs below materialize both.
    doc_buckets, tgt = _repin(
        _explode_terms(raw, id_col, text_col)
        .select(
            "id", hashed_bucket(F.col("term"), n_buckets).alias("bucket")
        )
        .groupBy("id", "bucket")
        .agg(F.count("*").alias("n")),
        _explode_terms(target, id_col, text_col)
        .select(hashed_bucket(F.col("term"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c")),
    )
    rawd = doc_buckets.groupBy("bucket").agg(
        F.sum("n").cast("long").alias("c")
    )
    # ONE collect for both corpus totals (r15 — guide §2.4): a union of
    # the two scalar aggregates materializes BOTH pins in a single
    # driver-blocking job (previously two jobs, one per total). The raw
    # total reads the doc_buckets pin directly — sum(n) over the per-doc
    # rows equals sum(c) over the bucket rollup exactly (integer sums).
    tot_rows = (
        tgt.agg(F.sum("c").alias("v"))
        .select(F.lit("t").alias("k"), "v")
        .unionAll(
            doc_buckets.agg(F.sum("n").alias("v")).select(
                F.lit("r").alias("k"), "v"
            )
        )
    ).collect()
    tgt_total = next((r.v for r in tot_rows if r.k == "t"), None) or 0
    raw_total = next((r.v for r in tot_rows if r.k == "r"), None) or 0

    # log(p_t / p_r) per bucket over the FULL bucket space: buckets
    # absent from one side get the smoothed floor, never -inf
    ratio = (
        tgt.withColumnRenamed("c", "ct")
        .join(rawd.withColumnRenamed("c", "cr"), "bucket", "outer")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("ct", F.lit(0)) + F.lit(k))
                    / F.lit(tgt_total + k * n_buckets)
                )
                - F.log(
                    (F.coalesce("cr", F.lit(0)) + F.lit(k))
                    / F.lit(raw_total + k * n_buckets)
                )
            ).alias("logratio"),
        )
    )

    return (
        doc_buckets.join(ratio, "bucket")
        .groupBy("id")
        .agg(
            F.sum("n").cast("long").alias("n_feats"),
            F.sum(F.col("n") * F.col("logratio")).alias("log_weight"),
        )
        .select(F.col("id").alias(id_col), "n_feats", "log_weight")
    )
