"""Naive Bayes and DSIR (operators/classify)."""

import math

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.operators import classify


@pytest.fixture(scope="module")
def tiny(spark):
    # 2 labels, vocabulary engineered for hand-computation
    rows = [
        (0, "spam spam eggs", "A"),
        (1, "spam spam spam", "A"),
        (2, "ham eggs ham", "B"),
        (3, "ham ham", "B"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_nb_hand_computed(spark, tiny):
    term_model, label_model = classify.nb_train(tiny, "doc_id", "text", "label")
    test = spark.createDataFrame([(10, "spam eggs")], ["doc_id", "text"])
    m = {
        (r.doc_id, r.label): r.logscore
        for r in classify.nb_score(
            test, term_model, label_model, "doc_id", "text"
        ).collect()
    }
    # training counts: A: spam=5, eggs=1 (total 6); B: ham=4, eggs=1
    # (total 5); vocab = {spam, eggs, ham} (V=3); priors 1/2 each; k=1
    pa = math.log(0.5) + math.log((5 + 1) / (6 + 3)) + math.log((1 + 1) / (6 + 3))
    pb = math.log(0.5) + math.log((0 + 1) / (5 + 3)) + math.log((1 + 1) / (5 + 3))
    assert m[(10, "A")] == pytest.approx(pa, abs=1e-9)
    assert m[(10, "B")] == pytest.approx(pb, abs=1e-9)


def test_nb_oov_dropped_and_prior_only_docs(spark, tiny):
    term_model, label_model = classify.nb_train(tiny, "doc_id", "text", "label")
    test = spark.createDataFrame(
        [(20, "zzz qqq"), (21, "ham zzz")], ["doc_id", "text"]
    )
    m = {
        (r.doc_id, r.label): r.logscore
        for r in classify.nb_score(
            test, term_model, label_model, "doc_id", "text"
        ).collect()
    }
    # doc 20: every token OOV -> score = prior alone
    assert m[(20, "A")] == pytest.approx(math.log(0.5), abs=1e-9)
    assert m[(20, "B")] == pytest.approx(math.log(0.5), abs=1e-9)
    # doc 21: 'zzz' dropped, 'ham' scores (B-heavy)
    assert m[(21, "B")] > m[(21, "A")]


@pytest.mark.slow  # >=15 s (r15 tiering)
def test_nb_predict_argmax_and_tiebreak(spark, tiny):
    term_model, label_model = classify.nb_train(tiny, "doc_id", "text", "label")
    test = spark.createDataFrame(
        [(30, "spam spam"), (31, "ham")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.label
        for r in classify.nb_predict(
            test, term_model, label_model, "doc_id", "text"
        ).collect()
    }
    assert got[30] == "A" and got[31] == "B"
    # exact tie: symmetric corpus (same totals, same priors), shared
    # term -> both labels score identically -> min-label tie-break
    sym = spark.createDataFrame(
        [(0, "aa shared", "A"), (1, "bb shared", "B")],
        ["doc_id", "text", "label"],
    )
    tm2, lm2 = classify.nb_train(sym, "doc_id", "text", "label")
    tie = classify.nb_predict(
        spark.createDataFrame([(40, "shared")], ["doc_id", "text"]),
        tm2, lm2, "doc_id", "text",
    ).collect()
    assert tie[0].label == "A"


def test_nb_accuracy_on_separable_corpus(spark):
    # the sf testdata's `lang` column is random w.r.t. the text (all
    # docs share one vocabulary), so language prediction carries no
    # signal there — accuracy is asserted on a corpus where the labels
    # actually generate the text. 3 labels, overlapping-but-biased
    # vocabularies, deterministic doc construction.
    vocab = {
        "news": ["market", "policy", "election", "economy", "shared"],
        "code": ["function", "compile", "kernel", "thread", "shared"],
        "chat": ["lol", "omg", "brb", "thread", "shared"],
    }
    rows = []
    for li, (label, words) in enumerate(sorted(vocab.items())):
        for i in range(40):
            toks = [words[(i * 7 + j * 3 + li) % 4] for j in range(12)]
            toks.append("shared")
            rows.append((li * 100 + i, " ".join(toks), label))
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    train = df.filter(F.col("doc_id") % 2 == 0)
    test = df.filter(F.col("doc_id") % 2 == 1)
    tm, lm = classify.nb_train(train, "doc_id", "text", "label")
    pred = classify.nb_predict(test, tm, lm, "doc_id", "text")
    hits = (
        pred.join(test.select("doc_id", F.col("label").alias("truth")), "doc_id")
        .select(F.avg((F.col("label") == F.col("truth")).cast("int")).alias("acc"))
        .collect()[0]
        .acc
    )
    assert hits > 0.95  # 'thread' is ambiguous (code/chat); rest separable


@pytest.mark.slow  # >=15 s (r15 tiering)
def test_nb_partitioning_invariance(spark, tiny):
    tm1, lm1 = classify.nb_train(tiny, "doc_id", "text", "label")
    tm2, lm2 = classify.nb_train(
        tiny.repartition(7, "text"), "doc_id", "text", "label"
    )
    test = spark.createDataFrame([(40, "spam ham eggs")], ["doc_id", "text"])
    a = sorted(
        (r.doc_id, r.label, round(r.logscore, 9))
        for r in classify.nb_score(test, tm1, lm1, "doc_id", "text").collect()
    )
    b = sorted(
        (r.doc_id, r.label, round(r.logscore, 9))
        for r in classify.nb_score(
            test.repartition(3), tm2, lm2, "doc_id", "text"
        ).collect()
    )
    assert a == b


def test_dsir_tilts_toward_target(spark):
    target = spark.createDataFrame(
        [(i, "physics quantum field theory lattice") for i in range(20)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [(100, "physics quantum lattice theory"),
         (101, "celebrity gossip fashion scandal news"),
         (102, "quantum gossip")],
        ["doc_id", "text"],
    )
    w = {
        r.doc_id: r.log_weight
        for r in classify.dsir_weights(
            raw, target, "doc_id", "text", n_buckets=256
        ).collect()
    }
    assert w[100] > w[102] > w[101]
    assert w[100] > 0 > w[101]


def test_dsir_feature_counts_and_bucket_hash(spark):
    raw = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    target = spark.createDataFrame([(2, "a b")], ["doc_id", "text"])
    out = classify.dsir_weights(raw, target, "doc_id", "text").collect()
    assert out[0].n_feats == 5
    # the portable bucket hash matches DuckDB's replay of the same idiom
    import duckdb

    got = (
        spark.range(1)
        .select(classify.hashed_bucket(F.lit("hello"), 1024).alias("b"))
        .collect()[0]
        .b
    )
    want = duckdb.sql(
        "SELECT ('0x' || substr(md5('hello'), 1, 8))::UBIGINT % 1024"
    ).fetchone()[0]
    assert got == want


def test_nb_no_python_udfs_in_plan(spark, tiny):
    tm, lm = classify.nb_train(tiny, "doc_id", "text", "label")
    test = spark.createDataFrame([(50, "spam")], ["doc_id", "text"])
    plan = (
        classify.nb_score(test, tm, lm, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
