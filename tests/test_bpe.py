"""BPE tokenizer (text.bpe_train / bpe_encode)."""

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.operators import text as text_ops


@pytest.fixture(scope="module")
def corpus(spark):
    # the classic Sennrich-style weighted corpus
    doc = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(1, doc)], "doc_id long, text string")


def test_train_hand_worked_merges(corpus):
    """First three merges, worked by hand:
      initial pair counts: (e,s)=9 (newest 6 + widest 3), (s,t)=9,
        (w,e)=8, (l,o)=7, (o,w)=7, ...
      tie 9/9 breaks pair-ascending -> ('e','s'); then ('es','t')=9;
      then (l,o)=(o,w)=7 ties -> ('l','o')."""
    merges = text_ops.bpe_train(corpus, "text", n_merges=3)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o")]


def test_train_partitioning_invariant(spark):
    rows = [(i, f"alpha beta gamma{i % 3} alpha beta") for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m1 = text_ops.bpe_train(df.repartition(1), "text", n_merges=10)
    m2 = text_ops.bpe_train(df.repartition(13, "doc_id"), "text", n_merges=10)
    assert m1 == m2


def test_train_stops_when_no_pairs_repeat(spark):
    df = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    # every adjacent pair occurs once -> nothing reaches the count-2 floor
    assert text_ops.bpe_train(df, "text", n_merges=10) == []


def test_encode_applies_merges_in_rank_order(spark, corpus):
    merges = [("e", "s"), ("es", "t"), ("l", "o")]
    df = spark.createDataFrame([(7, "lowest")], "doc_id long, text string")
    row = text_ops.bpe_encode(df, "doc_id", "text", merges).collect()[0]
    # l o w e s t -> es -> est -> lo  =>  [lo, w, est]
    assert row.tokens == ["lo", "w", "est"]
    assert row.n_tokens == 3


def test_encode_without_merges_is_characters(spark):
    df = spark.createDataFrame([(1, "ab c")], "doc_id long, text string")
    row = text_ops.bpe_encode(df, "doc_id", "text", []).collect()[0]
    assert row.tokens == ["a", "b", "c"]


def test_encode_lossless_reconstruction(spark, sf_dir):
    """Concatenated tokens reproduce the whitespace-stripped text for
    every document — tokenization never loses or invents bytes."""
    from graph_db_clustering_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    merges = text_ops.bpe_train(docs, "text", n_merges=40)
    assert len(merges) > 10  # the corpus genuinely trains merges
    enc = text_ops.bpe_encode(docs, "doc_id", "text", merges)
    joined = docs.select(
        F.col("doc_id").alias("id"),
        F.regexp_replace("text", r"[ \t\n\r\f]+", "").alias("want"),
    ).join(enc.select("id", F.concat_ws("", "tokens").alias("got")), "id")
    assert joined.count() == 100
    assert joined.filter(F.col("want") != F.col("got")).count() == 0


def test_trained_merges_compress(spark, sf_dir):
    """More merges -> fewer tokens, floored well under character count."""
    from graph_db_clustering_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    m0 = text_ops.bpe_encode(docs, "doc_id", "text", []).agg(
        F.sum("n_tokens")
    ).first()[0]
    merges = text_ops.bpe_train(docs, "text", n_merges=60)
    m60 = text_ops.bpe_encode(docs, "doc_id", "text", merges).agg(
        F.sum("n_tokens")
    ).first()[0]
    assert m60 < m0 * 0.55, (m0, m60)


def test_encode_nbsp_is_not_a_separator(spark):
    """Whitespace class alignment: bpe_train splits on the explicit
    ASCII class [ \\t\\n\\r\\f], so bpe_encode must too — \\xa0 (NBSP)
    stays INSIDE a word and losslessness holds byte-exactly."""
    text = "a\xa0b c"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = text_ops.bpe_encode(df, "doc_id", "text", []).collect()[0]
    assert row.tokens == ["a", "\xa0", "b", "c"]
    assert "".join(row.tokens) == text.replace(" ", "")
