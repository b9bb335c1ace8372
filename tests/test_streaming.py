"""Streaming tests (SURVEY §2.10, §5.2.5): replay the `events` table
through a file-source stream and assert the final state equals the batch
result — plus watermark late-drop semantics on a hand-staged 2-batch
stream."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.catalog import load_table
from graph_db_clustering_spark.queries.corpus import QUERIES
from graph_db_clustering_spark.streaming import (

    dedup_events,
    first_event_per_user_type,
    read_events_stream,
    run_available_now,
    session_counts,
    stage_replay_dir,
    stream_static_join,
    tumbling_counts,
)

pytestmark = pytest.mark.slow  # heavy tier (r15): run with -m slow

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("replay")
    return stage_replay_dir(spark, SF, str(d / "events"), num_chunks=4)


def _counts_sorted(df, *keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


def test_tumbling_stream_matches_batch(spark, replay_dir, tmp_path):
    """Full replay of the tumbling agg converges to the Q39 batch result.
    Complete output mode: every window's final value lands in the sink."""
    stream = read_events_stream(spark, replay_dir, max_files_per_trigger=2)
    res = run_available_now(
        tumbling_counts(stream, watermark="30 days"),
        "complete",
        "tumbling_final",
        str(tmp_path),
    )
    got = _counts_sorted(
        res.select(F.col("w_start").alias("w"), "event_type", "cnt", "sv"),
        "w",
        "event_type",
    )
    want = _counts_sorted(QUERIES["q39"](spark, SF), "w", "event_type")
    assert got == want


def test_session_stream_matches_batch_sessionization(spark, replay_dir, tmp_path):
    """session_window replay == the q42_sessions lag/cumsum batch form
    (same gap, same [first, last+gap) window semantics)."""
    stream = read_events_stream(spark, replay_dir, max_files_per_trigger=2)
    res = run_available_now(
        session_counts(stream, gap="30 minutes", watermark="30 days"),
        "complete",
        "sessions_final",
        str(tmp_path),
    )
    got = _counts_sorted(
        res.select("user_id", "s_start", "s_end", "cnt"), "user_id", "s_start"
    )
    want = _counts_sorted(
        QUERIES["q42_sessions"](spark, SF).select("user_id", "s_start", "s_end", "cnt"),
        "user_id",
        "s_start",
    )
    assert got == want


def test_first_event_stream_matches_q41(spark, replay_dir, tmp_path):
    stream = read_events_stream(spark, replay_dir, max_files_per_trigger=2)
    res = run_available_now(
        first_event_per_user_type(stream, watermark="30 days"),
        "complete",
        "first_final",
        str(tmp_path),
    )
    got = _counts_sorted(res, "user_id", "event_type")
    want = _counts_sorted(QUERIES["q41"](spark, SF), "user_id", "event_type")
    assert got == want


def test_stream_dedup_drops_replayed_duplicates(spark, tmp_path):
    """Stage the same chunk twice -> dropDuplicates keeps one copy each."""
    events = load_table(spark, SF, "events").limit(200)
    d = str(tmp_path / "dup_replay")
    events.coalesce(1).write.mode("overwrite").parquet(d)
    events.coalesce(1).write.mode("append").parquet(d)
    stream = read_events_stream(spark, d, max_files_per_trigger=1)
    res = run_available_now(
        dedup_events(stream, watermark="30 days"), "append", "dedup_final", str(tmp_path)
    )
    assert res.count() == 200
    assert res.select("event_id").distinct().count() == 200


def test_stream_static_join_matches_batch(spark, replay_dir, tmp_path):
    """Stream-static equi-join (Q10 shape): same row count as the batch
    join of the same inputs."""
    customer = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    stream = read_events_stream(spark, replay_dir, max_files_per_trigger=2)
    res = run_available_now(
        stream_static_join(stream, customer, "user_id"),
        "append",
        "ssjoin_final",
        str(tmp_path),
    )
    batch = load_table(spark, SF, "events").join(customer, "user_id")
    assert res.count() == batch.count()


def test_watermark_drops_late_data(spark, tmp_path):
    """Two micro-batches staged by hand: batch 2 carries an event 2 hours
    older than batch 1's max ts; with a 10-minute watermark the late
    event's window is already finalized, so the appended output equals the
    batch aggregate WITHOUT the late event."""
    base = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [(i, ts, 1, "click", 1.0, "{}") for i, ts in rows],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )

    d = str(tmp_path / "late_replay")
    ck = str(tmp_path / "ck")
    batch1 = [(1, base), (2, base + datetime.timedelta(minutes=5))]
    late_ts = base - datetime.timedelta(hours=2)
    batch2 = [(3, late_ts), (4, base + datetime.timedelta(minutes=6))]
    mk(batch1).coalesce(1).write.mode("overwrite").parquet(d)

    stream = read_events_stream(spark, d, max_files_per_trigger=10)
    agg = tumbling_counts(stream, window="1 hour", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_final")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: watermark -> 12:05 - 10min
        mk(batch2).coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()  # batch 2: late event (10:00) precedes it
    finally:
        q.stop()
    out = spark.table("late_final")
    # the 10:00 window must never appear; the 12:00 window counts 3 events
    starts = {r.w_start for r in out.select("w_start").collect()}
    assert late_ts.replace(minute=0) not in starts
    total = (
        out.groupBy("w_start").agg(F.max("cnt").alias("cnt")).agg(F.sum("cnt")).first()[0]
    )
    assert total == 3


def test_stateful_sessionize_matches_batch(spark, replay_dir, tmp_path):
    """The applyInPandasWithState session machine emits exactly the batch
    sessionization (q42_sessions): closed-by-event sessions during replay,
    the rest via event-time timeout as the final watermark passes them.
    Sessions still open at the final watermark legitimately stay in state;
    with a replay whose last chunk advances the watermark past every
    last+gap, the emitted set is complete."""
    from graph_db_clustering_spark.streaming import sessionize_with_state

    stream = read_events_stream(spark, replay_dir, max_files_per_trigger=1)
    res = run_available_now(
        sessionize_with_state(stream, gap_seconds=1800, watermark="10 minutes"),
        "append",
        "stateful_sessions",
        str(tmp_path),
    )
    got = _counts_sorted(
        res.select("user_id", "s_start", "s_end", "cnt"), "user_id", "s_start"
    )
    batch = QUERIES["q42_sessions"](spark, SF).select("user_id", "s_start", "s_end", "cnt")
    want_all = _counts_sorted(batch, "user_id", "s_start")
    # every emitted session is a real batch session (exactness)
    assert set(got) <= set(want_all)
    # completeness up to the final watermark: sessions whose end precedes
    # (max ts - 10 min) must all have been emitted
    max_ts = load_table(spark, SF, "events").agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(minutes=10)
    want_closed = [w for w in want_all if w[2] <= horizon]
    assert set(got) >= set(want_closed)
    assert len(got) == len(set(got))  # exactly-once emission


def test_rollup_stream_matches_batch(spark, replay_dir, tmp_path):
    """The multi-resolution rollup is a plain transform: run over the
    replay stream (complete mode), final state == the q43 batch tiers."""
    from graph_db_clustering_spark.operators.timeseries import rollup_time_series

    stream = read_events_stream(spark, replay_dir, max_files_per_trigger=2)
    res = run_available_now(
        rollup_time_series(stream, "ts", "value"),
        "complete",
        "rollup_final",
        str(tmp_path),
    )
    got = _counts_sorted(res, "level", "bucket")
    want = _counts_sorted(QUERIES["q43_rollup"](spark, SF), "level", "bucket")
    assert got == want


def test_stream_stream_join_matches_batch(spark, replay_dir, tmp_path):
    """Full replay of the watermarked stream-stream click->purchase join
    equals the identical expression evaluated over the batch events table
    (append mode: a joined pair is emitted once both sides have arrived)."""
    from graph_db_clustering_spark.streaming import click_purchase_join

    stream = read_events_stream(spark, replay_dir, max_files_per_trigger=2)
    res = run_available_now(
        click_purchase_join(stream, max_delay="2 hours", watermark="30 days"),
        "append",
        "ss_join_final",
        str(tmp_path),
    )
    keys = ["user_id", "click_id", "purchase_id", "click_ts", "purchase_ts"]
    got = _counts_sorted(res, *keys)
    batch = load_table(spark, SF, "events")
    want = _counts_sorted(click_purchase_join(batch), *keys)
    assert len(want) > 0
    assert got == want


def test_decontaminate_stream_matches_batch(spark, tmp_path):
    """Stream-ingest decontamination (foreachBatch over the batch op):
    4-chunk replay of documents vs the batch decontaminate on the full
    table — identical (id, n_shared) rows. The eval set is a slice of the
    same corpus, so overlap is guaranteed."""
    from graph_db_clustering_spark.operators.traindata import decontaminate
    from graph_db_clustering_spark.streaming import (
        decontaminate_stream,
        read_table_stream,
        stage_table_replay,
    )

    replay = stage_table_replay(
        spark, SF, "documents", "doc_id", str(tmp_path / "docs"), num_chunks=4
    )
    docs = load_table(spark, SF, "documents")
    eval_df = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")

    stream = read_table_stream(spark, replay, max_files_per_trigger=1)
    sink = str(tmp_path / "flagged")
    q = decontaminate_stream(
        stream, eval_df, sink, str(tmp_path / "ckpt"), n=5
    )
    q.awaitTermination()

    got = {(r.doc_id, r.n_shared) for r in spark.read.parquet(sink).collect()}
    want = {
        (r.doc_id, r.n_shared)
        for r in decontaminate(docs, eval_df, "doc_id", "text", n=5).collect()
    }
    assert len(want) > 0
    assert got == want


def test_scrub_stream_matches_batch(spark, tmp_path):
    """pii_scrub is a stateless projection, so it runs IN the streaming
    plan (append mode, no state): replayed output == batch output."""
    from graph_db_clustering_spark.operators.traindata import pii_scrub
    from graph_db_clustering_spark.streaming import (
        read_table_stream,
        scrub_stream,
        stage_table_replay,
    )

    replay = stage_table_replay(
        spark, SF, "documents", "doc_id", str(tmp_path / "docs"), num_chunks=4
    )
    stream = read_table_stream(spark, replay, max_files_per_trigger=2)
    res = run_available_now(
        scrub_stream(stream), "append", "scrub_final", str(tmp_path)
    )
    got = _counts_sorted(res, "doc_id")
    docs = load_table(spark, SF, "documents")
    want = _counts_sorted(pii_scrub(docs, "doc_id", "text"), "doc_id")
    assert got == want


def test_stream_dedup_within_watermark_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: replays inside the watermark are
    dropped exactly like plain dropDuplicates (same 200-row answer on the
    doubled replay), but the state store is guaranteed bounded — id state
    evicts once the watermark passes its first-seen time."""
    from graph_db_clustering_spark.streaming.ops import dedup_events_within_watermark

    events = load_table(spark, SF, "events").limit(200)
    d = str(tmp_path / "dupw_replay")
    events.coalesce(1).write.mode("overwrite").parquet(d)
    events.coalesce(1).write.mode("append").parquet(d)
    stream = read_events_stream(spark, d, max_files_per_trigger=1)
    res = run_available_now(
        dedup_events_within_watermark(stream, watermark="30 days"),
        "append",
        "dedupw_final",
        str(tmp_path),
    )
    assert res.count() == 200
    assert res.select("event_id").distinct().count() == 200


def test_stateful_quota_matches_batch(spark, replay_dir, tmp_path):
    """value_quota_stream (applyInPandasWithState) over the full replay
    equals the batch window-cumsum form: per user, events are kept while
    the running total of `value` stays under the cap, with identical
    running totals."""
    from graph_db_clustering_spark.streaming.stateful import (
        value_quota_batch,
        value_quota_stream,
    )

    cap = 2000.0
    stream = read_events_stream(spark, replay_dir, max_files_per_trigger=1)
    res = run_available_now(
        value_quota_stream(stream, cap),
        "append",
        "quota_final",
        str(tmp_path),
    )
    got = [
        (r.user_id, r.event_id, round(r.spent, 6))
        for r in res.orderBy("user_id", "event_id").collect()
    ]
    batch = value_quota_batch(load_table(spark, SF, "events"), cap)
    want = [
        (r.user_id, r.event_id, round(r.spent, 6))
        for r in batch.orderBy("user_id", "event_id").collect()
    ]
    assert got == want
    assert len(want) > 0


def test_quota_tws_form_gates_without_protobuf(spark):
    """The transformWithStateInPandas form needs google.protobuf (absent
    in this container): it must raise the clear availability gate, not
    crash the streaming query at runtime."""
    from graph_db_clustering_spark.streaming.stateful import value_quota_stream_tws

    try:
        from google.protobuf import descriptor  # noqa: F401

        pytest.skip("protobuf present: the tws form would actually run")
    except ImportError:
        pass
    events = load_table(spark, SF, "events")
    with pytest.raises(NotImplementedError, match="google.protobuf"):
        value_quota_stream_tws(events, 100.0)


def test_warc_stream_matches_batch(spark, tmp_path):
    """Streaming crawl ingestion (streaming/crawl): WARC shards staged
    in a landing directory, one shard per micro-batch, parse + HTML
    extraction in-stream — the drained output must equal the batch
    read_warc + extraction over the same files, exactly once."""
    import numpy as np  # noqa: F401 — parity with module imports

    from graph_db_clustering_spark.operators.text import html_text_expr
    from graph_db_clustering_spark.sources import warc
    from graph_db_clustering_spark.streaming import crawl

    landing = tmp_path / "landing"
    landing.mkdir()
    for shard in range(3):
        members = []
        for i in range(4):
            doc = shard * 10 + i
            html = f"<html><body><p>doc {doc} text</p></body></html>".encode()
            members.append(
                warc.gzip_member(
                    warc.build_record(
                        "response",
                        warc.http_response(html),
                        target_uri=f"https://x.example/doc/{doc}",
                        record_id=f"<urn:uuid:d{doc}>",
                    )
                )
            )
        (landing / f"shard-{shard}.warc.gz").write_bytes(b"".join(members))

    stream = crawl.read_warc_stream(
        spark, str(landing), max_files_per_trigger=1
    )
    res = run_available_now(
        crawl.extract_pages_stream(stream),
        "append",
        "warc_pages",
        str(tmp_path),
    )
    got = sorted(
        (r.target_uri, r.http_status, r.text) for r in res.collect()
    )
    batch = warc.read_warc(spark, str(landing))
    want = sorted(
        (r.target_uri, r.http_status, r.t)
        for r in batch.select(
            "target_uri",
            "http_status",
            html_text_expr(F.col("payload").cast("string")).alias("t"),
        ).collect()
    )
    assert got == want
    assert len(got) == 12
    assert got[0][2] == "doc 0 text"
    # one shard per micro-batch: the file-source replay genuinely ran
    # incrementally (3 data batches; a trailing empty batch may follow)
    q = [q for q in spark.streams.active if q.name == "warc_pages"]
    assert not q  # drained and stopped


def test_extract_pages_filters_are_case_insensitive(spark):
    """Content-Type values arrive mixed-case from real servers; the
    HTML filter must not drop 'Text/HTML'."""
    from graph_db_clustering_spark.sources import warc
    from graph_db_clustering_spark.streaming import crawl

    rec = warc.build_record(
        "response",
        warc.http_response(b"<p>hi</p>", content_type="Text/HTML; charset=utf-8"),
        target_uri="https://x.example/a",
    )
    df = spark.createDataFrame(
        [("f.warc", bytearray(rec))], "path string, content binary"
    )
    recs = warc.parse_warc_records(df)
    out = crawl.extract_pages_stream(recs).collect()
    assert len(out) == 1
    assert out[0].text == "hi"


def test_ann_serve_stream_matches_batch(spark, tmp_path, monkeypatch):
    """Streaming vector search (streaming/ann): query batches replayed
    one file per trigger against a SAVED IVF-PQ index must produce
    exactly the batch ivfpq_search results for the same queries, with
    no training/encoding in-stream (poison-pinned)."""
    from graph_db_clustering_spark.operators import kmeans, similarity
    from graph_db_clustering_spark.streaming import ann
    from graph_db_clustering_spark.streaming.replay import stage_table_replay

    emb = load_table(spark, SF, "embeddings")
    model, encoded = similarity.ivfpq_build(emb, cells=8, m=8, codes=64)
    index = str(tmp_path / "index")
    similarity.ivfpq_save(model, encoded, index)
    loaded_model, loaded_codes = similarity.ivfpq_load(spark, index)

    # stage the first 24 query vectors as 4 replay chunks
    qdir = str(tmp_path / "queries")
    queries = emb.filter(F.col("vec_id") < 24)
    queries.repartitionByRange(4, "vec_id").write.parquet(qdir)
    stream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir)
    )

    monkeypatch.setattr(kmeans, "fit", lambda *a, **k: 1 / 0)
    monkeypatch.setattr(similarity, "ivfpq_build", lambda *a, **k: 1 / 0)

    out = str(tmp_path / "hits")
    q = ann.ann_serve_stream(
        stream, loaded_model, loaded_codes, emb, out,
        str(tmp_path / "ckpt"), k=3, nprobe=4,
    )
    q.awaitTermination()

    got = sorted(
        (r.qid, r.nid, r.rk, round(r.cosine, 6))
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.qid, r.nid, r.rk, round(r.cosine, 6))
        for r in similarity.ivfpq_search(
            queries, loaded_model, loaded_codes, emb,
            k=3, nprobe=4, exclude_self=False,
        ).collect()
    )
    assert got == want
    assert len(got) == 24 * 3


def test_avro_stream_matches_batch(spark, tmp_path):
    """Streaming Avro ingestion: shards replayed one file per trigger
    decode to exactly the batch read, exactly once."""
    from graph_db_clustering_spark.sources import avro as pyavro
    from graph_db_clustering_spark.streaming import crawl

    schema = {"type": "record", "name": "R",
              "fields": [{"name": "a", "type": "long"},
                         {"name": "b", "type": ["null", "string"]}]}
    landing = tmp_path / "avro_landing"
    landing.mkdir()
    for i in range(3):
        rows = [{"a": i * 10 + j, "b": None if j == 0 else f"s{j}"} for j in range(4)]
        (landing / f"p{i}.avro").write_bytes(pyavro.encode_container(schema, rows))

    stream = crawl.read_avro_stream(
        spark, str(landing), pyavro.parse_schema(schema), max_files_per_trigger=1
    )
    res = run_available_now(stream, "append", "avro_rows", str(tmp_path))
    got = sorted((r.a, r.b) for r in res.collect())
    want = sorted(
        (r.a, r.b)
        for r in pyavro.read_avro(spark, str(landing)).collect()
    )
    assert got == want and len(got) == 12


def test_image_dedup_stream_matches_batch(spark, tmp_path):
    """Streaming perceptual dedup: image micro-batches checked against a
    static indexed hash set must flag exactly the batch bipartite-join
    result, exactly once, across replayed chunks."""
    from graph_db_clustering_spark.operators import multimodal

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 60)
    # index = images of docs 0..29; stream = images of docs 30..59, where
    # each streamed doc RENDERS the text of (doc_id - 30) -> every
    # streamed image duplicates exactly one indexed image
    idx_imgs = multimodal.synthetic_images_from_documents(
        docs.filter(F.col("doc_id") < 30), "doc_id", "text"
    )
    index_hashes = multimodal.dhash(idx_imgs)
    leaders = docs.select(
        (F.col("doc_id") + 30).alias("doc_id2"), F.col("text").alias("ltext")
    )
    new_docs = (
        docs.filter(F.col("doc_id") >= 30)
        .join(leaders, F.col("doc_id") == F.col("doc_id2"))
        .select("doc_id", F.col("ltext").alias("text"))
    )
    new_imgs = multimodal.synthetic_images_from_documents(new_docs, "doc_id", "text")

    staged = str(tmp_path / "imgs")
    new_imgs.repartitionByRange(3, "image_id").write.parquet(staged)
    stream = (
        spark.readStream.schema(new_imgs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    from graph_db_clustering_spark.streaming.ann import image_dedup_stream

    out = str(tmp_path / "flagged")
    q = image_dedup_stream(
        stream, index_hashes, out, str(tmp_path / "ck"), max_hamming=0
    )
    q.awaitTermination()
    got = sorted(
        (r.new_id, r.index_id, r.hamming)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.new_id, r.index_id, r.hamming)
        for r in multimodal.image_near_dups_against(
            multimodal.dhash(new_imgs), index_hashes, max_hamming=0
        ).collect()
    )
    assert got == want
    assert len(got) >= 30  # every streamed image matches its leader
    assert {(n, i) for n, i, _ in got} >= {(i + 30, i) for i in range(30)}


# --- streaming mini-batch k-means (round 7) --------------------------------


def test_streaming_kmeans_update_matches_numpy_reference(spark):
    import numpy as np

    from graph_db_clustering_spark.streaming.kmeans import StreamingKMeans

    pts = [(0, [0.0, 0.0]), (1, [2.0, 0.0]), (2, [10.0, 10.0]),
           (3, [12.0, 10.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    m = StreamingKMeans([[1.0, 1.0], [11.0, 11.0]], decay=1.0)
    m.update_batch(df, "vec_id", "embedding")
    # cluster 0 <- points 0,1 (mean [1,0]); cluster 1 <- 2,3 ([11,10]);
    # counts were 0, so the blend IS the batch mean
    assert np.allclose(m.centroids, [[1.0, 0.0], [11.0, 10.0]])
    assert list(m.counts) == [2.0, 2.0]
    # second batch: running mean with the count weights
    df2 = spark.createDataFrame(
        [(4, [4.0, 2.0]), (5, [14.0, 14.0])],
        "vec_id long, embedding array<double>",
    )
    m.update_batch(df2, "vec_id", "embedding")
    assert np.allclose(m.centroids[0], [(2 * 1 + 4) / 3, (2 * 0 + 2) / 3])
    assert np.allclose(m.centroids[1], [(2 * 11 + 14) / 3, (2 * 10 + 14) / 3])


def test_streaming_kmeans_decay_zero_is_last_batch_mean(spark):
    import numpy as np

    from graph_db_clustering_spark.streaming.kmeans import StreamingKMeans

    m = StreamingKMeans([[0.0], [10.0]], decay=0.0)
    m.update_batch(
        spark.createDataFrame([(0, [1.0]), (1, [9.0])],
                              "vec_id long, embedding array<double>"),
        "vec_id", "embedding",
    )
    m.update_batch(
        spark.createDataFrame([(2, [3.0]), (3, [7.0])],
                              "vec_id long, embedding array<double>"),
        "vec_id", "embedding",
    )
    assert np.allclose(m.centroids, [[3.0], [7.0]])


def test_streaming_kmeans_replay_matches_sequential_batches(
    spark, tmp_path
):
    """Stream == batch parity: replaying the embeddings table through
    kmeans_stream produces EXACTLY the centroids of sequentially
    calling update_batch on the same chunks in the same order."""
    import numpy as np

    from graph_db_clustering_spark.streaming.kmeans import (
        StreamingKMeans, kmeans_stream,
    )
    from graph_db_clustering_spark.streaming.replay import (
        read_table_stream, stage_table_replay,
    )

    d = stage_table_replay(
        spark, SF, "embeddings", "vec_id", str(tmp_path / "vecs"), num_chunks=3
    )
    init = [r.embedding for r in (
        spark.read.parquet(d).orderBy("vec_id").limit(4).collect()
    )]
    init = [[float(x) for x in v] for v in init]

    # sequential reference over the same chunk partition
    ref = StreamingKMeans(init, decay=0.9)
    chunks = spark.read.parquet(d).withColumn("fsrc", F.input_file_name())
    files = sorted(r.fsrc for r in chunks.select("fsrc").distinct().collect())
    for f in files:
        ref.update_batch(
            chunks.filter(F.col("fsrc") == f).drop("fsrc"), "vec_id", "embedding"
        )

    live = StreamingKMeans(init, decay=0.9)
    q = kmeans_stream(
        read_table_stream(spark, d, max_files_per_trigger=1),
        live,
        str(tmp_path / "traj"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    assert live.n_batches == 3
    assert np.allclose(live.centroids, ref.centroids, atol=1e-12)
    assert np.allclose(live.counts, ref.counts)
    # trajectory sink: one centroid set per batch, k rows each
    traj = spark.read.parquet(str(tmp_path / "traj"))
    assert (traj.groupBy("__batch_id").count()
            .select("count").distinct().count() == 1)
    assert traj.count() == 3 * len(init)


def test_streaming_kmeans_restart_and_retry_are_idempotent(
    spark, tmp_path
):
    """The sink is the model's source of truth (review fix): replaying
    the stream with a FRESH model object and a fresh checkpoint (the
    restart-worst-case: every batch retried) leaves the sink byte-
    stable — already-committed batches are skipped via the sink's
    latest batch id, never re-applied."""
    import numpy as np

    from graph_db_clustering_spark.streaming.kmeans import (
        StreamingKMeans, kmeans_stream,
    )
    from graph_db_clustering_spark.streaming.replay import (
        read_table_stream, stage_table_replay,
    )

    d = stage_table_replay(
        spark, SF, "embeddings", "vec_id", str(tmp_path / "vecs"), num_chunks=2
    )
    init = [[0.0] * 8, [1.0] * 8]
    dim = len(
        spark.read.parquet(d).select("embedding").first().embedding
    )
    init = [[0.0] * dim, [1.0] * dim]
    m1 = StreamingKMeans(init, decay=1.0)
    q = kmeans_stream(
        read_table_stream(spark, d), m1,
        str(tmp_path / "traj"), str(tmp_path / "ck1"),
    )
    q.awaitTermination()
    final = sorted(
        (r["__batch_id"], r.cid, tuple(r.centroid))
        for r in spark.read.parquet(str(tmp_path / "traj")).collect()
    )
    # "restart": fresh model with WRONG init, fresh checkpoint -> every
    # batch replays, every batch must be skipped via the sink
    m2 = StreamingKMeans([[9.0] * dim, [-9.0] * dim], decay=1.0)
    q2 = kmeans_stream(
        read_table_stream(spark, d), m2,
        str(tmp_path / "traj"), str(tmp_path / "ck2"),
    )
    q2.awaitTermination()
    again = sorted(
        (r["__batch_id"], r.cid, tuple(r.centroid))
        for r in spark.read.parquet(str(tmp_path / "traj")).collect()
    )
    assert again == final  # sink unchanged: no double-application
    assert m2.n_batches == 0  # the skipped batches never touched m2


def test_streaming_funnel_matches_batch(spark, replay_dir, tmp_path):
    """funnel_with_state over the time-ordered events replay converges
    to exactly the batch funnel_depth result (round 7 — the parity
    contract: observed-order == timestamp-order on an ordered replay)."""
    from graph_db_clustering_spark.operators.timeseries import funnel_depth
    from graph_db_clustering_spark.streaming.stateful import (
        funnel_with_state,
    )

    steps = ["view", "click", "purchase"]
    stream = read_events_stream(spark, replay_dir, max_files_per_trigger=1)
    out = run_available_now(
        funnel_with_state(stream.select("user_id", "ts", "event_type"), steps),
        "update",
        "funnel_state",
        str(tmp_path),
    )
    # update mode emits one row per depth advance; depth is monotone,
    # so the final value per user is the max
    got = {
        r.user_id: r.d
        for r in out.groupBy("user_id").agg(F.max("depth").alias("d")).collect()
    }
    batch = spark.read.parquet(replay_dir)
    want = {
        r.user_id: r.depth
        for r in funnel_depth(batch, "user_id", "ts", "event_type", steps).collect()
    }
    assert got == want


def test_cdc_stream_matches_batch_apply(spark, tmp_path):
    """Replaying a change feed through cdc_stream yields a final
    snapshot equal to one batch cdc_apply over the whole feed, with a
    time-travelable version per micro-batch (round 7)."""
    from graph_db_clustering_spark.operators import maintenance
    from graph_db_clustering_spark.streaming.cdc import cdc_stream
    from graph_db_clustering_spark.streaming.replay import (
        read_table_stream, stage_table_replay,
    )

    snap = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("key"),
        F.col("c_mktsegment").alias("segment"),
    )
    feed_dir = str(tmp_path / "feed")
    feed = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 11 == 0, "D").otherwise("U").alias("op"),
        F.col("o_orderpriority").alias("segment"),
    )
    (
        feed.repartitionByRange(3, "seq").sortWithinPartitions("seq")
        .write.mode("overwrite").parquet(feed_dir)
    )
    import os as _os
    import time as _time

    parts = sorted(
        f for f in _os.listdir(feed_dir) if f.startswith("part-")
    )
    base = int(_time.time()) - len(parts)
    for i, name in enumerate(parts):
        _os.utime(_os.path.join(feed_dir, name), (base + i, base + i))

    store = str(tmp_path / "store")
    q = cdc_stream(
        read_table_stream(spark, feed_dir), store, snap,
        "key", "seq", str(tmp_path / "ck"),
    )
    q.awaitTermination()
    versions = maintenance.snapshot_versions(store)
    assert len(versions) == 4  # v1 initial + one per chunk
    got = sorted(
        (r.key, r.segment)
        for r in maintenance.snapshot_read(spark, store).collect()
    )
    want = sorted(
        (r.key, r.segment)
        for r in maintenance.cdc_apply(snap, feed, "key", "seq").collect()
    )
    assert got == want
    # time travel: v1 is the untouched initial snapshot
    v1 = maintenance.snapshot_read(spark, store, version=1)
    assert sorted((r.key, r.segment) for r in v1.collect()) == sorted(
        (r.key, r.segment) for r in snap.collect()
    )


def test_decayed_counts_stream_matches_batch(spark, replay_dir, tmp_path):
    """decayed_counts_stream folded over a 4-chunk replay equals the
    batch telescoped sum per event_type — the O(1)-state re-basing
    (dec *= 2^(-dt/hl)) must reproduce the single-pass batch result."""
    from graph_db_clustering_spark.operators.timeseries import decayed_counts
    from graph_db_clustering_spark.streaming.stateful import decayed_counts_stream

    stream = read_events_stream(spark, replay_dir, max_files_per_trigger=1)
    res = run_available_now(
        decayed_counts_stream(stream, 3600.0),
        "update",
        "decay_final",
        str(tmp_path),
    )
    # update mode emits one row per key per touched micro-batch; the
    # live readout is the row with the max asof_us (ties: max n_events)
    final = {}
    for r in res.collect():
        cur = final.get(r.event_type)
        if cur is None or (r.asof_us, r.n_events) > (cur.asof_us, cur.n_events):
            final[r.event_type] = r
    batch = {
        r.event_type: r
        for r in decayed_counts(
            load_table(spark, SF, "events"), "event_type", "ts", 3600.0
        ).collect()
    }
    assert set(final) == set(batch) and len(batch) > 0
    for k, b in batch.items():
        s = final[k]
        assert s.n_events == b.n_events, k
        assert abs(s.decayed - b.decayed) < 1e-9 * max(1.0, b.decayed), k


def test_mv_maintained_by_foreachbatch_matches_batch(spark, replay_dir, tmp_path):
    """The incremental materialized aggregate driven from a STREAM:
    foreachBatch folds every micro-batch into the state with
    mv_apply_delta; after the replay drains, the view equals the
    from-scratch batch aggregate — the streaming maintenance story for
    the warehouse layer."""
    from graph_db_clustering_spark.operators.maintenance import (
        mv_apply_delta,
        mv_build,
        mv_read,
    )

    measures = {
        "n_events": ("value", "count"),
        "total_value": ("value", "sum"),
        "max_value": ("value", "max"),
    }
    path = str(tmp_path / "mv_stream")
    mv_build(
        load_table(spark, SF, "events").limit(0), path, ["event_type"], measures
    )

    def fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        mv_apply_delta(spark, path, batch_df, ["event_type"], measures)

    stream = read_events_stream(spark, replay_dir, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_type: (r.n_events, round(r.total_value, 6), r.max_value)
        for r in mv_read(spark, path).collect()
    }
    want = {
        r.event_type: (r.n_events, round(r.total_value, 6), r.max_value)
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.count("value").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_stream_stream_left_outer_join_emits_unmatched_after_watermark(
    spark, tmp_path
):
    """Round 9: the left-outer watermarked stream-stream join. A click
    with no purchase in its window may only surface (with null purchase
    columns) once the watermark PASSES click_ts + max_delay — so a
    later batch whose events push the watermark forward flushes the
    unconverted clicks from state. Matched pairs behave as in the inner
    join; the final replay output equals the batch LEFT join."""
    import datetime as dt
    import os

    from graph_db_clustering_spark.streaming import click_purchase_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: click, never purchases (the row the inner join loses)
        (1, t0, 1, "click", 1.0),
        # user 2: click + purchase 10 min later (matched pair)
        (2, t0, 2, "click", 1.0),
        (3, t0 + dt.timedelta(minutes=10), 2, "purchase", 5.0),
    ]
    # pusher batches must advance BOTH sides' watermarks (the global
    # watermark is the MIN over the two withWatermark nodes), so each
    # carries a click AND an unrelated purchase
    late = [
        (4, t0 + dt.timedelta(days=1), 9, "click", 1.0),
        (14, t0 + dt.timedelta(days=1), 8, "purchase", 1.0),
    ]
    later = [
        # the watermark a batch produces only takes effect at the NEXT
        # trigger, and this engine applies it with one further batch of
        # lag — two extra pusher chunks give it the triggers it needs
        # to evict user 1's click and emit it with nulls
        (5, t0 + dt.timedelta(days=2), 9, "click", 1.0),
        (15, t0 + dt.timedelta(days=2), 8, "purchase", 1.0),
    ]
    latest = [
        (6, t0 + dt.timedelta(days=3), 9, "click", 1.0),
        (16, t0 + dt.timedelta(days=3), 8, "purchase", 1.0),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    replay = str(tmp_path / "replay_outer")
    os.makedirs(replay)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(tmp_path / "b1")
    )
    spark.createDataFrame(late, schema).coalesce(1).write.parquet(
        str(tmp_path / "b2")
    )
    spark.createDataFrame(later, schema).coalesce(1).write.parquet(
        str(tmp_path / "b3")
    )
    spark.createDataFrame(latest, schema).coalesce(1).write.parquet(
        str(tmp_path / "b4")
    )
    import shutil
    import time as _time

    for i, src in enumerate(("b1", "b2", "b3", "b4")):
        part = [
            f for f in os.listdir(tmp_path / src) if f.endswith(".parquet")
        ][0]
        dest = os.path.join(replay, f"chunk-{i}.parquet")
        shutil.copy(str(tmp_path / src / part), dest)
        os.utime(dest, (int(_time.time()) - 4 + i,) * 2)

    stream = read_events_stream(spark, replay, max_files_per_trigger=1)
    res = run_available_now(
        click_purchase_join(
            stream, max_delay="2 hours", watermark="5 minutes", how="leftOuter"
        ),
        "append",
        "ss_outer_final",
        str(tmp_path),
    )
    got = {
        (r.user_id, r.click_id, r.purchase_id) for r in res.collect()
    }
    # matched pair present; user 1's click present with NULL purchase
    assert (2, 2, 3) in got
    assert (1, 1, None) in got
    # batch parity: identical expression as a batch left join
    batch = spark.createDataFrame(rows + late + later + latest, schema)
    want = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in click_purchase_join(batch, how="leftOuter").collect()
    }
    # the streaming output may still hold back rows the watermark has
    # not cleared (the final click at t0+1d has no flush after it)
    assert got <= want
    assert {(1, 1, None), (2, 2, 3)} <= got


# ---- round 14: exactly-once foreachBatch sink --------------------------


def test_exactly_once_sink_crash_replay_no_duplicates(
    spark, replay_dir, tmp_path
):
    """The full at-least-once failure matrix: (a) a replayed committed
    batch is skipped; (b) a retry that died between renames and the
    marker overwrites, not appends; (c) a fresh run with a WIPED
    checkpoint replays every batch id against the same sink dir and
    commits nothing twice."""
    import glob
    import json

    from graph_db_clustering_spark.streaming.replay import (
        exactly_once_batch_writer,
        read_exactly_once,
        read_table_stream,
        to_exactly_once_parquet_sink,
    )

    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck1")
    q = to_exactly_once_parquet_sink(
        read_table_stream(spark, replay_dir, max_files_per_trigger=1),
        sink, ck,
    )
    q.awaitTermination()
    want = spark.read.parquet(replay_dir).count()
    assert read_exactly_once(spark, sink).count() == want
    markers = sorted(os.listdir(os.path.join(sink, "_txn")))
    assert len(markers) == 4  # one per staged chunk

    # (a) replayed committed batch: no-op
    w = exactly_once_batch_writer(sink)
    w(spark.read.parquet(replay_dir), 0)
    assert read_exactly_once(spark, sink).count() == want
    assert sorted(os.listdir(os.path.join(sink, "_txn"))) == markers

    # (b) crash between renames and marker: delete batch 2's marker
    # (its data files remain) and retry — deterministic names must
    # overwrite, and the committed view converges to the same rows
    with open(os.path.join(sink, "_txn", markers[2])) as f:
        batch2_files = json.load(f)["files"]
    os.remove(os.path.join(sink, "_txn", markers[2]))
    batch2_id = int(markers[2].split(".")[0])
    files_before = sorted(glob.glob(os.path.join(sink, "*.parquet")))
    chunk = sorted(
        p for p in os.listdir(replay_dir) if p.endswith(".parquet")
    )[2]
    w(spark.read.parquet(os.path.join(replay_dir, chunk)), batch2_id)
    assert sorted(glob.glob(os.path.join(sink, "*.parquet"))) == files_before
    with open(os.path.join(sink, "_txn", markers[2])) as f:
        assert json.load(f)["files"] == batch2_files
    assert read_exactly_once(spark, sink).count() == want

    # (c) wiped checkpoint, same sink: every batch id replays, all skip
    q2 = to_exactly_once_parquet_sink(
        read_table_stream(spark, replay_dir, max_files_per_trigger=1),
        sink, str(tmp_path / "ck2"),
    )
    q2.awaitTermination()
    assert read_exactly_once(spark, sink).count() == want


def test_read_exactly_once_ignores_uncommitted(spark, replay_dir, tmp_path):
    """A half-renamed batch with no marker is invisible to readers."""
    from graph_db_clustering_spark.streaming.replay import (
        exactly_once_batch_writer,
        read_exactly_once,
    )

    sink = str(tmp_path / "sink2")
    w = exactly_once_batch_writer(sink)
    df = spark.read.parquet(replay_dir)
    w(df, 0)
    want = read_exactly_once(spark, sink).count()
    # fake a torn batch 1: data file present, marker absent
    import shutil

    src = sorted(
        p for p in os.listdir(sink) if p.endswith(".parquet")
    )[0]
    shutil.copy(
        os.path.join(sink, src),
        os.path.join(sink, "b0000000001-00000.parquet"),
    )
    assert read_exactly_once(spark, sink).count() == want
