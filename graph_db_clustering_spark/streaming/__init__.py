from graph_db_clustering_spark.streaming.replay import (
    read_events_stream,
    read_table_stream,
    run_available_now,
    stage_replay_dir,
    stage_table_replay,
)
from graph_db_clustering_spark.streaming.stateful import sessionize_with_state
from graph_db_clustering_spark.streaming.ops import (
    click_purchase_join,
    dedup_events,
    first_event_per_user_type,
    session_counts,
    sliding_counts,
    stream_static_join,
    tumbling_counts,
)
from graph_db_clustering_spark.streaming.ann import ann_serve_stream, image_dedup_stream
from graph_db_clustering_spark.streaming.crawl import (
    extract_pages_stream,
    read_warc_stream,
)
from graph_db_clustering_spark.streaming.traindata import (
    decontaminate_stream,
    scrub_stream,
)

__all__ = [
    "stage_replay_dir",
    "stage_table_replay",
    "read_events_stream",
    "read_table_stream",
    "run_available_now",
    "read_warc_stream",
    "ann_serve_stream",
    "image_dedup_stream",
    "extract_pages_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "dedup_events",
    "first_event_per_user_type",
    "stream_static_join",
    "click_purchase_join",
    "sessionize_with_state",
    "decontaminate_stream",
    "scrub_stream",
]
