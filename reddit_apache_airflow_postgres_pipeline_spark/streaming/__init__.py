from reddit_apache_airflow_postgres_pipeline_spark.streaming.combine_stream import (
    MemoryUpsertTarget,
    start_combine_stream,
)
from reddit_apache_airflow_postgres_pipeline_spark.streaming.events import (
    dedup_within_watermark,
    read_events_stream,
    run_available_now,
    session_agg,
    sliding_counts,
    tumbling_counts,
)
from reddit_apache_airflow_postgres_pipeline_spark.streaming.joins import (
    enrich_with_static,
    interval_join,
    view_click_attribution,
)
from reddit_apache_airflow_postgres_pipeline_spark.streaming.stateful import user_totals_stream

__all__ = [
    "MemoryUpsertTarget",
    "start_combine_stream",
    "dedup_within_watermark",
    "read_events_stream",
    "run_available_now",
    "session_agg",
    "sliding_counts",
    "tumbling_counts",
    "enrich_with_static",
    "interval_join",
    "view_click_attribution",
    "user_totals_stream",
]
