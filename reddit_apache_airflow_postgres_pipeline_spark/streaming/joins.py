"""Watermarked stream-stream joins — SURVEY.md §2.E engine extension.

The reference has no streaming at all (its closest shape is the batch
combine), so like ``events.py`` these are declared extensions: the
missing §2.E capability class after windows/dedup/stateful is the
stream-stream JOIN, which Structured Streaming supports natively when
both sides carry watermarks and the join condition bounds event time on
both inputs (the bound is what lets the engine evict buffered rows —
unbounded state is the failure mode at 100 TB/day).

Batch/stream parity contract (tested): the SAME DataFrame code runs in
both modes; draining the stream form with ``Trigger.AvailableNow`` must
equal the batch registry query ``q_join_interval_attribution``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner join of two (possibly streaming) inputs on ``key`` where
    ``right_ts`` falls in ``[left_ts, left_ts + within]``.

    Both sides get ``watermark`` on their event-time column; with the
    two-sided time bound below, each side's buffered state is evicted
    once the other side's watermark passes ``left_ts + within`` — state
    is O(rows inside the join window), not O(stream).

    The caller must have renamed columns so the two sides share ONLY
    ``key`` (ambiguous names would make the join condition unresolvable
    on a self-join of one source).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


def enrich_with_static(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of ``stream`` is
    joined against the (batch) ``dim`` DataFrame.

    No watermark needed — the static side is re-evaluated per
    micro-batch (so a dim backed by a parquet path picks up file-level
    updates between batches, the cheap slowly-changing-dimension mode).
    Spark broadcasts the dim when it fits; at 100 TB keep dims skinny or
    pre-bucket both sides. Inner/left are the streaming-supported modes
    for a static right side.
    """
    return stream.join(F.broadcast(dim), on, how)


def view_click_attribution(
    events: DataFrame,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Attribution: each click joined to every view by the same user in
    the preceding ``within`` interval (inclusive on both ends).

    Works on a batch OR streaming ``events`` input — the streaming form
    is a self-join of one source, which Structured Streaming plans as
    two scans of the file source sharing a checkpoint.

    Output: ``user_id, view_event_id, click_event_id, delay_s`` —
    event-time columns are dropped so the relation is
    timezone/format-stable across engines.
    """
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = interval_join(
        views, clicks, "user_id", "view_ts", "click_ts", within, watermark
    )
    return joined.select(
        "user_id",
        "view_event_id",
        "click_event_id",
        (
            F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")
        ).alias("delay_s"),
    )
