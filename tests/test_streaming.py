"""Streaming mode tests — SURVEY.md §2.E.

Combine-as-stream must equal combine-as-batch on the same inbox, then
keep upserting incrementally from the same checkpoint; windowed event
aggregations must equal their batch forms when drained with
``Trigger.AvailableNow``.
"""

from __future__ import annotations

import csv
import os
import shutil

import pytest
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.config import EngineConfig
from reddit_apache_airflow_postgres_pipeline_spark.streaming import (
    MemoryUpsertTarget,
    dedup_within_watermark,
    read_events_stream,
    run_available_now,
    start_combine_stream,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"

CUR_COLS = [
    "thing_key", "thing_type", "id", "created_at", "score", "num_comments",
    "title_sanitized", "author_hash", "permalink", "subreddit", "flair_text",
]


def _write_current(path: str, rows: list[list[str]]) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(CUR_COLS)
        w.writerows(rows)


def _write_legacy(path: str, rows: list[list[str]]) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "author", "title", "score", "num_comments", "created_at", "permalink"])
        w.writerows(rows)


def _row(key: str, score: str, title: str) -> list[str]:
    return [key, "t3", f"id-{key}", "2026-08-13T00:00:00Z", score, "1",
            title, f"h-{key}", f"/r/x/{key}", "S", ""]


@pytest.fixture()
def stream_cfg(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    return EngineConfig(
        gdpr_salt="test-salt",
        data_dir=str(data),
        combine_dir=str(tmp_path / "combined"),
        loaded_dir=str(tmp_path / "loaded"),
    )


def _drain(spark, cfg, ckpt, target):
    q = start_combine_stream(spark, cfg, ckpt, target.merge)
    q.awaitTermination()


def test_combine_stream_matches_batch_then_upserts(spark, stream_cfg, tmp_path):
    cfg = stream_cfg
    _write_current(os.path.join(cfg.data_dir, "italytravel_a.csv"),
                   [_row("k1", "5", "first"), _row("k2", "9", "other")])
    # duplicate k1 in a later file — first-wins within the batch
    _write_current(os.path.join(cfg.data_dir, "italytravel_b.csv"),
                   [_row("k1", "77", "later-должен-проиграть")])
    _write_legacy(os.path.join(cfg.data_dir, "italytravel_c.csv"),
                  [["zzz", "someone", "legacy row", "3", "0",
                    "2026-08-13T01:00:00Z", "/r/x/zzz"]])

    ckpt = str(tmp_path / "ckpt")
    target = MemoryUpsertTarget()
    _drain(spark, cfg, ckpt, target)

    got = {r["thing_key"]: r.asDict() for r in target.df(spark).collect()}
    assert len(got) == 3  # k1, k2, derived key for legacy zzz
    assert got["k1"]["score"] == "5"  # first file won
    assert got["k1"]["title_sanitized"] == "first"
    # inbox drained, files archived (A11 parity)
    assert sorted(os.listdir(cfg.data_dir)) == []
    assert len(os.listdir(cfg.loaded_dir)) == 3

    # second tick: new file updates k1's mutable cols, immutables persist
    _write_current(os.path.join(cfg.data_dir, "italytravel_d.csv"),
                   [["k1", "t3", "SHOULD-NOT-WIN", "2099-01-01T00:00:00Z", "50",
                     "8", "updated title", "hX", "/r/x/NEW", "S2", "F"],
                    _row("k9", "4", "brand new")])
    _drain(spark, cfg, ckpt, target)

    got = {r["thing_key"]: r.asDict() for r in target.df(spark).collect()}
    assert len(got) == 4
    assert got["k1"]["score"] == "50"  # updatable (README.md:188-195)
    assert got["k1"]["title_sanitized"] == "updated title"
    assert got["k1"]["id"] == "id-k1"  # immutable preserved
    assert got["k1"]["created_at"] == "2026-08-13T00:00:00Z"
    assert got["k9"]["score"] == "4"

    # third tick with NOTHING new: no change, nothing re-processed
    _drain(spark, cfg, ckpt, target)
    assert len(target.df(spark).collect()) == 4


def test_tumbling_counts_stream_equals_batch(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "events.parquet")

    stream = tumbling_counts(read_events_stream(spark, str(src)))
    run_available_now(stream, str(tmp_path / "ckpt"), "t_tumbling")
    got = spark.table("t_tumbling")

    from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table

    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "dups"
    from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table

    base = load_table(spark, SF, "events").limit(50)
    base.unionAll(base).write.parquet(str(src))  # every event delivered twice

    stream = dedup_within_watermark(
        read_events_stream(spark, str(src), nanos=False), ["event_id"], watermark="10 minutes"
    )
    run_available_now(stream, str(tmp_path / "ckpt"), "t_dedup")
    assert spark.table("t_dedup").count() == 50


def test_stateful_user_totals(spark, tmp_path):
    from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table
    from reddit_apache_airflow_postgres_pipeline_spark.streaming.stateful import user_totals_stream

    src = tmp_path / "ev"
    base = load_table(spark, SF, "events").limit(500)
    base.write.parquet(str(src))

    stream = user_totals_stream(read_events_stream(spark, str(src), nanos=False))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_user_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last row per user = final totals; single batch -> rows are final
    got = {
        r["user_id"]: r
        for r in spark.table("t_user_totals").collect()
    }
    want = {
        r["user_id"]: r
        for r in base.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchases"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid in want:
        assert got[uid]["n_events"] == want[uid]["n_events"]
        assert got[uid]["n_purchases"] == want[uid]["n_purchases"]
        assert abs(got[uid]["total_value"] - want[uid]["total_value"]) < 1e-6


def test_combine_stream_crash_recovery(spark, stream_cfg, tmp_path):
    """Kill the combine stream mid-inbox (merge raises on the 2nd
    micro-batch) and restart from the checkpoint: committed batches are
    NOT re-merged (exactly-once input), the failed batch re-runs, and
    inbox/archive converge — the contract documented in
    streaming/combine_stream.py. Keys are disjoint per file so the final
    state is independent of file-pickup order."""
    cfg = stream_cfg
    _write_current(os.path.join(cfg.data_dir, "italytravel_a.csv"),
                   [_row("k1", "5", "first")])
    _write_current(os.path.join(cfg.data_dir, "italytravel_b.csv"),
                   [_row("k2", "9", "second")])
    _write_current(os.path.join(cfg.data_dir, "italytravel_c.csv"),
                   [_row("k3", "4", "third")])

    ckpt = str(tmp_path / "ckpt")
    target = MemoryUpsertTarget()
    merged_batches: list[list[str]] = []
    state = {"invocations": 0}

    def flaky_merge(df, epoch):
        state["invocations"] += 1
        if state["invocations"] == 2:
            raise RuntimeError("injected crash mid-inbox")
        merged_batches.append(sorted(r["thing_key"] for r in df.collect()))
        target.merge(df, epoch)

    q = start_combine_stream(spark, cfg, ckpt, flaky_merge,
                             max_files_per_trigger=1)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()

    # crash state: exactly one batch committed+archived; the failed
    # batch's file must still be in the inbox (archive runs post-merge)
    assert len(merged_batches) == 1
    assert len(os.listdir(cfg.loaded_dir)) == 1
    assert len(os.listdir(cfg.data_dir)) == 2

    def clean_merge(df, epoch):
        merged_batches.append(sorted(r["thing_key"] for r in df.collect()))
        target.merge(df, epoch)

    q = start_combine_stream(spark, cfg, ckpt, clean_merge,
                             max_files_per_trigger=1)
    q.awaitTermination()

    # convergence: all keys present, inbox drained, everything archived
    got = {r["thing_key"]: r.asDict() for r in target.df(spark).collect()}
    assert set(got) == {"k1", "k2", "k3"}
    assert got["k2"]["score"] in {"9"}
    assert sorted(os.listdir(cfg.data_dir)) == []
    assert len(os.listdir(cfg.loaded_dir)) == 3
    # exactly-once: each key merged exactly once across crash + restart —
    # the committed pre-crash batch was not re-delivered
    all_keys = [k for batch in merged_batches for k in batch]
    assert sorted(all_keys) == ["k1", "k2", "k3"]


def test_sliding_and_session_streams_equal_batch(spark, tmp_path):
    """Remaining §2.E parity shapes: sliding (hopping) and session
    windows drained with AvailableNow must equal their batch forms on
    the same files (the transform is identical DataFrame code)."""
    import shutil as _shutil

    from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table
    from reddit_apache_airflow_postgres_pipeline_spark.streaming import session_agg, sliding_counts

    src = tmp_path / "events"
    src.mkdir()
    _shutil.copy(f"{SF}/events.parquet", src / "events.parquet")
    batch_events = load_table(spark, SF, "events")

    run_available_now(
        sliding_counts(read_events_stream(spark, str(src))),
        str(tmp_path / "ckpt_sl"), "t_sliding",
    )
    got_sl = spark.table("t_sliding")
    want_sl = (
        batch_events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    assert got_sl.count() == want_sl.count() > 0
    assert got_sl.exceptAll(want_sl).count() == 0
    assert want_sl.exceptAll(got_sl).count() == 0

    run_available_now(
        session_agg(read_events_stream(spark, str(src))),
        str(tmp_path / "ckpt_se"), "t_session",
    )
    got_se = spark.table("t_session")
    want_se = (
        batch_events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("session_start"), F.col("w.end").alias("session_end"),
                "user_id", "n_events", "sum_value")
    )
    assert got_se.count() == want_se.count() > 0
    assert got_se.exceptAll(want_se).count() == 0
    assert want_se.exceptAll(got_se).count() == 0


def test_interval_join_stream_equals_batch(spark, tmp_path):
    """§2.E stream-stream join parity: the watermarked view→click
    interval self-join drained with AvailableNow must equal the batch
    form of the identical code (q_join_interval_attribution)."""
    import shutil as _shutil

    from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table
    from reddit_apache_airflow_postgres_pipeline_spark.streaming import view_click_attribution

    src = tmp_path / "events"
    src.mkdir()
    _shutil.copy(f"{SF}/events.parquet", src / "events.parquet")

    run_available_now(
        view_click_attribution(read_events_stream(spark, str(src))),
        str(tmp_path / "ckpt_ij"), "t_ijoin",
    )
    got = spark.table("t_ijoin")
    want = view_click_attribution(load_table(spark, SF, "events"))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_static_enrichment_equals_batch(spark, tmp_path):
    """Stream-static join parity: enriching a streaming events source
    with a static dimension must equal the same join in batch."""
    import shutil as _shutil

    from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table
    from reddit_apache_airflow_postgres_pipeline_spark.streaming import enrich_with_static

    src = tmp_path / "events"
    src.mkdir()
    _shutil.copy(f"{SF}/events.parquet", src / "events.parquet")
    dim = spark.createDataFrame(
        [("view", "engage"), ("click", "engage"), ("purchase", "convert")],
        ["event_type", "category"],
    )
    enriched = enrich_with_static(
        read_events_stream(spark, str(src)), dim, "event_type"
    ).select("event_id", "event_type", "category")
    run_available_now(enriched, str(tmp_path / "ckpt_en"), "t_enrich")
    got = spark.table("t_enrich")
    want = enrich_with_static(
        load_table(spark, SF, "events"), dim, "event_type"
    ).select("event_id", "event_type", "category")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_sliding_chunks_stream_equals_batch(spark, tmp_path):
    """The RAG chunker is stateless map work, so it must run unchanged
    on a readStream source and produce the batch-identical chunk set —
    the property that lets one pipeline definition serve both backfill
    and continuous ingestion."""
    import shutil as _sh

    from reddit_apache_airflow_postgres_pipeline_spark.operators.chunking import sliding_chunks
    from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table

    src = tmp_path / "docs"
    src.mkdir()
    _sh.copy(f"{SF}/documents.parquet", src / "documents.parquet")

    batch_docs = load_table(spark, SF, "documents")
    sch = batch_docs.schema
    stream_docs = spark.readStream.schema(sch).parquet(str(src))
    stream = sliding_chunks(stream_docs, chunk_tokens=24, overlap=8)
    run_available_now(stream, str(tmp_path / "ckpt_chunks"), "t_chunks")
    got = spark.table("t_chunks")

    batch = sliding_chunks(batch_docs, chunk_tokens=24, overlap=8)
    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
