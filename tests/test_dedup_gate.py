"""Streaming MinHash dedup gate: admission semantics, cross-run state,
and checkpointed exactly-once file processing."""

from __future__ import annotations

import os

from reddit_apache_airflow_postgres_pipeline_spark.streaming import dedup_gate

SCHEMA = "doc_id long, text string"

A = "the quick brown fox jumps over the lazy dog near the river bank today"
B = "completely different content about spark shuffles and parquet footers"
C = "a third unrelated document describing watermark semantics in streams"


def _write(spark, path, rows):
    # a single real parquet FILE (not a Spark output directory) — the
    # file stream source lists flat files in the inbox
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, path)


def test_gate_batch_rejects_copies_first_wins(spark):
    batch = spark.createDataFrame(
        [(1, A), (2, A), (3, B)], SCHEMA  # 2 is an exact copy of 1
    )
    state = spark.createDataFrame([], "doc long, bk string")
    accepted, keys = dedup_gate.gate_batch(batch, state)
    assert sorted(r["doc_id"] for r in accepted.collect()) == [1, 3]
    # only accepted docs contribute state
    assert sorted(set(r["doc"] for r in keys.collect())) == [1, 3]


def test_gate_batch_rejects_against_prior_state(spark):
    batch = spark.createDataFrame([(4, A), (5, C)], SCHEMA)
    state0 = spark.createDataFrame([], "doc long, bk string")
    _, keys1 = dedup_gate.gate_batch(
        spark.createDataFrame([(1, A)], SCHEMA), state0
    )
    accepted, _ = dedup_gate.gate_batch(batch, keys1)
    assert [r["doc_id"] for r in accepted.collect()] == [5]


def test_run_gate_streaming_state_and_checkpoint(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inbox)

    # run 1: one file, one in-batch copy
    _write(spark, os.path.join(inbox, "f1.parquet"), [(1, A), (2, A), (3, B)])
    dedup_gate.run_gate_available_now(
        spark, inbox, SCHEMA, out, state, ckpt
    )
    got1 = sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    )
    assert got1 == [1, 3]

    # run 2 (restart): a new file arrives; 4 duplicates the accepted
    # corpus, 5 is novel. The checkpoint must skip f1 entirely.
    _write(spark, os.path.join(inbox, "f2.parquet"), [(4, A), (5, C)])
    dedup_gate.run_gate_available_now(
        spark, inbox, SCHEMA, out, state, ckpt
    )
    got2 = sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    )
    assert got2 == [1, 3, 5]

    # state holds band keys only for admitted docs
    state_docs = sorted(
        set(r["doc"] for r in spark.read.parquet(state).collect())
    )
    assert state_docs == [1, 3, 5]

    # run 3: nothing new → no change (exactly-once over files)
    dedup_gate.run_gate_available_now(
        spark, inbox, SCHEMA, out, state, ckpt
    )
    got3 = sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    )
    assert got3 == [1, 3, 5]
