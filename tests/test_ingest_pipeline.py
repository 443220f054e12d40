"""End-to-end streaming ingest stack: drift quarantine, near-dup
rejection, sketch state over the surviving corpus, and restart
idempotence across the whole chain."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators.sketches import hll_estimate
from reddit_apache_airflow_postgres_pipeline_spark.streaming import (
    cms_stream,
    drift_gate,
    hll_stream,
    ingest_pipeline,
)

SCHEMA = "doc_id long, text string"
NORMAL_A = "alpha beta gamma delta " * 10  # ~40 tokens, bin 2
NORMAL_B = "epsilon zeta eta theta " * 10
SHORT = "x y"  # drifted: bin 0


def _write(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        path,
    )


def test_full_chain_and_restart(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    work = str(tmp_path / "work")
    ref = str(tmp_path / "ref")
    os.makedirs(inbox)
    drift_gate.write_reference(
        spark.createDataFrame(
            [(i, NORMAL_A) for i in range(50)] + [(50 + i, NORMAL_B) for i in range(50)],
            SCHEMA,
        ),
        ref,
    )
    # f0: clean docs; f1: drifted batch (quarantined whole);
    # f2: near-duplicates of f0 (admitted by drift, rejected by dedup)
    _write(os.path.join(inbox, "f0.parquet"),
           [(1, NORMAL_A), (2, NORMAL_B)])
    _write(os.path.join(inbox, "f1.parquet"),
           [(10 + i, SHORT) for i in range(20)])
    _write(os.path.join(inbox, "f2.parquet"),
           [(100, NORMAL_A), (101, NORMAL_B)])
    p = ingest_pipeline.run_ingest_pipeline_available_now(
        spark, inbox, SCHEMA, work, ref
    )

    quarantined = spark.read.parquet(os.path.join(p["drift"], "quarantined"))
    assert quarantined.count() == 20  # the whole drifted batch
    accepted = spark.read.parquet(os.path.join(p["accepted"], "batch_id=*"))
    ids = {r["doc_id"] for r in accepted.collect()}
    assert ids == {1, 2}  # dups 100/101 rejected by the content gate

    # sketches reflect ONLY the surviving corpus: 8 distinct tokens
    est = hll_estimate(hll_stream.read_sketch(spark, p["hll"]), p=5).collect()
    assert abs(est[0]["est"] - 8) / 8 < 0.6
    cms = cms_stream.read_sketch(spark, p["cms"])
    total = cms.filter(F.col("row") == 0).agg(F.sum("c")).collect()[0][0]
    assert total == 80  # 2 docs x 40 tokens

    # restart: nothing reprocessed anywhere in the chain
    p2 = ingest_pipeline.run_ingest_pipeline_available_now(
        spark, inbox, SCHEMA, work, ref
    )
    assert p2 == p
    assert spark.read.parquet(os.path.join(p["accepted"], "batch_id=*")).count() == 2
    assert spark.read.parquet(os.path.join(p["drift"], "decisions")).count() == 3

    # a new clean file flows through every stage incrementally
    # ~40 tokens so the new doc matches the reference length profile
    _write(os.path.join(inbox, "f3.parquet"), [(200, "iota kappa " * 20)])
    ingest_pipeline.run_ingest_pipeline_available_now(
        spark, inbox, SCHEMA, work, ref
    )
    assert spark.read.parquet(os.path.join(p["accepted"], "batch_id=*")).count() == 3
    total2 = (
        cms_stream.read_sketch(spark, p["cms"])
        .filter(F.col("row") == 0)
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    assert total2 == 120  # +40 tokens from the new doc


def test_all_quarantined_skips_later_stages(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    work = str(tmp_path / "work")
    ref = str(tmp_path / "ref")
    os.makedirs(inbox)
    drift_gate.write_reference(
        spark.createDataFrame([(i, NORMAL_A) for i in range(50)], SCHEMA), ref
    )
    _write(os.path.join(inbox, "f0.parquet"), [(1, SHORT), (2, SHORT)])
    p = ingest_pipeline.run_ingest_pipeline_available_now(
        spark, inbox, SCHEMA, work, ref
    )
    assert spark.read.parquet(os.path.join(p["drift"], "quarantined")).count() == 2
    # no admitted batches: the dedup/sketch stages skipped cleanly
    assert not os.path.isdir(p["accepted"]) or not os.listdir(p["accepted"])
    assert not os.path.isdir(p["cms"])
