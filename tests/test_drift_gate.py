"""Streaming PSI drift gate: in-distribution batches admitted, drifted
batches quarantined (kept, not dropped), decisions logged, exactly-once
across restarts."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.streaming import drift_gate

SCHEMA = "doc_id long, text string"

# reference corpus: ~40-token docs (bin 2 at width 20)
NORMAL = " ".join(["tok"] * 40)
SHORT = "tok tok"  # bin 0 — a degenerate-crawl symptom


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


def test_batch_psi_zero_on_identical_distribution(spark):
    ref_df = spark.createDataFrame([(i, NORMAL) for i in range(50)], SCHEMA)
    ref = drift_gate.reference_counts(ref_df)
    psi, n = drift_gate.batch_psi_stats(ref_df, ref)
    assert psi == 0.0 and n == 50
    drifted = spark.createDataFrame([(i, SHORT) for i in range(50)], SCHEMA)
    assert drift_gate.batch_psi(drifted, ref) > 0.25


def test_write_reference_roundtrip_is_bounded_and_psi_zero(spark, tmp_path):
    # the persisted reference must be the PRE-AGGREGATED (bin, n) form
    # (<= bins rows however large the snapshot) and round-trip through
    # batch_psi as exactly 0.0 on the same data (VERDICT r5 #3)
    ref_path = str(tmp_path / "ref")
    snap = spark.createDataFrame(
        [(i, NORMAL) for i in range(80)] + [(100 + i, SHORT) for i in range(20)],
        SCHEMA,
    )
    drift_gate.write_reference(snap, ref_path, bins=10)
    persisted = spark.read.parquet(ref_path)
    assert persisted.count() <= 10
    assert sorted(persisted.columns) == ["bin", "n"]
    assert persisted.agg(F.sum("n")).collect()[0][0] == 100
    assert drift_gate.batch_psi(snap, persisted) == 0.0


def test_gate_admits_normal_quarantines_drifted_and_logs(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "out")
    ref = str(tmp_path / "ref")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inbox)
    drift_gate.write_reference(
        spark.createDataFrame([(i, NORMAL) for i in range(100)], SCHEMA), ref
    )
    _write(os.path.join(inbox, "f0.parquet"), [(i, NORMAL) for i in range(20)])
    _write(os.path.join(inbox, "f1.parquet"), [(100 + i, SHORT) for i in range(20)])
    drift_gate.run_drift_gate_available_now(
        spark, inbox, SCHEMA, out, ref, ckpt
    )
    admitted = spark.read.parquet(f"{out}/admitted")
    quarantined = spark.read.parquet(f"{out}/quarantined")
    assert admitted.count() == 20 and quarantined.count() == 20
    assert admitted.agg(F.max("doc_id")).collect()[0][0] < 100  # normal file
    assert quarantined.agg(F.min("doc_id")).collect()[0][0] >= 100
    decisions = {
        r["admitted"]: r for r in spark.read.parquet(f"{out}/decisions").collect()
    }
    assert decisions[True]["psi"] <= 0.25 < decisions[False]["psi"]
    assert decisions[True]["n_docs"] == decisions[False]["n_docs"] == 20

    # restart: nothing reprocessed, a new drifted file gates correctly
    _write(os.path.join(inbox, "f2.parquet"), [(200 + i, SHORT) for i in range(10)])
    drift_gate.run_drift_gate_available_now(
        spark, inbox, SCHEMA, out, ref, ckpt
    )
    assert spark.read.parquet(f"{out}/admitted").count() == 20  # unchanged
    assert spark.read.parquet(f"{out}/quarantined").count() == 30
    assert spark.read.parquet(f"{out}/decisions").count() == 3
