"""Pinned corpus snapshots (sinks/snapshots.py): create / read /
verify / diff over a drain-layout corpus, and the documented collision
with right-to-be-forgotten (erasure mutates a pinned dir → the pin
fails loudly instead of silently serving a different corpus)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.sinks import snapshots as snap


def _write_corpus(spark, root: str, gens: int = 3, per_gen: int = 5) -> str:
    """A drain-layout corpus: batch_id=<g> dirs of (doc_id, text)."""
    corpus = os.path.join(root, "corpus")
    for g in range(gens):
        rows = [
            (g * per_gen + i, f"doc {g * per_gen + i} text body")
            for i in range(per_gen)
        ]
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(os.path.join(corpus, f"batch_id={g}"))
    return corpus


def test_create_read_roundtrip_and_partition_column(spark, tmp_path):
    corpus = _write_corpus(spark, str(tmp_path))
    m = snap.create_snapshot(spark, corpus, "v1")
    assert [e["batch_id"] for e in m["batches"]] == [0, 1, 2]
    assert all(e["rows"] == 5 for e in m["batches"])

    df = snap.read_snapshot(spark, corpus, "v1")
    assert df.count() == 15
    # batch_id survives as a partition column via basePath
    assert set(df.select("batch_id").distinct().toPandas()["batch_id"]) == {
        0,
        1,
        2,
    }
    assert snap.list_snapshots(corpus) == ["v1"]


def test_upto_batch_pins_a_prefix_and_later_growth_is_invisible(
    spark, tmp_path
):
    corpus = _write_corpus(spark, str(tmp_path), gens=2)
    snap.create_snapshot(spark, corpus, "early", upto_batch=0)
    # the corpus grows AFTER the pin
    spark.createDataFrame(
        [(99, "late arrival")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(os.path.join(corpus, "batch_id=7"))
    df = snap.read_snapshot(spark, corpus, "early")
    assert df.count() == 5
    assert set(df.toPandas()["doc_id"]) == {0, 1, 2, 3, 4}


def test_recreate_identical_is_idempotent_different_refused(spark, tmp_path):
    corpus = _write_corpus(spark, str(tmp_path), gens=1)
    m1 = snap.create_snapshot(spark, corpus, "v1")
    m2 = snap.create_snapshot(spark, corpus, "v1")  # no-op
    assert m1 == m2
    spark.createDataFrame(
        [(50, "new")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(os.path.join(corpus, "batch_id=1"))
    with pytest.raises(ValueError, match="DIFFERENT contents"):
        snap.create_snapshot(spark, corpus, "v1")
    # a new name pins the grown corpus fine
    m3 = snap.create_snapshot(spark, corpus, "v2")
    assert len(m3["batches"]) == 2


def test_verify_flags_inplace_mutation_and_read_verify_raises(
    spark, tmp_path
):
    corpus = _write_corpus(spark, str(tmp_path))
    snap.create_snapshot(spark, corpus, "pin")
    ok = snap.verify_snapshot(spark, corpus, "pin").toPandas()
    assert ok["ok"].all()

    # mutate batch 1 in place with the SAME row count (forget-style
    # rewrite): only the fingerprint can catch it
    sub = os.path.join(corpus, "batch_id=1")
    df = spark.read.parquet(sub)
    mutated = df.withColumn(
        "text", F.when(F.col("doc_id") == 6, F.lit("REWRITTEN")).otherwise(F.col("text"))
    )
    tmp = sub + "__tmp"
    mutated.write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(sub)
    os.replace(tmp, sub)

    audit = snap.verify_snapshot(spark, corpus, "pin").toPandas()
    by_batch = dict(zip(audit["batch_id"], audit["ok"]))
    assert by_batch == {0: True, 1: False, 2: True}
    # rows matched — the count alone would have blessed the mutation
    row1 = audit[audit["batch_id"] == 1].iloc[0]
    assert row1["rows"] == row1["rows_actual"]

    with pytest.raises(ValueError, match="immutability"):
        snap.read_snapshot(spark, corpus, "pin", verify=True)
    # unverified read still serves (the caller opted out of the audit)
    assert snap.read_snapshot(spark, corpus, "pin").count() == 15


def test_verify_reports_vanished_dir(spark, tmp_path):
    import shutil

    corpus = _write_corpus(spark, str(tmp_path), gens=2)
    snap.create_snapshot(spark, corpus, "pin")
    shutil.rmtree(os.path.join(corpus, "batch_id=1"))
    audit = snap.verify_snapshot(spark, corpus, "pin").toPandas()
    gone = audit[audit["batch_id"] == 1].iloc[0]
    assert not gone["ok"] and gone["rows_actual"] == -1
    with pytest.raises(ValueError, match="no longer exist"):
        snap.read_snapshot(spark, corpus, "pin")


def test_diff_reads_only_the_delta(spark, tmp_path):
    corpus = _write_corpus(spark, str(tmp_path))
    snap.create_snapshot(spark, corpus, "a", upto_batch=0)
    snap.create_snapshot(spark, corpus, "b")
    d = snap.snapshot_diff(spark, corpus, "a", "b")
    pdf = d.toPandas()
    assert set(pdf["batch_id"]) == {1, 2}
    assert len(pdf) == 10
    # the delta plan scans ONLY the two delta dirs
    files = d.inputFiles()
    assert files and all(
        "batch_id=1" in f or "batch_id=2" in f for f in files
    )
    # self-diff is empty with the corpus schema
    empty = snap.snapshot_diff(spark, corpus, "b", "b")
    assert empty.count() == 0 and "doc_id" in empty.columns


def test_diff_refuses_non_nested_pins(spark, tmp_path):
    import shutil

    corpus = _write_corpus(spark, str(tmp_path))
    snap.create_snapshot(spark, corpus, "all")
    # a pin made after batch 0 vanished is NOT an ancestor of "all"
    shutil.rmtree(os.path.join(corpus, "batch_id=0"))
    snap.create_snapshot(spark, corpus, "later")
    with pytest.raises(ValueError, match="append lineage"):
        snap.snapshot_diff(spark, corpus, "all", "later")


def test_manifest_is_atomic_and_spark_blind(spark, tmp_path):
    corpus = _write_corpus(spark, str(tmp_path), gens=1)
    snap.create_snapshot(spark, corpus, "v1")
    # the _snapshots dir must not leak into corpus reads
    assert spark.read.parquet(corpus).count() == 5
    p = os.path.join(corpus, snap.SNAPSHOTS_SUBDIR, "v1.json")
    with open(p) as f:
        m = json.load(f)
    assert m["format"] == snap.SNAPSHOT_FORMAT
    assert not os.path.exists(p + ".tmp")


def test_missing_snapshot_and_bad_names(spark, tmp_path):
    corpus = _write_corpus(spark, str(tmp_path), gens=1)
    with pytest.raises(FileNotFoundError):
        snap.load_manifest(corpus, "nope")
    for bad in ("", "_x", "a/b"):
        with pytest.raises(ValueError, match="invalid snapshot name"):
            snap.create_snapshot(spark, corpus, bad)
    with pytest.raises(ValueError, match="no batch_id"):
        snap.create_snapshot(spark, corpus, "v", upto_batch=-1)


def test_drained_out_dir_is_a_stamped_catalog_corpus(spark, tmp_path):
    """The gate drains stamp their out_dir as admitted-corpus/v1, so
    the estate catalog classifies the corpus (payload store) without
    guessing, and snapshots know its id column."""
    import json

    from reddit_apache_airflow_postgres_pipeline_spark.sinks.catalog import (
        catalog_entry,
    )
    from reddit_apache_airflow_postgres_pipeline_spark.streaming import (
        counting_state as cs,
        dedup_gate,
    )

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 10), (2, "epsilon zeta eta " * 10)],
        "doc_id long, text string",
    ).toPandas().to_parquet(os.path.join(inbox, "f0.parquet"))
    out = str(tmp_path / "out")
    dedup_gate.run_verified_gate_available_now(
        spark, inbox, "doc_id long, text string", out,
        str(tmp_path / "state"), str(tmp_path / "ckpt"),
    )
    with open(os.path.join(out, cs.META)) as f:
        meta = json.load(f)
    assert meta == {
        "format": cs.CORPUS_FORMAT, "id_col": "doc_id", "modality": "text"
    }
    ent = catalog_entry(spark, "out", out)
    assert ent["category"] == "corpus" and ent["n_rows"] == 2
    # and the snapshot layer pins it directly
    m = snap.create_snapshot(spark, out, "v1")
    assert m["batches"][0]["rows"] == 2
    assert snap.read_snapshot(spark, out, "v1", verify=True).count() == 2


def test_backfill_redrain_reproduces_snapshot_fingerprints(spark, tmp_path):
    """Backfill determinism: draining the SAME inbox into a second,
    independent estate yields a corpus whose snapshot manifest —
    per-batch row counts AND content fingerprints — is identical to
    the first's. 'Re-run the pipeline from the archive' reproduces
    the pinned corpus bit-for-bit, which is what makes a snapshot
    name meaningful across estates."""
    from reddit_apache_airflow_postgres_pipeline_spark.streaming import dedup_gate

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    rows0 = [(1, "alpha beta gamma delta " * 8), (2, "epsilon zeta eta " * 8)]
    rows1 = [(3, "theta iota kappa lambda " * 8), (4, "alpha beta gamma delta " * 8)]
    import pandas as pd
    import time

    for i, rows in enumerate((rows0, rows1)):
        p = os.path.join(inbox, f"f{i}.parquet")
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(p)
        past = time.time() - (20 - 10 * i)
        os.utime(p, (past, past))

    manifests = []
    for est in ("a", "b"):
        out = str(tmp_path / est / "out")
        dedup_gate.run_verified_gate_available_now(
            spark, inbox, "doc_id long, text string", out,
            str(tmp_path / est / "state"), str(tmp_path / est / "ckpt"),
        )
        m = snap.create_snapshot(spark, out, "pin")
        manifests.append(m["batches"])
    assert manifests[0] == manifests[1]
    # and the near-dup actually rejected in both (4 dups 1)
    assert sum(e["rows"] for e in manifests[0]) == 3


def test_snapshot_to_training_shards_roundtrip(spark, tmp_path):
    """The terminal composition: pinned corpus -> deterministic split
    -> packed training shards on disk -> re-read equals what was
    written (the trainer's input is a pure function of the pin)."""
    from reddit_apache_airflow_postgres_pipeline_spark.sinks.training_shards import (
        write_training_shards,
    )

    corpus = _write_corpus(spark, str(tmp_path), gens=3, per_gen=6)
    snap.create_snapshot(spark, corpus, "train-v1")
    pinned = snap.read_snapshot(spark, corpus, "train-v1").withColumn(
        "source", F.lit("pin")
    )
    shards = str(tmp_path / "shards")
    written = write_training_shards(
        pinned, shards, chunk_tokens=16, train_pct=60, val_pct=20
    )
    back = spark.read.parquet(shards)
    assert back.count() == 18
    assert set(back.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test"
    }
    # split is the md5 recipe — identical across the write and a
    # recompute from the same pin
    from reddit_apache_airflow_postgres_pipeline_spark.operators.curation import hash_split

    expect = {
        r["doc_id"]: r["split"]
        for r in hash_split(pinned, train_pct=60, val_pct=20).collect()
    }
    got = {r["doc_id"]: r["split"] for r in back.collect()}
    assert got == expect
    assert {r["doc_id"]: r["split"] for r in written.collect()} == expect
