"""Streaming index maintenance (streaming/vector_index_stream.py):
stream-appended stores equal batch appends, restarts drain nothing,
and stream ids never collide with the build or ad-hoc appends."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.sinks import vector_index as vi
from reddit_apache_airflow_postgres_pipeline_spark.streaming import counting_state as cs
from reddit_apache_airflow_postgres_pipeline_spark.streaming.vector_index_stream import (
    run_index_append_available_now,
)

SF = "/root/testdata/sf0.001"
SCHEMA = "vec_id long, embedding array<float>"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _write_delta_file(df, path):
    df.toPandas().to_parquet(path)


def test_streamed_ivfpq_appends_equal_batch_appends(spark, tmp_path):
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 6)
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    streamed = str(tmp_path / "streamed")
    vi.write_ivfpq_index(e.filter(F.col("vec_id") < 300), streamed, n_cells=16)
    for i, (lo, hi) in enumerate([(300, 400), (400, 500)]):
        p = os.path.join(inbox, f"d{i}.parquet")
        _write_delta_file(
            e.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), p
        )
        past = time.time() - (2 - i) * 10
        os.utime(p, (past, past))
    run_index_append_available_now(
        spark, inbox, SCHEMA, streamed, str(tmp_path / "ckpt"), kind="ivfpq"
    )

    batch = str(tmp_path / "batch")
    vi.write_ivfpq_index(e.filter(F.col("vec_id") < 300), batch, n_cells=16)
    vi.append_to_ivfpq_index(e.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400)), batch)
    vi.append_to_ivfpq_index(e.filter(F.col("vec_id") >= 400), batch)

    got = sorted(map(tuple, vi.query_ivfpq_index(spark, streamed, q, n_probe=4, k=5).collect()))
    want = sorted(map(tuple, vi.query_ivfpq_index(spark, batch, q, n_probe=4, k=5).collect()))
    assert got == want
    # stream ids live in their reserved range, base batch 0 untouched
    ids = set(cs.state_subdirs(f"{streamed}/codes").values())
    assert 0 in ids
    assert {i for i in ids if i >= vi.STREAM_ID_BASE} == {
        vi.STREAM_ID_BASE, vi.STREAM_ID_BASE + 1
    }

    # restart: checkpoint drains nothing, store unchanged
    before = ids
    run_index_append_available_now(
        spark, inbox, SCHEMA, streamed, str(tmp_path / "ckpt"), kind="ivfpq"
    )
    assert set(cs.state_subdirs(f"{streamed}/codes").values()) == before

    # an ad-hoc append after streaming allocates BELOW the stream range
    extra = e.filter(F.col("vec_id") < 0)  # empty delta is fine
    vi.append_to_ivfpq_index(e.filter(F.col("vec_id") < 0), streamed)
    new_ids = set(cs.state_subdirs(f"{streamed}/codes").values()) - before
    assert new_ids == {1}


def test_streamed_ivf_postings_appends(spark, tmp_path):
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 4)
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    path = str(tmp_path / "ix")
    vi.write_ivf_index(e.filter(F.col("vec_id") < 450), path, n_cells=16, refine_iters=1)
    _write_delta_file(e.filter(F.col("vec_id") >= 450), os.path.join(inbox, "d0.parquet"))
    run_index_append_available_now(
        spark, inbox, SCHEMA, path, str(tmp_path / "ckpt"), kind="ivf"
    )
    assert vi.read_postings(spark, path).count() == e.count()
    # queries see the streamed delta
    got = vi.query_ivf_index(spark, path, q, n_probe=16, k=3)
    assert got.count() == 4 * 3


def test_streamed_binary_appends_equal_union_build(spark, tmp_path):
    """kind="binary": streamed sig deltas make the store EXACTLY equal
    a fresh build on the union corpus (no quantizer, no drift), and a
    restart drains nothing new."""
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 6)
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    streamed = str(tmp_path / "streamed")
    vi.write_binary_index(e.filter(F.col("vec_id") < 300), streamed)
    for i, (lo, hi) in enumerate([(300, 400), (400, 500)]):
        p = os.path.join(inbox, f"d{i}.parquet")
        _write_delta_file(
            e.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), p
        )
        past = time.time() - (2 - i) * 10
        os.utime(p, (past, past))
    ckpt = str(tmp_path / "ckpt")
    run_index_append_available_now(
        spark, inbox, SCHEMA, streamed, ckpt, kind="binary"
    )
    union = str(tmp_path / "union")
    vi.write_binary_index(e, union)
    got = sorted(
        map(tuple, vi.query_binary_index(spark, streamed, q, k=5).collect())
    )
    want = sorted(
        map(tuple, vi.query_binary_index(spark, union, q, k=5).collect())
    )
    assert got == want
    n = vi.read_sigs(spark, streamed).count()
    # restart: checkpoint says both files are consumed — nothing new
    run_index_append_available_now(
        spark, inbox, SCHEMA, streamed, ckpt, kind="binary"
    )
    assert vi.read_sigs(spark, streamed).count() == n
    # stream ids landed above the base so ad-hoc appends can't collide
    ids = set(cs.state_subdirs(f"{streamed}/sigs").values())
    assert any(i >= vi.STREAM_ID_BASE for i in ids)


def test_streamed_deletes_shadow_then_threshold_compaction_drops(spark, tmp_path):
    """The erasure queue: id files drain into tombstones exactly-once
    (shadowed immediately), a restart reprocesses nothing, and crossing
    the threshold triggers the FULL compaction that physically drops
    the rows and GCs the absorbed tombstone dirs."""
    from reddit_apache_airflow_postgres_pipeline_spark.streaming.vector_index_stream import (
        run_index_delete_available_now,
    )

    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 4)
    ix = str(tmp_path / "ix")
    vi.write_ivfpq_index(e, ix, n_cells=8)
    inbox = str(tmp_path / "del_inbox")
    os.makedirs(inbox)
    served = vi.query_ivfpq_index(spark, ix, q, n_probe=8, k=5).collect()
    victims = sorted({r["neighbor_id"] for r in served})[:2]
    for i, v in enumerate(victims):
        p = os.path.join(inbox, f"e{i}.parquet")
        _write_delta_file(e.filter(F.col("vec_id") == v).select("vec_id"), p)
        past = time.time() - (2 - i) * 10
        os.utime(p, (past, past))
    ckpt = str(tmp_path / "ckpt")
    run_index_delete_available_now(
        spark, inbox, "vec_id long", ix, ckpt, kind="ivfpq"
    )
    live = {
        r["neighbor_id"]
        for r in vi.query_ivfpq_index(spark, ix, q, n_probe=8, k=50).collect()
    }
    assert not (set(victims) & live)
    # stream tombstone ids live in the reserved range
    ids = set(cs.state_subdirs(f"{ix}/tombstones").values())
    assert ids == {vi.STREAM_ID_BASE, vi.STREAM_ID_BASE + 1}

    # restart: checkpoint drains nothing
    run_index_delete_available_now(
        spark, inbox, "vec_id long", ix, ckpt, kind="ivfpq"
    )
    assert set(cs.state_subdirs(f"{ix}/tombstones").values()) == ids

    # threshold crossing (compact_after_dirs=1): a third erasure file
    # triggers the full compaction — tombstones absorbed + GC'd, ids
    # physically gone from the raw codes store
    third = sorted({r["neighbor_id"] for r in served} - set(victims))[0]
    p = os.path.join(inbox, "e2.parquet")
    _write_delta_file(e.filter(F.col("vec_id") == third).select("vec_id"), p)
    run_index_delete_available_now(
        spark, inbox, "vec_id long", ix, ckpt, kind="ivfpq",
        compact_after_dirs=1,
    )
    assert vi.read_tombstones(spark, ix) is None
    raw = {r["neighbor_id"] for r in spark.read.parquet(f"{ix}/codes").collect()}
    assert not ({*victims, third} & raw)
    assert len(raw) == 500 - 3
    # and the store still serves correctly post-GC
    still = {
        r["neighbor_id"]
        for r in vi.query_ivfpq_index(spark, ix, q, n_probe=8, k=50).collect()
    }
    assert not ({*victims, third} & still) and len(still) > 0
