"""Text-native index maintenance: raw documents stream into a persisted
served ANN index with the featurization inside the drain
(streaming/vector_index_stream.run_text_index_append_available_now +
sinks/text_index.py), parity-pinned against the batch embed path and
wired as stage 5 of the full ingest chain — the r10 verdict's #1:
an admitted document becomes servable with no manual embed hop."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators import similarity
from reddit_apache_airflow_postgres_pipeline_spark.sinks import text_index as ti
from reddit_apache_airflow_postgres_pipeline_spark.sinks import vector_index as vi
from reddit_apache_airflow_postgres_pipeline_spark.streaming import counting_state as cs
from reddit_apache_airflow_postgres_pipeline_spark.streaming.vector_index_stream import (
    run_text_index_append_available_now,
)

SF = "/root/testdata/sf0.001"
DSCHEMA = "doc_id long, text string"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _write_file(df, path, age_s: float = 0.0):
    df.toPandas().to_parquet(path)
    if age_s:
        past = time.time() - age_s
        os.utime(path, (past, past))


def test_text_index_serves_identical_topk_to_batch_embed_path(spark, tmp_path):
    """The q_text_embed_ivfpq parity pin the verdict asked for: a
    persisted text index built from raw documents serves EXACTLY the
    top-k the one-plan batch path (embed_text → ivfpq_topk) computes on
    the same docs with the same params."""
    docs = _docs(spark)
    qdocs = docs.filter(F.col("doc_id") < 8)
    ix = str(tmp_path / "ix")
    ti.write_text_index(
        docs, ix, kind="ivfpq", d=8, n=2, salt="emb",
        n_cells=16, m=4, n_codes=16, iters=1,
    )
    got = sorted(map(tuple, ti.query_text_index(
        spark, ix, qdocs, k=5, n_probe=4
    ).collect()))
    e = similarity.embed_text(docs, d=8, n=2, salt="emb")
    q = similarity.embed_text(qdocs, d=8, n=2, salt="emb")
    want = sorted(map(tuple, similarity.ivfpq_topk(
        e, q, n_cells=16, n_probe=4, m=4, n_codes=16, k=5, iters=1,
        id_col="doc_id",
    ).collect()))
    assert got == want and len(got) == 8 * 5


def test_streamed_text_appends_equal_batch_appends_and_restart(spark, tmp_path):
    """Stream-vs-batch parity for the text drain: raw document FILES
    drained through the stream produce a store row-identical to batch
    append_text_to_index calls on the same docs, a restart drains
    nothing, and stream batch ids live in the reserved range. Also the
    meta guard: appending text to a non-text index fails loudly."""
    docs = _docs(spark)
    qdocs = docs.filter(F.col("doc_id") < 6)
    a = docs.filter(F.col("doc_id") < 300)
    b1 = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    b2 = docs.filter(F.col("doc_id") >= 400)

    streamed = str(tmp_path / "streamed")
    ti.write_text_index(a, streamed, kind="ivfpq", n_cells=16)
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    _write_file(b1, os.path.join(inbox, "d0.parquet"), age_s=20)
    _write_file(b2, os.path.join(inbox, "d1.parquet"), age_s=10)
    ckpt = str(tmp_path / "ckpt")
    run_text_index_append_available_now(
        spark, inbox, DSCHEMA, streamed, ckpt
    )

    batch = str(tmp_path / "batch")
    ti.write_text_index(a, batch, kind="ivfpq", n_cells=16)
    ti.append_text_to_index(b1, batch)
    ti.append_text_to_index(b2, batch)

    got_codes = sorted(map(tuple, vi.read_codes(spark, streamed).select(
        "neighbor_id", "sub", "code", "cell").collect()))
    want_codes = sorted(map(tuple, vi.read_codes(spark, batch).select(
        "neighbor_id", "sub", "code", "cell").collect()))
    assert got_codes == want_codes
    got = sorted(map(tuple, ti.query_text_index(
        spark, streamed, qdocs, k=5, n_probe=4).collect()))
    want = sorted(map(tuple, ti.query_text_index(
        spark, batch, qdocs, k=5, n_probe=4).collect()))
    assert got == want

    # restart: checkpoint drains nothing, store unchanged
    ids = set(cs.state_subdirs(f"{streamed}/codes").values())
    assert {i for i in ids if i >= vi.STREAM_ID_BASE} == {
        vi.STREAM_ID_BASE, vi.STREAM_ID_BASE + 1
    }
    run_text_index_append_available_now(
        spark, inbox, DSCHEMA, streamed, ckpt
    )
    assert set(cs.state_subdirs(f"{streamed}/codes").values()) == ids

    # a raw-vector index has no text meta: the text surface fails loud
    raw = str(tmp_path / "raw")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    vi.write_ivfpq_index(e, raw, n_cells=8)
    with pytest.raises(ValueError, match="not a text index"):
        ti.append_text_to_index(docs.limit(1), raw)
    with pytest.raises(ValueError, match="not a text index"):
        run_text_index_append_available_now(
            spark, inbox, DSCHEMA, raw, str(tmp_path / "ckpt2")
        )


def test_full_chain_index_stage_serves_admitted_docs(spark, tmp_path):
    """The composed loop (r10 verdict #1): drift gate → dedup gate →
    span gate → sketches → TEXT INDEX. The validated snapshot both
    freezes the drift reference and trains the index quantizers; after
    one drain the index serves exactly snapshot ∪ span-survivors (the
    quarantined batch and the near-dup rejects never reach it), the
    store equals a batch append of the spanned corpus, and a chain
    restart appends nothing."""
    from reddit_apache_airflow_postgres_pipeline_spark.streaming import (
        drift_gate,
        ingest_pipeline,
    )

    NORMAL_A = "alpha beta gamma delta " * 10
    NORMAL_B = "epsilon zeta eta theta " * 10
    SHORT = "x y"

    snapshot = spark.createDataFrame(
        [(i, NORMAL_A) for i in range(50)]
        + [(50 + i, NORMAL_B) for i in range(50)],
        DSCHEMA,
    )
    ref = str(tmp_path / "ref")
    drift_gate.write_reference(snapshot, ref)
    ix = str(tmp_path / "ix")
    ti.write_text_index(snapshot, ix, kind="ivfpq", n_cells=4, m=4, n_codes=8)

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)

    def _w(name, rows, age_s):
        _write_file(
            spark.createDataFrame(rows, DSCHEMA), os.path.join(inbox, name),
            age_s=age_s,
        )

    _w("f0.parquet", [(1001, NORMAL_A + "iota kappa"),
                      (1002, NORMAL_B + "lambda mu")], 30)
    _w("f1.parquet", [(1100 + i, SHORT) for i in range(20)], 20)  # drifted
    _w("f2.parquet", [(1201, NORMAL_A + "iota kappa")], 10)  # near-dup

    work = str(tmp_path / "work")
    p = ingest_pipeline.run_full_ingest_available_now(
        spark, inbox, DSCHEMA, work, ref, index_path=ix
    )
    spanned = spark.read.parquet(os.path.join(p["spanned"], "batch_id=*"))
    surv = {r["doc_id"] for r in spanned.select("doc_id").collect()}
    assert surv == {1001, 1002}

    # the index serves snapshot ∪ survivors and nothing else — compare
    # against the ids embed_text actually emits on the spanned corpus
    # (a doc whose cleaned text is empty embeds to no row, by contract)
    emb_ids = {
        r["doc_id"]
        for r in similarity.embed_text(
            spanned, text_col="text_clean", d=8, n=2, salt="emb"
        ).select("doc_id").collect()
    }
    live = {
        r["neighbor_id"] for r in vi.read_codes(spark, ix).collect()
    }
    assert live == set(range(100)) | emb_ids

    # store equality vs the batch path appending the same spanned corpus
    twin = str(tmp_path / "twin")
    ti.write_text_index(snapshot, twin, kind="ivfpq", n_cells=4, m=4, n_codes=8)
    ti.append_text_to_index(spanned, twin, text_col="text_clean")
    got = sorted(map(tuple, vi.read_codes(spark, ix).select(
        "neighbor_id", "sub", "code", "cell").collect()))
    want = sorted(map(tuple, vi.read_codes(spark, twin).select(
        "neighbor_id", "sub", "code", "cell").collect()))
    assert got == want

    # and the composed index answers a raw-text probe
    probe = spark.createDataFrame([(9001, NORMAL_A)], DSCHEMA)
    res = ti.query_text_index(spark, ix, probe, k=3, n_probe=4).collect()
    assert len(res) == 3

    # chain restart: nothing re-drained anywhere, index untouched
    ids = set(cs.state_subdirs(f"{ix}/codes").values())
    ingest_pipeline.run_full_ingest_available_now(
        spark, inbox, DSCHEMA, work, ref, index_path=ix
    )
    assert set(cs.state_subdirs(f"{ix}/codes").values()) == ids
