"""Media-native index maintenance: raw binary payloads stream into a
persisted served ANN index with the featurization inside the drain
(streaming/vector_index_stream.run_media_index_append_available_now +
sinks/media_index.py), parity-pinned against the batch feature path —
the media twin of the text drain: an arriving image/audio/video payload
becomes servable with no manual feature hop."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators import multimodal as mm
from reddit_apache_airflow_postgres_pipeline_spark.operators import similarity
from reddit_apache_airflow_postgres_pipeline_spark.sinks import media_index as mi
from reddit_apache_airflow_postgres_pipeline_spark.sinks import vector_index as vi
from reddit_apache_airflow_postgres_pipeline_spark.streaming import counting_state as cs
from reddit_apache_airflow_postgres_pipeline_spark.streaming.vector_index_stream import (
    run_media_index_append_available_now,
)

SF = "/root/testdata/sf0.001"
MSCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int,height:int,sample_rate:int,n_frames:int,fmt:string>"
)


def _media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    return mm.media_from_documents(docs)


def _write_file(df, path, age_s: float = 0.0):
    """Land df as ONE parquet file at path (binary+struct columns rule
    out the pandas writer the text tests use)."""
    tmp = path + "__tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, path)
    shutil.rmtree(tmp)
    if age_s:
        past = time.time() - age_s
        os.utime(path, (past, past))


def test_media_index_serves_identical_topk_to_batch_feature_path(spark, tmp_path):
    """The q_media_ivfpq_topk parity pin, store-shaped: a persisted
    media index built from raw payloads serves EXACTLY the top-k the
    one-plan batch path (byte_histogram_features → ivfpq_topk) computes
    on the same media with the same params."""
    media = _media(spark)
    qmedia = media.filter(F.col("media_id") < 8)
    ix = str(tmp_path / "ix")
    mi.write_media_index(
        media, ix, kind="ivfpq", n_cells=16, m=4, n_codes=16, iters=1
    )
    got = sorted(map(tuple, mi.query_media_index(
        spark, ix, qmedia, k=5, n_probe=4
    ).collect()))
    feats = (
        mm.byte_histogram_features(media.filter(F.length("payload") > 0))
        .select(F.col("media_id").alias("vec_id"), F.col("feat").alias("embedding"))
    )
    want = sorted(map(tuple, similarity.ivfpq_topk(
        feats, feats.filter(F.col("vec_id") < 8),
        n_cells=16, n_probe=4, m=4, n_codes=16, k=5, iters=1,
    ).collect()))
    assert got == want and len(got) == 8 * 5


def test_streamed_media_appends_equal_batch_appends_and_restart(spark, tmp_path):
    """Stream-vs-batch parity for the media drain: raw media FILES
    drained through the stream produce a store row-identical to batch
    append_media_to_index calls on the same payloads, a restart drains
    nothing, and stream batch ids live in the reserved range. Also the
    meta guard: appending media to a non-media index fails loudly."""
    media = _media(spark)
    qmedia = media.filter(F.col("media_id") < 6)
    a = media.filter(F.col("media_id") < 300)
    b1 = media.filter((F.col("media_id") >= 300) & (F.col("media_id") < 400))
    b2 = media.filter(F.col("media_id") >= 400)

    streamed = str(tmp_path / "streamed")
    mi.write_media_index(a, streamed, kind="ivfpq", n_cells=16)
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    _write_file(b1, os.path.join(inbox, "m0.parquet"), age_s=20)
    _write_file(b2, os.path.join(inbox, "m1.parquet"), age_s=10)
    ckpt = str(tmp_path / "ckpt")
    run_media_index_append_available_now(
        spark, inbox, MSCHEMA, streamed, ckpt
    )

    batch = str(tmp_path / "batch")
    mi.write_media_index(a, batch, kind="ivfpq", n_cells=16)
    mi.append_media_to_index(b1, batch)
    mi.append_media_to_index(b2, batch)

    got_codes = sorted(map(tuple, vi.read_codes(spark, streamed).select(
        "neighbor_id", "sub", "code", "cell").collect()))
    want_codes = sorted(map(tuple, vi.read_codes(spark, batch).select(
        "neighbor_id", "sub", "code", "cell").collect()))
    assert got_codes == want_codes
    got = sorted(map(tuple, mi.query_media_index(
        spark, streamed, qmedia, k=5, n_probe=4).collect()))
    want = sorted(map(tuple, mi.query_media_index(
        spark, batch, qmedia, k=5, n_probe=4).collect()))
    assert got == want

    # restart: checkpoint drains nothing, store unchanged
    ids = set(cs.state_subdirs(f"{streamed}/codes").values())
    assert {i for i in ids if i >= vi.STREAM_ID_BASE} == {
        vi.STREAM_ID_BASE, vi.STREAM_ID_BASE + 1
    }
    run_media_index_append_available_now(
        spark, inbox, MSCHEMA, streamed, ckpt
    )
    assert set(cs.state_subdirs(f"{streamed}/codes").values()) == ids

    # a raw-vector index has no media meta: the media surface fails loud
    raw = str(tmp_path / "raw")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    vi.write_ivfpq_index(e, raw, n_cells=8)
    with pytest.raises(ValueError, match="not a media index"):
        mi.append_media_to_index(media.limit(1), raw)
    with pytest.raises(ValueError, match="not a media index"):
        run_media_index_append_available_now(
            spark, inbox, MSCHEMA, raw, str(tmp_path / "ckpt2")
        )


def test_media_index_binary_kind_and_empty_payload_skip(spark, tmp_path):
    """The other store kinds accept the frozen-codec contract too, and a
    delta that is ALL empty payloads appends nothing (zero vectors have
    no direction — symmetrical with embed_text skipping empty docs)."""
    media = _media(spark)
    ix = str(tmp_path / "bix")
    mi.write_media_index(media.filter(F.col("media_id") < 200), ix, kind="binary")
    before = vi.read_sigs(spark, ix).count()

    empties = (
        media.filter((F.col("media_id") >= 200) & (F.col("media_id") < 210))
        .withColumn("payload", F.lit(b""))
    )
    mi.append_media_to_index(empties, ix)
    assert vi.read_sigs(spark, ix).count() == before

    mi.append_media_to_index(
        media.filter((F.col("media_id") >= 200) & (F.col("media_id") < 210)), ix
    )
    assert vi.read_sigs(spark, ix).count() > before
    res = mi.query_media_index(
        spark, ix, media.filter(F.col("media_id") < 3), k=3
    )
    assert res.count() == 9
