"""The full operational loop in ONE scenario — the production narrative
the reference's cron pipeline (fetch → combine → load,
dags/Combine_send_to_postgresql.py:301) implies for this engine at
scale: a validated snapshot seeds the admission gate AND the served
index; the ingest chain quarantines drift and rejects near-dups; an
erasure request lands as a tombstone and is honored by every probe;
the staleness audit rebuilds from survivors and GCs the tombstone; the
erased id can then legitimately return. Every stage here is an already
individually-tested component — this pins that they COMPOSE."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.sinks import text_index as ti
from reddit_apache_airflow_postgres_pipeline_spark.sinks import vector_index as vi
from reddit_apache_airflow_postgres_pipeline_spark.streaming import (
    drift_gate,
    ingest_pipeline,
)
from reddit_apache_airflow_postgres_pipeline_spark.streaming.vector_index_stream import (
    run_index_delete_available_now,
)

DSCHEMA = "doc_id long, text string"
NORMAL_A = "alpha beta gamma delta " * 10
NORMAL_B = "epsilon zeta eta theta " * 10
SHORT = "x y"


def _write_file(spark, df, path, age_s=0.0):
    df.toPandas().to_parquet(path)
    if age_s:
        past = time.time() - age_s
        os.utime(path, (past, past))


def test_operational_loop_ingest_erase_rebuild_readd(spark, tmp_path):
    # 1. validated snapshot seeds BOTH the drift reference and the index
    snapshot = spark.createDataFrame(
        [(i, NORMAL_A) for i in range(50)]
        + [(50 + i, NORMAL_B) for i in range(50)],
        DSCHEMA,
    )
    ref = str(tmp_path / "ref")
    drift_gate.write_reference(snapshot, ref)
    ix = str(tmp_path / "ix")
    ti.write_text_index(snapshot, ix, kind="ivfpq", n_cells=4, m=4, n_codes=8)

    # 2. the chain drains an inbox: one good file, one drifted, one dup
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)

    def _w(name, rows, age_s):
        _write_file(
            spark, spark.createDataFrame(rows, DSCHEMA),
            os.path.join(inbox, name), age_s=age_s,
        )

    _w("f0.parquet", [(1001, NORMAL_A + "iota kappa"),
                      (1002, NORMAL_B + "lambda mu")], 30)
    _w("f1.parquet", [(1100 + i, SHORT) for i in range(20)], 20)
    _w("f2.parquet", [(1201, NORMAL_A + "iota kappa")], 10)
    work = str(tmp_path / "work")
    ingest_pipeline.run_full_ingest_available_now(
        spark, inbox, DSCHEMA, work, ref, index_path=ix
    )
    live = {r["neighbor_id"] for r in vi.read_codes(spark, ix).collect()}
    assert live == set(range(100)) | {1001, 1002}

    # 3. an erasure request for an ADMITTED doc streams in as a tombstone
    erase_inbox = str(tmp_path / "erase")
    os.makedirs(erase_inbox)
    _write_file(
        spark, spark.createDataFrame([(1001,)], "doc_id long"),
        os.path.join(erase_inbox, "e0.parquet"), age_s=5,
    )
    run_index_delete_available_now(
        spark, erase_inbox, "doc_id long", ix,
        str(tmp_path / "eckpt"), kind="ivfpq", id_col="doc_id",
    )
    probe = spark.createDataFrame([(9001, NORMAL_A + "iota kappa")], DSCHEMA)
    served = {
        r["neighbor_id"]
        for r in ti.query_text_index(spark, ix, probe, k=50, n_probe=4).collect()
    }
    assert 1001 not in served and served  # shadowed immediately

    # 3b. while the tombstone is live, re-adding 1001 fails loudly
    with pytest.raises(ValueError, match="tombstone"):
        ti.append_text_to_index(
            spark.createDataFrame([(1001, NORMAL_A)], DSCHEMA), ix
        )

    # 4. staleness loop rebuilds from SURVIVORS (erased id excluded),
    #    GCs the tombstone
    survivors = snapshot.unionByName(
        spark.createDataFrame([(1002, NORMAL_B + "lambda mu")], DSCHEMA)
    )
    res = ti.rebuild_text_index_if_stale(
        spark, ix, survivors, survivors.filter(F.col("doc_id") < 3),
        min_recall=1.1,
        probe_kwargs={"n_probe": 4},
        build_kwargs={"n_cells": 4, "m": 4, "n_codes": 8},
    )
    assert res["rebuilt"] is True
    assert not os.path.isdir(os.path.join(ix, "tombstones"))
    live = {r["neighbor_id"] for r in vi.read_codes(spark, ix).collect()}
    assert live == set(range(100)) | {1002}

    # 5. the erased id may now legitimately return (fresh consent):
    #    append succeeds and it serves again
    ti.append_text_to_index(
        spark.createDataFrame([(1001, NORMAL_A + "iota kappa")], DSCHEMA), ix
    )
    # k covers the whole store: the snapshot's 100 docs share two
    # embeddings, so PQ distances tie in blocks and the id-ascending
    # tie-break can push a larger id out of a small top-k — membership
    # is the claim here, not rank
    served = {
        r["neighbor_id"]
        for r in ti.query_text_index(spark, ix, probe, k=120, n_probe=4).collect()
    }
    assert 1001 in served


def test_media_operational_loop_chain_erase_rebuild_readd(spark, tmp_path):
    """The media twin of the loop above: media chain (size-drift gate →
    aHash gate → index) admits and serves a batch; a streamed erasure
    request shadows one item and blocks its re-add; the staleness
    rebuild from survivors GCs the tombstone; a fresh append serves it
    again."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from reddit_apache_airflow_postgres_pipeline_spark.operators import multimodal as mm
    from reddit_apache_airflow_postgres_pipeline_spark.sinks import media_index as mi
    from reddit_apache_airflow_postgres_pipeline_spark.streaming import ingest_pipeline

    MSCHEMA = (
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,fmt:string>"
    )
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    media = mm.media_from_documents(docs)
    snapshot = media.filter(F.col("media_id") < 300)
    ref = str(tmp_path / "ref")
    ingest_pipeline.write_media_reference(snapshot, ref)
    ix = str(tmp_path / "ix")
    mi.write_media_index(snapshot, ix, kind="ivfpq", n_cells=8)

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    good = media.filter((F.col("media_id") >= 300) & (F.col("media_id") < 320))
    tmp_dir = str(tmp_path / "w")
    good.coalesce(1).write.parquet(tmp_dir)
    shutil.move(
        glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0],
        os.path.join(inbox, "f0.parquet"),
    )
    past = time.time() - 20
    os.utime(os.path.join(inbox, "f0.parquet"), (past, past))
    ingest_pipeline.run_media_ingest_available_now(
        spark, inbox, MSCHEMA, str(tmp_path / "work"), ref, index_path=ix
    )
    live = {r["neighbor_id"] for r in vi.read_codes(spark, ix).collect()}
    assert 305 in live

    # streamed erasure of an admitted item
    erase_inbox = str(tmp_path / "erase")
    os.makedirs(erase_inbox)
    _write_file(
        spark, spark.createDataFrame([(305,)], "media_id long"),
        os.path.join(erase_inbox, "e0.parquet"), age_s=5,
    )
    run_index_delete_available_now(
        spark, erase_inbox, "media_id long", ix,
        str(tmp_path / "eckpt"), kind="ivfpq", id_col="media_id",
    )
    probe = media.filter(F.col("media_id") == 305).select(
        (F.col("media_id") + 9000).alias("media_id"), "kind", "payload", "meta"
    )
    served = {
        r["neighbor_id"]
        for r in mi.query_media_index(spark, ix, probe, k=400, n_probe=8).collect()
    }
    assert 305 not in served and served
    with pytest.raises(ValueError, match="tombstone"):
        mi.append_media_to_index(media.filter(F.col("media_id") == 305), ix)

    survivors = snapshot.unionByName(good).filter(F.col("media_id") != 305)
    res = mi.rebuild_media_index_if_stale(
        spark, ix, survivors, survivors.filter(F.col("media_id") < 4),
        min_recall=1.1,
        probe_kwargs={"n_probe": 8}, build_kwargs={"n_cells": 8},
    )
    assert res["rebuilt"] is True
    assert not os.path.isdir(os.path.join(ix, "tombstones"))
    mi.append_media_to_index(media.filter(F.col("media_id") == 305), ix)
    served = {
        r["neighbor_id"]
        for r in mi.query_media_index(spark, ix, probe, k=400, n_probe=8).collect()
    }
    assert 305 in served


def test_estate_catalog_over_loop_end_state(spark, tmp_path):
    """The ops catalog reads the loop's END STATE as one relation:
    served index (kind + frozen params + live dirs + tombstone
    backlog), gate signature state, and the gate's decision log with
    admission accounting — classified purely from on-disk markers."""
    import json

    from reddit_apache_airflow_postgres_pipeline_spark.sinks.catalog import (
        catalog,
        catalog_entry,
    )
    from reddit_apache_airflow_postgres_pipeline_spark.streaming import dedup_gate

    # a served text index with one tombstone
    snapshot = spark.createDataFrame(
        [(i, NORMAL_A) for i in range(10)]
        + [(10 + i, NORMAL_B) for i in range(10)],
        DSCHEMA,
    )
    ix = str(tmp_path / "ix")
    ti.write_text_index(snapshot, ix, kind="ivfpq", n_cells=4, m=4, n_codes=8)
    vi.delete_from_index(
        spark.createDataFrame([(3,)], "vec_id long"), ix, batch_id=1
    )

    # a verified-gate drain with decision + dup_of logs: 2 files,
    # second re-delivers doc 1 (rejected) plus a novel doc
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    _write_file(
        spark,
        spark.createDataFrame([(1, NORMAL_A), (2, NORMAL_B)], DSCHEMA),
        os.path.join(inbox, "f0.parquet"), age_s=20,
    )
    _write_file(
        spark,
        spark.createDataFrame(
            [(1, NORMAL_A), (5, NORMAL_A + " nu xi omicron pi rho sigma")],
            DSCHEMA,
        ),
        os.path.join(inbox, "f1.parquet"), age_s=10,
    )
    gstate = str(tmp_path / "gstate")
    gdec = str(tmp_path / "gdec")
    gdup = str(tmp_path / "gdup")
    dedup_gate.run_verified_gate_available_now(
        spark, inbox, DSCHEMA, str(tmp_path / "gout"), gstate,
        str(tmp_path / "gckpt"), decisions_dir=gdec, dup_of_dir=gdup,
    )

    rel = catalog(
        spark, {"idx": ix, "gate": gstate, "dec": gdec, "dup": gdup}
    )
    rows = {r["name"]: r.asDict() for r in rel.collect()}
    assert set(rows) == {"idx", "gate", "dec", "dup"}

    idx = rows["idx"]
    assert idx["category"] == "vector-index" and idx["kind"] == "ivfpq"
    assert idx["modality"] == "text" and idx["tombstones"] == 1
    assert idx["n_rows"] == 19 and idx["live_dirs"] == 1
    assert json.loads(idx["params"])["salt"] == "emb"

    gate = rows["gate"]
    assert gate["category"] == "gate-state"
    assert gate["kind"] == "verified-dedup-gate/v1" and gate["modality"] == "text"
    assert gate["n_rows"] == 3  # 1, 2 admitted in b0; 5 in b1; re-del 1 rejected
    assert gate["live_dirs"] == 2
    assert json.loads(gate["params"])["threshold"] == 0.5

    dec = rows["dec"]
    assert dec["category"] == "decision-log"
    assert dec["n_rows"] == 4 and dec["n_admitted"] == 3 and dec["n_rejected"] == 1

    dup = rows["dup"]
    assert dup["category"] == "attribution-log" and dup["kind"] == "dup_of"
    assert dup["modality"] == "text"
    assert dup["n_rows"] == 1  # the one rejection: re-delivered doc 1

    # fail-loud on an unclassifiable root
    bogus = str(tmp_path / "bogus")
    os.makedirs(bogus)
    with pytest.raises(ValueError, match="no known layout"):
        catalog_entry(spark, "bogus", bogus)
