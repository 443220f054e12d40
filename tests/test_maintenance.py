"""Maintenance planner + executor (sinks/maintenance.py): the catalog's
consumer. Pins the operational loop the module exists for — plan over
a degraded estate, execute, replan reaches all-OK — plus the fail-loud
contracts (foreign plan row, uncompactable COMPACT) and that executing
COMPACT physically clears what the rule measured (dirs folded,
tombstones GC'd) without changing what the store serves."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.sinks import text_index as ti
from reddit_apache_airflow_postgres_pipeline_spark.sinks import vector_index as vi
from reddit_apache_airflow_postgres_pipeline_spark.sinks.catalog import catalog
from reddit_apache_airflow_postgres_pipeline_spark.sinks.maintenance import (
    execute_maintenance,
    maintenance_plan,
)
DSCHEMA = "doc_id long, text string"
NORMAL_A = "alpha beta gamma delta " * 10
NORMAL_B = "epsilon zeta eta theta " * 10

TIGHT = {"max_live_dirs": 2, "max_tombstone_ratio": 0.0,
         "min_admission_rate": 0.9}


def _docs(spark, lo, hi, text=NORMAL_A):
    return spark.createDataFrame([(i, text) for i in range(lo, hi)], DSCHEMA)


def _degraded_estate(spark, tmp_path):
    """A text index with 3 append dirs + a tombstone, and a raw-gate
    state with 3 batch dirs — both over TIGHT's thresholds."""
    ix = str(tmp_path / "ix")
    ti.write_text_index(
        _docs(spark, 0, 12), ix, kind="ivfpq", n_cells=4, m=4, n_codes=8
    )
    ti.append_text_to_index(_docs(spark, 100, 106, NORMAL_B), ix, batch_id=1)
    ti.append_text_to_index(_docs(spark, 200, 206, NORMAL_B), ix, batch_id=2)
    vi.delete_from_index(
        spark.createDataFrame([(3,)], "vec_id long"), ix, batch_id=3
    )
    gstate = str(tmp_path / "gstate")
    from reddit_apache_airflow_postgres_pipeline_spark.streaming import (
        counting_state as cs,
    )

    cs.stamp_meta(gstate, {"format": "dedup-gate/v1", "n": 3,
                           "num_hashes": 12, "bands": 4})
    for b in range(3):
        spark.createDataFrame(
            [(100 * b + i, f"bk{b}_{i % 2}") for i in range(4)],
            "doc long, bk string",
        ).write.mode("overwrite").parquet(
            os.path.join(gstate, f"batch_id={b}")
        )
    return {"ix": ix, "gstate": gstate}


def test_plan_execute_replan_reaches_ok(spark, tmp_path):
    roots = _degraded_estate(spark, tmp_path)
    plan = maintenance_plan(catalog(spark, roots), TIGHT)
    rows = {r["name"]: r.asDict() for r in plan.collect()}

    # both triggers fire: the index on dir accretion (3 > 2 dirs wins
    # first-match over its tombstone backlog), the gate on accretion
    assert rows["ix"]["action"] == "COMPACT"
    assert rows["ix"]["reason"] == "batch-dir accretion"
    assert rows["ix"]["metric"] == 3.0 and rows["ix"]["threshold"] == 2.0
    assert rows["gstate"]["action"] == "COMPACT"
    assert rows["gstate"]["reason"] == "batch-dir accretion"

    # what the store serves before maintenance...
    probe = _docs(spark, 100, 101, NORMAL_B)
    before = {
        (r["query_id"], r["neighbor_id"])
        for r in ti.query_text_index(spark, roots["ix"], probe, k=5,
                                     n_probe=4).collect()
    }

    log = execute_maintenance(spark, roots, plan)
    assert {(e["name"], e["status"]) for e in log} == {
        ("ix", "compacted"), ("gstate", "compacted")
    }

    # ...is what it serves after: compaction is a physical-layout move
    after = {
        (r["query_id"], r["neighbor_id"])
        for r in ti.query_text_index(spark, roots["ix"], probe, k=5,
                                     n_probe=4).collect()
    }
    assert after == before

    replan = maintenance_plan(catalog(spark, roots), TIGHT)
    assert {r["action"] for r in replan.collect()} == {"OK"}
    # the full fold also GC'd the tombstone backlog the backlog rule
    # would otherwise have kept firing on
    cat2 = {r["name"]: r.asDict() for r in catalog(spark, roots).collect()}
    assert cat2["ix"]["tombstones"] == 0 and cat2["ix"]["live_dirs"] == 1
    assert cat2["gstate"]["live_dirs"] == 1


def test_tombstone_backlog_rule_fires_without_accretion(spark, tmp_path):
    ix = str(tmp_path / "ix")
    ti.write_text_index(
        _docs(spark, 0, 12), ix, kind="ivfpq", n_cells=4, m=4, n_codes=8
    )
    vi.delete_from_index(
        spark.createDataFrame([(3,), (5,)], "vec_id long"), ix, batch_id=1
    )
    plan = maintenance_plan(
        catalog(spark, {"ix": ix}),
        {"max_live_dirs": 16, "max_tombstone_ratio": 0.1,
         "min_admission_rate": 0.0},
    )
    row = plan.collect()[0]
    assert row["action"] == "COMPACT" and row["reason"] == "tombstone backlog"
    assert row["metric"] == pytest.approx(2 / 12)
    execute_maintenance(spark, {"ix": ix}, plan)
    assert vi.index_stats(spark, ix, "ivfpq")["tombstones"] == 0


def test_corpus_accretion_is_ok_by_design(spark, tmp_path):
    """Corpus batch dirs are provenance (snapshots pin them); the
    planner must never fold them — even past the live-dir threshold."""
    from reddit_apache_airflow_postgres_pipeline_spark.streaming import (
        counting_state as cs,
    )

    corpus = str(tmp_path / "corpus")
    cs.stamp_corpus_meta(corpus, "doc_id", "text")
    for b in range(4):  # > TIGHT's max_live_dirs=2
        _docs(spark, 10 * b, 10 * b + 3).write.mode("overwrite").parquet(
            os.path.join(corpus, f"batch_id={b}")
        )
    cat = catalog(spark, {"corpus": corpus})
    ent = cat.collect()[0]
    assert ent["category"] == "corpus" and ent["n_rows"] == 12
    assert ent["live_dirs"] == 4
    row = maintenance_plan(cat, TIGHT).collect()[0]
    assert row["action"] == "OK" and row["reason"] == "healthy"


def test_admission_floor_investigate_and_handler(spark, tmp_path):
    dec = str(tmp_path / "dec")
    spark.createDataFrame(
        [(i, i % 4 == 0) for i in range(8)], "doc long, admitted boolean"
    ).write.mode("overwrite").parquet(os.path.join(dec, "batch_id=0"))

    plan = maintenance_plan(catalog(spark, {"dec": dec}), TIGHT)
    row = plan.collect()[0]
    assert row["action"] == "INVESTIGATE"
    assert row["reason"] == "admission rate below floor"
    assert row["metric"] == pytest.approx(0.25)

    # unhandled by default; a caller-wired handler (e.g. the PSI
    # admission-drift monitor) gets the root
    assert execute_maintenance(spark, {"dec": dec}, plan) == [
        {"name": "dec", "action": "INVESTIGATE", "status": "unhandled"}
    ]
    seen = []
    log = execute_maintenance(
        spark, {"dec": dec}, plan,
        handlers={"dec": lambda sp, p: seen.append(p)},
    )
    assert log[0]["status"] == "handled" and seen == [dec]


def test_execute_fails_loud_on_foreign_plan_row(spark, tmp_path):
    roots = _degraded_estate(spark, tmp_path)
    plan = maintenance_plan(catalog(spark, roots), TIGHT)
    with pytest.raises(ValueError, match="not in roots"):
        execute_maintenance(spark, {"ix": roots["ix"]}, plan)


def test_compact_on_uncompactable_category_fails_loud(spark, tmp_path):
    dec = str(tmp_path / "dec")
    spark.createDataFrame(
        [(1, True)], "doc long, admitted boolean"
    ).write.mode("overwrite").parquet(os.path.join(dec, "batch_id=0"))
    forged = maintenance_plan(catalog(spark, {"dec": dec}), TIGHT).withColumn(
        "action", F.lit("COMPACT")
    )
    with pytest.raises(ValueError, match="uncompactable"):
        execute_maintenance(spark, {"dec": dec}, forged)
