"""Upsert-merge (J1) semantics vs DuckDB's literal INSERT ... ON CONFLICT,
plus first-wins dedup (D1) vs a ROW_NUMBER oracle."""

from __future__ import annotations

import duckdb
import pytest

from reddit_apache_airflow_postgres_pipeline_spark.operators.dedup import dedup_first, dedup_first_agg
from reddit_apache_airflow_postgres_pipeline_spark.operators.merge import upsert_merge


TARGET_ROWS = [
    ("k1", "t3", "old-id1", 10, 1, "old title 1", "oldsub"),
    ("k2", "t3", "old-id2", 20, 2, "old title 2", "oldsub"),
    ("k3", "t3", "old-id3", 30, 3, "old title 3", "oldsub"),
]
STAGE_ROWS = [
    ("k2", "t3", "new-id2", 99, 9, "new title 2", "newsub"),  # update
    ("k4", "t3", "new-id4", 44, 4, "new title 4", "newsub"),  # insert
]
SCHEMA = "thing_key string, thing_type string, id string, score long, num_comments long, title_sanitized string, subreddit string"
UPDATE_COLS = ["score", "num_comments", "title_sanitized", "subreddit"]


def duck_oracle():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE target (thing_key TEXT PRIMARY KEY, thing_type TEXT, id TEXT,"
        " score BIGINT, num_comments BIGINT, title_sanitized TEXT, subreddit TEXT)"
    )
    con.executemany("INSERT INTO target VALUES (?,?,?,?,?,?,?)", TARGET_ROWS)
    con.execute("CREATE TABLE stage AS SELECT * FROM target LIMIT 0")
    con.executemany("INSERT INTO stage VALUES (?,?,?,?,?,?,?)", STAGE_ROWS)
    con.execute(
        "INSERT INTO target SELECT * FROM stage ON CONFLICT (thing_key) DO UPDATE SET "
        + ", ".join(f"{c} = EXCLUDED.{c}" for c in UPDATE_COLS)
    )
    return sorted(con.execute("SELECT * FROM target").fetchall())


@pytest.mark.parametrize("broadcast_stage", [True, False])
def test_upsert_merge_matches_on_conflict(spark, broadcast_stage):
    target = spark.createDataFrame(TARGET_ROWS, SCHEMA)
    stage = spark.createDataFrame(STAGE_ROWS, SCHEMA)
    got = upsert_merge(target, stage, "thing_key", UPDATE_COLS, broadcast_stage)
    assert sorted(tuple(r) for r in got.collect()) == duck_oracle()


def test_upsert_preserves_immutables(spark):
    target = spark.createDataFrame(TARGET_ROWS, SCHEMA)
    stage = spark.createDataFrame(STAGE_ROWS, SCHEMA)
    got = {
        r["thing_key"]: r.asDict()
        for r in upsert_merge(target, stage, "thing_key", UPDATE_COLS).collect()
    }
    assert got["k2"]["id"] == "old-id2"  # immutable preserved on update
    assert got["k2"]["score"] == 99      # updatable overwritten
    assert got["k4"]["id"] == "new-id4"  # insert takes stage values
    assert got["k1"]["score"] == 10      # untouched row passes through
    assert len(got) == 4


def test_upsert_broadcast_plan_has_no_shuffle_of_target(spark):
    """Scale guard: the broadcast path must not shuffle the target —
    expect BroadcastHashJoin and no Exchange hashpartitioning on target."""
    target = spark.createDataFrame(TARGET_ROWS, SCHEMA)
    stage = spark.createDataFrame(STAGE_ROWS, SCHEMA)
    plan = (
        upsert_merge(target, stage, "thing_key", UPDATE_COLS, True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


DEDUP_ROWS = [
    ("k1", 0, 1, "a"),
    ("k1", 0, 2, "b"),
    ("k1", 1, 1, "c"),
    ("k2", 1, 1, "d"),
    ("k2", 0, 5, "e"),
]


@pytest.mark.parametrize("op", ["window", "agg"])
def test_dedup_first_matches_row_number_oracle(spark, op):
    df = spark.createDataFrame(DEDUP_ROWS, "k string, file_seq long, row_seq long, payload string")
    if op == "window":
        got = dedup_first(df, "k", ["file_seq", "row_seq"])
    else:
        got = dedup_first_agg(
            df, "k", (df.file_seq * 1_000_000 + df.row_seq)
        )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k TEXT, file_seq BIGINT, row_seq BIGINT, payload TEXT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", DEDUP_ROWS)
    want = sorted(
        con.execute(
            "SELECT k, file_seq, row_seq, payload FROM ("
            " SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY file_seq, row_seq) rn FROM t)"
            " WHERE rn = 1"
        ).fetchall()
    )
    assert sorted(tuple(r) for r in got.select("k", "file_seq", "row_seq", "payload").collect()) == want
