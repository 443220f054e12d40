"""snapshot_diff unit semantics: insert/delete/update classification,
NULL-safe signatures, compare-column selection."""

from __future__ import annotations

from reddit_apache_airflow_postgres_pipeline_spark.operators.diff import snapshot_diff


def _rows(df):
    return sorted((r[0], r[1]) for r in df.collect())


def test_classifies_all_three(spark):
    prev = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "s", "v"]
    )
    cur = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", 30), (4, "d", 40)], ["k", "s", "v"]
    )
    got = _rows(snapshot_diff(prev, cur, ["k"]))
    assert got == [(1, "delete"), (3, "update"), (4, "insert")]


def test_null_transitions_are_updates(spark):
    prev = spark.createDataFrame(
        [(1, None, 10), (2, "x", None)], "k int, s string, v int"
    )
    cur = spark.createDataFrame(
        [(1, "now-set", 10), (2, "x", None)], "k int, s string, v int"
    )
    got = _rows(snapshot_diff(prev, cur, ["k"]))
    assert got == [(1, "update")]  # NULL→value is a change; NULL==NULL is not


def test_null_vs_shifted_value_not_confused(spark):
    # ('a', NULL) must differ from (NULL, 'a') — concat-style signatures
    # that drop NULLs would collide these.
    prev = spark.createDataFrame([(1, "a", None)], "k int, s string, v string")
    cur = spark.createDataFrame([(1, None, "a")], "k int, s string, v string")
    got = _rows(snapshot_diff(prev, cur, ["k"]))
    assert got == [(1, "update")]


def test_compare_cols_subset(spark):
    prev = spark.createDataFrame([(1, "a", 10)], ["k", "s", "v"])
    cur = spark.createDataFrame([(1, "a", 999)], ["k", "s", "v"])
    assert _rows(snapshot_diff(prev, cur, ["k"], compare_cols=["s"])) == []
    assert _rows(snapshot_diff(prev, cur, ["k"], compare_cols=["v"])) == [(1, "update")]
