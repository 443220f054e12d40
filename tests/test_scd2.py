"""SCD2 merge semantics on a controlled fixture: close-out, no-op
update, new key, NULL payloads, history passthrough, and idempotent
re-application."""

from __future__ import annotations

from reddit_apache_airflow_postgres_pipeline_spark.operators.scd2 import scd2_apply

SCHEMA = "k string, attr string, score long, valid_from string, valid_to string"


def _dim(spark):
    return spark.createDataFrame(
        [
            ("a", "old", 1, "t0", "t1"),      # history row — must pass through
            ("a", "newer", 2, "t1", None),     # current, will be updated
            ("b", "same", 5, "t0", None),      # current, no-op update arrives
            ("c", None, 7, "t0", None),        # current with NULL payload
        ],
        SCHEMA,
    )


def _updates(spark):
    return spark.createDataFrame(
        [
            ("a", "newest", 3),   # changed → close + new version
            ("b", "same", 5),     # identical → no new version
            ("c", None, 7),       # identical incl. NULL → no new version
            ("d", "brand", 9),    # unknown key → insert
        ],
        "k string, attr string, score long",
    )


def test_scd2_apply(spark):
    out = scd2_apply(_dim(spark), _updates(spark), key="k", ts="t2")
    rows = sorted(
        (tuple(r) for r in out.collect()),
        key=lambda t: (t[0], t[3] or "", t[4] or "~"),
    )
    assert rows == sorted(
        [
            ("a", "old", 1, "t0", "t1"),
            ("a", "newer", 2, "t1", "t2"),    # closed out
            ("a", "newest", 3, "t2", None),   # new current
            ("b", "same", 5, "t0", None),     # untouched (no-op)
            ("c", None, 7, "t0", None),       # untouched (NULL-safe compare)
            ("d", "brand", 9, "t2", None),    # inserted
        ],
        key=lambda t: (t[0], t[3] or "", t[4] or "~"),
    )

    # idempotence: re-applying the same batch at t3 changes nothing
    again = scd2_apply(out, _updates(spark), key="k", ts="t3")
    assert sorted(tuple(r) for r in again.collect()) == sorted(tuple(r) for r in out.collect())
