"""Extended relational operators: as-of join exactness on a controlled
fixture, approx_count_distinct error bound."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_exact(spark):
    left = spark.createDataFrame(
        [(1, _ts("2026-01-01T10:00:00"), "L1"),
         (1, _ts("2026-01-01T12:00:00"), "L2"),
         (2, _ts("2026-01-01T09:00:00"), "L3"),
         (3, _ts("2026-01-01T09:00:00"), "L4")],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2026-01-01T09:30:00"), "R1"),
         (1, _ts("2026-01-01T11:00:00"), "R2"),
         (1, _ts("2026-01-01T12:00:00"), "R3"),  # equal ts -> inclusive match
         (2, _ts("2026-01-01T09:30:00"), "R4")],  # after L3 -> no match
        ["k", "ts", "rv"],
    )
    out = {r["lv"]: r["rv_asof"] for r in asof_join(left, right, on="k").collect()}
    assert out == {"L1": "R1", "L2": "R3", "L3": None, "L4": None}


def test_approx_count_distinct_error(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.plans.registry import queries

    rows = queries()["q_approx_count_distinct"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    for r in rows:
        # within_5pct is the oracle-checked sketch-vs-exact bound
        assert r["within_5pct"] is True, r
        assert r["exact_parts"] > 0


def test_resolve_latest(tmp_path):
    import os
    from reddit_apache_airflow_postgres_pipeline_spark.sources.files import resolve_latest

    d = str(tmp_path)
    for name, age in [("italytravel_a.csv", 100), ("italytravel_b.csv", 50),
                      ("italytravel_old.csv", 3000), ("other.txt", 10)]:
        p = os.path.join(d, name)
        open(p, "w").write("x")
        os.utime(p, (1_000_000 - age, 1_000_000 - age))
    # exact wins even when older
    assert resolve_latest(d, exact="italytravel_a.csv", now=1_000_000).endswith("_a.csv")
    # else newest within the 30-min window (old one excluded, txt filtered)
    assert resolve_latest(d, prefix="italytravel_", now=1_000_000).endswith("_b.csv")
    # nothing within window
    assert resolve_latest(d, prefix="italytravel_", max_age_s=10, now=1_000_000) is None


def test_salted_agg_equals_plain_groupby(spark):
    from pyspark.sql import functions as F
    from reddit_apache_airflow_postgres_pipeline_spark.operators.skew import Agg, salted_agg
    from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    got = {
        r["l_returnflag"]: r.asDict()
        for r in salted_agg(
            li, ["l_returnflag"],
            [Agg("count", None, "n"), Agg("sum", "l_quantity", "s"),
             Agg("avg", "l_discount", "a"), Agg("min", "l_partkey", "mn"),
             Agg("max", "l_partkey", "mx")],
            buckets=7,
        ).collect()
    }
    want = {
        r["l_returnflag"]: r.asDict()
        for r in li.groupBy("l_returnflag").agg(
            F.count("*").alias("n"), F.sum("l_quantity").alias("s"),
            F.avg("l_discount").alias("a"), F.min("l_partkey").alias("mn"),
            F.max("l_partkey").alias("mx"),
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        for c in ["n", "s", "mn", "mx"]:
            assert got[k][c] == want[k][c], (k, c)
        assert got[k]["a"] == pytest.approx(want[k]["a"], rel=1e-12)

    import pytest as _pt
    with _pt.raises(ValueError, match="non-algebraic"):
        salted_agg(li, ["l_returnflag"], [Agg("median", "l_quantity", "m")])
