"""Unit tests for operators/timeseries.py against hand-computed cases,
plus the ORC source/sink roundtrip (built-in columnar format parity)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators import timeseries


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    ).withColumn("event_type", F.lit("t"))


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_max_concurrency_hand_case(spark):
    # 10-min intervals: [0,10) [5,15) [9,19) overlap 3-deep at t=9;
    # [30,40) is alone; boundary touch at [40,50) vs [50,60) counts as
    # overlapping (delta DESC puts the +1 first).
    e = _events(
        spark,
        [
            (1, _t(0), 1, 0.0),
            (2, _t(5), 1, 0.0),
            (3, _t(9), 1, 0.0),
            (4, _t(30), 1, 0.0),
            (5, _t(40), 1, 0.0),
            (6, _t(50), 1, 0.0),
        ],
    )
    out = timeseries.max_concurrency(e, "event_type", "ts", "event_id").collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 6
    assert out[0]["max_concurrent"] == 3


def test_activity_islands_hand_case(spark):
    def day(d):
        return dt.datetime(2024, 1, d, 9, 0, 0)

    # user 1: days 1,2,3 then 5,6 → islands of 3 and 2
    # user 2: day 1 only (two events same day collapse) → island of 1
    e = _events(
        spark,
        [
            (1, day(1), 1, 0.0),
            (2, day(2), 1, 0.0),
            (3, day(3), 1, 0.0),
            (4, day(5), 1, 0.0),
            (5, day(6), 1, 0.0),
            (6, day(1), 2, 0.0),
            (7, day(1), 2, 0.0),
        ],
    )
    isl = {
        (r["key"], str(r["island_start"])): r["island_len"]
        for r in timeseries.activity_islands(e, "user_id", "ts").collect()
    }
    assert isl == {
        (1, "2024-01-01"): 3,
        (1, "2024-01-05"): 2,
        (2, "2024-01-01"): 1,
    }


def test_ewma_bounded_head_renormalizes(spark):
    e = _events(
        spark,
        [(1, _t(0), 1, 8.0), (2, _t(1), 1, 4.0), (3, _t(2), 1, 2.0)],
    )
    ew = timeseries.ewma_bounded(
        F.col("value"), [F.col("ts").asc(), F.col("event_id").asc()],
        F.col("user_id"), alpha=0.5, depth=4,
    )
    got = {
        r["event_id"]: r["e"]
        for r in e.select("event_id", F.round(ew, 6).alias("e")).collect()
    }
    assert got[1] == 8.0  # head: only itself
    assert got[2] == round((4.0 + 0.5 * 8.0) / 1.5, 6)
    assert got[3] == round((2.0 + 0.5 * 4.0 + 0.25 * 8.0) / 1.75, 6)


def test_orc_roundtrip(spark, tmp_path):
    """ORC is the second built-in columnar format; schema + values must
    survive a write/read cycle including arrays and timestamps."""
    df = spark.createDataFrame(
        [
            (1, "a", [1.5, 2.5], dt.datetime(2024, 1, 1, 3, 4, 5)),
            (2, None, [], dt.datetime(2024, 6, 1, 0, 0, 0)),
        ],
        "id long, name string, xs array<double>, ts timestamp",
    )
    path = str(tmp_path / "t.orc")
    df.write.format("orc").mode("overwrite").save(path)
    back = spark.read.format("orc").load(path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
