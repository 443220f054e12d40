"""Time-series analytic operators over the events stream: sweep-line
concurrency, gaps-and-islands activity runs, and bounded-depth EWMA.

These extend the reference's event handling (SURVEY §2.E batch shapes)
with the interval/run analyses an activity pipeline needs; all are
window compositions — no UDFs, no driver loops.

Scale posture: every window is partitioned by a business key
(event_type / user_id), never global. Sweep-line and island detection
are inherently sequential *per key*; the per-key ordering sort is the
algorithm, and Spark runs one sort per key-partition in parallel. For a
single pathological hot key, pre-aggregate the ±1 deltas per (key,
timestamp) first — the sweep is associative over equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def concurrency_points(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    duration: str = "INTERVAL 10 MINUTES",
) -> DataFrame:
    """Sweep-line point stream: each event becomes (+1 at start, -1 at
    start+duration); the running sum ordered by (t, delta DESC, id) is
    the number of concurrently-open intervals. ``delta DESC`` makes
    boundary-touching intervals count as overlapping; the running MAX of
    ``cum`` is invariant to the id tie-break (equal-time +1s commute),
    so the per-key maximum is deterministic."""
    start = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("t"),
        F.lit(1).alias("delta"),
        F.col(id_col).alias("id"),
    )
    end = df.select(
        F.col(key_col).alias("key"),
        (F.col(ts_col) + F.expr(duration)).alias("t"),
        F.lit(-1).alias("delta"),
        F.col(id_col).alias("id"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("t").asc(), F.col("delta").desc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return start.unionAll(end).withColumn("cum", F.sum("delta").over(w))


def max_concurrency(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    duration: str = "INTERVAL 10 MINUTES",
) -> DataFrame:
    """Per-key maximum number of concurrently-open fixed-duration
    intervals. Output: (key, n_events, max_concurrent)."""
    pts = concurrency_points(df, key_col, ts_col, id_col, duration)
    return pts.groupBy(F.col("key").alias(key_col)).agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("n_events"),
        F.max("cum").alias("max_concurrent"),
    )


def activity_islands(
    df: DataFrame, key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active days per key.

    The classic rn-difference idiom: for each key's distinct active day,
    ``day - row_number()`` is constant within a consecutive run. Output:
    (key, island_start, island_len) — one row per island.
    """
    days = df.select(
        F.col(key_col).alias("key"), F.col(ts_col).cast("date").alias("day")
    ).distinct()
    rn = F.row_number().over(
        Window.partitionBy("key").orderBy("day")
    )
    grp = days.withColumn("grp", F.date_sub("day", rn))
    return grp.groupBy("key", "grp").agg(
        F.min("day").alias("island_start"),
        F.count("*").alias("island_len"),
    ).drop("grp")


def ewma_bounded(
    value: Column, order_cols: list[Column], partition: Column,
    alpha: float = 0.5, depth: int = 4
) -> Column:
    """Bounded-depth EWMA window column: weighted mean of the current and
    up to ``depth`` preceding values with weights alpha^k, renormalized
    over the weights actually present (series heads use fewer terms).

    A lag-chain rather than a recursive state: fixed-size expression,
    whole-stage-codegen'd, identical arithmetic tree in any engine —
    the property the oracle needs. Sums associate left-to-right.
    """
    w = Window.partitionBy(partition).orderBy(*order_cols)
    num = value * 1.0
    den = F.lit(1.0)
    for k in range(1, depth + 1):
        lagged = F.lag(value, k).over(w)
        num = num + F.coalesce(F.lit(alpha**k) * lagged, F.lit(0.0))
        den = den + F.when(lagged.isNull(), 0.0).otherwise(alpha**k)
    return num / den
