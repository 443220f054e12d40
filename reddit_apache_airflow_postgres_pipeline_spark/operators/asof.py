"""As-of (temporal) join — the canonical time-series operator Spark has
no primitive for (engine extension; the reference has no joins at all,
SURVEY.md §2.D).

``asof_join(left, right, …)``: for every left row, attach the most
recent right row with ``right.ts <= left.ts`` (backward direction)
within the same key group.

Scalable formulation — union + ordered window, NOT a range join:

* tag both sides, union them (schema-aligned),
* one window per key ordered by (ts, side) carrying
  ``last(right-payload, ignoreNulls)`` forward,
* keep left rows; the carried value IS the as-of match.

Cost: ONE shuffle+sort on (key, ts) over |L|+|R| rows — linear, no
per-row range scan, no candidate blowup; skewed keys are split by AQE.
A right row at exactly ``left.ts`` matches (inclusive), because side
orders right(0) before left(1) at equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join. Output: every left row + ``right_cols`` of its
    as-of match renamed with ``suffix`` (NULL when no prior right row).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    payload = F.struct(*[F.col(c) for c in right_cols])

    lt = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType.simpleString()
        ).alias("__r"),
    )
    rt = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("p")
            ).schema["p"].dataType.simpleString()
        ).alias("__l"),
        payload.alias("__r"),
    )
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    out_left = [
        F.col(f"__l.{c}").alias(c) for c in left.columns
    ]
    out_right = [
        F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return carried.select(*out_left, *out_right)
