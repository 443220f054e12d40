"""Incremental aggregate maintenance (delta rollup merge).

The reference recomputes everything every run (full inbox re-combine,
full CSV re-upsert). At 100 TB you maintain materialized rollups
incrementally instead: aggregate only the new batch, then merge the
partial aggregate into the stored one. This works for any
**re-aggregable** measure (count, sum, min, max — and avg as
sum+count); the merge is a key-partitioned union + re-aggregate, i.e.
one shuffle over rollup-sized (not fact-sized) data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_rollup(
    base: DataFrame, delta: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Merge a partial aggregate ``delta`` into the materialized
    ``base`` (same schema: keys + summable measure columns).

    ``unionByName`` + one hash aggregate: Spark's partial-aggregation
    machinery combines map-side, so the shuffle carries at most
    2×|rollup| rows regardless of how large the underlying fact deltas
    were. Keys present in only one input pass through unchanged (the
    union simply has one row for them). Measures must be re-aggregable
    by SUM — keep decimal sums decimal until presentation so merges
    stay order-insensitive.
    """
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(*[F.sum(m).alias(m) for m in measures])
    )
