"""Skew-resilient aggregation: salted two-phase group-by.

At 100 TB a handful of hot keys (one subreddit, one return-flag, one
language) can pin a whole aggregation on one reducer. AQE splits skewed
JOIN partitions but a skewed AGGREGATE still funnels every hot-key row
group through one task in the final stage unless the map-side partial
agg already collapsed them — which it does for low-cardinality keys but
NOT when the key set per mapper is too large for the partial-agg hash
map (spark.sql.aggregate spill) or when the agg is over high-cardinality
composite keys with a few giants.

``salted_agg`` makes the split explicit and deterministic:

  phase 1: groupBy(keys + salt)   — hot keys fan out over ``buckets``
            reducers, each holding a partial aggregate;
  phase 2: groupBy(keys)          — merges ``buckets`` partials per key
            (tiny input: |keys| × buckets rows).

Only algebraic aggregates decompose this way; supported: sum, count,
min, max, avg (sum/count pair re-divided in phase 2). The salt is
``pmod(hash(entire row? no — a cheap uniform source), buckets)``: we use
``monotonically_increasing_id`` mod buckets, which is uniform per
partition and adds no data-dependent correlation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Agg:
    fn: str  # sum | count | min | max | avg
    col: str | None  # None only for count(*)
    alias: str


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Agg],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation, result-identical to
    ``df.groupBy(keys).agg(...)`` for the supported algebraic functions."""
    supported = {"sum", "count", "min", "max", "avg"}
    for a in aggs:
        if a.fn not in supported:
            raise ValueError(f"non-algebraic aggregate {a.fn!r} cannot be salted")

    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    )

    phase1, phase2, final = [], [], []
    for a in aggs:
        if a.fn == "count":
            c = F.count("*") if a.col is None else F.count(a.col)
            phase1.append(c.alias(f"__p_{a.alias}"))
            phase2.append(F.sum(f"__p_{a.alias}").alias(a.alias))
            final.append(F.col(a.alias))
        elif a.fn in ("sum", "min", "max"):
            merge = {"sum": F.sum, "min": F.min, "max": F.max}[a.fn]
            phase1.append(merge(a.col).alias(f"__p_{a.alias}"))
            phase2.append(merge(f"__p_{a.alias}").alias(a.alias))
            final.append(F.col(a.alias))
        else:  # avg = merged sum / merged count
            phase1.append(F.sum(a.col).alias(f"__ps_{a.alias}"))
            phase1.append(F.count(a.col).alias(f"__pc_{a.alias}"))
            phase2.append(F.sum(f"__ps_{a.alias}").alias(f"__s_{a.alias}"))
            phase2.append(F.sum(f"__pc_{a.alias}").alias(f"__c_{a.alias}"))
            final.append(
                (F.col(f"__s_{a.alias}") / F.col(f"__c_{a.alias}")).alias(a.alias)
            )

    p1 = salted.groupBy(*keys, "__salt").agg(*phase1)
    p2 = p1.groupBy(*keys).agg(*phase2)
    return p2.select(*keys, *final)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join: salt the big (skewed) side, REPLICATE
    the small side ``buckets`` times, join on (key, salt).

    A hot key on the big side fans its rows over ``buckets`` reducers
    instead of one; the cost is a ``buckets``× blow-up of the small side
    — the deliberate trade when the small side is dimension-sized but
    too big (or the skew too extreme) for plain broadcast, and AQE's
    size-threshold skew splitting hasn't kicked in (it only splits
    post-shuffle partitions over ``skewedPartitionThresholdInBytes``;
    a logical hot KEY below that still serializes).

    Result-identical to ``big.join(small, on, how)`` for inner/left
    joins (each big row matches exactly one replica). The big-side salt
    is uniform and data-independent (``monotonically_increasing_id``)
    so no correlation with the key distribution is possible.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    b = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    )
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return b.join(s, [on, "__salt"], how).drop("__salt")
