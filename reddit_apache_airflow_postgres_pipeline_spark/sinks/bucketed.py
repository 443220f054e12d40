"""Bucketed parquet tables — co-located joins without a shuffle.

The 100 TB pattern: facts that are repeatedly joined or aggregated on
the same key (orders ⋈ lineitem on orderkey; events by user) are
written ONCE bucketed + sorted by that key. Every later sort-merge join
or group-by on the bucket key then reads co-located buckets and skips
both the Exchange and (with sortBy) the Sort — the dominant cost of
repeated fact-fact joins.

Buckets also bound file counts (``num_buckets`` files per write, not one
per task) and give bucket pruning on point lookups
(``spark.sql.sources.bucketing.enabled`` / ``autoBucketedScan``).

Spark's bucketing lives in the session catalog (``saveAsTable``) — plain
``.parquet(path)`` writes cannot record bucket metadata. Tables here are
EXTERNAL (explicit ``path``) so data outlives the catalog entry and
lands where the caller owns storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as an external bucketed (optionally sorted) parquet
    table registered in the session catalog."""
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. With
    matching bucket counts Spark plans a sort-merge join with NO exchange
    on either side (assert via ``.explain``: zero Exchange operators)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    if isinstance(on, str):
        on = [on]
    cond = None
    for k in on:
        lk, rk = k if isinstance(k, tuple) else (k, k)
        c = lt[lk] == rt[rk]
        cond = c if cond is None else cond & c
    # hint the merge join: broadcast would hide the co-location benefit
    # (and at real fact×fact scale broadcast is impossible anyway)
    return lt.hint("merge").join(rt.hint("merge"), cond, how)
