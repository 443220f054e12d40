"""Snapshot diff — change-data-capture between two table states.

The reference's load path replays full CSVs into an ``ON CONFLICT``
upsert (Combine_send_to_postgresql.py:211-264), i.e. it never KNOWS what
changed — every run rewrites everything. A scale pipeline wants the
delta: diff yesterday's snapshot against today's and ship only
inserts/updates/deletes downstream (to the merge sink, a CDC feed, or an
incremental index rebuild).

Scale shape: ONE full-outer equi-join on the key columns. Both sides
hash-partition on the same key, so with co-bucketed snapshots
(sinks/bucketed.py) the diff is shuffle-free; change detection compares
a single 64-bit row hash (``xxhash64`` over the compared columns) so
wide rows never cross the network twice — payloads stay columnar and
pruned to key + hash until a change is confirmed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_COL = "change_type"


def _row_sig(cols: list[str]) -> F.Column:
    # NULL-safe: hash each column's string form with a sentinel for NULL
    # (concat_ws drops NULLs, which would collide ('a',NULL) with (NULL,'a')
    # — the per-column coalesce keeps arity visible to the hash).
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols]
    return F.xxhash64(*parts)


def snapshot_diff(
    prev: DataFrame,
    cur: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots of the same relation.

    Returns one row per changed key: ``*key_cols, change_type`` where
    change_type ∈ {'insert', 'delete', 'update'}. Unchanged keys are
    dropped (the common case — the output is delta-sized, not
    snapshot-sized).

    ``compare_cols`` defaults to every non-key column present in BOTH
    sides (schema drift: a column only one side has would mark every row
    updated — callers diffing across schema versions pass the stable
    subset explicitly).
    """
    if compare_cols is None:
        common = [c for c in cur.columns if c in set(prev.columns)]
        compare_cols = [c for c in common if c not in set(key_cols)]
    p = prev.select(*key_cols, _row_sig(compare_cols).alias("_sig_prev"))
    c = cur.select(*key_cols, _row_sig(compare_cols).alias("_sig_cur"))
    joined = p.join(c, key_cols, "full_outer")
    change = (
        F.when(F.col("_sig_prev").isNull(), F.lit("insert"))
        .when(F.col("_sig_cur").isNull(), F.lit("delete"))
        .when(F.col("_sig_prev") != F.col("_sig_cur"), F.lit("update"))
    )
    return (
        joined.withColumn(CHANGE_COL, change)
        .filter(F.col(CHANGE_COL).isNotNull())
        .select(*key_cols, CHANGE_COL)
    )
