"""Upsert-as-join: the pure-Spark semantic form of the reference's
``INSERT ... ON CONFLICT (thing_key) DO UPDATE`` (SURVEY.md J1/A9,
Combine_send_to_postgresql.py:239-249, README.md:188-195).

Semantics, per key in ``stage``:
  * key not in ``target``  → insert the stage row;
  * key in ``target``      → keep the target row but overwrite the
    ``update_cols`` with the stage values (partial update).
Target rows with no stage match pass through unchanged.

This form is oracle-checkable (DuckDB runs the literal ON CONFLICT) and is
what the JDBC sink executes server-side (sinks/postgres.py) — one
definition of the semantics, two execution strategies.

Scale design — the target NEVER shuffles. A naive full-outer join on the
key cannot be broadcast (Spark only supports shuffle strategies for full
outer), so instead:

  1. ``target LEFT OUTER broadcast(stage)``   — one map-side pass over the
     target produces updated + untouched rows (BroadcastHashJoin).
  2. ``matched = target LEFT SEMI broadcast(stage)`` keys — second
     map-side pass, output ≤ |stage| (tiny).
  3. ``inserts = stage LEFT ANTI broadcast(matched)`` — driver-scale join.
  4. union (1) ∪ (3).

At 100 TB target + MB-scale micro-batch stage this is two broadcast scans
and zero shuffles; with AQE both scans pipeline into the union. For a
LARGE stage (backfill) pass ``broadcast_stage=False`` to fall back to one
shuffled full-outer join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_matched(
    target_row_exists: F.Column,
    stage_row_exists: F.Column,
    key: str,
    cols: list[str],
    update_cols: list[str],
    t_col,
    s_col,
):
    """Column list implementing the per-column update policy."""
    out = [F.coalesce(t_col(key), s_col(key)).alias(key)]
    for c in cols:
        if c == key:
            continue
        if c in update_cols:
            # updatable: stage wins whenever a stage row exists
            out.append(
                F.when(stage_row_exists, s_col(c)).otherwise(t_col(c)).alias(c)
            )
        else:
            # immutable: target wins unless this key is a brand-new insert
            out.append(
                F.when(target_row_exists, t_col(c)).otherwise(s_col(c)).alias(c)
            )
    return out


def upsert_merge(
    target: DataFrame,
    stage: DataFrame,
    key: str,
    update_cols: list[str],
    broadcast_stage: bool = True,
) -> DataFrame:
    """Return the post-merge relation. ``stage`` must be unique on ``key``
    (the combine pipeline's dedup guarantees it; Postgres would raise
    ``cardinality_violation`` otherwise)."""
    cols = target.columns
    s = stage.select(
        F.col(key).alias("__sk"),
        *[F.col(c).alias(f"__s_{c}") for c in cols if c != key],
    )

    def s_col(c: str):
        return F.col("__sk") if c == key else F.col(f"__s_{c}")

    def t_col(c: str):
        return F.col(c)

    if broadcast_stage:
        sb = F.broadcast(s)
        # Pass 1: updates + untouched, map-side only.
        upd = target.join(sb, F.col(key) == F.col("__sk"), "left_outer").select(
            *_merge_matched(
                F.lit(True), F.col("__sk").isNotNull(), key, cols, update_cols, t_col, s_col
            )
        )
        # Pass 2: which stage keys matched (tiny output).
        matched = target.join(sb, F.col(key) == F.col("__sk"), "left_semi").select(
            F.col(key).alias("__mk")
        )
        inserts = (
            stage.join(F.broadcast(matched), F.col(key) == F.col("__mk"), "left_anti")
            .select(*cols)
        )
        return upd.unionByName(inserts)

    # Backfill path: single shuffled full-outer join.
    joined = target.join(s, F.col(key) == F.col("__sk"), "full_outer")
    return joined.select(
        *_merge_matched(
            F.col(key).isNotNull(),
            F.col("__sk").isNotNull(),
            key,
            cols,
            update_cols,
            t_col,
            s_col,
        )
    )
