"""SCD Type-2 merge — versioned dimension history without MERGE INTO.

The reference's upsert (J1/A9) is SCD Type-1: updates overwrite in
place. Warehouses also need Type-2 — keep every version with a validity
interval. Spark has no MERGE without a lakehouse table format, so this
is the pure-DataFrame emulation (anti-join + union), oracle-testable
and usable inside ``foreachBatch`` against any sink.

Contract: dimension rows carry (key, payload…, valid_from,
valid_to NULL=current). ``scd2_apply(dim, updates, key, ts)``:

* rows whose key is NOT in updates — unchanged;
* current rows (valid_to IS NULL) whose key IS updated AND whose
  payload differs — closed out (``valid_to = ts``);
* current rows whose key is updated but payload is identical —
  unchanged (no-op update produces no new version);
* each genuinely-new (key, payload) — appended with
  ``valid_from = ts, valid_to = NULL``; unknown keys insert the same
  way.

Scale: one shuffle on ``key`` (the join), one union — no windows over
the full history; history rows (valid_to set) stream through untouched.
``updates`` must be unique per key (latest-wins pre-dedup is the
caller's job — dedup_first by a batch sequence does it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _payload_neq(cols: list[str], a: str, b: str) -> Column:
    """NULL-safe any-column-differs between prefixed sides."""
    neq = None
    for c in cols:
        d = ~F.col(f"{a}.{c}").eqNullSafe(F.col(f"{b}.{c}"))
        neq = d if neq is None else (neq | d)
    return neq if neq is not None else F.lit(False)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one batch of updates at timestamp literal ``ts``; returns the
    new full dimension relation (same schema as ``dim``)."""
    payload_cols = [c for c in dim.columns if c not in (key, valid_from, valid_to)]
    upd = updates.select(key, *payload_cols).alias("u")
    d = dim.alias("d")

    history = dim.filter(F.col(valid_to).isNotNull())
    current = d.filter(F.col(f"d.{valid_to}").isNull())

    joined = current.join(upd, F.col(f"d.{key}") == F.col(f"u.{key}"), "left")
    changed = F.col(f"u.{key}").isNotNull() & _payload_neq(payload_cols, "d", "u")

    kept_current = joined.filter(~changed).select("d.*")
    closed = joined.filter(changed).select(
        *[F.col(f"d.{c}") for c in [key, *payload_cols, valid_from]],
        F.lit(ts).cast(dim.schema[valid_to].dataType).alias(valid_to),
    )

    # new versions: changed payloads + brand-new keys
    cur_keys = dim.filter(F.col(valid_to).isNull()).select(
        F.col(key),
        F.lit(1).alias("__cur_exists"),
        *[F.col(c).alias(f"__cur_{c}") for c in payload_cols],
    )
    u2 = updates.select(key, *payload_cols).join(cur_keys, key, "left")
    is_new_key = F.col("__cur_exists").isNull()
    differs = None
    for c in payload_cols:
        dne = ~F.col(c).eqNullSafe(F.col(f"__cur_{c}"))
        differs = dne if differs is None else (differs | dne)
    fresh = u2.filter(is_new_key | differs).select(
        key,
        *payload_cols,
        F.lit(ts).cast(dim.schema[valid_from].dataType).alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    )

    cols = dim.columns
    return (
        history.select(*cols)
        .unionByName(kept_current.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(fresh.select(*cols))
    )
