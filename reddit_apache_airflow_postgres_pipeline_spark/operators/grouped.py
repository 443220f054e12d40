"""Grouped-map Pandas operators (``groupBy().applyInPandas``).

The sanctioned escape hatch for per-group logic the built-in aggregates
can't express (model scoring, per-group curve fits, bespoke
normalization): Spark shuffles each group to one task and hands it to a
Python function as ONE Arrow-backed pandas DataFrame — vectorized, not
row-at-a-time. Contract at scale: a group must fit in one task's memory
(use it for per-key groups, never a global "group by nothing"), and the
function must be deterministic in the group's ROW SET, not its row
order — Spark does not guarantee intra-group order, so anything
order-sensitive must sort first.

This module keeps the demonstration operator numerically exact:
``group_zscore`` works on integer-valued measures, where sums and
sums-of-squares are exact in float64 and therefore independent of
summation order — the property that lets a DuckDB SQL oracle replay the
same numbers bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def group_zscore(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group z-score via ``applyInPandas``: for each row,
    ``(x - mean(group)) / std_pop(group)``, rounded; single-member or
    zero-variance groups score 0.0.

    Output: ``group_col, id_col, zscore``. The pandas function computes
    mean and population std from exact integer sums (``x.sum()``,
    ``(x*x).sum()`` — float64-exact for integer-valued inputs), so the
    result is order-free and reproducible in SQL.
    """
    import pandas as pd  # local: Arrow path imports lazily like multimodal.py

    out_schema = f"{group_col} string, {id_col} long, zscore double"

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].astype("float64")
        n = len(x)
        s = x.sum()
        ss = (x * x).sum()
        mean = s / n
        var = ss / n - mean * mean
        if n < 2 or var <= 0:
            z = pd.Series([0.0] * n, index=pdf.index)
        else:
            z = (x - mean) / (var ** 0.5)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].astype(str),
                id_col: pdf[id_col],
                "zscore": z.round(round_digits),
            }
        )

    return (
        df.select(group_col, id_col, value_col)
        .groupBy(group_col)
        .applyInPandas(_one, schema=out_schema)
    )


def cogroup_type_balance(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Co-grouped-map Pandas (``groupBy().cogroup().applyInPandas``):
    for each key, both sides' rows arrive as two pandas DataFrames in
    one Python call — the extension point for per-key two-table logic
    (custom as-of matching, per-entity reconciliation) that a join
    can't express row-wise.

    Demonstration statistic (exact-arithmetic, oracle-replayable):
    per key, each side's row count and integer value sum, plus their
    difference — keys present on one side only still produce a row
    (counts 0), which is exactly the semantics an outer join + 2 aggs
    needs three shuffles for and cogroup does in one pass per side.

    Output: ``key, n_left, n_right, sum_left, sum_right, balance``.
    """
    import pandas as pd

    out_schema = (
        f"{key_col} long, n_left long, n_right long, "
        "sum_left long, sum_right long, balance long"
    )

    def _one(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        key = l[key_col].iloc[0] if len(l) else r[key_col].iloc[0]
        sl = int(l[value_col].sum()) if len(l) else 0
        sr = int(r[value_col].sum()) if len(r) else 0
        return pd.DataFrame(
            {
                key_col: [key],
                "n_left": [len(l)],
                "n_right": [len(r)],
                "sum_left": [sl],
                "sum_right": [sr],
                "balance": [sl - sr],
            }
        )

    lsel = left.select(key_col, value_col)
    rsel = right.select(key_col, value_col)
    return lsel.groupBy(key_col).cogroup(rsel.groupBy(key_col)).applyInPandas(
        _one, schema=out_schema
    )
