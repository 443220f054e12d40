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
