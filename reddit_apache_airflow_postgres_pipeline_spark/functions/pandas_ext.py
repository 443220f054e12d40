"""Sanctioned ``pandas_udf`` extension points — SURVEY.md §2.F.

Engine policy is builtin-first: every reference transform is a Column
expression (functions/expr.py), and NOTHING in the hot paths uses these.
They exist because §2.F declares scalar and grouped-aggregate
``pandas_udf`` as the two supported user extension surfaces (Arrow
batches, vectorized — never row-Python ``F.udf``), and a user of the
engine needs working, tested templates with the determinism rules spelled
out:

* operate on values, never on partition/row order;
* integer arithmetic (or exact-in-float64 integer sums) if the result
  feeds the DuckDB oracle — float reductions in numpy are pairwise, not
  sequential, so they do NOT bit-match SQL fold order;
* regex character classes written explicitly (``[\\t\\n\\f\\r ]``), because
  Python's ``\\s`` is wider than Java's and RE2's.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# RE2/Java-parity whitespace (see module docstring): NOT Python \s
_WS_RE = re.compile(r"[\t\n\f\r ]+")


@pandas_udf("long")
def token_count_pd(text: pd.Series) -> pd.Series:
    """Scalar pandas_udf: whitespace token count of lowercased text,
    empty tokens dropped. Vectorized over the Arrow batch; integer
    output — exactly reproducible in SQL."""
    return text.fillna("").map(
        lambda s: sum(1 for t in _WS_RE.split(s.lower().strip(" ")) if t)
    )


@pandas_udf("long")
def sum_long_pd(v: pd.Series) -> int:
    """Grouped-aggregate pandas_udf: exact integer sum of a long column
    (used inside ``groupBy().agg``; Spark routes the whole group's
    values into one call). Note Spark disallows mixing grouped-agg
    pandas UDFs with built-in aggregates in one ``agg()``
    (INVALID_PANDAS_UDF_PLACEMENT) — keep the agg list homogeneous."""
    return int(v.fillna(0).sum())


def token_count_pandas(col: Column | str) -> Column:
    """Column wrapper for :func:`token_count_pd`."""
    return token_count_pd(F.col(col) if isinstance(col, str) else col)
