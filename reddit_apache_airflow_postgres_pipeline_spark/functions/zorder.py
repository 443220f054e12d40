"""Z-order (Morton) interleave keys for multi-dimensional data layout.

Sorting a 100 TB table by ONE column clusters that column only; range
predicates on a second column then scan everything. Writing ordered by
a Z-key interleaves the bits of several columns so that rows close in
ANY of the dimensions land in the same parquet row groups — min/max
statistics then prune multi-predicate scans (the technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``; public literature: Morton 1966).

Everything here is integer bit arithmetic in Column expressions —
deterministic, codegen, and replayable in ANSI SQL (the oracle in
plans/registry.py re-derives keys with the same shifts), so the layout
key is testable like any other operator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleaved Morton key of ``len(cols)`` non-negative ints using
    the low ``bits`` of each (values are masked, so callers bucket /
    range-normalize first — see :func:`bucketize`). Bit j of column i
    lands at position ``j * n_cols + i``; total bits must fit a signed
    long (``bits * n_cols ≤ 63``).
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs >= 2 columns")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds a signed long")
    key = F.lit(0).cast("long")
    for i, col in enumerate(cols):
        c = (F.col(col) if isinstance(col, str) else col).cast("long")
        for j in range(bits):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, j * n + i)
    return key


def bucketize(col: Column | str, lo: float, hi: float, buckets: int) -> Column:
    """Map a numeric column into [0, buckets) by linear range — the
    normalization step before interleaving unlike-scaled dimensions.
    Values at/beyond ``hi`` clamp to the top bucket; below ``lo`` to 0.
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    idx = F.floor((c - F.lit(lo)) / F.lit((hi - lo) / buckets)).cast("long")
    return F.greatest(F.lit(0).cast("long"),
                      F.least(F.lit(buckets - 1).cast("long"), idx))
