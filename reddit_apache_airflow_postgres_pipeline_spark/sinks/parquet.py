"""Partitioned parquet writes — the layout that makes 100 TB readable.

Hive-style ``partitionBy`` directories give free partition PRUNING: a
filter on the partition column never touches non-matching files (the
scan's ``PartitionFilters``, not a data filter). Combined with
``maxRecordsPerFile`` this bounds both file sizes and file counts — the
two failure modes of petabyte table layouts (giant unsplittable files /
millions of tiny ones).

Guidance encoded here: partition on LOW-cardinality columns users filter
by (date, kind, cell); bucket (sinks/bucketed.py) on HIGH-cardinality
join keys; never partition on high-cardinality columns (one directory
per value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)
