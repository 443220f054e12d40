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


def compact_parquet(
    spark,
    src: str,
    dest: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite ``src`` into ``dest`` with
    ~``target_file_bytes`` per output file; returns the output file
    count.

    Incremental micro-batch ingestion (the inbox pattern) accretes tiny
    files; at scale that means listing storms, per-file open cost, and
    task-per-file scheduling. Compaction sizes files from the SOURCE's
    total on-disk bytes (driver-side file metadata — never row data),
    so output size tracks the input's actual compressed density.
    ``sort_within_by`` optionally clusters rows inside each output file
    (``sortWithinPartitions`` — no global shuffle beyond the
    repartition) so min/max footer stats make later predicate pushdown
    selective. ``dest`` must differ from ``src``: readers keep a
    consistent view and the swap stays an atomic rename/retarget for
    the caller."""
    import math

    if dest.rstrip("/") == src.rstrip("/"):
        raise ValueError("compact_parquet: dest must differ from src")
    sc = spark.sparkContext
    hconf = sc._jsc.hadoopConfiguration()
    jpath = sc._jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(hconf)
    summary = fs.getContentSummary(jpath)
    total_bytes = summary.getLength()
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(src).repartition(n_files)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    df.write.mode("overwrite").parquet(dest)
    import glob
    import os

    return len(glob.glob(os.path.join(dest, "part-*")))
