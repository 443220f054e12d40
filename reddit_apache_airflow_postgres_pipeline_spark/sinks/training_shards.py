"""Training-shard export: the terminal sink of the curation pipeline.

Composes the curation operators into the layout a trainer reads:
``hash_split`` (deterministic train/val/test) → ``pack_chunks``
(per-shard concat-and-chunk token budgeting) → hive-partitioned parquet
by ``split``. Partitioning on the 3-value split column gives free
partition pruning (a val-set scan never lists train files);
``maxRecordsPerFile`` bounds shard file sizes so downstream loaders get
splittable, uniformly-sized inputs. Doc order inside each (split,
shard) is the ``id_col`` order ``pack_chunks`` packed by, so
``chunk_id`` remains meaningful after the roundtrip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from reddit_apache_airflow_postgres_pipeline_spark.operators.curation import hash_split, pack_chunks
from reddit_apache_airflow_postgres_pipeline_spark.sinks.parquet import write_partitioned


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
    chunk_tokens: int = 2048,
    train_pct: int = 90,
    val_pct: int = 5,
    max_records_per_file: int | None = None,
) -> DataFrame:
    """Split, pack, and write ``df`` as training shards under ``path``.

    Returns the exact DataFrame that was written (split + n_tok +
    chunk_id columns appended) so callers can run audits against it
    without re-reading the sink."""
    assigned = hash_split(df, id_col, train_pct, val_pct)
    packed = pack_chunks(
        assigned, id_col, text_col, shard_col, chunk_tokens
    )
    write_partitioned(
        packed, path, ["split"], max_records_per_file=max_records_per_file
    )
    return packed
