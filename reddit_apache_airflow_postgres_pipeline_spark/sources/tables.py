"""Parquet table loaders for the driver's synthetic star schema (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one parquet table. Plain ``spark.read.parquet`` on purpose:
    Catalyst handles column pruning + filter pushdown; nothing to add.

    Exception: files written with nanosecond timestamps (events.parquet)
    — Spark has no TIMESTAMP(NANOS) type, so read them as long and
    truncate to microseconds (matches a DuckDB ``CAST(ts AS TIMESTAMP)``).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            # integer div — ns values overflow double precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` can be used."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
