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

    Event-time contract: a column named ``ts`` always comes out as
    ``TimestampType`` (TIMESTAMP_LTZ; session TZ is UTC) no matter how
    the writer encoded it — the same normalization the streaming reader
    applies (streaming/events.py), so batch and stream relations agree
    on values AND schema:

    * TIMESTAMP(NANOS) — no Spark type; read as long
      (``legacy.parquet.nanosAsLong``) and integer-div-truncate to
      micros (matches a DuckDB ``CAST(ts AS TIMESTAMP)``);
    * TIMESTAMP(MICROS) isAdjustedToUTC=false — inferred
      ``timestamp_ntz``; cast (instant-preserving under UTC session).
      NTZ also cannot carry an event-time watermark, so letting it
      leak out would make every relation stream-incompatible.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema:
        if field.name == "ts":
            if isinstance(field.dataType, T.LongType):
                # integer div — ns values overflow double precision
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif not isinstance(field.dataType, T.TimestampType):
                df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` can be used."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
