"""Streaming analytics over the ``events`` table shape.

The reference has no true streaming operators (SURVEY.md §2.E) — these
are the declared engine extensions: watermarked tumbling / session
windows and watermark-bounded key dedup, built on Structured Streaming's
built-in stateful operators so state is RocksDB/HDFS-checkpointable and
bounded (nothing driver-side).

Batch/stream parity: ``tumbling_counts`` / ``session_agg`` produce the
same relations as the batch registry queries (``q_events_tumbling_1h``,
``q_events_session_30m``) when run over the same files with
``Trigger.AvailableNow`` — the transform is identical DataFrame code; only
the source/sink differ. That parity is what the tests assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # TESTDATA parquet stores TIMESTAMP(NANOS) which Spark has no type
        # for: read as long (legacy.parquet.nanosAsLong), truncate to
        # micros — identical to the batch loader (sources/tables.py).
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, events_dir: str, nanos: bool = True
) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    At scale the same transforms run unchanged on a Kafka source
    (``readStream.format("kafka")`` + ``from_json``); the file source is
    what the test environment can exercise hermetically. ``nanos=False``
    reads files whose ``ts`` is already a standard TIMESTAMP(MICROS)
    (e.g. Spark-written), skipping the nanos workaround.
    """
    if not nanos:
        schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.TimestampType())
                for f in EVENTS_SCHEMA
            ]
        )
        return spark.readStream.schema(schema).parquet(events_dir)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, event_type) count + value sum with late-data bound.

    The watermark caps state: windows older than max(ts) - watermark are
    finalized and evicted — the knob that keeps an unbounded stream's
    state finite at 100 TB/day input rates.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding (hopping) window agg — each event lands in
    window/slide overlapping windows; watermark bounds state exactly as
    in :func:`tumbling_counts`. Batch shape: ``q_events_sliding_2h1h``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session windows (gap-based), watermark-bounded."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming D1 analog: drop re-deliveries of the same key arriving
    within the watermark horizon (``dropDuplicatesWithinWatermark``).
    Unlike batch first-wins dedup, an unbounded stream cannot keep all
    keys forever; the watermark bounds the dedup state exactly like the
    reference's upsert bounds it with the Postgres PK (D2) — duplicates
    beyond the horizon become updates, not errors."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_available_now(stream_df: DataFrame, checkpoint_dir: str, table_name: str) -> None:
    """Drain the stream into an in-memory sink (complete/append chosen by
    Spark from the plan) and block until done — test/drain helper mirroring
    the reference's cron-tick batch run."""
    mode = "complete" if stream_df.isStreaming and _has_agg(stream_df) else "append"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _has_agg(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan
