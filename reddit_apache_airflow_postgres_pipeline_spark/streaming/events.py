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

def read_events_stream(
    spark: SparkSession, events_dir: str, nanos: bool | None = None
) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    At scale the same transforms run unchanged on a Kafka source
    (``readStream.format("kafka")`` + ``from_json``); the file source is
    what the test environment can exercise hermetically.

    The physical encoding of ``ts`` is auto-detected at stream
    construction with one batch schema read of the same directory, so
    the streaming side always agrees with the batch loader
    (sources/tables.py) no matter how the files were written:

    * TIMESTAMP(NANOS) (no Spark type) surfaces as LongType under
      ``legacy.parquet.nanosAsLong`` and gets the integer-div-1000
      truncation to micros;
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false infers as
      ``timestamp_ntz`` — which event-time watermarks REJECT
      (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so it is cast to
      ``timestamp``. The session runs UTC (session.py), making the
      cast instant-preserving and the streamed values equal to the
      batch loader's.

    Contract: ``ts`` is always ``TimestampType`` on the way out —
    watermark-ready regardless of how the writer encoded it. The
    directory must contain at least one file when the stream is
    constructed (true for every drain-style use here; a from-empty
    deployment would pass an explicit schema instead). ``nanos`` is
    retained for source compatibility and ignored — detection
    supersedes the caller's guess, which is the point: a hardcoded
    flag is exactly what broke when the upstream writer switched
    encodings.
    """
    del nanos  # auto-detected; see docstring
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    physical = spark.read.parquet(events_dir).schema
    df = spark.readStream.schema(physical).parquet(events_dir)
    if "ts" in physical.fieldNames():
        ts_type = physical["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # integer div — ns values overflow double precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(ts_type, T.TimestampType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


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
