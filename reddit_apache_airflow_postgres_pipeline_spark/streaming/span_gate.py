"""Streaming exact duplicated-substring (span) admission gate: the
online form of operators/curation.dedup_spans (Lee et al. ExactSubstr),
keyed on the SAME k-gram universe so batch and stream agree on what a
duplicated span is.

Semantics — **first-wins, like the rest of the engine's dedup family**:
a k-gram's effective occurrence count for batch ``i`` is (cumulative
count from batches < i) + (its count within batch i). Tokens covered by
a gram meeting ``min_occurrences`` are dropped from the batch's docs
before they are emitted. The divergence from the monolithic batch
operator is deliberate and one-sided: dedup_spans drops ALL copies of a
duplicated span, but an online gate cannot revise documents it already
flushed — so the FIRST copy (emitted while the gram was still below the
bar) survives and every later copy is dropped. A single-batch drain is
exactly the batch operator (tests pin both properties).

State = corpus-wide ``(gram, c)`` counts on the shared crash-safe
counting store (streaming/counting_state.py, ``sum`` mode): per-batch
idempotent dirs, retry exclusion via ``before_batch``, manifest-guarded
generation folds, and a format marker carrying ``k`` so stores built
under a different gram width refuse to merge. The state is
gram-vocabulary-sized — exactly the batch operator's count relation,
which IS the ExactSubstr memory footprint (the paper pays a suffix
array for the same information); at 100 TB the store becomes a
``gram``-bucketed table and the per-batch join prunes to matching
grams, the dedup_gate posture.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators.curation import dedup_spans, kgrams
from reddit_apache_airflow_postgres_pipeline_spark.streaming import counting_state as _cs

_GRAM_SCHEMA = "gram string, c long"
_KEYS = ["gram"]

# Compact once the store accumulates this many batch_id=* dirs (same
# listing-cliff rationale as dedup_gate._COMPACT_AFTER_DIRS).
_COMPACT_AFTER_DIRS = 16


def _meta(k: int, min_occurrences: int) -> dict:
    """Store format marker: the gram width and occurrence bar are part
    of the count semantics — summing stores built under a different
    ``k`` silently mixes incomparable gram universes."""
    return {
        "format": "span-gram-counts",
        "k": k,
        "min_occurrences": min_occurrences,
    }


def read_gram_counts(
    spark: SparkSession,
    state_dir: str,
    before_batch: int | None = None,
) -> DataFrame:
    """The cumulative ``(gram, c)`` corpus counts: key-wise sum over
    every live state dir — counting_state.read_counts' liveness/retry
    contract."""
    return _cs.read_counts(
        spark, state_dir, _GRAM_SCHEMA, _KEYS, "c", before_batch=before_batch
    )


def compact_state(
    spark: SparkSession, state_dir: str, exclude_from: int | None = None
) -> None:
    """Fold live dirs into one manifest-guarded generation (sum state —
    see counting_state.compact_counts)."""
    _cs.compact_counts(
        spark, state_dir, _GRAM_SCHEMA, _KEYS, "c", exclude_from=exclude_from
    )


def gate_batch(
    batch_df: DataFrame,
    prior_counts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_occurrences: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Apply the span gate to one (batch, state) pair.

    Returns (cleaned_docs, batch_gram_counts): the first is
    dedup_spans' output relation (doc_id, n_tokens, dropped_tokens,
    text_clean) with the occurrence bar shifted by ``prior_counts``;
    the second is the batch's raw ``(gram, c)`` counts — what the
    caller appends to the state store (raw, not post-drop: the batch
    operator counts over the raw corpus, and first-wins needs every
    sighting on the books). Pure DataFrame logic so the batch path is
    unit-testable without a stream — and replayable as the parity
    test's sequential batch form.

    The gram counts are computed ONCE (checkpointed — they're bounded
    by the batch's gram vocabulary and get persisted as state anyway)
    and fed to dedup_spans as its count source, so the per-batch gram
    fan-out and count shuffle are not paid twice."""
    counts = (
        kgrams(batch_df, id_col, text_col, k)
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint()
    )
    cleaned = dedup_spans(
        batch_df,
        id_col,
        text_col,
        k=k,
        min_occurrences=min_occurrences,
        prior_counts=prior_counts,
        batch_counts=counts,
    )
    return cleaned, counts


def run_span_gate_available_now(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_occurrences: int = 2,
    compact_after_dirs: int = _COMPACT_AFTER_DIRS,
) -> None:
    """Drain ``input_dir`` (parquet files) through the span gate with an
    availableNow trigger. Cleaned docs land under
    ``out_dir/batch_id=<i>/``, the batch's gram counts under
    ``state_dir/batch_id=<i>/`` — per-batch overwrite makes a retried
    micro-batch idempotent (its failed attempt's counts are excluded on
    read via ``before_batch``), and the checkpoint guarantees each
    input file is gated exactly once across restarts."""
    _cs.stamp_meta(state_dir, _meta(k, min_occurrences))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            prior = read_gram_counts(
                batch_df.sparkSession, state_dir, before_batch=batch_id
            )
            cleaned, counts = gate_batch(
                batch_df, prior, id_col, text_col, k, min_occurrences
            )
            cleaned.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch_id={batch_id}")
            )
            counts.write.mode("overwrite").parquet(
                os.path.join(state_dir, f"batch_id={batch_id}")
            )
            if _cs.live_dir_count(state_dir) > compact_after_dirs:
                compact_state(
                    batch_df.sparkSession, state_dir, exclude_from=batch_id
                )
        finally:
            batch_df.unpersist()

    (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
