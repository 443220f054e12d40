"""Streaming maintenance of a count-min sketch over an unbounded
document stream — corpus-scale token/key frequencies kept queryable
while data arrives, in O(d×w) state.

Follows the dedup-gate state discipline (streaming/dedup_gate.py):
per-micro-batch parquet dirs under ``state_dir/batch_id=<i>`` with
idempotent overwrite (a retried batch rewrites its own dir and excludes
its failed attempt on read), checkpointed exactly-once file handling,
and generation-folding compaction bounding listing cost.

**The counting-state twist.** The dedup gate's fold is crash-safe
because its state is a SET consumed through distinct semi-joins —
duplicate rows never change a decision, so "write generation, then
delete subsumed dirs" tolerates a crash between the two steps. A
counting state has no such absorption: a generation PLUS a lingering
subsumed dir double-counts. The manifest machinery handling that lives
in streaming/counting_state.py (shared with the quantile-sketch
stream); this module supplies the CMS cell schema and the per-batch
sketch builder.

At 100 TB/day the same layout holds: each micro-batch contributes a
≤(d×w)-row sketch (the batch's own aggregation is the only shuffle,
keyed on d×w cells), the store grows one bounded dir per batch, and
compaction is a cell-wise sum over ≤(dirs × d × w) rows — trivially
parallel, no single-task fold. Reference scope: the reference has no
streaming or sketches; this extends the engine per the build brief.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators.sketches import cms_build
from reddit_apache_airflow_postgres_pipeline_spark.streaming import counting_state as _cs

_CELLS = "row int, col int, c long"
_KEYS = ["row", "col"]
_MANIFEST = _cs.MANIFEST

# Compact once the store accumulates this many batch_id=* dirs (same
# listing-cliff rationale as dedup_gate._COMPACT_AFTER_DIRS).
_COMPACT_AFTER_DIRS = 16

# thin aliases: tests and callers address the store through this module
_state_subdirs = _cs.state_subdirs
_subsumed_ids = _cs.subsumed_ids


def occurrences_from_batch(
    batch_df: DataFrame, key_col: str, text_col: str | None
) -> DataFrame:
    """The engine-wide streaming occurrence contract, shared by every
    sketch-maintenance stream (CMS, HH): tokenize ``text_col`` under
    the whitespace contract when given (each token = one occurrence),
    else one occurrence per row of ``key_col``. Output column name =
    ``key_col``."""
    if text_col is not None:
        from reddit_apache_airflow_postgres_pipeline_spark.operators.textstats import tokens

        return batch_df.select(F.explode(tokens(text_col)).alias(key_col))
    return batch_df.select(F.col(key_col))


def _meta(d: int | None = None, w: int | None = None) -> dict:
    """Store format marker (counting_state.stamp_meta): geometry is
    part of the cell semantics — summing stores built under different
    (d, w) is silent garbage the one-sided runtime extent guard cannot
    always catch."""
    m: dict = {"format": "cms-cells"}
    if d is not None:
        m["d"] = d
    if w is not None:
        m["w"] = w
    return m


def read_sketch(
    spark: SparkSession,
    state_dir: str,
    before_batch: int | None = None,
    d: int | None = None,
    w: int | None = None,
) -> DataFrame:
    """The current corpus sketch: cell-wise sum over every live state
    dir — see counting_state.read_counts for the liveness/retry
    contract. Pass ``d``/``w`` to reject a store stamped with a
    different geometry."""
    _cs.check_meta(state_dir, _meta(d, w))
    return _cs.read_counts(
        spark, state_dir, _CELLS, _KEYS, "c", before_batch=before_batch
    )


def compact_state(
    spark: SparkSession, state_dir: str, exclude_from: int | None = None
) -> None:
    """Fold live dirs (and prior generations) into one new generation
    with a transitive ``_subsumed.json`` manifest; see
    counting_state.compact_counts for the crash-safety argument."""
    _cs.compact_counts(
        spark, state_dir, _CELLS, _KEYS, "c", exclude_from=exclude_from
    )


def run_cms_available_now(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str = "tok",
    text_col: str | None = None,
    d: int = 4,
    w: int = 256,
    compact_after_dirs: int = _COMPACT_AFTER_DIRS,
) -> None:
    """Drain ``input_dir`` (parquet files) into the sketch store with an
    availableNow trigger. When ``text_col`` is given, each row's text is
    tokenized (the engine-wide whitespace contract) and every token is
    one count increment; otherwise each input row is one occurrence of
    its ``key_col`` value. Per-batch overwrite + the checkpoint give
    exactly-once counting across restarts and retries."""
    _cs.stamp_meta(state_dir, _meta(d, w))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        occ = occurrences_from_batch(batch_df, key_col, text_col)
        cms_build(occ, key_col, d=d, w=w).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )
        if _cs.live_dir_count(state_dir) > compact_after_dirs:
            compact_state(
                batch_df.sparkSession, state_dir, exclude_from=batch_id
            )

    (
        stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
