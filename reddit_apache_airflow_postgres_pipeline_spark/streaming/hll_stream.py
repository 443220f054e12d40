"""Streaming maintenance of a HyperLogLog sketch over an unbounded
document stream — corpus-scale distinct-key cardinality kept queryable
while data arrives, in O(2^p) state per group.

Completes the streaming sketch trio beside the MinHash admission gate
(streaming/dedup_gate.py — set membership) and the count-min stream
(streaming/cms_stream.py — frequencies): this one answers "how many
DISTINCT keys has the stream seen?" without ever shuffling or storing
the raw keys.

Same store layout as the siblings: per-micro-batch parquet dirs under
``state_dir/batch_id=<i>`` with idempotent overwrite (a retried batch
rewrites its own dir and excludes its failed attempt on read),
checkpointed exactly-once file handling, and generation-folding
compaction bounding listing cost.

**The max-merge simplification.** The CMS stream's counting state needs
a ``_subsumed.json`` manifest because a generation PLUS a lingering
folded dir double-COUNTS. HLL state is register-wise MAX — an ABSORBING
merge: a folded dir surviving beside the generation that subsumed it
changes no register's max, so "write generation, then delete subsumed
dirs" is crash-safe with no manifest at all, exactly like the dedup
gate's set state. Readers just max over whatever dirs exist.

At 100 TB/day the same layout holds: each micro-batch contributes a
≤(groups × 2^p)-row sketch (the batch's own aggregation is the only
shuffle, keyed on (group, register)), the store grows one bounded dir
per batch, and compaction is a register-wise max over
≤(dirs × groups × 2^p) rows — trivially parallel, no single-task fold.
Reference scope: the reference has no streaming or sketches; this
extends the engine per the build brief.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators.sketches import _HLL_BITS, hll_build
from reddit_apache_airflow_postgres_pipeline_spark.streaming import counting_state as _cs

# Compact once the store accumulates this many batch_id=* dirs (same
# listing-cliff rationale as cms_stream._COMPACT_AFTER_DIRS).
_COMPACT_AFTER_DIRS = 16


def _registers_schema(group_cols: list[str] | None) -> str:
    """Store schema. Group columns are pinned to string in the stream
    store (cast them before the gate if needed) so reads are
    schema-stable without inference."""
    cols = "".join(f"{g} string, " for g in (group_cols or []))
    return cols + "register int, maxrank int"


# thin aliases: tests and callers address the store through this module
_state_subdirs = _cs.state_subdirs


def _meta(p: int | None = None) -> dict:
    """Store format marker: the 32→60-bit hash change keeps old
    sketches INSIDE the runtime register/rank guard (32-bit geometry is
    a subset) while hashing keys to different registers — only this
    marker catches a stale pre-change store (ADVICE r6)."""
    m = {"format": "hll-registers", "hash_bits": _HLL_BITS}
    if p is not None:
        m["p"] = p
    return m


def read_sketch(
    spark: SparkSession,
    state_dir: str,
    group_cols: list[str] | None = None,
    before_batch: int | None = None,
    p: int | None = None,
) -> DataFrame:
    """The current stream sketch: register-wise max over every state dir
    — delegated to counting_state.read_counts(agg="max"), which skips
    manifest bookkeeping because max absorbs duplicate dirs (see module
    docstring). ``before_batch`` (the in-flight batch id on the retry
    path) excludes the failed attempt's own dir; generations (negative
    ids) always pass, as in cms_stream. Pass ``p`` to also reject a
    store stamped with a different precision."""
    group_cols = group_cols or []
    _cs.check_meta(state_dir, _meta(p))
    return _cs.read_counts(
        spark,
        state_dir,
        _registers_schema(group_cols),
        [*group_cols, "register"],
        "maxrank",
        before_batch=before_batch,
        agg="max",
    )


def compact_state(
    spark: SparkSession,
    state_dir: str,
    group_cols: list[str] | None = None,
    exclude_from: int | None = None,
) -> None:
    """Fold every foldable dir (prior generations included) into one new
    generation, then delete the folded dirs — counting_state.
    compact_counts(agg="max"), which writes NO manifest: a crash
    between the rename and any delete leaves folded dirs beside the
    generation, and register-wise max over both is identical to either
    alone — the absorption the CMS stream's counting state lacks.
    ``exclude_from`` keeps the in-flight batch's dir out of the fold so
    it survives for retry exclusion."""
    group_cols = group_cols or []
    _cs.compact_counts(
        spark,
        state_dir,
        _registers_schema(group_cols),
        [*group_cols, "register"],
        "maxrank",
        exclude_from=exclude_from,
        agg="max",
    )


def run_hll_available_now(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str = "tok",
    text_col: str | None = None,
    group_cols: list[str] | None = None,
    p: int = 5,
    compact_after_dirs: int = _COMPACT_AFTER_DIRS,
) -> None:
    """Drain ``input_dir`` (parquet files) into the sketch store with an
    availableNow trigger. When ``text_col`` is given, each row's text is
    tokenized (the engine-wide whitespace contract) and every token is
    one key occurrence; otherwise each input row is one occurrence of
    its ``key_col`` value. Per-batch overwrite + the checkpoint give
    exactly-once semantics across restarts and retries — and max-merge
    would forgive even a double-applied batch."""
    group_cols = group_cols or []
    _cs.stamp_meta(state_dir, _meta(p))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        if text_col is not None:
            from reddit_apache_airflow_postgres_pipeline_spark.operators.textstats import tokens

            occ = batch_df.select(
                *group_cols, F.explode(tokens(text_col)).alias(key_col)
            )
        else:
            occ = batch_df.select(*group_cols, key_col)
        hll_build(occ, key_col, group_cols, p=p).write.mode(
            "overwrite"
        ).parquet(os.path.join(state_dir, f"batch_id={batch_id}"))
        if len(_state_subdirs(state_dir)) > compact_after_dirs:
            compact_state(
                batch_df.sparkSession,
                state_dir,
                group_cols,
                exclude_from=batch_id,
            )

    (
        stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
