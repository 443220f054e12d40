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
subsumed dir double-counts. So every generation commits with a
``_subsumed.json`` manifest (atomic with the generation itself — one
directory rename) listing every batch/generation id it folded,
transitively; readers take the NEWEST generation's manifest as the
exclusion set, which makes the subsequent deletes pure GC: a crash
anywhere between rename and the last delete leaves estimates exactly
unchanged. (Spark's parquet reader skips ``_``-prefixed files, so the
manifest can live inside the generation dir.)

At 100 TB/day the same layout holds: each micro-batch contributes a
≤(d×w)-row sketch (the batch's own aggregation is the only shuffle,
keyed on d×w cells), the store grows one bounded dir per batch, and
compaction is a cell-wise sum over ≤(dirs × d × w) rows — trivially
parallel, no single-task fold. Reference scope: the reference has no
streaming or sketches; this extends the engine per the build brief.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from reddit_apache_airflow_postgres_pipeline_spark.operators.sketches import cms_build

_CELLS = "row int, col int, c long"
_MANIFEST = "_subsumed.json"

# Compact once the store accumulates this many batch_id=* dirs (same
# listing-cliff rationale as dedup_gate._COMPACT_AFTER_DIRS).
_COMPACT_AFTER_DIRS = 16


def _state_subdirs(state_dir: str) -> dict[str, int]:
    """{path: batch_id} for every ``batch_id=*`` dir in the store."""
    if not os.path.isdir(state_dir):
        return {}
    out = {}
    for d in os.listdir(state_dir):
        p = os.path.join(state_dir, d)
        if d.startswith("batch_id=") and os.path.isdir(p):
            out[p] = int(d.split("=", 1)[1])
    return out


def _subsumed_ids(state_dir: str) -> set[int]:
    """Exclusion set = the NEWEST (most negative id) generation's
    manifest. Older generations are in that manifest by construction,
    so one file answers for the whole history; no generations → empty.
    Driver-side and file-count sized, like the gate's dir listing."""
    gens = {p: i for p, i in _state_subdirs(state_dir).items() if i < 0}
    if not gens:
        return set()
    newest = min(gens, key=gens.get)
    with open(os.path.join(newest, _MANIFEST)) as f:
        return set(json.load(f))


def read_sketch(
    spark: SparkSession, state_dir: str, before_batch: int | None = None
) -> DataFrame:
    """The current corpus sketch: cell-wise sum over every live state
    dir — live = not named by the newest generation's manifest (folded
    dirs awaiting GC must not count twice) and, when ``before_batch``
    is given (the in-flight batch id on the retry path), not written by
    batch ids ≥ it. Generations (negative ids) always pass the retry
    filter, as in dedup_gate._load_state."""
    try:
        df = spark.read.schema(_CELLS + ", batch_id long").parquet(state_dir)
    except AnalysisException:
        return spark.createDataFrame([], _CELLS)
    subsumed = _subsumed_ids(state_dir)
    if subsumed:
        df = df.filter(~F.col("batch_id").isin([int(i) for i in subsumed]))
    if before_batch is not None:
        df = df.filter(F.col("batch_id") < before_batch)
    return df.groupBy("row", "col").agg(F.sum("c").alias("c"))


def compact_state(
    spark: SparkSession, state_dir: str, exclude_from: int | None = None
) -> None:
    """Fold live dirs (and prior generations) into one new generation.

    1. sum the live cells (excluding the in-flight batch via
       ``exclude_from``, so its dir survives for retry exclusion) into
       a tmp dir OUTSIDE the store;
    2. drop the transitive subsumed-id manifest into the tmp dir;
    3. rename tmp into the store as ``batch_id=<next_gen>`` — the
       manifest and the folded counts become visible atomically;
    4. delete the subsumed dirs. Pure GC: a crash anywhere after (3)
       changes nothing a reader computes, because (3)'s manifest
       already excludes every subsumed dir.
    """
    dirs = _state_subdirs(state_dir)
    prior_subsumed = _subsumed_ids(state_dir)
    # finish any interrupted GC first: dirs already named by the newest
    # manifest are invisible to readers, so deleting them here is safe
    # and keeps the listing bounded across crash-restart cycles
    for p, i in list(dirs.items()):
        if i in prior_subsumed:
            shutil.rmtree(p, ignore_errors=True)
            del dirs[p]
    fold_ids = {
        i
        for i in dirs.values()
        if i < 0 or exclude_from is None or i < exclude_from
    }
    if len(fold_ids) < 2:
        return
    next_gen = min(min(dirs.values()), 0) - 1
    folded = read_sketch(spark, state_dir, before_batch=exclude_from)
    tmp = state_dir.rstrip("/") + "__compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    folded.repartition("row", "col").write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _MANIFEST), "w") as f:
        json.dump(sorted(prior_subsumed | fold_ids), f)
    os.replace(tmp, os.path.join(state_dir, f"batch_id={next_gen}"))
    for p, i in dirs.items():
        if i in fold_ids:
            shutil.rmtree(p, ignore_errors=True)


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
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        if text_col is not None:
            from reddit_apache_airflow_postgres_pipeline_spark.operators.textstats import tokens

            occ = batch_df.select(
                F.explode(tokens(text_col)).alias(key_col)
            )
        else:
            occ = batch_df.select(key_col)
        cms_build(occ, key_col, d=d, w=w).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )
        subsumed = _subsumed_ids(state_dir)
        live = sum(
            1 for i in _state_subdirs(state_dir).values() if i not in subsumed
        )
        if live > compact_after_dirs:
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
