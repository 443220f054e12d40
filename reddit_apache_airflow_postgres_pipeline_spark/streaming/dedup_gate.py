"""Streaming near-duplicate admission gate: MinHash-LSH bucket filtering
of a document stream against the already-accepted corpus.

The LLM-ingest shape: documents arrive continuously; a doc is admitted
only if none of its MinHash band buckets has been claimed by an
earlier-accepted doc. Bucket state lives in a parquet directory keyed by
micro-batch (idempotent overwrite per batch id — a retried batch
rewrites its own subdirectory, so the sink is exactly-once alongside the
checkpoint), and the band-key definition is shared with the batch miner
(operators/neardup.py:minhash_band_keys), so streaming and batch agree
on the bucket universe.

Admission policy — **pessimistic first-wins**, deterministic and
order-free within a batch: a doc is REJECTED iff one of its band buckets
(a) exists in the accepted-state store (claimed by an earlier batch /
the seeded corpus), or (b) is shared with a smaller ``doc_id`` inside
its own batch — whether or not that smaller doc is itself admitted.
(b) makes the rule slightly stricter than a sequential greedy scan on
collision *chains* (A–B, B–C, no A–C: greedy would re-admit C), in
exchange for being computable as two joins with no per-doc iteration —
the property that lets one micro-batch of a million docs gate in a
single shuffle round.

Scale posture: state is touched only through (bucket-key) semi/anti
joins on skinny strings; the stream side is map work (signatures) plus
one self-agg per batch. At 100 TB of accepted corpus, the state store
becomes a bucketed table on ``bk`` so the per-batch semi-join prunes to
matching buckets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from reddit_apache_airflow_postgres_pipeline_spark.operators.neardup import minhash_band_keys

_BK_SCHEMA = "doc long, bk string"


def _load_state(spark: SparkSession, state_dir: str) -> DataFrame:
    try:
        return spark.read.schema(_BK_SCHEMA).parquet(state_dir)
    except AnalysisException:
        return spark.createDataFrame([], _BK_SCHEMA)


def gate_batch(
    batch_df: DataFrame,
    state: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Apply the admission policy to one (batch, state) pair.

    Returns (accepted_rows, accepted_band_keys) — the second is what the
    caller appends to the state store. Pure DataFrame logic so the batch
    path is unit-testable without a stream."""
    keys = minhash_band_keys(
        batch_df, id_col, text_col, n, num_hashes, bands
    )
    hit_prev = (
        keys.join(state.select("bk").distinct(), "bk", "left_semi")
        .select("doc")
        .distinct()
    )
    min_per_bucket = keys.groupBy("bk").agg(F.min("doc").alias("min_doc"))
    hit_batch = (
        keys.join(min_per_bucket, "bk")
        .filter(F.col("doc") > F.col("min_doc"))
        .select("doc")
        .distinct()
    )
    rejected = hit_prev.unionAll(hit_batch).distinct()
    accepted = batch_df.join(
        rejected.withColumnRenamed("doc", id_col), id_col, "left_anti"
    )
    accepted_keys = keys.join(rejected, "doc", "left_anti")
    return accepted, accepted_keys


def run_gate_available_now(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> None:
    """Drain ``input_dir`` (parquet files) through the gate with an
    availableNow trigger. Accepted rows land under
    ``out_dir/batch_id=<i>/``, their band keys under
    ``state_dir/batch_id=<i>/`` — per-batch overwrite makes a retried
    micro-batch idempotent, and the checkpoint guarantees each input
    file is gated exactly once across restarts."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        state = _load_state(batch_df.sparkSession, state_dir)
        accepted, accepted_keys = gate_batch(
            batch_df, state, id_col, text_col, n, num_hashes, bands
        )
        accepted.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )
        accepted_keys.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
