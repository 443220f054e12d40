"""Streaming maintenance of a persisted vector index: drain arriving
embedding files into the IVF postings store or the IVFPQ codes store,
exactly-once.

The operational loop a served 100 TB index lives by: deltas arrive
continuously, each micro-batch is encoded against the index's FROZEN
quantizers (broadcast, map-shaped — `sinks/vector_index.py`'s append
contract) and lands as the store's ``batch_id=<i>`` dir named by the
STREAM's batch id — so a retried micro-batch overwrites its own dir
instead of minting a new one (stream ids are offset by
``vector_index.STREAM_ID_BASE`` so they never collide with the build's
batch 0 or ad-hoc appends), and the checkpoint guarantees each input
file is indexed exactly once across restarts. When the live-dir listing
grows past the threshold the store folds into one cell-partitioned
generation (distinct-mode compaction with the subsumption manifest), so
probe reads stay partition-pruned and listing-bounded over an unbounded
run. Quantizer drift over the stream is the standard accepted trade;
the recall audits (q_sim_ivf_recall / q_sim_pq_recall /
q_sim_ivfpq_recall) are the rebuild signal.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from reddit_apache_airflow_postgres_pipeline_spark.sinks import vector_index as _vi
from reddit_apache_airflow_postgres_pipeline_spark.streaming import counting_state as _cs

_COMPACT_AFTER_DIRS = 16


def run_index_append_available_now(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    index_path: str,
    checkpoint_dir: str,
    kind: str = "ivfpq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_after_dirs: int = _COMPACT_AFTER_DIRS,
) -> None:
    """Drain ``input_dir`` (parquet files of (id, vector) rows) into a
    persisted index with an availableNow trigger. ``kind``: "ivf"
    appends raw-vector postings, "ivfpq" appends PQ codes, "binary"
    appends sign signatures. The index must already exist
    (write_ivf_index / write_ivfpq_index / write_binary_index — the
    quantizers are frozen; this stream never retrains them, and the
    binary kind has nothing to retrain at all). Caller contract
    unchanged from the batch appends: delta ids disjoint from indexed
    ids."""
    _vi.check_kind(kind)
    append = _vi.APPENDERS[kind]
    compact = _vi.COMPACTORS[kind]
    store = os.path.join(index_path, _vi.STORE_SUBDIR[kind])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        sid = _vi.STREAM_ID_BASE + batch_id
        append(batch_df, index_path, id_col, vec_col, batch_id=sid)
        if _cs.live_dir_count(store) > compact_after_dirs:
            compact(batch_df.sparkSession, index_path, exclude_from=sid)

    (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_text_index_append_available_now(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_after_dirs: int = _COMPACT_AFTER_DIRS,
) -> None:
    """Drain arriving DOCUMENT files (raw text, no vectors) into a
    persisted text index, exactly-once — the composition the r10
    verdict named as the one remaining seam between the batch serving
    loop and production: admitted documents → ``embed_text`` →
    ``append_to_*_index`` with no manual embed hop.

    The index must already exist (``sinks/text_index.write_text_index``
    on the validated snapshot — the same snapshot that froze the drift
    gate's reference can train the quantizers). Featurizer params and
    store kind come from the index's own ``text_meta.json``, so this
    stream takes NO embedding arguments: a restarted or re-deployed
    drain cannot drift the geometry. Micro-batch ids map above
    ``STREAM_ID_BASE`` (idempotent per-dir overwrite on retry, no
    collision with ad-hoc appends), and the live-dir threshold folds
    the store exactly like the raw-vector append stream. Parity with
    the batch path (same docs ⇒ identical served top-k) and restart
    safety are pinned by tests/test_text_index_stream.py."""
    from reddit_apache_airflow_postgres_pipeline_spark.sinks import text_index as _ti

    _ti.text_index_meta(index_path)  # fail loud before starting
    store = _ti.text_index_store(index_path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        sid = _vi.STREAM_ID_BASE + batch_id
        _ti.append_text_to_index(
            batch_df, index_path, id_col=id_col, text_col=text_col,
            batch_id=sid,
        )
        if _cs.live_dir_count(store) > compact_after_dirs:
            _ti.compact_text_index(
                batch_df.sparkSession, index_path, exclude_from=sid
            )

    (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_media_index_append_available_now(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "media_id",
    compact_after_dirs: int = _COMPACT_AFTER_DIRS,
) -> None:
    """Drain arriving MEDIA files (binary payloads + typed metadata, no
    vectors) into a persisted media index, exactly-once — the media twin
    of the text drain: an arriving image/audio/video payload becomes
    servable with no manual feature hop.

    The index must already exist (``sinks/media_index.write_media_index``
    on the validated snapshot). The codec and store kind come from the
    index's own ``media_meta.json``, so this stream takes NO
    featurization arguments: a restarted or re-deployed drain cannot
    drift the geometry. Micro-batch ids map above ``STREAM_ID_BASE``
    (idempotent per-dir overwrite on retry, no collision with ad-hoc
    appends), and the live-dir threshold folds the store exactly like
    the raw-vector and text append streams. Parity with the batch path
    (same media ⇒ identical served top-k) and restart safety are pinned
    by tests/test_media_index_stream.py."""
    from reddit_apache_airflow_postgres_pipeline_spark.sinks import media_index as _mi

    _mi.media_index_meta(index_path)  # fail loud before starting
    store = _mi.media_index_store(index_path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        sid = _vi.STREAM_ID_BASE + batch_id
        _mi.append_media_to_index(
            batch_df, index_path, id_col=id_col, batch_id=sid
        )
        if _cs.live_dir_count(store) > compact_after_dirs:
            _mi.compact_media_index(
                batch_df.sparkSession, index_path, exclude_from=sid
            )

    (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_index_delete_available_now(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    index_path: str,
    checkpoint_dir: str,
    kind: str = "ivfpq",
    id_col: str = "vec_id",
    compact_after_dirs: int = _COMPACT_AFTER_DIRS,
) -> None:
    """Drain erasure requests (parquet files of id rows) into a
    persisted index's tombstone store, exactly-once — the streaming
    half of the GDPR path (`sinks/vector_index.delete_from_index`):
    a deletion queue is operationally identical to an ingest queue,
    and the erasure SLA starts when the tombstone lands, not when the
    bytes are physically gone.

    Each micro-batch's ids become one tombstone batch dir named by the
    stream's id (offset by ``STREAM_ID_BASE``, overwritten on retry —
    the same idempotence contract as the append stream); from that
    moment every probe read shadows the ids. When the tombstone
    listing grows past ``compact_after_dirs`` the DATA store runs a
    FULL compaction (the only kind that physically drops tombstoned
    rows and GCs the absorbed tombstone dirs — a partial compaction
    deliberately keeps tombstones live). ``kind`` picks which data
    store that compaction folds; the tombstone store itself is
    kind-agnostic. Single-writer discipline: don't run the full
    compaction concurrently with an append stream on the same store
    (same rule as the batch API's exclude_from contract)."""
    compact = _vi.COMPACTORS[_vi.check_kind(kind)]
    tomb = _vi._tomb_store(index_path)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def _delete(batch_df: DataFrame, batch_id: int) -> None:
        sid = _vi.STREAM_ID_BASE + batch_id
        _vi.delete_from_index(batch_df, index_path, id_col, batch_id=sid)
        if _cs.live_dir_count(tomb) > compact_after_dirs:
            compact(batch_df.sparkSession, index_path)

    (
        stream.writeStream.foreachBatch(_delete)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
