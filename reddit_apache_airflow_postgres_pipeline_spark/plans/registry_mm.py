"""Query registry, part 3: multimodal binary columns.

The fake codec (operators/multimodal.py) makes the media path
oracle-checkable: payload bytes are deterministic (UTF-8 of document
text), so byte-count arithmetic — sizes, frame splits — is expressible
in ANSI SQL even though the decode itself runs in ``mapInPandas``.
``q_media_decode_stats`` (byte-level numpy statistics) has no SQL
equivalent and takes the rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators import multimodal as MM
from reddit_apache_airflow_postgres_pipeline_spark.plans.registry import _q
from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table

# Shared media derivation (must match multimodal.media_from_documents)
_MEDIA_SQL = """
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         encode(coalesce(text, '')) AS payload,
         CAST(16 + doc_id % 48 AS INT) AS width,
         CAST(16 + doc_id % 32 AS INT) AS height,
         CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
         CAST(1 + doc_id % 16 AS INT) AS n_frames
  FROM documents
"""


@_q(
    "q_media_meta_stats",
    "WITH media AS (" + _MEDIA_SQL + """)
    SELECT kind,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
           CAST(SUM(width * height) AS BIGINT) AS total_pixels,
           CAST(SUM(n_frames) AS BIGINT) AS total_frames,
           CAST(MAX(sample_rate) AS BIGINT) AS max_sample_rate
    FROM media GROUP BY kind
    """,
)
def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over the media relation — binary
    payloads flow through JVM-side expressions only (no Python)."""
    m = MM.media_from_documents(load_table(spark, sf_dir, "documents"))
    return m.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.sum(F.col("meta.width").cast("long") * F.col("meta.height")).alias("total_pixels"),
        F.sum(F.col("meta.n_frames").cast("long")).alias("total_frames"),
        F.max(F.col("meta.sample_rate").cast("long")).alias("max_sample_rate"),
    )


@_q(
    "q_media_frame_sample",
    "WITH media AS (" + _MEDIA_SQL + """)
    SELECT media_id,
           CAST((n_frames + 1) // 2 AS BIGINT) AS frames_kept,
           CAST(((n_frames + 1) // 2) * (octet_length(payload) // n_frames)
                AS BIGINT) AS frame_bytes
    FROM media
    WHERE kind = 'video' AND octet_length(payload) // n_frames > 0
    """,
)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (every 2nd frame) through the real
    ``mapInPandas`` path, then per-media accounting. The oracle reproduces
    the byte arithmetic (frame length = len//n, kept = ceil(n/2)) in SQL —
    the distributed plumbing is what's under test."""
    m = MM.media_from_documents(load_table(spark, sf_dir, "documents"))
    frames = MM.sample_frames(m, every_k=2)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count("*").alias("frames_kept"),
            F.sum(F.length("frame")).alias("frame_bytes"),
        )
        .filter(F.col("frame_bytes") > 0)
    )


@_q("q_media_decode_stats", None)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind statistics of decoded samples (fake codec: bytes are the
    uint8 sample grid). Byte-level numpy math has no SQL analog → rows-only
    driver check; exact values are asserted in tests/test_multimodal.py
    against a pure-Python recomputation."""
    m = MM.media_from_documents(load_table(spark, sf_dir, "documents"))
    stats = MM.decode_stats(m)
    return stats.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("byte_mean"), 4).alias("avg_byte_mean"),
        F.max("byte_max").alias("max_byte"),
    )
