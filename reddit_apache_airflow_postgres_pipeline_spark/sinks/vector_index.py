"""Persisted IVF vector index: build once, query many times with
partition pruning.

``ivf_knn`` (operators/similarity.py) recomputes centroids and the
corpus assignment on every call — right for one-shot queries, wrong
for a served index over a 100 TB corpus. This sink writes the index as
two parquet relations:

* ``<path>/centroids`` — (cell, cv), n_cells rows
* ``<path>/postings``  — (neighbor_id, embedding, cell), the corpus
  partitioned **by cell**, so a query probing ``n_probe`` cells reads
  only those directories — real partition pruning, verified by
  ``tests/test_bucketed.py``-style plan assertions in
  tests/test_vector_index.py.

Centroids come from :func:`kmeans_refine` (deterministic Lloyd steps)
so a rebuilt index on the same corpus is byte-identical — the property
that makes index builds idempotent and diffable across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators.similarity import (
    cosine,
    ivf_assign,
    ivf_centroids,
    kmeans_refine,
)


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build and persist the index. ``refine_iters=0`` keeps the raw
    seeded centroids (cheapest build); ≥1 runs deterministic Lloyd
    refinement first."""
    if refine_iters > 0:
        cents = kmeans_refine(corpus, n_cells, refine_iters, id_col, vec_col)
        # seeds are float vectors, refined centroids double — store double
        cents = cents.select("cell", F.col("cv").cast("array<double>").alias("cv"))
    else:
        cents = ivf_centroids(corpus, n_cells, id_col, vec_col).select(
            "cell", F.col("cv").cast("array<double>").alias("cv")
        )
    assigned = ivf_assign(corpus, cents, id_col, vec_col, out_id="neighbor_id")
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    (
        assigned.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/postings")
    )


def query_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """(query_id, neighbor_id, score): exact cosine top-k within the
    probed cells of a persisted index. The ``cell IN (probed)`` join
    key reaches the postings scan as a partition filter — only the
    probed directories are read."""
    from pyspark.sql import Window

    cents = spark.read.parquet(f"{path}/centroids")
    postings = spark.read.parquet(f"{path}/postings")
    probes = ivf_assign(
        queries, cents, id_col, vec_col, n_probe=n_probe, out_id="query_id"
    )
    qv = probes.select("query_id", F.col(vec_col).alias("__qv"), "cell")
    cv = postings.select("neighbor_id", F.col(vec_col).alias("__cv"), "cell")
    score = F.round(cosine(F.col("__cv"), F.col("__qv")), round_digits)
    scored = (
        cv.join(F.broadcast(qv), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", score)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def append_to_ivf_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally add vectors to a persisted index — the operational
    path a served 100 TB index needs: a daily embedding delta cannot
    afford a full rebuild, and the FROZEN centroids make the append
    exactly equivalent to having built with the union corpus from the
    start (``tests/test_vector_index.py`` pins that equality).

    The delta is assigned against the index's own persisted centroids
    (broadcast, map-only) and appended into the cell-partitioned
    postings — Spark's dynamic partition append touches only the cells
    the delta lands in. Quantizer drift is the accepted trade (same as
    FAISS's ``add`` after ``train``): as the corpus distribution moves,
    recall decays until the next scheduled rebuild; the
    :func:`reddit_apache_airflow_postgres_pipeline_spark.plans.registry_ml.q_ivf_recall`-style
    audit is the signal for when.

    Caller contract: delta ids must be disjoint from the indexed ids
    (dedup upstream — the engine's first-wins family — or the reader
    sees duplicates, exactly as with any append-only store).
    """
    spark = new_vectors.sparkSession
    cents = spark.read.parquet(f"{path}/centroids")
    assigned = ivf_assign(new_vectors, cents, id_col, vec_col, out_id="neighbor_id")
    (
        assigned.write.mode("append")
        .partitionBy("cell")
        .parquet(f"{path}/postings")
    )
