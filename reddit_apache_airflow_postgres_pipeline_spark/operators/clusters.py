"""Duplicate-cluster resolution: near-dup PAIRS → connected components →
one canonical document per cluster.

The top of the dedup ladder (exact → fingerprint → MinHash-LSH pairs →
THIS): pair output alone can't drive deletion — if A~B and B~C, keeping
"one of each pair" double-deletes. The component's minimum doc id is the
deterministic canonical survivor, so downstream curation is
``docs.join(clusters, 'doc', 'left').filter(canonical IS NULL OR
canonical == doc)``.

Algorithm: iterative min-label propagation over the undirected edge
list. Each round, every node takes the min of its own label and its
neighbors' labels; a fixpoint is reached after O(component diameter)
rounds (near-dup clusters are shallow — duplicates of a common source —
so this converges in a handful of rounds in practice; ``max_iter``
guards pathological chains). Each round is ONE shuffle join keyed on
doc id plus a min-aggregate — no driver-side graph, no collects.

Lineage discipline (the iterative-plan trap): round i+1's labels
reference round i's TWICE (neighbor-min join + convergence check), so
without truncation the logical plan doubles per round — measured to hit
Spark's 2 GiB plan-string cap by round ~12. Each round is therefore
``localCheckpoint``ed (eager): the plan resets to a leaf scan of
materialized blocks, keeping round cost constant. localCheckpoint
blocks live on executors and die with them — on a real cluster point
``spark.sparkContext.setCheckpointDir`` at durable storage and swap in
``checkpoint()`` if executor loss mid-algorithm must be survivable.
For graphs with huge diameters prefer alternating small-star/large-star
(pointer jumping, O(log n) rounds) — not needed for near-dup workloads.

Deterministic and oracle-checkable: DuckDB reproduces the fixpoint with
a recursive CTE (registry_ml._clusters_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id_a, id_b) undirected pair relation → (doc, canonical).

    ``canonical`` is the minimum doc id reachable from ``doc``; every
    doc appearing in at least one pair gets a row (singletons never
    enter the pair relation and are implicitly their own canonical).
    Raises if ``max_iter`` rounds don't reach the fixpoint — a sign the
    pair graph is not near-dup-shaped."""
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()  # eager: materialized once, leaf plan
    )
    labels = (
        edges.select("u").distinct().withColumn("lbl", F.col("u")).localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("__nlbl"))
        )
        new_labels = (
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least(F.col("lbl"), F.coalesce("__nlbl", F.col("lbl"))).alias(
                    "lbl"
                ),
            )
            .localCheckpoint()  # truncate lineage — see module docstring
        )
        # labels only ever decrease, so "changed" = strictly smaller
        changed = (
            new_labels.join(labels.select("u", F.col("lbl").alias("__old")), "u")
            .filter(F.col("lbl") < F.col("__old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("u").alias("doc"), F.col("lbl").alias("canonical")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Filter ``docs`` to one canonical representative per near-dup
    cluster: the component-minimum doc id survives, non-paired docs pass
    through untouched. The join is doc-count sized on the cluster side —
    broadcastable when clusters are rare (AQE decides)."""
    comp = connected_components(pairs, id_a, id_b)
    return (
        docs.join(comp, docs[id_col] == comp["doc"], "left")
        .filter(F.col("canonical").isNull() | (F.col("canonical") == docs[id_col]))
        .drop("doc", "canonical")
    )
