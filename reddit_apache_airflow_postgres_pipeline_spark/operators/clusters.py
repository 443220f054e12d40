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


def pagerank(
    pairs: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    id_a: str = "id_a",
    id_b: str = "id_b",
    round_digits: int = 9,
) -> DataFrame:
    """PageRank over the undirected near-dup pair graph: (node, rank).

    The centrality read on dedup output — a high-rank node is the hub
    of a template family (the page every near-copy resembles), a more
    actionable survivor choice than min-id when clusters are star-
    shaped. Edges are symmetrized (each pair contributes both
    directions), so every node has out-degree ≥ 1 and the dangling-mass
    term vanishes; isolated docs simply don't appear (rank is relative
    within the pair graph).

    The iteration is a cross-engine CONTRACT like kmeans_refine:
    per-edge contributions ``rank/deg`` are rounded to ``round_digits``
    and summed as DECIMAL (order-free), and each round's ranks are
    rounded again — so DuckDB replays the loop bit-for-bit from
    unrolled CTEs (plans/registry_stats.py). No fixpoint test: ``iters``
    is a constant, which also keeps the oracle finite.

    Scale shape: per round, one join of the edge list against the
    ≤|V|-row rank relation (AQE broadcasts small rank sides; both sides
    hash on the node key otherwise) and one hash-agg — O(|E|) per
    round, never quadratic. Like connected_components, each round is
    localCheckpoint()ed so the plan stays constant-size across
    iterations (same 2 GiB plan-string trap, same remedy).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionAll(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .localCheckpoint()
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.agg(F.count("*").alias("n"))
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", F.round(F.lit(1.0) / F.col("n"), round_digits).alias("rank")
    )
    base = F.lit(1.0 - damping) / F.col("n")
    for _ in range(iters):
        contribs = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") / F.col("deg"), round_digits).alias("c"),
            )
        )
        summed = contribs.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(28,12)")).cast("double").alias("s")
        )
        ranks = (
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                F.round(
                    base + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                    round_digits,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
