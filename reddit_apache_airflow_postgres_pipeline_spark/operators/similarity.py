"""Similarity search over embedding columns (``array<float>``).

Two strategies, same contract (query_id, neighbor_id, score):

* ``knn_bruteforce`` — exact top-k cosine for a (small) set of query
  vectors against the full corpus. The join is
  ``corpus × broadcast(queries)`` — a map-only pass over the corpus, so it
  scales linearly in corpus size at any cluster width (queries ≪ corpus).
* ``lsh_candidates`` / ``knn_lsh`` — sign-random-projection (SimHash-LSH)
  bucketing: vectors agreeing on all ``bits`` signs of deterministic
  hyperplanes land in a bucket; cosine is computed only within buckets.
  At 100 TB this replaces the corpus-wide scan per query with a
  bucket-equi-join (shuffle on bucket id, AQE handles skew).

Everything is built-in expressions (``zip_with``/``aggregate`` — JVM,
codegen); hyperplanes are deterministic pseudo-random literals derived
from a seed via a splitmix64-style integer mix, reproducible in ANSI SQL
for the oracle (plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ accumulated left-to-right in double (bit-reproducible)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim.

    splitmix64-style mix of (seed, bit, coordinate) — pure integer
    arithmetic so the SQL oracle can regenerate the identical planes.
    """
    planes = []
    for b in range(bits):
        row = []
        for d in range(dim):
            x = (seed * 1_000_003 + b * 10_007 + d) & 0xFFFFFFFFFFFFFFFF
            x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
            x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
            x = x ^ (x >> 31)
            row.append((x % 2_000_001) / 1_000_000.0 - 1.0)
        planes.append(row)
    return planes


def srp_signature(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: '10110…' string of sign bits."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(v) for v in row])
        bits.append(F.when(dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, score) — score rounded for
    cross-engine reproducibility; ranking is by (rounded score desc,
    neighbor_id asc) so ties are deterministic. Self-matches excluded.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    score = cosine(F.col("__cv"), F.col("__qv"))
    if round_digits is not None:
        score = F.round(score, round_digits)
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", score)
        .drop("__qv", "__cv")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def lsh_candidates(
    vectors: DataFrame,
    bits_per_band: int = 4,
    bands: int = 4,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (id_a < id_b) pairs sharing an SRP bucket in ANY band.

    ``bands`` independent signatures of ``bits_per_band`` sign bits each;
    candidate recall follows the LSH s-curve 1-(1-p^r)^b with
    p = 1 - θ/π. Each band is one shuffle on its bucket id — the scale
    path that replaces the quadratic cross join.
    """
    planes = hyperplanes(dim, bits_per_band * bands, seed)
    sig = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        *[
            srp_signature(
                vec_col, planes[b * bits_per_band : (b + 1) * bits_per_band]
            ).alias(f"bucket_{b}")
            for b in range(bands)
        ],
    )
    cands = None
    for b in range(bands):
        a = sig.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("__va"),
            F.col(f"bucket_{b}").alias("bk"),
        )
        c = sig.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("__vb"),
            F.col(f"bucket_{b}").alias("bk"),
        )
        pairs = (
            a.join(c, "bk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "__va", "__vb")
        )
        cands = pairs if cands is None else cands.unionByName(pairs)
    return cands.dropDuplicates(["id_a", "id_b"])


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.4,
    bits_per_band: int = 4,
    bands: int = 4,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded LSH + exact
    verify. Output (id_a, id_b, score ≥ threshold), no false positives;
    pairs split by every band are missed — the recall/cost trade is the
    (bits_per_band, bands) knob."""
    cand = lsh_candidates(vectors, bits_per_band, bands, seed, dim, id_col, vec_col)
    score = cosine(F.col("__va"), F.col("__vb"))
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (
        cand.withColumn("score", score)
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )
