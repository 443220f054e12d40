"""Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969)
— the standard entity-resolution operator a crawl-corpus user reaches
for right after near-duplicate dedup: given two record feeds (or one
feed against itself), which pairs describe the SAME real-world entity?

The model: for each comparison field ``f`` with match probability
``m_f = P(agree | same entity)`` and chance-agreement probability
``u_f = P(agree | different entities)``, a candidate pair scores

    weight = Σ_f  log2(m_f / u_f)            if the pair agrees on f
             Σ_f  log2((1−m_f) / (1−u_f))    otherwise

and classifies by two thresholds: ``weight ≥ t_upper`` → match,
``weight ≤ t_lower`` → non-match, else possible (clerical review). The
m/u parameters are either supplied or fitted unsupervised by
:func:`fs_fit_em` over the agreement-pattern counts (Winkler's EM
workflow — the pattern relation this module emits is exactly EM's
sufficient statistics, at most 2^|fields| rows).

Scale shape — the whole point of BLOCKED linkage: candidate pairs come
from one equi-join on a blocking key (never a cross product; compare
the banded self-join in operators/neardup.py), optionally df-capped so
a hot block cannot go quadratic, and the scoring is a map-side
expression over the pair relation. At 100 TB the plan is: shuffle both
feeds once on the block key, join, score — the same shape as any big
equi-join, with the block-size cap bounding the worst key.

Determinism contract: per-field agree/disagree weights are computed
driver-side (:func:`fs_weights`) and rounded to 6 dp, so both engines
sum identical DECIMAL literals — no float log2 inside either engine.

Reference scope: the reference pipeline has no linkage; this extends
the engine per the build brief (SURVEY.md north-star operators), reusing
its first-wins-dedup key discipline (dags/Combine_send_to_postgresql.py
builds hashed entity keys, file:96-117) for the id columns.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fs_weights(
    m: dict[str, float], u: dict[str, float], digits: int = 6
) -> dict[str, tuple[float, float]]:
    """Per-field (agree_weight, disagree_weight) = (log2(m/u),
    log2((1−m)/(1−u))), rounded to ``digits`` dp driver-side so both
    engines consume identical literals. Probabilities must lie strictly
    in (0, 1) with m > u (an informative field)."""
    if set(m) != set(u):
        raise ValueError(
            f"m and u must cover the same fields: m has {sorted(m)}, "
            f"u has {sorted(u)}"
        )
    out = {}
    for f in m:
        mf, uf = m[f], u[f]
        if not (0.0 < uf < mf < 1.0):
            raise ValueError(
                f"field {f!r}: need 0 < u < m < 1, got m={mf}, u={uf}"
            )
        out[f] = (
            round(math.log2(mf / uf), digits),
            round(math.log2((1.0 - mf) / (1.0 - uf)), digits),
        )
    return out


def block_pairs(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    id_col: str = "rec_id",
    fields: list[str] | None = None,
    max_block_size: int | None = None,
    self_dedupe: bool = False,
) -> DataFrame:
    """Blocked candidate-pair generation: one equi-join on the blocking
    key(s). Both inputs must carry ``id_col``, the block columns, and
    the comparison ``fields``; output is (id_l, id_r, <f>_l, <f>_r ...)
    plus the block columns.

    ``max_block_size`` drops blocks larger than the cap on EITHER side
    before the join — the df-cap discipline from neardup.py: a hot
    block (think blocking on an empty-string zip code) otherwise
    contributes |block|² pairs and owns the job at scale. Dropped
    blocks are a recall-for-bound trade the caller opts into; count
    them beforehand if you need the audit.

    ``self_dedupe`` keeps only id_l < id_r — set it when linking a feed
    against itself.
    """
    fields = fields or []

    # on self-linkage (left IS right) compute the block-size aggregate
    # once and reuse it for both sides — a second corpus-wide count
    # pass would be pure waste at scale
    cap_cache: dict[int, DataFrame] = {}

    def _cap(df: DataFrame) -> DataFrame:
        if max_block_size is None:
            return df
        if id(df) not in cap_cache:
            cap_cache[id(df)] = (
                df.groupBy(*block_cols)
                .agg(F.count("*").alias("__bn"))
                .filter(F.col("__bn") <= max_block_size)
            )
        return df.join(cap_cache[id(df)], block_cols).drop("__bn")

    l = _cap(left).select(
        *block_cols,
        F.col(id_col).alias("id_l"),
        *[F.col(f).alias(f"{f}_l") for f in fields],
    )
    r = _cap(right).select(
        *block_cols,
        F.col(id_col).alias("id_r"),
        *[F.col(f).alias(f"{f}_r") for f in fields],
    )
    pairs = l.join(r, block_cols)
    if self_dedupe:
        pairs = pairs.filter(F.col("id_l") < F.col("id_r"))
    return pairs


def _agree(f: str) -> Column:
    """Field agreement: null-safe equality with NULL-vs-anything (and
    NULL-vs-NULL) counted as DISAGREE — a missing value carries no
    linkage evidence, the conservative FS convention."""
    lc, rc = F.col(f + "_l"), F.col(f + "_r")
    return lc.isNotNull() & rc.isNotNull() & (lc == rc)


def fs_score(
    pairs: DataFrame,
    weights: dict[str, tuple[float, float]],
    t_upper: float,
    t_lower: float,
) -> DataFrame:
    """Score blocked pairs: per-field agreement booleans, the total
    log-likelihood weight (DECIMAL sum of the 6-dp per-field literals —
    exact, order-free), and the three-way decision. Map-side only."""
    if t_lower > t_upper:
        raise ValueError(f"t_lower {t_lower} > t_upper {t_upper}")
    agree_cols = [ _agree(f).alias(f"agree_{f}") for f in weights ]
    scored = pairs.select("id_l", "id_r", *agree_cols)
    term = [
        F.when(F.col(f"agree_{f}"), F.lit(aw).cast("decimal(18,6)")).otherwise(
            F.lit(dw).cast("decimal(18,6)")
        )
        for f, (aw, dw) in weights.items()
    ]
    total = term[0]
    for t in term[1:]:
        total = total + t
    scored = scored.withColumn("weight", F.round(total.cast("double"), 6))
    return scored.withColumn(
        "decision",
        F.when(F.col("weight") >= t_upper, F.lit("match"))
        .when(F.col("weight") <= t_lower, F.lit("non_match"))
        .otherwise(F.lit("possible")),
    )


def fs_link(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    m: dict[str, float],
    u: dict[str, float],
    id_col: str = "rec_id",
    t_upper: float = 4.0,
    t_lower: float = 0.0,
    max_block_size: int | None = None,
    self_dedupe: bool = False,
) -> DataFrame:
    """Blocked Fellegi–Sunter linkage end-to-end: block → compare →
    weight → classify. Output: (id_l, id_r, agree_<f>..., weight,
    decision), one row per surviving candidate pair."""
    w = fs_weights(m, u)
    pairs = block_pairs(
        left,
        right,
        block_cols,
        id_col=id_col,
        fields=list(w),
        max_block_size=max_block_size,
        self_dedupe=self_dedupe,
    )
    return fs_score(pairs, w, t_upper, t_lower)


def fs_fit_em(
    scored_pairs: DataFrame,
    fields: list[str],
    p0: float = 0.1,
    m0: float = 0.8,
    u0: float = 0.2,
    rounds: int = 3,
) -> DataFrame:
    """Fit the Fellegi–Sunter m/u parameters by EM (Winkler 1988) —
    the step production linkage runs BEFORE :func:`fs_score`: given the
    per-pair agreement vectors (any relation with boolean
    ``agree_<f>`` columns, e.g. fs_score output), learn
    ``m_f = P(agree|match)``, ``u_f = P(agree|non-match)`` and the
    match proportion ``p``. Output: (field, m, u, p_match), one row
    per field, after ``rounds`` EM rounds from the (p0, m0, u0) start.

    The sufficient statistics are the agreement-PATTERN counts — at
    most 2^|fields| rows — so EM iterates on a tiny relation: one
    corpus-scale aggregate (localCheckpoint'ed, the engine's iterative
    idiom), then constant-round E/M steps whose per-round arithmetic
    rounds (w at 9 dp, params at 6 dp, DECIMAL pattern sums) replay
    bit-for-bit in the unrolled-CTE oracle — the fifth iterative
    algorithm under that discipline (kmeans, PageRank, power-iteration
    PCA, BPE, EM).

    Conditional-independence caveat (inherent to FS-EM): correlated
    fields bias m/u; the round count is a fixed contract, not a
    convergence test.
    """
    if not fields:
        raise ValueError("fields must be non-empty")
    acols = [f"agree_{f}" for f in fields]
    counts = (
        scored_pairs.groupBy(*acols)
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint()
    )
    tot = counts.agg(F.sum("n").alias("__N"))
    spark = scored_pairs.sparkSession
    params = spark.range(1).select(
        F.lit(float(p0)).alias("p"),
        *[F.lit(float(m0)).alias(f"m_{f}") for f in fields],
        *[F.lit(float(u0)).alias(f"u_{f}") for f in fields],
    )
    dec = "decimal(28,12)"
    for _ in range(rounds):
        j = counts.crossJoin(F.broadcast(params))
        num_m = F.col("p")
        num_u = F.lit(1.0) - F.col("p")
        for f in fields:
            num_m = num_m * F.when(
                F.col(f"agree_{f}"), F.col(f"m_{f}")
            ).otherwise(F.lit(1.0) - F.col(f"m_{f}"))
            num_u = num_u * F.when(
                F.col(f"agree_{f}"), F.col(f"u_{f}")
            ).otherwise(F.lit(1.0) - F.col(f"u_{f}"))
        w = F.round(num_m / (num_m + num_u), 9)
        e = j.select(
            *acols,
            "n",
            F.round(F.col("n") * w, 9).alias("__nw"),
            F.round(F.col("n") * (F.lit(1.0) - w), 9).alias("__nv"),
        )
        aggs = [
            F.sum(F.col("__nw").cast(dec)).cast("double").alias("__sw"),
            F.sum(F.col("__nv").cast(dec)).cast("double").alias("__sv"),
        ]
        for f in fields:
            aggs.append(
                F.sum(
                    F.when(F.col(f"agree_{f}"), F.col("__nw"))
                    .otherwise(F.lit(0.0))
                    .cast(dec)
                )
                .cast("double")
                .alias(f"__swg_{f}")
            )
            aggs.append(
                F.sum(
                    F.when(F.col(f"agree_{f}"), F.col("__nv"))
                    .otherwise(F.lit(0.0))
                    .cast(dec)
                )
                .cast("double")
                .alias(f"__svg_{f}")
            )
        s = e.agg(*aggs).crossJoin(F.broadcast(tot))
        out = [
            F.round(F.col("__sw") / F.col("__N"), 6).alias("p"),
        ]
        for f in fields:
            out.append(
                F.when(
                    F.col("__sw") > 0,
                    F.round(F.col(f"__swg_{f}") / F.col("__sw"), 6),
                )
                .otherwise(F.lit(0.0))
                .alias(f"m_{f}")
            )
            out.append(
                F.when(
                    F.col("__sv") > 0,
                    F.round(F.col(f"__svg_{f}") / F.col("__sv"), 6),
                )
                .otherwise(F.lit(0.0))
                .alias(f"u_{f}")
            )
        # 1-row relation; checkpoint keeps the unrolled plan constant
        params = s.select(*out).localCheckpoint()
    # EMPTY pair relation → p is NULL (sum over nothing / N) — emit 0
    # rows, matching the SQL oracle's empty aggregate, instead of a
    # garbage parameter row. Output built per-field with unionByName
    # (never an expr/stack string round-trip: field names are data,
    # not SQL identifiers — 'bal-band' would mis-parse as subtraction).
    params = params.filter(F.col("p").isNotNull())
    out_rows = [
        params.select(
            F.lit(f).alias("field"),
            F.col(f"m_{f}").alias("m"),
            F.col(f"u_{f}").alias("u"),
            F.col("p").alias("p_match"),
        )
        for f in fields
    ]
    result = out_rows[0]
    for r in out_rows[1:]:
        result = result.unionByName(r)
    return result
