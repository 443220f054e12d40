"""Deterministic hash-based corpus sampling.

``df.sample()`` draws from a per-partition RNG: the selected set changes
with partitioning, plan, and engine — unusable when a training-data
pipeline must be reproducible and auditable. The scalable practice is
CONTENT-ADDRESSED sampling: a doc is in the sample iff
``hash(salt ‖ key) mod M < rate·M`` — a pure map-side predicate,
stable across engines, partitionings, and reruns, and composable
(rate 0.5 then 0.2 over the same salt ≡ rate 0.1... for nested salts).

Per-stratum rates (``stratified_sample_by_hash``) give deterministic
stratified sampling — e.g. downsample by language or source while
keeping rare strata whole — as one broadcast join + the same predicate.

Hash: first 8 hex chars of md5 (32 uniform bits) — cheap, and DuckDB
reproduces it verbatim for the oracle (registry_ml)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 32


def hash_bucket(col: Column | str, salt: str = "", hex_chars: int = 8) -> Column:
    """Uniform bucket of ``salt ‖ key`` via the md5 prefix — 32-bit by
    default; ``hex_chars=15`` gives a 60-bit hash, the widest prefix
    that stays inside a signed BIGINT in both engines (DuckDB:
    ``('0x'||substr(md5(salt||k),1,hex_chars))::BIGINT``)."""
    if not 1 <= hex_chars <= 15:
        raise ValueError(f"hex_chars must be in [1, 15], got {hex_chars}")
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, hex_chars),
        16,
        10,
    ).cast("long")


def sample_by_hash(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose key hashes below ``rate`` of the bucket space.
    Map-side only (pushes past shuffles, no RNG, no state)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(hash_bucket(key_col, salt) < int(rate * _BUCKETS))


def stratified_sample_by_hash(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum ``s`` keeps
    ``rates.get(s, default_rate)`` of its rows by key hash. The rate
    table is a literal broadcast map — no shuffle, no second pass."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    thresh = F.lit(int(default_rate * _BUCKETS))
    expr = None
    for s, r in rates.items():
        cond = F.col(stratum_col) == s
        val = F.lit(int(r * _BUCKETS))
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    thresh = expr.otherwise(thresh) if expr is not None else thresh
    return df.filter(hash_bucket(key_col, salt) < thresh)


def sample_to_target_mix(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    shares: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Downsample to the LARGEST corpus matching a target stratum mix.

    Training-data pipelines fix domain proportions ("30% web, 20% code,
    …") before tokenization. Given target ``shares`` (fractions summing
    to ~1), the largest total honoring them without upsampling is
    ``N = min_s count_s / share_s``; stratum ``s`` then keeps
    ``rate_s = share_s · N / count_s`` of its rows. Selection is
    content-addressed (:func:`hash_bucket`), so the kept set is
    deterministic across engines/reruns and stable under repartitioning.
    Strata absent from ``shares`` are dropped (share 0).

    Scale shape: one tiny counts agg (|strata| rows), a 1-row min agg
    for N, both broadcast back — then a pure map-side filter over the
    corpus. No corpus shuffle at any scale.
    """
    if not shares:
        raise ValueError("shares must be non-empty")
    for s, r in shares.items():
        if r <= 0.0:
            raise ValueError(f"share for stratum {s!r} must be > 0, got {r}")
    share_expr = None
    for s, r in shares.items():
        cond = F.col(stratum_col) == s
        val = F.lit(float(r))
        share_expr = (
            F.when(cond, val) if share_expr is None else share_expr.when(cond, val)
        )
    per = (
        df.groupBy(stratum_col)
        .agg(F.count("*").alias("__cnt"))
        .withColumn("__share", share_expr)
        .filter(F.col("__share").isNotNull())
    )
    nmax = per.agg(F.min(F.col("__cnt") / F.col("__share")).alias("__N"))
    rates = (
        per.crossJoin(F.broadcast(nmax))
        # evaluation order pinned as (share * N) / cnt — the oracle SQL
        # replays the identical IEEE op sequence so thresholds agree bit-for-bit
        .select(
            stratum_col,
            F.least(
                F.lit(1.0), (F.col("__share") * F.col("__N")) / F.col("__cnt")
            ).alias("__rate"),
        )
    )
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(
            hash_bucket(key_col, salt)
            < F.floor(F.col("__rate") * F.lit(float(_BUCKETS))).cast("long")
        )
        .drop("__rate")
    )


def sample_weighted_by_hash(
    df: DataFrame, key_col: str, rate_col: str, salt: str = ""
) -> DataFrame:
    """Per-ROW deterministic Bernoulli sampling: keep a row iff
    ``hash(salt ‖ key) < floor(rate · 2³²)``, where ``rate`` is a
    column in [0, 1] (clamped). The weighted generalization of
    :func:`sample_by_hash` — importance sampling ∝ a per-doc score
    (e.g. ``exp(dsir_logw − max)``), still content-addressed: no RNG,
    stable across engines/partitionings/reruns, and monotone in the
    rate (raising a doc's rate can only add it, never drop it — the
    property that makes re-weighted re-runs incremental). Map-side
    only."""
    r = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col(rate_col)))
    return df.filter(
        hash_bucket(key_col, salt)
        < F.floor(r * F.lit(float(_BUCKETS))).cast("long")
    )


def sample_to_token_budget(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    shares: dict[str, float],
    budget_tokens: float,
    weight_col: str,
    salt: str = "",
) -> DataFrame:
    """Downsample to an ABSOLUTE token budget with target stratum
    shares — the data-mixing step a pretraining run actually performs:
    "2T tokens total: 50% web, 20% code, …" measured in TOKENS (the
    unit the loss sees), not documents. ``weight_col`` is the per-row
    token count (callers compute it with textstats.token_count so the
    counting contract stays theirs).

    Stratum ``s`` targets ``share_s · budget`` tokens against its
    available mass ``A_s = Σ weight``; its keep rate is
    ``min(1, share_s·budget / A_s)`` — under-filled strata keep
    everything (never upsampled; the audit query surfaces the
    shortfall). Selection is content-addressed per document
    (:func:`hash_bucket`), so expected kept tokens ≈ the target and
    the kept SET is deterministic across engines/reruns. Strata absent
    from ``shares`` are dropped.

    Scale shape: one |strata|-row weight agg broadcast back, then a
    pure map-side filter — no corpus shuffle, same as
    :func:`sample_to_target_mix`.
    """
    rates = token_budget_rates(
        df, stratum_col, shares, budget_tokens, weight_col
    ).select(stratum_col, "__rate")
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(
            hash_bucket(key_col, salt)
            < F.floor(F.col("__rate") * F.lit(float(_BUCKETS))).cast("long")
        )
        .drop("__rate")
    )


def token_budget_rates(
    df: DataFrame,
    stratum_col: str,
    shares: dict[str, float],
    budget_tokens: float,
    weight_col: str,
) -> DataFrame:
    """The per-stratum rate relation behind
    :func:`sample_to_token_budget`: (stratum, __avail, __share, __rate)
    — exposed so audit queries report the EXACT rate the filter
    applies (one formula, one evaluation order) instead of
    re-deriving it."""
    if not shares:
        raise ValueError("shares must be non-empty")
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be > 0, got {budget_tokens}")
    for s, r in shares.items():
        if r <= 0.0:
            raise ValueError(f"share for stratum {s!r} must be > 0, got {r}")
    share_expr = None
    for s, r in shares.items():
        cond = F.col(stratum_col) == s
        val = F.lit(float(r))
        share_expr = (
            F.when(cond, val) if share_expr is None else share_expr.when(cond, val)
        )
    per = (
        df.groupBy(stratum_col)
        .agg(F.sum(F.col(weight_col)).alias("__avail"))
        .withColumn("__share", share_expr)
        .filter(F.col("__share").isNotNull())
    )
    # evaluation order pinned as (share * budget) / avail; the zero-
    # avail guard keeps ANSI mode off a 0-division (empty strata)
    return per.select(
        stratum_col,
        "__avail",
        "__share",
        F.when(
            F.col("__avail") > 0,
            F.least(
                F.lit(1.0),
                (F.col("__share") * F.lit(float(budget_tokens)))
                / F.col("__avail").cast("double"),
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("__rate"),
    )


def sample_negatives_ring(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int,
    id_col: str = "doc_id",
    anchor_col: str = "doc_id",
    n_buckets_bits: int = 4,
    salt: str = "",
) -> DataFrame:
    """Deterministic uniform-ish NEGATIVE sampling for contrastive
    training: for each anchor, ``k`` pseudo-random corpus docs chosen
    by consistent-hash-ring lookup — (anchor, neg_rank, neg_id), no
    RNG, stable across engines/reruns/partitionings, and incremental
    (adding corpus docs only moves the negatives that land next to
    them on the ring, the consistent-hashing property).

    Mechanics: every corpus doc takes a ring position (32-bit md5
    bucket, uniquified by a low-bit id tie term — ids must fit 20
    bits); probe ``i`` of an anchor hashes to a position and matches
    the first doc clockwise (smallest position ≥ probe). The ring is
    split into ``2^n_buckets_bits`` hash-prefix buckets, each its own
    ring with internal wrap-around, so matching is a per-bucket
    BACKWARD as-of join on negated positions (operators/asof.py) —
    fully parallel, no global sort; raise the bucket count with corpus
    size. Draws are with replacement (two probes may hit the same
    doc); self-matches are filtered (an anchor occasionally gets
    k−1 negatives), both standard for negative sampling. A probe
    landing in a bucket holding NO corpus docs is dropped too — a
    tiny-corpus artifact (with corpus ≫ 2^n_buckets_bits the
    probability vanishes); lower ``n_buckets_bits`` if anchors come
    up short.
    """
    from reddit_apache_airflow_postgres_pipeline_spark.operators.asof import asof_join

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0 <= n_buckets_bits <= 16:
        raise ValueError(
            f"n_buckets_bits must be in [0, 16], got {n_buckets_bits}"
        )
    # the ring tie term needs an integral id: a non-numeric id column
    # would cast('long') to NULL, silently dropping those docs from the
    # ring (and shrinking every anchor's negative set) instead of
    # failing — validate the precondition up front (ADVICE r6)
    id_type = corpus.schema[id_col].dataType.typeName()
    if id_type not in ("byte", "short", "integer", "long"):
        raise TypeError(
            f"sample_negatives_ring needs an integral id column; "
            f"{id_col!r} is {id_type}"
        )
    shift = 32 - n_buckets_bits
    tie = 1 << 20
    h = hash_bucket(id_col, f"ring:{salt}")
    ring = corpus.select(
        F.col(id_col).alias("__neg"),
        F.shiftright(h, shift).alias("__bucket"),
        (h * tie + F.col(id_col).cast("long") % tie).alias("__pos"),
    ).withColumn("__negpos", -F.col("__pos"))
    # NULL ids hash to a NULL position — surface them as an error
    # rather than a quietly smaller ring
    ring = ring.where(
        F.assert_true(
            F.col("__pos").isNotNull(),
            F.lit(f"sample_negatives_ring: NULL {id_col} in corpus"),
        ).isNull()
    )
    ph = hash_bucket(
        F.concat(F.col("__anchor").cast("string"), F.lit(":"), F.col("__i")),
        f"probe:{salt}",
    )
    probes = (
        anchors.select(F.col(anchor_col).alias("__anchor"))
        .select("__anchor", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__i"))
        .select(
            "__anchor",
            "__i",
            F.shiftright(ph, shift).alias("__bucket"),
            (-(ph * tie)).alias("__negpos"),
        )
    )
    matched = asof_join(
        probes,
        ring.select("__bucket", "__negpos", "__neg"),
        on="__bucket",
        left_ts="__negpos",
        right_ts="__negpos",
        right_cols=["__neg"],
    )
    # wrap-around: a probe past its bucket's last doc takes the
    # bucket's FIRST doc (min position) — a <=2^bits-row broadcast
    fall = ring.groupBy("__bucket").agg(
        F.min_by("__neg", "__pos").alias("__fallback")
    )
    return (
        matched.join(F.broadcast(fall), "__bucket", "left")
        .select(
            F.col("__anchor").alias("anchor"),
            F.col("__i").alias("neg_rank"),
            F.coalesce(F.col("__neg_asof"), F.col("__fallback")).alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("anchor"))
    )


def _arrival_time(key_col: str, weight_col: str, salt: str) -> Column:
    """The Efraimidis-Spirakis exponential-race key t = −ln(u)/w with
    content-addressed u = (hash+0.5)/2³², rounded 9dp — the ONE
    definition of the oracle-parity-critical contract, shared by the
    global and per-group samplers (a dp or half-offset tweak in one
    copy would silently desynchronize the other's DuckDB hash-match).

    Fail-loud on non-positive weights (the pq_subvectors discipline):
    w=0 divides by zero and w<0 yields a negative arrival time that
    deterministically wins the top-k — either would silently corrupt
    the weighted sample, so a per-row runtime assert rejects them."""
    w = F.col(weight_col).cast("double")
    u = (hash_bucket(key_col, salt).cast("double") + 0.5) / F.lit(
        float(_BUCKETS)
    )
    return F.when(
        F.assert_true(
            w > 0.0,
            F.concat(
                F.lit("sample_weighted_topk: non-positive weight "),
                w.cast("string"),
                F.lit(f" in {weight_col!r} — weights must be > 0"),
            ),
        ).isNull(),
        F.round(-F.log(u) / w, 9),
    )


def sample_weighted_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exact-k weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, the exponential-race form): each row draws a
    content-addressed uniform u = (hash+0.5)/2³² and an arrival time
    t = −ln(u)/w; the k SMALLEST t values are the sample. Inclusion
    probability is ∝ weight in the without-replacement sense — the
    exact-size companion to :func:`sample_weighted_by_hash`'s
    Bernoulli (which only hits a budget in expectation).

    Determinism contract: u is exact (integer hash arithmetic), t is
    rounded 9dp (the engine's transcendental-function rounding
    discipline — ln differs across libm implementations in the last
    ulps) and ties break by key asc. Returns the input rows plus the
    ``__t`` key, smallest-k only.

    Scale shape: map-side key computation, then ONE k-row top-k (a
    TakeOrderedAndProject in the plan, never a global sort)."""
    return (
        df.withColumn("__t", _arrival_time(key_col, weight_col, salt))
        .orderBy(F.asc("__t"), F.asc(key_col))
        .limit(k)
    )


def sample_weighted_topk_by_group(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    group_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """:func:`sample_weighted_topk` PER GROUP — exact-k weighted
    without-replacement sampling inside each stratum (the per-language
    / per-source quota form a mixing recipe actually specifies:
    "k docs from every feed, weighted by token mass"). Same arrival-
    time contract (content-addressed u, t = −ln(u)/w rounded 9dp,
    key-asc ties); the top-k is a window PARTITIONED by the group, so
    no stratum's selection funnels through one task. Groups smaller
    than k keep everything — never upsampled."""
    from pyspark.sql import Window

    win = Window.partitionBy(group_col).orderBy(F.asc("__t"), F.asc(key_col))
    return (
        df.withColumn("__t", _arrival_time(key_col, weight_col, salt))
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
