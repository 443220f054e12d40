"""Persisted IVF vector index: build once, query many times with
partition pruning.

``ivf_knn`` (operators/similarity.py) recomputes centroids and the
corpus assignment on every call — right for one-shot queries, wrong
for a served index over a 100 TB corpus. This sink writes the index as
two parquet relations:

* ``<path>/centroids`` — (cell, cv), n_cells rows
* ``<path>/postings``  — (neighbor_id, embedding, cell): a
  counting_state SET store (``batch_id=<i>/cell=<k>/…`` dirs — build
  writes batch 0, each append adds the next batch id) whose inner level
  is partitioned **by cell**, so a query probing ``n_probe`` cells
  reads only those directories — real partition pruning, verified by
  plan assertions in tests/test_vector_index.py. The store carries
  counting_state's ``_meta.json`` format marker, and
  :func:`compact_postings` folds the batch dirs into one
  cell-partitioned generation via
  ``counting_state.compact_counts(agg="distinct",
  partition_by=["cell"])`` — the dir listing stays bounded across
  appends without giving up pruned probes, and the generation's
  subsumption manifest keeps the probe path's RAW reader (no per-query
  distinct shuffle) exact across a crash-interrupted GC.

Centroids come from :func:`kmeans_refine` (deterministic Lloyd steps)
so a rebuilt index on the same corpus is byte-identical — the property
that makes index builds idempotent and diffable across runs.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.streaming import counting_state as _cs

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
    store = f"{path}/postings"
    # a rebuild REPLACES the store: clear it so the fresh marker +
    # batch 0 are the whole state (stamp before writing — stamp_meta
    # refuses marker-less non-empty stores by design)
    shutil.rmtree(store, ignore_errors=True)
    _cs.stamp_meta(store, {"format": _POSTINGS_FORMAT, "n_cells": n_cells})
    (
        assigned.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(store, "batch_id=0"))
    )


_POSTINGS_FORMAT = "ivf-postings/v1"


def _reject_legacy_flat_store(store: str) -> None:
    """A pre-store index laid its postings out as top-level ``cell=*``
    dirs with no ``batch_id=*`` level. :func:`read_postings` still
    reads that layout, but APPENDING a batch dir beside it would give
    the directory two conflicting partition structures ({cell} vs
    {batch_id, cell}) and brick every subsequent read — so refuse
    loudly and direct the caller to rebuild."""
    if not os.path.isdir(store):
        return
    has_cells = any(
        d.startswith("cell=") and os.path.isdir(os.path.join(store, d))
        for d in os.listdir(store)
    )
    if has_cells and not _cs.state_subdirs(store):
        raise ValueError(
            f"{store} uses the legacy flat cell=* layout — appending a "
            "batch_id=* dir beside it would corrupt partition "
            "discovery. Rebuild the index (write_*_index) to migrate "
            "it to the batch-dir store"
        )


# Stream-owned batch ids live at STREAM_ID_BASE + <micro-batch id> so a
# stream and ad-hoc appends can share one store without colliding: the
# ad-hoc path allocates below the base, the stream's checkpoint-monotonic
# ids map above it, and generations stay negative.
STREAM_ID_BASE = 1_000_000_000


def _write_delta(
    rows: DataFrame,
    store: str,
    batch_id: int | None,
    partition_by: tuple[str, ...] = ("cell",),
) -> None:
    """Write a delta as a batch dir (``partition_by`` names the inner
    partitioning — cell for the IVF stores, none for the flat binary
    sig store). ``batch_id=None`` takes the next free AD-HOC id (always
    below STREAM_ID_BASE); an EXPLICIT id is the streaming caller's
    idempotence hook — a retried micro-batch overwrites its own dir
    instead of minting a new one (the counting_state retry contract).

    The next free id must clear the newest generation's manifest too,
    not just the live listing: after a compaction the folded ids are
    SUBSUMED (readers exclude them and the next compaction GC-deletes
    their dirs), so reusing one would silently disappear the delta."""
    if batch_id is None:
        used = set(_cs.state_subdirs(store).values()) | _cs.subsumed_ids(store)
        batch_id = (
            max((i for i in used if 0 <= i < STREAM_ID_BASE), default=-1) + 1
        )
    writer = rows.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(store, f"batch_id={batch_id}"))


def read_postings(spark: SparkSession, path: str) -> DataFrame:
    """The live postings relation (neighbor_id, embedding, cell): a
    RAW scan over the store's live dirs — subsumed batch ids (named by
    the newest generation's manifest) are excluded, nothing else is
    folded. No per-query distinct shuffle: the append contract (delta
    ids disjoint from indexed ids) plus the manifest keep live rows
    exact, so a probe pays only the pruned scan. Also reads a plain
    cell-partitioned directory (no ``batch_id=*`` level) unchanged —
    the pre-store layout and hand-built test fixtures."""
    store = f"{path}/postings"
    df = spark.read.parquet(store)
    excluded = _cs.subsumed_ids(store)
    if excluded:
        df = df.filter(~F.col("batch_id").isin([int(i) for i in excluded]))
    if "batch_id" in df.columns:
        df = df.drop("batch_id")
    return _apply_tombstones(df, spark, path)


def compact_postings(
    spark: SparkSession, path: str, exclude_from: int | None = None
) -> None:
    """Fold the postings batch dirs into ONE cell-partitioned
    generation — counting_state.compact_counts in ``distinct`` mode
    with ``partition_by=["cell"]``: the dir listing stays bounded as
    appends accumulate, probes keep their partition pruning (pinned by
    tests/test_vector_index.py), and the generation's manifest keeps
    :func:`read_postings` exact across a crash-interrupted GC. A full
    compaction (``exclude_from=None``) also physically drops tombstoned
    rows and GCs the absorbed tombstone dirs (see
    :func:`delete_from_index`)."""
    _compact_with_tombstones(
        spark, path, f"{path}/postings", exclude_from, ["cell"]
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
    postings = read_postings(spark, path)
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
    batch_id: int | None = None,
) -> None:
    """Incrementally add vectors to a persisted index — the operational
    path a served 100 TB index needs: a daily embedding delta cannot
    afford a full rebuild, and the FROZEN centroids make the append
    exactly equivalent to having built with the union corpus from the
    start (``tests/test_vector_index.py`` pins that equality).

    The delta is assigned against the index's own persisted centroids
    (broadcast, map-only) and written as the store's NEXT batch dir
    (cell-partitioned inside) — prior batch dirs and generations are
    never touched, and the idempotent per-dir overwrite makes a
    retried append converge. When appends accumulate,
    :func:`compact_postings` folds the listing back to one generation.
    Quantizer drift is the accepted trade (same as
    FAISS's ``add`` after ``train``): as the corpus distribution moves,
    recall decays until the next scheduled rebuild; the
    :func:`reddit_apache_airflow_postgres_pipeline_spark.plans.registry_ml.q_ivf_recall`-style
    audit is the signal for when.

    Caller contract: delta ids must be disjoint from the indexed ids
    (dedup upstream — the engine's first-wins family — or the reader
    sees duplicates, exactly as with any append-only store). Appending
    an id with a LIVE tombstone raises (see
    :func:`_guard_live_tombstones`).
    """
    spark = new_vectors.sparkSession
    _guard_live_tombstones(new_vectors, path, id_col)
    cents = spark.read.parquet(f"{path}/centroids")
    assigned = ivf_assign(new_vectors, cents, id_col, vec_col, out_id="neighbor_id")
    store = f"{path}/postings"
    _reject_legacy_flat_store(store)
    _cs.stamp_meta(store, {"format": _POSTINGS_FORMAT})
    _write_delta(assigned, store, batch_id)


# ---------------------------------------------------------------------------
# Persisted IVFPQ index: the coarse cells prune, the PQ codes shrink
# each posting to m small ints — the layout a billion-vector served
# index actually stores (codes instead of raw floats: d×4 bytes → m).
# ---------------------------------------------------------------------------

_IVFPQ_FORMAT = "ivfpq-codes/v1"


def write_ivfpq_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 4,
    n_codes: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build and persist the IVFPQ index (similarity.ivfpq_topk's
    non-residual contract): ``centroids/`` (coarse seed cells),
    ``codebooks/`` (per-subspace PQ codebooks), and ``codes/`` — the
    corpus as (neighbor_id, sub, code, cell), a counting_state SET
    store cell-partitioned inside each batch dir like the raw-vector
    ``postings/`` store, but m ints per vector instead of d floats."""
    from reddit_apache_airflow_postgres_pipeline_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    cents = ivf_centroids(corpus, n_cells, id_col, vec_col)
    cb = pq_codebooks(corpus, m, n_codes, iters, id_col, vec_col)
    # cell assigned and carried through encoding in ONE corpus pass —
    # no corpus-sized join to re-attach it before the partitioned write
    assigned = ivf_assign(
        corpus, cents, id_col, vec_col, n_probe=1, out_id="neighbor_id"
    )
    codes = pq_encode(
        assigned, cb, m, "neighbor_id", vec_col,
        out_id="neighbor_id", carry=("cell",),
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    cb.write.mode("overwrite").parquet(f"{path}/codebooks")
    store = f"{path}/codes"
    shutil.rmtree(store, ignore_errors=True)
    _cs.stamp_meta(
        store,
        {"format": _IVFPQ_FORMAT, "n_cells": n_cells, "m": m, "n_codes": n_codes},
    )
    (
        codes.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(store, "batch_id=0"))
    )


def append_to_ivfpq_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int | None = None,
) -> None:
    """Encode a delta against the index's FROZEN centroids and
    codebooks and write it as the codes store's next batch dir — the
    same append contract as :func:`append_to_ivf_index` (disjoint ids,
    prior dirs untouched, idempotent per-dir overwrite, quantizer
    drift accepted until the next rebuild), including the fail-loud
    live-tombstone guard."""
    from reddit_apache_airflow_postgres_pipeline_spark.operators.similarity import pq_encode

    spark = new_vectors.sparkSession
    _guard_live_tombstones(new_vectors, path, id_col)
    cents = spark.read.parquet(f"{path}/centroids")
    cb = spark.read.parquet(f"{path}/codebooks")
    m = _codes_m(spark, path, cb)
    assigned = ivf_assign(
        new_vectors, cents, id_col, vec_col, n_probe=1, out_id="neighbor_id"
    )
    codes = pq_encode(
        assigned, cb, m, "neighbor_id", vec_col,
        out_id="neighbor_id", carry=("cell",),
    )
    store = f"{path}/codes"
    _reject_legacy_flat_store(store)
    _cs.stamp_meta(store, {"format": _IVFPQ_FORMAT})
    _write_delta(codes, store, batch_id)


def _codes_m(spark: SparkSession, path: str, cb: DataFrame) -> int:
    """The index's subspace count: from the codes store's format
    marker when present (no job), else one tiny distinct over the
    broadcastable codebooks (pre-marker stores)."""
    import json

    meta_path = os.path.join(path, "codes", _cs.META)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if "m" in meta:
            return int(meta["m"])
    return cb.select("sub").distinct().count()


def read_codes(spark: SparkSession, path: str) -> DataFrame:
    """The live (neighbor_id, sub, code, cell) relation — same raw
    pruned-scan contract as :func:`read_postings` (manifest-named
    subsumed dirs excluded, no per-query distinct shuffle)."""
    store = f"{path}/codes"
    df = spark.read.parquet(store)
    excluded = _cs.subsumed_ids(store)
    if excluded:
        df = df.filter(~F.col("batch_id").isin([int(i) for i in excluded]))
    if "batch_id" in df.columns:
        df = df.drop("batch_id")
    return _apply_tombstones(df, spark, path)


def compact_codes(
    spark: SparkSession, path: str, exclude_from: int | None = None
) -> None:
    """Fold the codes batch dirs into one cell-partitioned generation —
    identical machinery to :func:`compact_postings`, including the
    physical tombstone drop on a full compaction."""
    _compact_with_tombstones(
        spark, path, f"{path}/codes", exclude_from, ["cell"]
    )


def query_ivfpq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, dist): ADC top-k within the probed cells
    of a persisted IVFPQ index. The ``cell`` membership of the probed
    set reaches the codes scan as a partition filter, and each
    surviving candidate costs m lookup-table additions — the pruning
    AND the compression of a served big-corpus index, with the same
    rounding ladder as similarity.ivfpq_topk (equality pinned by
    tests/test_vector_index.py)."""
    from pyspark.sql import Window

    from reddit_apache_airflow_postgres_pipeline_spark.operators.similarity import (
        l2sq,
        pq_subvectors,
    )

    cents = spark.read.parquet(f"{path}/centroids")
    cb = spark.read.parquet(f"{path}/codebooks")
    m = _codes_m(spark, path, cb)
    codes = read_codes(spark, path)
    probes = ivf_assign(
        queries, cents, id_col, vec_col, n_probe=n_probe, out_id="query_id"
    ).select("query_id", "cell")
    qsv = pq_subvectors(queries, m, id_col, vec_col, out_id="query_id")
    dtab = qsv.join(F.broadcast(cb), "sub").select(
        "query_id",
        "sub",
        "code",
        F.round(l2sq("svec", "cv"), 9).cast("decimal(28,12)").alias("__term"),
    )
    scored = (
        codes.join(F.broadcast(probes), "cell")
        .join(F.broadcast(dtab), ["query_id", "sub", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("__term").cast("double"), 6).alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "dist")
    )


# ---------------------------------------------------------------------------
# Persisted binary signature index: the 32x-compressed sign-bit form
# (operators/similarity.sign_signature) as a maintained store. No
# trained parameters at all — the sign function is frozen by
# definition — so appends are EXACTLY equivalent to a fresh build on
# the union corpus (no quantizer-drift caveat, unlike IVF/IVFPQ), and
# the Hamming scan deliberately reads every signature: the product IS
# the cheapest whole-corpus metric (XOR+popcount over m words), which
# is why the store keeps no inner partitioning to prune by.
# ---------------------------------------------------------------------------

_SIGS_FORMAT = "binary-sigs/v1"


def write_binary_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build and persist the signature store: ``<path>/sigs`` holds
    (neighbor_id, sig array<bigint>) as a counting_state SET store
    (flat batch dirs — see module note on why there is no inner
    partitioning)."""
    from reddit_apache_airflow_postgres_pipeline_spark.operators.similarity import (
        sign_signature,
    )

    sigs = sign_signature(corpus, vec_col, "sig").select(
        F.col(id_col).alias("neighbor_id"), "sig"
    )
    store = f"{path}/sigs"
    shutil.rmtree(store, ignore_errors=True)
    _cs.stamp_meta(store, {"format": _SIGS_FORMAT, "word_bits": 32})
    sigs.write.mode("overwrite").parquet(os.path.join(store, "batch_id=0"))


def append_to_binary_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int | None = None,
) -> None:
    """Add a delta as the store's next batch dir. Same append contract
    as the IVF stores (disjoint ids, idempotent per-dir overwrite,
    prior dirs untouched, fail-loud live-tombstone guard) with one
    upgrade: since signatures have no trained parameters, an appended
    store is EXACTLY a fresh build on the union corpus — pinned by
    tests/test_vector_index.py."""
    from reddit_apache_airflow_postgres_pipeline_spark.operators.similarity import (
        sign_signature,
    )

    _guard_live_tombstones(new_vectors, path, id_col)
    sigs = sign_signature(new_vectors, vec_col, "sig").select(
        F.col(id_col).alias("neighbor_id"), "sig"
    )
    store = f"{path}/sigs"
    _cs.stamp_meta(store, {"format": _SIGS_FORMAT})
    _write_delta(sigs, store, batch_id, partition_by=())


def read_sigs(spark: SparkSession, path: str) -> DataFrame:
    """The live (neighbor_id, sig) relation — raw scan over live batch
    dirs, subsumed generations excluded (read_postings semantics)."""
    store = f"{path}/sigs"
    df = spark.read.parquet(store)
    excluded = _cs.subsumed_ids(store)
    if excluded:
        df = df.filter(~F.col("batch_id").isin([int(i) for i in excluded]))
    if "batch_id" in df.columns:
        df = df.drop("batch_id")
    return _apply_tombstones(df, spark, path)


def compact_sigs(
    spark: SparkSession, path: str, exclude_from: int | None = None
) -> None:
    """Fold the sig batch dirs into ONE generation (distinct-mode
    counting_state compaction) so the listing stays bounded over an
    unbounded append stream. Full compactions physically drop
    tombstoned rows (see :func:`delete_from_index`)."""
    _compact_with_tombstones(
        spark, path, f"{path}/sigs", exclude_from, None
    )


def query_binary_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, hamming): Hamming top-k of the query
    signatures against the stored corpus signatures (id-asc ties). For
    the exact-rerank funnel, feed these candidates to the caller's raw
    corpus exactly like similarity.binary_rerank_topk's second stage."""
    from pyspark.sql import Window

    from reddit_apache_airflow_postgres_pipeline_spark.operators.similarity import (
        hamming,
        sign_signature,
    )

    sigs = read_sigs(spark, path)
    q = sign_signature(queries, vec_col, "__sq").select(
        F.col(id_col).alias("query_id"), "__sq"
    )
    scored = (
        sigs.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("hamming", hamming("sig", "__sq"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "hamming")
    )


# ---------------------------------------------------------------------------
# Tombstone deletes — the GDPR-erasure path (reference theme: salted
# hashing of user identifiers, README.md:328). A served corpus must be
# able to forget a vector without a full index rebuild: deletes land as
# id-tombstone batch dirs in a sibling ``<path>/tombstones`` store
# (same counting_state delta machinery as the data stores), every
# probe reader anti-joins the live tombstones, and the next full
# compaction PHYSICALLY drops tombstoned rows from the folded
# generation and garbage-collects the absorbed tombstone dirs.
# ---------------------------------------------------------------------------

_TOMB_FORMAT = "index-tombstones/v1"


def _tomb_store(path: str) -> str:
    return f"{path}/tombstones"


def delete_from_index(
    ids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    batch_id: int | None = None,
) -> None:
    """Mark ids deleted in the index at ``path`` (works identically for
    IVF, IVFPQ, and binary stores — tombstones are index-agnostic id
    lists). Same delta contract as the appends: idempotent per-dir
    overwrite (an explicit ``batch_id`` is the streaming/retry hook),
    prior dirs untouched.

    Semantics: a tombstone shadows its id from every subsequent read
    until a FULL compaction (``exclude_from=None``) physically drops
    the rows and absorbs the tombstone. Re-adding a deleted id while
    its tombstone is live is unsupported (the anti-join would shadow
    the new row too) — erase, compact, then re-add; the appends
    ENFORCE this by raising on any live-tombstoned id in the batch
    (:func:`_guard_live_tombstones`)."""
    rows = ids.select(F.col(id_col).alias("neighbor_id")).distinct()
    store = _tomb_store(path)
    _cs.stamp_meta(store, {"format": _TOMB_FORMAT})
    _write_delta(rows, store, batch_id, partition_by=())


# explicit per-index names, mirroring the append_* surface
delete_from_ivf_index = delete_from_index
delete_from_ivfpq_index = delete_from_index
delete_from_binary_index = delete_from_index


def read_tombstones(spark: SparkSession, path: str) -> DataFrame | None:
    """The live deleted-id relation (neighbor_id), or None when the
    index has no tombstone store / no live tombstone dirs."""
    store = _tomb_store(path)
    if not _cs.state_subdirs(store):
        return None
    df = spark.read.parquet(store)
    excluded = _cs.subsumed_ids(store)
    if excluded:
        df = df.filter(~F.col("batch_id").isin([int(i) for i in excluded]))
    return df.select("neighbor_id")


def _apply_tombstones(df: DataFrame, spark: SparkSession, path: str) -> DataFrame:
    """Anti-join the live tombstones onto a data-store read. No forced
    broadcast: the erasure backlog is USUALLY tiny between compactions
    (AQE will pick a broadcast join on its own), but it is unbounded in
    the worst case — a quarter's GDPR queue drained right before a
    compaction — and the compaction path (``_compact_with_tombstones``)
    already lets AQE choose for exactly that reason; forcing the hint
    here would pin two code paths to contradictory assumptions about
    the same relation (r10 ADVICE). The data side's partition pruning
    (cell dirs) is untouched by an anti-join on neighbor_id."""
    tomb = read_tombstones(spark, path)
    if tomb is None:
        return df
    return df.join(tomb, "neighbor_id", "left_anti")


def _guard_live_tombstones(new_vectors: DataFrame, path: str, id_col: str) -> None:
    """Fail-loud re-add guard shared by the three appends: an appended
    id whose tombstone is still live would be SILENTLY shadowed by
    every read until the next full compaction physically drops it —
    data loss from the caller's perspective. The documented contract
    (erase → full compact → re-add) is therefore enforced, matching
    the repo's fail-loud discipline for ragged/null vectors (r10
    verdict #2). Cost: zero when the index has no live tombstone dirs
    (one directory listing); otherwise one semi-join of the bounded
    append batch against the bounded erasure backlog."""
    spark = new_vectors.sparkSession
    tomb = read_tombstones(spark, path)
    if tomb is None:
        return
    hit = (
        new_vectors.select(F.col(id_col).alias("neighbor_id"))
        .join(tomb, "neighbor_id", "semi")
        .limit(5)
        .collect()
    )
    if hit:
        ids = sorted(r["neighbor_id"] for r in hit)
        raise ValueError(
            f"append to {path!r} contains ids with LIVE tombstones "
            f"(sample: {ids}) — the rows would be invisibly shadowed "
            "until the next full compaction drops them. Erase, run a "
            "full compaction, then re-add (delete_from_index contract)."
        )


def _compact_with_tombstones(
    spark: SparkSession,
    path: str,
    store: str,
    exclude_from: int | None,
    partition_by: list[str] | None,
) -> None:
    """The shared compact body: fold the data store, physically
    dropping tombstoned rows, then GC the absorbed tombstone dirs —
    but ONLY when the fold covered every live data dir
    (``exclude_from=None``): an excluded in-flight dir keeps its rows
    raw, so its tombstones must stay live or the delete would silently
    resurrect. Crash-safety: tombstone deletion is pure GC — a crash
    before it leaves the tombstones live and the anti-join re-applies
    them (idempotent)."""
    tomb = _tomb_store(path)
    tdirs = _cs.state_subdirs(tomb) if exclude_from is None else {}
    drop = (
        spark.read.parquet(*tdirs.keys()).select("neighbor_id").distinct()
        if tdirs
        else None
    )
    df = spark.read.parquet(store)
    fields = [f for f in df.schema.fields if f.name != "batch_id"]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
    folded = _cs.compact_counts(
        spark,
        store,
        schema,
        [f.name for f in fields],
        None,
        exclude_from=exclude_from,
        agg="distinct",
        partition_by=partition_by,
        drop_keys=drop,
        drop_on=["neighbor_id"] if drop is not None else None,
    )
    if folded and tdirs:
        # the folded generation no longer contains the dropped ids and
        # the append contract forbids id reuse — the snapshot of
        # tombstone dirs read above is fully absorbed. Dirs appended
        # AFTER the snapshot stay live for the next cycle.
        for p in tdirs:
            shutil.rmtree(p, ignore_errors=True)


# ---------------------------------------------------------------------------
# Kind dispatch — THE one place the ivf | ivfpq | binary → function /
# store-subdir mapping lives. The streaming drains
# (streaming/vector_index_stream.py) and the text-index sink
# (sinks/text_index.py) both consume these tables; encoding the mapping
# locally in each consumer is how a fourth store kind ends up batch-
# appendable but not streamable (r11 review catch).
# ---------------------------------------------------------------------------

STORE_SUBDIR = {"ivf": "postings", "ivfpq": "codes", "binary": "sigs"}
WRITERS = {
    "ivf": write_ivf_index,
    "ivfpq": write_ivfpq_index,
    "binary": write_binary_index,
}
APPENDERS = {
    "ivf": append_to_ivf_index,
    "ivfpq": append_to_ivfpq_index,
    "binary": append_to_binary_index,
}
QUERIES = {
    "ivf": query_ivf_index,
    "ivfpq": query_ivfpq_index,
    "binary": query_binary_index,
}
COMPACTORS = {
    "ivf": compact_postings,
    "ivfpq": compact_codes,
    "binary": compact_sigs,
}


def check_kind(kind: str) -> str:
    """Validate a store kind against the dispatch tables, fail-loud."""
    if kind not in STORE_SUBDIR:
        raise ValueError(f"unknown index kind {kind!r} (ivf | ivfpq | binary)")
    return kind


# -- staleness audit + drift-triggered rebuild --------------------------------
#
# Appends encode against FROZEN quantizers — the accepted trade of every
# streaming maintainer above. The rebuild SIGNAL has always been "the
# recall audit", but nothing made that signal operational: measure the
# served store against exact ground truth, and retrain + replace only
# when it has actually gone stale.


def infer_kind(path: str) -> str:
    """Which store kind lives at ``path``, from the store layout itself
    (exactly one of postings/ codes/ sigs/ exists for a built index).
    Fail-loud on none or several — a path that isn't a single built
    index must not be silently audited as one."""
    found = [k for k, sub in STORE_SUBDIR.items() if os.path.isdir(os.path.join(path, sub))]
    if len(found) != 1:
        raise ValueError(
            f"{path!r} holds {found or 'no'} store dirs — expected exactly "
            "one of postings/codes/sigs (a single built index)"
        )
    return found[0]


def index_recall(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    kind: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **probe_kwargs,
) -> float:
    """Recall@k of the PERSISTED store's probe against the exact-L2
    truth set over ``corpus`` (similarity.exact_l2_topk_set — the same
    ground-truth definition every registry recall audit uses). The
    probe runs the store's own pruned read path; the truth set
    broadcasts the bounded query set; the returned scalar is the only
    driver-side materialization."""
    kind = check_kind(kind or infer_kind(path))
    approx = QUERIES[kind](
        spark, path, queries, k=k, id_col=id_col, vec_col=vec_col, **probe_kwargs
    ).select("query_id", "neighbor_id")
    from reddit_apache_airflow_postgres_pipeline_spark.operators.similarity import (
        exact_l2_topk_set,
    )

    exact = exact_l2_topk_set(corpus, queries, k, id_col, vec_col)
    # ONE action: the exact truth set (broadcast join + per-query window
    # over the full corpus) is the expensive relation here, and the
    # staleness loop evaluates recall repeatedly — hits and total come
    # out of a single left-join aggregate instead of two jobs that each
    # recompute it (r11 review).
    hit = approx.dropDuplicates(["query_id", "neighbor_id"]).withColumn(
        "__hit", F.lit(1)
    )
    row = (
        exact.join(hit, ["query_id", "neighbor_id"], "left")
        .agg(F.count("*").alias("total"), F.count("__hit").alias("hits"))
        .first()
    )
    return row["hits"] / row["total"] if row["total"] else 1.0


def rebuild_index_if_stale(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    queries: DataFrame,
    min_recall: float,
    k: int = 5,
    kind: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_kwargs: dict | None = None,
    build_kwargs: dict | None = None,
) -> dict:
    """The drift-triggered rebuild loop, closed: measure
    :func:`index_recall` on a probe set; if it clears ``min_recall``
    leave the store untouched, otherwise retrain quantizers and rewrite
    the store from ``corpus`` (the writers' documented REPLACE
    semantics — rebuilds on the same corpus are deterministic, so the
    swap is idempotent) and re-measure.

    ``corpus`` must be the SURVIVING corpus (the same relation a
    rebuild-equivalence compaction would keep): after the new store
    lands, the tombstone dir is GC'd — every erased id is already
    physically absent from a store rebuilt from survivors, and a
    tombstone left live would silently shadow a legitimately re-added
    id (the fail-loud append guard keys off live tombstones). The GC
    runs AFTER the write so a crash mid-rebuild never leaves deleted
    ids un-shadowed.

    Returns ``{"kind", "recall", "rebuilt", "recall_after"}`` —
    ``recall_after`` is None when no rebuild ran. Single-writer
    discipline: don't run concurrently with an append/delete stream on
    the same store (the compaction rule)."""
    kind = check_kind(kind or infer_kind(path))
    probe_kwargs = probe_kwargs or {}

    def _recall() -> float:
        return index_recall(
            spark, path, corpus, queries, k, kind, id_col, vec_col,
            **probe_kwargs,
        )

    return staleness_rebuild(
        path,
        kind,
        min_recall,
        _recall,
        lambda: WRITERS[kind](
            corpus, path, id_col=id_col, vec_col=vec_col,
            **(build_kwargs or {}),
        ),
    )


def staleness_rebuild(
    path: str,
    kind: str,
    min_recall: float,
    recall_fn,
    rebuild_fn,
) -> dict:
    """THE one copy of the staleness loop's measure → compare → rebuild
    → GC-tombstones → re-measure skeleton (r11 review: the raw-vector,
    text, and media wrappers each encoded it separately). The ordering
    contract that matters for correctness lives here exactly once: the
    tombstone dir is GC'd strictly AFTER ``rebuild_fn`` has landed the
    new store, so a crash mid-rebuild never leaves erased ids
    un-shadowed. ``rebuild_fn`` must write from the SURVIVING corpus
    (the wrappers' documented contract)."""
    before = recall_fn()
    if before >= min_recall:
        return {"kind": kind, "recall": before, "rebuilt": False,
                "recall_after": None}
    rebuild_fn()
    shutil.rmtree(_tomb_store(path), ignore_errors=True)
    return {"kind": kind, "recall": before, "rebuilt": True,
            "recall_after": recall_fn()}


def index_stats(spark: SparkSession, path: str, kind: str | None = None) -> dict:
    """The served store's ops view, decision-sized: per-cell posting/
    code counts (fill skew is what degrades probe latency — a hot cell
    makes every n_probe read pay for it), live batch-dir count (the
    compaction trigger), tombstone backlog (the erasure SLA meter and
    the anti-join size every probe pays until the next full
    compaction), and total live rows. One aggregate job over the pruned
    raw reader; the returned dict is ≤ n_cells entries — the dashboard
    relation for a store, computed by the store's own read path.

    Returns ``{"kind", "rows", "live_dirs", "tombstones", "cells":
    {cell: n, ...} | None}`` — ``cells`` is None for the flat binary
    store (no cell level to skew)."""
    kind = check_kind(kind or infer_kind(path))
    readers = {"ivf": read_postings, "ivfpq": read_codes, "binary": read_sigs}
    df = readers[kind](spark, path)
    store = os.path.join(path, STORE_SUBDIR[kind])
    if kind == "binary":
        rows = df.count()
        cells = None
    else:
        # ivfpq counts CODE rows per cell; normalize to vectors by the
        # distinct neighbor count per cell (m sub-codes per vector)
        per = (
            df.select("cell", "neighbor_id")
            .distinct()
            .groupBy("cell")
            .count()
            .collect()
        )
        cells = {int(r["cell"]): int(r["count"]) for r in per}
        rows = sum(cells.values())
    return {
        "kind": kind,
        "rows": rows,
        "live_dirs": _cs.live_dir_count(store),
        "tombstones": (
            0 if (tomb := read_tombstones(spark, path)) is None
            else tomb.count()
        ),
        "cells": cells,
    }
