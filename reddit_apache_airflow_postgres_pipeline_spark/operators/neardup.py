"""Near-duplicate detection over text: n-gram Jaccard, MinHash+LSH,
SimHash. The dedup ladder for training-data pipelines:

  exact (operators.dedup) → fingerprint (textstats.fingerprint)
  → MinHash LSH (this module, sub-quadratic) → n-gram Jaccard verify.

Design for 100 TB:

* Shingling is a map-only explode; the only shuffles are the
  (band, band-key) self-join (MinHash LSH) and the shingle self-join
  (exact Jaccard — quadratic in bucket size, so ONLY run it on LSH
  candidates or small corpora).
* The MinHash trick for cross-engine determinism: a "hash function" is
  ``md5(i || ':' || shingle)`` and the signature element is the
  **lexicographic min of the hex strings** — a uniform total order on
  128-bit values that DuckDB reproduces verbatim, no integer conversion.

Everything below is built-in expressions (explode/groupBy/agg) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Size-aware spread targets. Shingling + hashing is heavily CPU-bound
# (~2 digest calls per shingle over column-compressed text, so one scan
# byte is many hash bytes): per-task input must stay SMALL or the work
# serializes — measured at sf0.1, 2 partitions ran the LSH chain 3×
# slower than 18, and 16 KB/task beat 32 KB/task by ~7% for both the
# LSH and jaccard chains (min-of-3 ×2 rounds). The floor exists for
# the opposite failure: spreading a tiny corpus into dozens of
# near-empty micro-partitions trades one warm task for scheduler
# round-trips, a shape that degrades super-linearly when the host is
# contended (the r3 bench's 10× q_dedup_ngram_jaccard outlier). 16 KB
# of scan bytes per task keeps every task carrying real hash work
# while anything ≥ ~0.5 MB still reaches defaultParallelism (the cap —
# a real cluster always saturates).
_TARGET_BYTES_PER_TASK = 16 << 10
# Above this many scan bytes, near-dup verifies restrict their
# shingle-array re-compute to candidate docs instead of re-shingling
# the whole corpus: the corpus-wide form costs two extra full map
# passes (prohibitive at 100 TB) but overlaps the candidate chain on
# an under-utilized small-corpus run (measured A/Bs in
# minhash_lsh_pairs). 64 MB ≈ where two wholesale re-shingles stop
# being noise on any real cluster; every driver bench SF stays below
# it, every production corpus is far above.
_RESTRICT_VERIFY_BYTES = 64 << 20
# Note on persist: multi-consumer shingle plans deliberately do NOT
# cache intermediate relations. Identical subtrees share their shuffle
# via runtime ReuseExchange, while an eager persist adds a serialized
# materialization job — measured slower at bench scale for both the
# jaccard and LSH chains (A/Bs in the respective docstrings) and a
# cache-churn liability at 100 TB.


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate (scan bytes for file
    sources). Unknown stats return a huge default so callers treat the
    input as big — the safe direction for both knobs above.

    PRIVATE-API PIN: the ``_jdf.queryExecution()`` reach-in is the only
    one outside plan tests; written and tested against PySpark 4.1.x
    (py4j BigInt marshalling per the isinstance branch below). If a
    Spark upgrade breaks it, the broad except falls back to "treat as
    big" — correctness unaffected, only small-corpus spread widens."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = stats.sizeInBytes()
        # py4j auto-converts small scala.BigInt to int; huge values come
        # through as JavaObject and need the string round-trip
        return size if isinstance(size, int) else int(size.toString())
    except Exception:  # pragma: no cover - py4j surface drift
        return 1 << 62


def _spread_partitions(df: DataFrame) -> int:
    par = df.sparkSession.sparkContext.defaultParallelism
    return max(1, min(par, _plan_size_bytes(df) // _TARGET_BYTES_PER_TASK))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams of lowercased whitespace-tokenized text.
    Texts with < n tokens yield their full token-join as one shingle
    (so short docs still participate).

    Implementation: ONE overlapping-lookahead regex pass —
    ``(?=(\\S+ \\S+ …))\\S+`` over the space-normalized text captures
    the n-token window starting at every token. Measured at sf0.1
    (5000 docs, min-of-3): 0.43s vs 3.20s for the previous
    ``transform(sequence, slice+concat_ws)`` form — higher-order
    lambdas run interpreted (~11µs/gram, no codegen), while the regex
    stays inside WholeStageCodegen; exact row parity verified for
    n=3 and n=4 on the full corpus plus null/empty/short/whitespace
    edge cases. Semantics unchanged: normalization collapses the Java
    ``\\s`` class, so the DuckDB oracle's spelled-out
    ``[ \\t\\n\\x0b\\f\\r]+`` split still mirrors this exactly."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(
        F.trim(F.lower(F.coalesce(c, F.lit("")))), r"\s+", " "
    )
    pat = "(?=(" + " ".join([r"\S+"] * n) + r"))\S+"
    grams = F.regexp_extract_all(norm, F.lit(pat), 1)
    return F.array_distinct(
        F.when(F.size(F.split(norm, " ")) < n, F.array(norm)).otherwise(grams)
    )


def token_chunks(col: Column | str, k: int = 8) -> Column:
    """Non-overlapping ``k``-token chunks of lowercased
    whitespace-tokenized text, as space-joined strings. Docs shorter
    than ``k`` tokens yield their whole token-join as one chunk (so
    short docs still participate); a trailing partial chunk is dropped
    (a chunk is a fixed-size unit, mirroring fixed-window substring
    dedup practice)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(
        F.trim(F.lower(F.coalesce(c, F.lit("")))), r"\s+", " "
    )
    # one non-overlapping regex pass: consecutive k-token runs; the <k
    # trailing run can't match, which IS the drop-the-tail rule. Same
    # interpreted-HOF-vs-codegen trade as word_shingles (2x measured).
    grams = F.regexp_extract_all(norm, F.lit(r"\S+( \S+){%d}" % (k - 1)), 0)
    return F.when(
        F.size(F.split(norm, " ")) < k, F.array(norm)
    ).otherwise(grams)


def token_chunks_with_tail(col: Column | str, k: int = 8) -> Column:
    """Like :func:`token_chunks` but KEEPS the trailing partial chunk —
    the reassembly variant: concatenating the chunks in order
    reproduces the doc's full normalized token stream, which is what a
    rewrite transform (curation.strip_duplicate_chunks) needs. Dedup
    STATISTICS keep using :func:`token_chunks` (fixed-size units only),
    so a short tail never pollutates the duplicate-mass signal."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(
        F.trim(F.lower(F.coalesce(c, F.lit("")))), r"\s+", " "
    )
    # {0,k-1} continuation lets the final (shorter) run match too —
    # greedy matching takes k tokens whenever available, so full chunks
    # are identical to token_chunks and the remainder becomes the tail.
    grams = F.regexp_extract_all(norm, F.lit(r"\S+( \S+){0,%d}" % (k - 1)), 0)
    return F.when(
        F.size(F.split(norm, " ")) < k, F.array(norm)
    ).otherwise(grams)


def chunk_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Per-document duplicated-chunk mass: the fraction of a doc's
    fixed-size token chunks that also occur verbatim in at least one
    OTHER document — the fixed-window form of substring-level exact
    dedup (the "how much of this doc is corpus boilerplate" signal
    used to strip repeated spans from training corpora; cf. the
    dedup ladder in this module's header).

    Output: (doc_id, n_chunks, dup_chunks, dup_chunk_frac). Chunk
    occurrences count positionally — a chunk repeated inside one doc
    contributes each occurrence, but needs a second DOC to count as
    duplicated.

    Scale: the chunk relation is ~n_tokens/k rows per doc (k× thinner
    than a shingle relation); the only shuffles are the per-chunk
    doc-count agg and the occurrence join on the same key (AQE plans
    the second from the first's partitioning), plus the final per-doc
    agg. No self-join — cost is linear in corpus size regardless of
    how duplicated it is.
    """
    occ = (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))
        .repartition(_spread_partitions(df))
        .select("doc", F.explode(token_chunks("__t", k)).alias("c"))
        .filter(F.col("c") != "")
    )
    docs_per_chunk = occ.groupBy("c").agg(
        F.count_distinct("doc").alias("__nd")
    )
    return (
        occ.join(docs_per_chunk, "c")
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count(F.when(F.col("__nd") >= 2, 1)).alias("dup_chunks"),
        )
        .select(
            F.col("doc").alias("doc_id"),
            "n_chunks",
            "dup_chunks",
            F.round(F.col("dup_chunks") / F.col("n_chunks"), 6).alias(
                "dup_chunk_frac"
            ),
        )
    )


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle) exploded relation — distinct per doc.

    The input is repartitioned before the explode: document corpora often
    arrive as few large files (or one), and shingling + hashing is
    CPU-bound — without the spread, one task does all the regex/md5 work
    regardless of cluster width. The partition count is size-aware
    (:func:`_spread_partitions`): big corpora get defaultParallelism,
    small ones only as many tasks as carry real work."""
    sel = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))
    return (
        sel.repartition(_spread_partitions(sel))
        .select("doc", F.explode(word_shingles("__t", n)).alias("s"))
        .filter(F.col("s") != "")
    )


def _df_capped_candidates(
    rel: DataFrame, key_col: str, max_df: int
) -> tuple[DataFrame, DataFrame]:
    """Bounded candidate generation over an exploded ``(doc, key)``
    relation (keys distinct per doc). Returns ``(inter_c, sides)``:

    * ``inter_c`` — (id_a, id_b, __ic): per-pair count of shared RARE
      keys (2 ≤ df ≤ max_df), emitted as in-array pairs from per-key
      posting lists. The df filter runs BEFORE the ``collect_list``
      aggregate, so a posting list is only ever collected for a rare
      key and its length is ≤ max_df **by construction** — a corpus-hot
      key ("the city of rome" across 10⁸ docs) contributes zero rows to
      the collect and zero candidate pairs, and no O(m) array ever
      forms anywhere in the plan. This removes the hot-key memory
      cliff entirely; the worst-case emission is max_df²/2 pairs per
      rare key at ANY corpus scale.
    * ``sides`` — (doc, __n, __hot): per-doc exact key count and
      hot-key count (df > max_df), a count-only aggregate over the
      df-annotated relation — hot keys reach it as counts, never as
      lists.

    Cost shape: one groupBy(key) for the df counts, one key-equi-join
    annotating the relation (both sides hash-partitioned on the key —
    the aggregate side arrives pre-partitioned from its own groupBy,
    and the rare-key collect aggregates on the join's output
    partitioning without a further exchange), then one groupBy(doc)
    for ``sides``. One more shuffle than a collect-everything
    single-pass, bought back as a bounded memory profile per task.

    Measured-and-REJECTED alternative (r14, guide §1): joining only
    the df-FILTERED key sets (rare keys for the collect, hot keys for
    a broadcast-probe hot count) with a join-free ``__n`` looks like
    §2.3 "filter before the join" but LOST the A/B decisively —
    solo-session min-of-3 at sf0.1: construct 0.69→1.42s, execute
    2.04→4.48s. The filtered form references the exploded relation 4x
    and the df aggregate 2x, growing the physical plan from 84 to 108
    Exchange mentions / 28 to 36 scans (duplicated non-exchange
    subtree work + planning); the single annotate-join keeps one
    shared subtree that runtime ReuseExchange serves to both
    consumers. Singleton-heavy join output is cheaper than subtree
    duplication at every scale where the explode dominates.
    """
    dfreq = rel.groupBy(key_col).agg(F.count("*").alias("__df"))
    ann = rel.join(dfreq, key_col)
    ds = F.col("__docs")
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                ds,
                lambda x: F.transform(
                    ds, lambda y: F.struct(x.alias("id_a"), y.alias("id_b"))
                ),
            )
        ),
        lambda p: p.getField("id_a") < p.getField("id_b"),
    )
    inter_c = (
        ann.filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
        .groupBy(key_col)
        .agg(F.collect_list("doc").alias("__docs"))
        .select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__ic"))
    )
    sides = ann.groupBy("doc").agg(
        F.count("*").alias("__n"),
        F.count(F.when(F.col("__df") > max_df, 1)).alias("__hot"),
    )
    return inter_c, sides


def _restricted_shingle_arrays(
    df: DataFrame, cands: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc, sh) shingle arrays for CANDIDATE docs only: the candidate
    id set (output-sized — broadcastable by definition) semi-restricts
    the corpus before the re-shingle, so the verify's map work is
    proportional to matches, not corpus size. Callers pass a persisted
    ``cands`` so this subtree reads the cached pairs instead of
    re-running the candidate chain."""
    cd = cands.select(
        F.explode(F.array("id_a", "id_b")).alias("doc")
    ).distinct()
    return (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))
        .join(F.broadcast(cd), "doc")
        .select(
            "doc",
            F.filter(word_shingles("__t", n), lambda s: s != "").alias("sh"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    round_digits: int | None = 6,
    max_df: int | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard near-dup pairs.

    Output (id_a, id_b, jaccard ≥ threshold) with id_a < id_b; the
    Jaccard value itself is always exact (full shingle sets).

    ``max_df`` is the scale guard for candidate generation. The shingle
    self-join is quadratic per posting list — one shingle shared by m
    docs yields m² candidate rows, so a single corpus-hot shingle
    ("the city of rome") detonates the join on an open-world corpus.
    With ``max_df=K``, only shingles whose document frequency is ≤ K
    generate candidates (bounding the blowup at K² per shingle — the
    stop-phrase analog of stop-word removal), and candidates are then
    verified with EXACT full-set Jaccard via :func:`exact_jaccard_verify`.
    Semantics with the cap: pairs that share at least one shingle with
    df ≤ K, scored exactly. A qualifying pair is missed only if EVERY
    shingle it shares is corpus-hot — at threshold 0.8 the pair shares
    most of its shingles, so in practice the output is unchanged
    (measured: identical at sf0.01 and sf0.1 with K=10) while the
    worst-case join size is bounded at any scale.

    ``max_df=None`` runs the exact all-pairs form (safe on LSH
    candidates or small corpora; at 100 TB use minhash_lsh_pairs or a
    df cap).
    """
    if max_df is not None:
        # Candidate pairs can still be numerous (every pair sharing ≥1
        # rare shingle — measured 436k at sf0.1), so the exact array
        # verify must NOT run on all of them: shipping two full shingle
        # arrays per candidate is the expensive step. Instead score a
        # SOUND upper bound from skinny counts first:
        #   I_exact ≤ min(inter_capped + min(hot_a, hot_b), na, nb)
        # (a pair's uncounted intersection can only come from hot
        # shingles, of which doc x holds hot_x). Jaccard is increasing
        # in I, so bound < threshold ⇒ exact < threshold — the
        # prefilter drops nothing that qualifies, and survivors are
        # true-pair scale (measured: exactly the 256 finals at sf0.1).
        # Candidate + stats generation is the shared df-capped form
        # (:func:`_df_capped_candidates`): df counts first, then an
        # annotating key-join, so posting lists are collected ONLY for
        # rare shingles (≤ K elements by construction) — a corpus-hot
        # shingle never materializes a list at any corpus size. The
        # exact verify re-attaches per-doc shingle ARRAYS straight from
        # the raw docs restricted to candidate ids (broadcast join) —
        # map-only, never a corpus-wide array materialization.
        # Deliberately NOT persisted: identical subtrees share their
        # shuffle via runtime ReuseExchange; an explicit persist ADDS a
        # serialized materialization job and measurably loses (A/B at
        # sf0.1, min-of-3 ×2 rounds: no-persist 2.77s vs eager-persist
        # 3.96s — same direction for the LSH chain, 4.75s vs 8.49s).
        # The r3 contention outlier was the 32-micro-partition spread
        # (fixed size-aware above), not the recompute.
        sh = shingle_table(df, id_col, text_col, n)
        inter_c, sides = _df_capped_candidates(sh, "s", max_df)
        # per-doc stats joined plain (AQE broadcasts when small)
        sa = sides.select(
            F.col("doc").alias("id_a"),
            F.col("__n").alias("__na"),
            F.col("__hot").alias("__hota"),
        )
        sb = sides.select(
            F.col("doc").alias("id_b"),
            F.col("__n").alias("__nb"),
            F.col("__hot").alias("__hotb"),
        )
        i_ub = F.least(
            F.col("__ic") + F.least("__hota", "__hotb"),
            F.least("__na", "__nb"),
        )
        # cands is TRUE-PAIR scale (skinny id pairs) and consumed three
        # times downstream (final join + twice via the arrays build).
        # Unlike the corpus-scale posting-list relation — where the A/B
        # above shows persist losing — caching this tiny relation
        # truncates the 3× recompute of the whole candidate chain:
        # measured at sf0.1 min-of-7, 1.81s persisted vs 3.36s not.
        # Lazy persist: the first consumer populates the block cache
        # within the job; no extra materialization action.
        cands = (
            inter_c.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(i_ub / (F.col("__na") + F.col("__nb") - i_ub) >= threshold)
            .select("id_a", "id_b")
            .persist()
        )
        # full shingle arrays only for candidate docs (true-pair scale):
        # re-shingle the raw candidate docs map-side — cheaper than a
        # third pass over the posting-list shuffle
        arrays = _restricted_shingle_arrays(df, cands, id_col, text_col, n)
        return exact_jaccard_verify(
            df, cands, id_col, text_col, n, threshold, round_digits,
            arrays=arrays,
        )

    # referenced 3× (cnt, a, b): persist + eager materialize so the three
    # subtrees share one computation. MEMORY_AND_DISK by default —
    # spillable, not driver-side. (At 100 TB prefer minhash_lsh_pairs,
    # which never materializes an exploded shingle relation.)
    sh = shingle_table(df, id_col, text_col, n).persist()
    sh.count()
    cnt = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc").alias("id_a"), "s")
    b = sh.select(F.col("doc").alias("id_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    ca = cnt.select(F.col("doc").alias("id_a"), F.col("n_sh").alias("na"))
    cb = cnt.select(F.col("doc").alias("id_b"), F.col("n_sh").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    if round_digits is not None:
        jac = F.round(jac, round_digits)
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def exact_jaccard_verify(
    df: DataFrame,
    cands: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
    round_digits: int | None,
    arrays: DataFrame | None = None,
) -> DataFrame:
    """Exact full-set Jaccard for a skinny (id_a, id_b) candidate
    relation: re-attach both docs' shingle arrays (recomputed map work —
    cheap, never materialized — unless a precomputed ``arrays``
    (doc, sh) relation is passed) and score with ``array_intersect`` —
    pure codegen expressions, no exploded self-join. Shared by
    :func:`minhash_lsh_pairs` and the df-capped
    :func:`ngram_jaccard_pairs`."""
    if arrays is None:
        arrays = shingle_arrays(df, id_col, text_col, n)
    a = arrays.select(F.col("doc").alias("id_a"), F.col("sh").alias("__sha"))
    b = arrays.select(F.col("doc").alias("id_b"), F.col("sh").alias("__shb"))
    inter = F.size(F.array_intersect("__sha", "__shb"))
    jac = inter / (F.size("__sha") + F.size("__shb") - inter)
    if round_digits is not None:
        jac = F.round(jac, round_digits)
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(doc, sh: array<string>) — per-doc distinct shingle set as an array
    column. Map-side only (no explode/shuffle); docs with zero shingles
    are dropped (they cannot pair). Input repartitioned for parallelism —
    corpora often arrive as few large files — with the same size-aware
    count as :func:`shingle_table`."""
    sel = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))
    return (
        sel.repartition(_spread_partitions(sel))
        .select(
            "doc",
            F.filter(word_shingles("__t", n), lambda s: s != "").alias("sh"),
        )
        .filter(F.size("sh") > 0)
    )


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(doc, mh_0..mh_{k-1}): MinHash signature as lexicographic mins of
    salted md5 hex digests.

    Shape chosen for codegen, measured at sf0.1: explode the per-doc
    shingle array to (doc, s) rows, derive the k hash values, then ONE
    hash aggregate of k ``min``s with map-side partial combine (k×8-hex
    bytes per doc leave each mapper). The tempting "zero-shuffle"
    alternatives — k ``array_min(transform(…))`` columns, or one k-wide
    HOF ``aggregate`` — both lose: HOF lambdas are opaque to Catalyst CSE
    (the k columns re-evaluate the shingle subtree k times once
    ProjectCollapse inlines it), and the k-wide aggregate runs
    interpreted, allocating a k-array per shingle.

    Hash family: for k ≤ 24, one concatenated
    ``md5 || sha256 [|| md5∘reverse || sha256∘reverse]`` digest per
    shingle sliced into k independent 8-hex chunks — ≤4 hash calls per
    shingle instead of k salted ones (~4–6× less hashing; both hex
    alphabets are lowercase in Spark and DuckDB so the lexicographic min
    agrees, and DuckDB can replay the identical family — it has no
    sha512, hence reversed-input digests rather than longer ones).
    Beyond 24, fall back to salted per-function md5.
    """
    sh = shingle_arrays(df, id_col, text_col, n).select(
        "doc", F.explode("sh").alias("s")
    )
    # the k-wide projections/aggregates are JVM-parsed SQL strings —
    # this builder runs at plan-build time once per micro-batch in the
    # streaming gates (guide §5); parsed trees identical to the old
    # Column-API form (the concat subtree is embedded per column either
    # way; Catalyst CSE collapses it at codegen).
    if num_hashes <= 24:
        # 32 + 64 (+32 +64 reversed-input) hex chars → up to 24 chunks
        # from ≤4 hash calls; k ≤ 12 needs only the first two.
        # md5/sha256 over reverse(s) are the extra digests both engines
        # share (DuckDB has no sha512) — same cross-engine-lowercase-hex
        # argument as above.
        parts = ["md5(s)", "sha2(s, 256)"]
        if num_hashes > 12:
            parts.append("md5(reverse(s))")
        if num_hashes > 16:
            parts.append("sha2(reverse(s), 256)")
        dg = "concat(" + ", ".join(parts) + ")"
        digs = sh.selectExpr(
            "doc",
            *[
                f"substring({dg}, {i * 8 + 1}, 8) AS d{i}"
                for i in range(num_hashes)
            ],
        )
    else:
        digs = sh.selectExpr(
            "doc",
            *[
                f"md5(concat('{i}:', s)) AS d{i}"
                for i in range(num_hashes)
            ],
        )
    return digs.groupBy("doc").agg(
        *[F.expr(f"min(d{i}) AS mh_{i}") for i in range(num_hashes)]
    )


def minhash_band_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(doc, bk): one row per (doc, band) with the band key prefixed by
    its band index, so a SINGLE self-equi-join on ``bk`` covers "equal
    in ANY band" — one shuffle instead of ``bands`` separate joins. The
    groupBy inside minhash_signature is the projection barrier here:
    band keys read the aggregated mh_* columns, nothing re-inlines.

    Shared by :func:`minhash_lsh_pairs` (batch pair mining) and the
    streaming dedup gate (streaming/dedup_gate.py), so both see the
    identical bucket universe."""
    sig = minhash_signature(df, id_col, text_col, n, num_hashes)
    return band_keys_of_signature(sig, num_hashes, bands)


def band_keys_of_signature(
    sig: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """(doc, bk) band keys derived from an ALREADY-COMPUTED signature
    relation (doc, mh_0..mh_{k-1}) — pure map work, no shuffle. Split
    out of :func:`minhash_band_keys` so callers that RETAIN signatures
    (the verified streaming gate's state store, where history's text is
    gone and the signatures ARE the retained state) derive bucket keys
    from stored sigs without re-reading any text."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # built as one JVM-parsed selectExpr: this runs at plan-build time
    # once per micro-batch in the streaming gates (~25 py4j round trips
    # per call in Column form; guide §5). Identical parsed tree.
    band_keys = ", ".join(
        "concat_ws('|', '" + str(b) + "', "
        + ", ".join(f"mh_{b * r + i}" for i in range(r))
        + ")"
        for b in range(bands)
    )
    return sig.selectExpr("doc", f"explode(array({band_keys})) AS bk")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    round_digits: int | None = 6,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs with exact-Jaccard verify.

    ``num_hashes`` minhashes split into ``bands`` bands of r = k/b rows;
    docs agreeing on ALL rows of any band become candidates (classic
    s-curve: P[candidate] = 1-(1-j^r)^b). Candidates are then verified
    with exact n-gram Jaccard, so the output has no false positives —
    only (possibly) missed pairs, the standard MinHash trade.

    Output (id_a, id_b, jaccard ≥ threshold), id_a < id_b.

    Shuffle profile (the 100 TB story): signatures are pure map work over
    per-doc shingle arrays; the only shuffles are a tiny signature
    repartition (projection barrier, see ``minhash_signature``), ONE
    self-equi-join on (band-key) rows — skinny — plus the candidate
    distinct. No exploded shingle self-join anywhere.

    Verify-arrays routing is SIZE-AWARE (cold A/B at sf0.1, min-of-5
    with cache cleared between runs): on a small corpus the verify's
    full-corpus shingle re-compute is cheap map work whose stages
    OVERLAP the candidate chain across idle cores — 4.6s vs 5.6s for
    the restricted form, which serializes the verify behind the
    candidate set. Past ``_RESTRICT_VERIFY_BYTES`` of scan input the
    trade inverts decisively: two wholesale corpus re-shingles cost
    O(corpus) while the restricted form re-shingles only candidate
    docs (output-sized, broadcast semi-join) — at 100 TB the
    corpus-wide form is two extra full passes, so the big-corpus path
    persists the candidate set (lazily — an eager materialize measured
    9s vs 5s in an earlier round) and restricts.
    """
    banded = minhash_band_keys(df, id_col, text_col, n, num_hashes, bands)
    a = banded.select(F.col("doc").alias("id_a"), "bk")
    c = banded.select(F.col("doc").alias("id_b"), "bk")
    cands = (
        a.join(c, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    arrays = None
    if _plan_size_bytes(df) > _RESTRICT_VERIFY_BYTES:
        cands = cands.persist()
        arrays = _restricted_shingle_arrays(df, cands, id_col, text_col, n)

    # exact verify on candidates only — no exploded shingle self-join
    return exact_jaccard_verify(
        df, cands, id_col, text_col, n, threshold, round_digits,
        arrays=arrays,
    )


def minhash_estimate_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Sketch-accuracy relation: for every LSH candidate pair, the
    MinHash similarity ESTIMATE (matching signature positions / k)
    beside the exact n-gram Jaccard, plus their absolute error.

    This is the query you run before trusting a sketch configuration at
    scale — it quantifies, on real data, how far ``k`` minhashes stray
    from the true Jaccard (E[err] ~ sqrt(j(1-j)/k)). Same shuffle
    profile as :func:`minhash_lsh_pairs`; the estimate join touches only
    the k-column signature relation (skinny), and exact verification is
    the usual array_intersect re-attach with threshold 0 (candidates
    with no shared shingle surface as jaccard 0, not as dropped rows).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signature(df, id_col, text_col, n, num_hashes)
    band_keys = F.array(
        *[
            F.concat_ws(
                "|", F.lit(str(b)), *[F.col(f"mh_{b * r + i}") for i in range(r)]
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("doc", F.explode(band_keys).alias("bk"))
    # Same size-aware routing as minhash_lsh_pairs: small corpus keeps
    # the un-persisted form (ReuseExchange already shares the candidate
    # exchange between the estimate and verify subtrees — measured cold
    # at sf0.1: 7.3s vs 9.9s with an unconditional persist, whose
    # cache-write serialization costs more than the dedup saves); big
    # corpus persists and restricts the verify arrays, trading that
    # overhead for two fewer wholesale corpus re-shingles.
    cands = (
        banded.select(F.col("doc").alias("id_a"), "bk")
        .join(banded.select(F.col("doc").alias("id_b"), "bk"), "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    arrays = None
    if _plan_size_bytes(df) > _RESTRICT_VERIFY_BYTES:
        cands = cands.persist()
        arrays = _restricted_shingle_arrays(df, cands, id_col, text_col, n)
    sa = sig.select(
        F.col("doc").alias("id_a"),
        *[F.col(f"mh_{i}").alias(f"__a{i}") for i in range(num_hashes)],
    )
    sb = sig.select(
        F.col("doc").alias("id_b"),
        *[F.col(f"mh_{i}").alias(f"__b{i}") for i in range(num_hashes)],
    )
    matches = sum(
        (F.col(f"__a{i}") == F.col(f"__b{i}")).cast("int")
        for i in range(num_hashes)
    )
    est = cands.join(sa, "id_a").join(sb, "id_b").select(
        "id_a",
        "id_b",
        F.round(matches / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
    )
    exact = exact_jaccard_verify(
        df, cands, id_col, text_col, n, threshold=0.0, round_digits=6,
        arrays=arrays,
    )
    return est.join(exact, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        "est_jaccard",
        F.col("jaccard").alias("exact_jaccard"),
        F.round(F.abs(F.col("est_jaccard") - F.col("jaccard")), 6).alias(
            "abs_err"
        ),
    )


def simhash(col: Column | str, bits: int = 32) -> Column:
    """SimHash of whitespace tokens: bit j of the hash is the sign of
    Σ_tokens (bit_j(md5(token))·2−1). Uses the first ``bits``/4 hex chars
    of the digest. Returns the hash as a ``bits``-char '0'/'1' string
    (cross-engine safe; no 64-bit int parsing needed).
    """
    assert bits % 4 == 0
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(
        F.split(F.trim(F.lower(F.coalesce(c, F.lit("")))), r"\s+")
    )
    digests = F.transform(toks, lambda t: F.md5(t))

    def bit_weight(acc: Column, d, j: int) -> Column:
        nibble_idx = j // 4 + 1  # 1-based substring index
        bit_in_nibble = 3 - (j % 4)  # md5 hex: high bit first
        set_ = (
            F.conv(F.substring(d, nibble_idx, 1), 16, 10)
            .cast("int")
            .bitwiseAND(F.lit(1 << bit_in_nibble))
            > 0
        )
        return (
            F.element_at(acc, j + 1)
            + F.when(set_, F.lit(1)).otherwise(F.lit(-1)).cast("long")
        )

    # ALL bit weights in one aggregate pass (single evaluation of the
    # tokenize+md5 subtree — k separate aggregates would re-evaluate it k
    # times: HOF lambdas are opaque to Catalyst CSE).
    weights = F.aggregate(
        digests,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, d: F.array(*[bit_weight(acc, d, j) for j in range(bits)]),
    )
    return F.array_join(
        F.transform(weights, lambda w: F.when(w >= 0, F.lit("1")).otherwise(F.lit("0"))),
        "",
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """(doc, sig: LONG with the ``bits`` SimHash bits packed high-first)
    via explode + hash aggregate.

    Bit j (as in :func:`simhash`'s '0'/'1' string, j=0 leftmost) lives at
    long bit position ``bits-1-j``. Shaped for scale: one row per
    (doc, distinct token); ONE md5 + ONE ``conv`` per token (the digest's
    leading ``bits/4`` hex chars as a long); the per-bit ±1 weights are
    ``bits`` codegen'd shift-mask sums in a single ``HashAggregateExec``
    (map-side partial combine, spillable). The single-expression
    :func:`simhash` column re-evaluates its token array per output bit —
    HOF lambdas are opaque to Catalyst CSE — so it is test/small-data
    only."""
    assert bits % 4 == 0 and bits <= 60  # conv() result must fit a long
    sel = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))
    toks = (
        sel.repartition(_spread_partitions(sel))
        .select(
            "doc",
            F.explode(
                F.array_distinct(
                    F.split(F.trim(F.lower(F.coalesce("__t", F.lit("")))), r"\s+")
                )
            ).alias("tok"),
        )
        # split(trim('')) yields [''] — drop it so empty/whitespace-only
        # docs contribute zero rows and fall out of the groupBy entirely.
        # Keeps the doc universe identical to the oracle's
        # WHERE trim(lower(coalesce(text,''))) <> '' (registry_ml), and
        # prevents all empty docs sharing one md5('') signature (an
        # O(n²) identical-signature candidate blowup at scale).
        .filter(F.col("tok") != "")
    )
    dig = toks.select(
        "doc",
        F.conv(F.substring(F.md5("tok"), 1, bits // 4), 16, 10)
        .cast("long")
        .alias("v"),
    )
    weights = [
        F.sum(
            F.shiftright("v", bits - 1 - j).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"w{j}")
        for j in range(bits)
    ]
    agg = dig.groupBy("doc").agg(*weights)
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"w{j}") >= 0, F.lit(1 << (bits - 1 - j)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return agg.select("doc", sig.alias("sig"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs whose SimHash Hamming distance ≤ ``max_hamming``.

    Candidate generation blocks on bit-bands (pigeonhole: distance ≤ d
    ⇒ at least one of d+1 bands is identical), then verifies the exact
    Hamming distance — same ban d trick as MinHash LSH, so no quadratic
    cross join. Output (id_a, id_b, hamming).
    """
    sig = simhash_signatures(df, id_col, text_col, bits)
    return signature_near_dups(sig, bits, max_hamming)


def signature_band_keys(
    sig: DataFrame, bits: int, max_hamming: int, keep: tuple[str, ...] = ()
) -> DataFrame:
    """(doc, bk) pigeonhole band keys over a packed-long ``(doc, sig)``
    relation: distance ≤ d ⇒ at least one of d+1 bands is identical.
    One row per (doc, band), pure map work — factored out of
    :func:`signature_near_dups` so the streaming media admission gate
    derives bucket keys from STORED signatures exactly as
    band_keys_of_signature does for MinHash state.

    Band b covers string-bits [b·width, b·width+w) = long bits
    [bits-b·width-w, bits-b·width); key = (sig >> shift) & mask, tagged
    with the band index. Real corpora cluster hard on few-bit bands
    (measured: a 2 400-doc bucket at sf0.1 → ~9M raw candidates), so
    callers must thin candidates to DISTINCT id pairs before carrying
    anything through the blowup."""
    if not 0 <= max_hamming < bits:
        # max_hamming >= bits makes every band zero-width: all docs
        # share every band key and the "banded" join degenerates into
        # the full quadratic cross product this design exists to avoid.
        # Guard lives HERE so every caller (signature_near_dups, the
        # streaming media gate) inherits it (r11 review).
        raise ValueError(
            f"need 0 <= max_hamming < bits, got max_hamming={max_hamming}, "
            f"bits={bits}"
        )
    nbands = max_hamming + 1
    width = bits // nbands

    # one JVM-parsed selectExpr (plan-build runs once per micro-batch
    # in the media/multimodal gates; guide §5); parens pin the SQL
    # precedence to the Column-API tree ((sig >> s) & mask) * n + b
    def band_key(b: int) -> str:
        w = width if b < nbands - 1 else bits - (nbands - 1) * width
        shift = bits - b * width - w
        return (
            f"((shiftright(sig, {shift}) & {(1 << w) - 1})"
            f" * {nbands} + {b})"
        )

    keys = ", ".join(band_key(b) for b in range(nbands))
    # ``keep`` carries extra columns (e.g. the packed sig itself)
    # through the explode so a caller can verify ON the banded relation
    # without re-joining the signature store — the all-pairs replay
    # builder's verify-before-distinct shape (r14; a hot band bucket
    # makes distinct-then-join quadratic in bucket size BEFORE any
    # filtering, measured 6.8M distinct inputs vs 21k after the
    # popcount filter at sf0.1)
    return sig.selectExpr("doc", *keep, f"explode(array({keys})) AS bk")


def signature_near_dups(
    sig: DataFrame, bits: int, max_hamming: int
) -> DataFrame:
    """Band-and-verify near-dup pairs over ANY packed-long ``(doc,
    sig)`` signature relation — the pigeonhole machinery SimHash uses,
    factored out so other bit-signature families (e.g. the multimodal
    aHash) reuse it: distance ≤ d ⇒ at least one of d+1 bands is
    identical, so candidates come from one banded self-equi-join and
    the exact Hamming popcount only runs on the thinned pair set.
    Output (id_a, id_b, hamming).
    """
    banded = signature_band_keys(sig, bits, max_hamming)
    a = banded.select(F.col("doc").alias("id_a"), "bk")
    c = banded.select(F.col("doc").alias("id_b"), "bk")
    cands = (
        a.join(c, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verify: popcount of XOR on the packed longs — pure codegen
    sa = sig.select(F.col("doc").alias("id_a"), F.col("sig").alias("__sa"))
    sb = sig.select(F.col("doc").alias("id_b"), F.col("sig").alias("__sb"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("hamming", F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def chunk_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    threshold: float = 0.6,
    max_df: int = 10,
    round_digits: int | None = 6,
) -> DataFrame:
    """Asymmetric near-CONTAINMENT pairs over distinct k-token chunk
    sets: containment(a,b) = |A ∩ B| / min(|A|, |B|) — the signal
    Jaccard misses when a small doc is embedded inside a much larger
    one (quoted article in a page, boilerplate wrapper around content):
    such pairs have low Jaccard but containment ≈ 1.

    Output (id_a, id_b, containment ≥ threshold), id_a < id_b, scored
    exactly on full distinct-chunk sets. Candidate generation is
    df-capped exactly like :func:`ngram_jaccard_pairs` (rare chunks
    with 2 ≤ df ≤ max_df emit their in-array pairs; a corpus-hot chunk
    emits nothing), with the same sound upper-bound prefilter —
    I_exact ≤ min(ic + min(hot_a, hot_b), na, nb) and containment is
    increasing in I. Recall contract: the prefilter is LOSSLESS over
    the posting-list candidate universe (no candidate that qualifies
    is dropped before the exact verify), but a pair whose every shared
    chunk has df > max_df never enters that universe at all — by
    design, pairs glued together only by corpus-hot boilerplate are
    not detected (the oracle applies the same cap, so parity holds).
    The exact verify re-chunks only candidate docs map-side.
    """
    occ = (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))
        .repartition(_spread_partitions(df))
        .select(
            "doc",
            F.explode(
                F.array_distinct(token_chunks("__t", k))
            ).alias("c"),
        )
        .filter(F.col("c") != "")
    )
    inter_c, sides = _df_capped_candidates(occ, "c", max_df)
    sa = sides.select(  # see ngram_jaccard_pairs: same df-capped shape
        F.col("doc").alias("id_a"),
        F.col("__n").alias("__na"),
        F.col("__hot").alias("__hota"),
    )
    sb = sides.select(
        F.col("doc").alias("id_b"),
        F.col("__n").alias("__nb"),
        F.col("__hot").alias("__hotb"),
    )
    i_ub = F.least(
        F.col("__ic") + F.least("__hota", "__hotb"),
        F.least("__na", "__nb"),
    )
    # true-pair-scale relation consumed 3×: lazy persist truncates the
    # candidate-chain recompute (see the measured note in
    # ngram_jaccard_pairs — same shape, same win)
    cands = (
        inter_c.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(i_ub / F.least("__na", "__nb") >= threshold)
        .select("id_a", "id_b")
        .persist()
    )
    cd = cands.select(
        F.explode(F.array("id_a", "id_b")).alias("doc")
    ).distinct()
    arrays = (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))
        .join(F.broadcast(cd), "doc")
        .select(
            "doc",
            F.filter(
                F.array_distinct(token_chunks("__t", k)), lambda c: c != ""
            ).alias("ch"),
        )
    )
    a = arrays.select(F.col("doc").alias("id_a"), F.col("ch").alias("__ca"))
    b = arrays.select(F.col("doc").alias("id_b"), F.col("ch").alias("__cb"))
    inter = F.size(F.array_intersect("__ca", "__cb"))
    cont = inter / F.least(F.size("__ca"), F.size("__cb"))
    if round_digits is not None:
        cont = F.round(cont, round_digits)
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("containment", cont)
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )
