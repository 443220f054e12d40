"""Text-analysis operators for training-data pipelines (BASELINE.json
north star): tokenization, token counting, quality scoring, language ID,
document fingerprinting.

All operators are built-in Column expressions (JVM-side, codegen-friendly)
— no Python in the hot path — and each has a deterministic ANSI-SQL
equivalent so the DuckDB oracle can verify results (plans/registry.py).

At 100 TB these are embarrassingly parallel map-only projections: no
shuffle, pushdown-friendly, limited only by scan bandwidth.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deliberately tiny + hardcoded: the operator contract is
# deterministic voting, not model quality.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "que", "pour"],
}

STOPWORDS_EN = LANG_MARKERS["en"]

PUNCT_RE = r"[^A-Za-z0-9\s]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text; empty text → empty array.

    ``split`` on ``\\s+`` after trim — both engines agree that tokenizing
    an empty string yields zero tokens (guarded explicitly).
    """
    c = F.trim(F.lower(F.coalesce(_col(col), F.lit(""))))
    return F.when(c == "", F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count (long)."""
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: split on word/number/punct boundaries with
    a BPE-flavored regex (letters runs, digit runs, single punct marks).
    A cheap, deterministic stand-in for a real tokenizer's token count."""
    c = F.coalesce(_col(col), F.lit(""))
    # count matches of: letter-runs | digit-runs | non-space-non-alnum singles
    return F.size(
        F.filter(
            F.split(c, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
            lambda t: F.trim(t) != "",
        )
    ).cast("long")


def punct_ratio(col: Column | str) -> Column:
    """len(non-alnum-non-space chars) / len(text); 0.0 for empty text."""
    c = F.coalesce(_col(col), F.lit(""))
    n = F.length(c)
    p = n - F.length(F.regexp_replace(c, PUNCT_RE, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n.cast("double"))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords; 0.0 if no tokens."""
    sw = stopwords or STOPWORDS_EN
    t = tokens(col)
    hits = F.size(F.filter(t, lambda x: x.isin(*sw)))
    n = F.size(t)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double")
    )


def mean_token_len(col: Column | str) -> Column:
    """Average token length in characters; 0.0 if no tokens."""
    t = tokens(col)
    n = F.size(t)
    total = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(
        total.cast("double") / n.cast("double")
    )


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1]:

        0.4 * min(n_tokens/100, 1)        -- enough content
      + 0.3 * (1 - punct_ratio)           -- not symbol soup
      + 0.3 * min(stopword_ratio*5, 1)    -- natural-language-like

    Deterministic and SQL-mirrorable; the weights are the contract.
    """
    nt = token_count(col).cast("double")
    return (
        F.lit(0.4) * F.least(nt / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(col))
        + F.lit(0.3) * F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-stopword hit counts (the language-ID votes)."""
    t = tokens(col)
    return {
        lang: F.size(F.filter(t, lambda x: x.isin(*markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column | str, default: str = "und") -> Column:
    """Argmax language by marker hits; ties broken by language code order
    (deterministic); no hits at all → ``default``.

    Implemented as a greatest-score CASE chain so the whole thing stays
    one codegen'd expression.
    """
    scores = lang_scores(col)
    langs = sorted(scores)  # tie-break: alphabetical
    best = F.greatest(*[scores[lg] for lg in langs])
    out = F.lit(default)
    # build reversed so earlier languages win ties
    for lg in reversed(langs):
        out = F.when((scores[lg] > 0) & (scores[lg] == best), F.lit(lg)).otherwise(out)
    return out


def fingerprint(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 of lowercased,
    whitespace-collapsed, trimmed text. The exact-dedup key for text that
    differs only in spacing/case."""
    c = F.coalesce(_col(col), F.lit(""))
    canon = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(canon)


# PII patterns — kept to syntax Java regex and RE2 (DuckDB) agree on:
# plain classes and bounded repeats, no lookaround, no \s (Java's \s
# includes \x0B, RE2's does not), no backreferences.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PII_PHONE_RE = r"\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"

# scrub order is part of the contract: email first (its local part could
# otherwise be chewed up by the phone pattern's digit runs), then IP
# (dotted digits must go before the looser phone digits), then phone.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", PII_EMAIL_RE, "[EMAIL]"),
    ("ipv4", PII_IPV4_RE, "[IP]"),
    ("phone", PII_PHONE_RE, "[PHONE]"),
]


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-pattern PII hit counts on the original text (long columns)."""
    c = F.coalesce(_col(col), F.lit(""))
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def pii_scrub(col: Column | str) -> Column:
    """Redact all PII patterns, applied in the documented order."""
    c = F.coalesce(_col(col), F.lit(""))
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def tfidf_top_terms(docs, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 3):
    """Top-k TF-IDF terms per document (smoothed sklearn-style idf:
    ``ln((N+1)/(df+1)) + 1``).

    Scale shape (the plan a vocabulary/relevance build runs at 100 TB):

    * tokens: map-side explode — no shuffle;
    * tf: hash aggregate on ``(doc, term)`` — one shuffle, partial
      map-side combine;
    * df: re-aggregate of the (already skinny) tf relation on term —
      vocabulary-sized output;
    * tf⋈df on term: AQE broadcasts df when the vocabulary is small,
      falls back to a shuffle join when it isn't — no hint forced;
    * corpus size N: scalar aggregate, broadcast-nested into every row
      via a 1-row cross join (never ``collect()`` — keeps the whole
      thing one lazy plan);
    * top-k: ``row_number`` window per doc, partition-local sort only.

    Determinism contract: ranking and output both use the 6dp-rounded
    score, so a ≤1-ulp ``ln`` divergence between engines cannot reorder
    the top-k (ties break on term asc).
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "tok", "tf", "df", "tfidf")
    )


def unigram_logprob(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document mean unigram log2-probability under the corpus's own
    empirical unigram LM — the cheap perplexity proxy quality filters
    use: documents whose tokens are systematically improbable for the
    corpus (OCR noise, wrong-language spans, symbol soup) score far
    below the bulk and can be thresholded off before training.

    Output: (doc_id, n_tokens, avg_logprob) — avg_logprob is
    ``mean(log2 c_tok / T)`` over the doc's token occurrences, where
    ``c_tok`` is the corpus count of the token and ``T`` the total
    token count. Always negative; higher (closer to 0) = more typical.
    Per-token logs are rounded to 9 dp and summed as DECIMAL (the
    engine-wide order-free-reduce idiom, cf. the entropy query) so the
    mean is independent of partitioning and engine.

    Scale shape: one explode (map-side), one vocabulary hash-agg
    (map-side partial combine → vocabulary-sized output), the
    occurrence⋈vocab join on token (AQE broadcasts small vocabularies,
    shuffles big ones), the corpus total as a 1-row broadcast cross
    join (never ``collect()``), and a final per-doc agg. At 100 TB the
    vocabulary join is the only corpus-scale shuffle, and it reuses the
    explode's partitioning.
    """
    occ = docs.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = occ.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").cast("long").alias("t"))
    return (
        occ.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(
                    F.round(F.log2(F.col("c") / F.col("t")), 9).cast(
                        "decimal(28,12)"
                    )
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_logprob"),
        )
        .select(F.col("doc").alias("doc_id"), "n_tokens", "avg_logprob")
    )


def bigram_logprob(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document mean add-one-smoothed bigram conditional
    log2-probability under the corpus's own bigram LM — the step up
    from :func:`unigram_logprob` on the perplexity-proxy ladder:
    word-salad documents whose tokens are individually common but
    locally incoherent ("the of and the of") score low here while
    passing the unigram filter.

    P(w2|w1) = (c(w1 w2) + 1) / (c(w1·) + V), where c(w1·) counts
    bigram CONTEXTS (bigram-initial occurrences, derived from the
    bigram relation itself) and V is the corpus vocabulary size —
    classic Laplace smoothing, so unseen continuations stay finite.
    Output: (doc_id, n_bigrams, avg_logprob) over the doc's bigram
    occurrences (multiplicity kept; docs with < 2 tokens produce no
    bigrams and drop out). Per-bigram logs rounded to 9 dp and summed
    as DECIMAL — the engine-wide order-free-reduce idiom.

    Scale shape mirrors unigram_logprob: the bigram occurrences come
    from ONE overlapping-lookahead regex pass (codegen, no HOF — see
    word_shingles), then a bigram-vocab hash agg, a context agg over
    that (already tiny), the occurrence⋈counts joins on the bigram
    key, a 1-row broadcast vocab size, and a per-doc agg. The only
    corpus-scale shuffle is the bigram join, same as the unigram's.
    """
    norm = F.regexp_replace(
        F.trim(F.lower(F.coalesce(_col(text_col), F.lit("")))), r"\s+", " "
    )
    occ = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.regexp_extract_all(norm, F.lit(r"(?=(\S+ \S+))\S+"), 1)
        ).alias("bg"),
    )
    bgc = occ.groupBy("bg").agg(F.count("*").alias("cbg"))
    ctx = (
        bgc.select(F.substring_index("bg", " ", 1).alias("w1"), "cbg")
        .groupBy("w1")
        .agg(F.sum("cbg").cast("long").alias("cctx"))
    )
    vocab = (
        docs.select(F.explode(tokens(text_col)).alias("tok"))
        .filter(F.col("tok") != "")
        .agg(F.countDistinct("tok").alias("v"))
    )
    logp = F.round(
        F.log2((F.col("cbg") + 1) / (F.col("cctx") + F.col("v"))), 9
    )
    return (
        occ.join(bgc, "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum(logp.cast("decimal(28,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_logprob"),
        )
        .select(F.col("doc").alias("doc_id"), "n_bigrams", "avg_logprob")
    )


def bpe_learn(
    docs: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Learn the first ``k`` BPE merges from the corpus (Sennrich et al.
    2016) — tokenizer TRAINING, not just token counting: the other half
    of what a pretraining data pipeline does with text at scale.

    Classic word-level BPE: words split into characters; each round
    merges the adjacent symbol pair with the highest corpus frequency
    (weighted by word frequency, ties broken lexicographically — a
    total order, so the learned merge table is deterministic). Output:
    (step, l_sym, r_sym, merged, cnt), one row per learned merge.
    If the corpus exhausts its merges before round ``k`` (all surviving
    words single-symbol), the remaining rounds are no-ops and the
    output has FEWER than ``k`` rows — never an annihilated relation
    (a cnt=0 sentinel keeps the per-round argmax non-empty).

    Symbol sequences are carried as ``{a}{b}{c}`` strings: the braces
    make the merge a plain string ``replace`` with no false boundary
    matches (a pattern ``{a}{b}`` cannot match inside ``{xa}{b}``), and
    both engines' replace is leftmost non-overlapping, continuing after
    the replacement — Python ``str.replace`` semantics — so the SQL
    oracle (registry_stats._bpe_sql) replays every round exactly.
    The corpus alphabet must not contain ``{`` or ``}`` (asserted
    nowhere: pick different sentinels for corpora that do).

    Scale shape per round: pair counting is one explode + hash agg over
    the WORD VOCABULARY (not the corpus — frequencies were folded into
    ``freq`` by the first agg), the argmax is a vocabulary-of-pairs
    top-1 (TakeOrderedAndProject, no full sort materialization), and
    the merge is a map-side replace under a 1-row broadcast. ``k`` is a
    small constant here; a production trainer with k in the tens of
    thousands batches non-conflicting merges per round — same plan
    shape, fewer rounds.
    """
    steps, _ = _bpe_rounds(docs, text_col, k)
    out = steps[0]
    for s in steps[1:]:
        out = out.unionAll(s)
    return out


def _bpe_rounds(docs: DataFrame, text_col: str, k: int):
    """The shared trainer loop: returns (per-step merge DataFrames, the
    final symbol-sequence relation (w, seq, freq) after all k merges)."""
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        # brace-bearing tokens are EXCLUDED from training (mirrored in
        # the SQL oracle): they would collide with the {…} sentinel and
        # silently corrupt merges — in both engines identically, which
        # is exactly the failure the oracle gate cannot see
        .filter(
            (F.col("w") != "")
            & ~F.col("w").contains("{")
            & ~F.col("w").contains("}")
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        # the one corpus-scale pass (token explode + agg); checkpointed
        # so the k unrolled rounds and the step union all read one
        # materialized vocabulary instead of re-deriving the corpus
        # subtree per consumer (triangles/pagerank idiom)
        .localCheckpoint()
    )
    seqs = words.select(
        "w", F.regexp_replace("w", "(.)", "{$1}").alias("seq"), "freq"
    )
    # no-op fallback merge: if a round finds NO adjacent pair (all
    # surviving words single-symbol, or k exceeds available merges) the
    # bare top-1 is EMPTY and a crossJoin would annihilate seqs — every
    # later round silently returning 0 rows. Union a cnt=0 sentinel
    # ('','') whose replace pattern '{}{}' can never match (symbols are
    # never empty) so the argmax is always 1 row; real pairs (cnt >= 1)
    # always outrank it. Steps with cnt=0 are filtered out, so
    # bpe_learn may return FEWER than k steps on degenerate corpora.
    noop = docs.sparkSession.range(1).select(
        F.lit("").alias("l_sym"),
        F.lit("").alias("r_sym"),
        F.lit(0).cast("bigint").alias("cnt"),
    )
    steps = []
    for step in range(1, k + 1):
        syms = F.split(
            F.regexp_replace("seq", r"^\{|\}$", ""), r"\}\{"
        )
        pairs = (
            seqs.withColumn("__syms", syms)
            .filter(F.size("__syms") >= 2)
            .select(
                F.explode(
                    F.zip_with(
                        F.slice("__syms", 1, F.size("__syms") - 1),
                        F.slice("__syms", 2, F.size("__syms") - 1),
                        lambda a, b: F.concat_ws(" ", a, b),
                    )
                ).alias("pr"),
                "freq",
            )
        )
        best = (
            pairs.groupBy("pr")
            .agg(F.sum("freq").alias("cnt"))
            .select(
                F.split_part(F.col("pr"), F.lit(" "), F.lit(1)).alias("l_sym"),
                F.split_part(F.col("pr"), F.lit(" "), F.lit(2)).alias("r_sym"),
                "cnt",
            )
            .unionAll(noop)
            .orderBy(F.desc("cnt"), F.asc("l_sym"), F.asc("r_sym"))
            .limit(1)
        )
        steps.append(
            best.filter(F.col("cnt") > 0).select(
                F.lit(step).alias("step"),
                "l_sym",
                "r_sym",
                F.concat("l_sym", "r_sym").alias("merged"),
                F.col("cnt").cast("bigint").alias("cnt"),
            )
        )
        seqs = seqs.crossJoin(F.broadcast(best)).select(
            "w",
            F.replace(
                F.col("seq"),
                F.concat(F.lit("{"), F.col("l_sym"), F.lit("}{"), F.col("r_sym"), F.lit("}")),
                F.concat(F.lit("{"), F.col("l_sym"), F.col("r_sym"), F.lit("}")),
            ).alias("seq"),
            "freq",
        )
    return steps, seqs


def bpe_compression_stats(
    docs: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Train the first ``k`` BPE merges, APPLY them, and report the
    number a tokenizer trainer actually optimizes — symbols per token:

        (vocab_size, total_tokens, syms_per_token_initial,
         syms_per_token_merged, compression)

    one row, token-frequency-weighted means (initial = characters per
    token), compression = initial / merged. All ratios are divisions of
    exact integer sums rounded at 6 dp, so the oracle (which replays
    the identical unrolled merge rounds) matches exactly. Same plan
    shape as :func:`bpe_learn` plus one bounded vocabulary aggregate.
    """
    _, seqs = _bpe_rounds(docs, text_col, k)
    n_syms = F.size(
        F.split(F.regexp_replace("seq", r"^\{|\}$", ""), r"\}\{")
    )
    agg = seqs.select(
        "freq",
        (F.length("w") * F.col("freq")).alias("__chars"),
        (n_syms * F.col("freq")).alias("__syms"),
    ).agg(
        F.count("*").cast("bigint").alias("vocab_size"),
        F.sum("freq").cast("bigint").alias("total_tokens"),
        F.sum("__chars").alias("__tc"),
        F.sum("__syms").alias("__ts"),
    )
    return agg.select(
        "vocab_size",
        "total_tokens",
        F.round(F.col("__tc") / F.col("total_tokens"), 6).alias(
            "syms_per_token_initial"
        ),
        F.round(F.col("__ts") / F.col("total_tokens"), 6).alias(
            "syms_per_token_merged"
        ),
        F.round(F.col("__tc") / F.col("__ts"), 6).alias("compression"),
    )


def bpe_apply(
    docs: DataFrame,
    merges: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """APPLY a learned merge table to the corpus — the tokenizer-run
    counterpart of :func:`bpe_learn` (learn → apply → ship shards):
    (doc_id, pos, w, syms), one row per word occurrence in document
    order, ``syms`` the word's symbol sequence after the first ``k``
    merges in learned order.

    ``merges`` is bpe_learn's output relation; ``k`` tells the plan how
    many replace stages to build (the caller trained with it — a
    relation can't size a static plan). Steps missing from the table
    (degenerate corpora learn fewer than k) fall back to a no-op
    sentinel, mirroring the trainer. Words carrying the ``{``/``}``
    sentinel chars are excluded exactly as they were from training.

    Scale shape: the merge chain runs over the DISTINCT-WORD vocabulary
    (each replace a map-side pass under a 1-row broadcast), then one
    equi-join puts per-word symbol arrays back on the corpus word
    stream — tokenize-once-per-type, the only sane shape at 100 TB.
    """
    spark = docs.sparkSession
    noop = spark.range(1).select(
        F.lit(0).alias("__real"), F.lit("").alias("l_sym"), F.lit("").alias("r_sym")
    )
    word_stream = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens(text_col)).alias("pos", "w"),
        )
        .filter(
            (F.col("w") != "")
            & ~F.col("w").contains("{")
            & ~F.col("w").contains("}")
        )
    )
    seqs = word_stream.select("w").distinct().select(
        "w", F.regexp_replace("w", "(.)", "{$1}").alias("seq")
    )
    for step in range(1, k + 1):
        m = (
            merges.filter(F.col("step") == step)
            .select(F.lit(1).alias("__real"), "l_sym", "r_sym")
            .unionAll(noop)
            .orderBy(F.desc("__real"))
            .limit(1)
        )
        seqs = seqs.crossJoin(F.broadcast(m)).select(
            "w",
            F.replace(
                F.col("seq"),
                F.concat(F.lit("{"), F.col("l_sym"), F.lit("}{"), F.col("r_sym"), F.lit("}")),
                F.concat(F.lit("{"), F.col("l_sym"), F.col("r_sym"), F.lit("}")),
            ).alias("seq"),
        )
    syms = seqs.select(
        "w",
        F.split(F.regexp_replace("seq", r"^\{|\}$", ""), r"\}\{").alias("syms"),
    )
    return word_stream.join(syms, "w").select("doc_id", "pos", "w", "syms")


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query
    term set — the lexical half of a hybrid retrieval stack (the
    embedding kNN in operators/similarity.py is the dense half):
    (doc_id, n_matched, score), one row per document matching ≥ 1 term.

    Lucene's always-positive idf variant:
    ``idf = ln((N − df + 0.5)/(df + 0.5) + 1)``; per (doc, term)
    ``idf · (tf·(k1+1)) / (tf + k1·(1 − b + b·dl/avgdl))``, rounded to
    9 dp and summed as DECIMAL so the per-doc reduce is order-free
    (the engine-wide determinism recipe); the SQL oracle replays the
    identical expression shape.

    Scale shape: token explode filtered to the |Q| query terms BEFORE
    the (doc, term) aggregate — the exchange carries only matching
    tokens; doc lengths are a second slim aggregate joined back; N,
    avgdl, and the per-term idf table are 1-row / |Q|-row broadcasts.
    One corpus scan dominates at any size.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t")
    )
    tf = (
        d.select("doc_id", F.explode(tokens("__t")).alias("term"))
        .filter(F.col("term").isin(*query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = d.select("doc_id", token_count("__t").alias("dl"))
    totals = d.agg(
        F.count("*").alias("__N"),
        F.sum(token_count("__t")).alias("__toks"),
    )
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = dft.crossJoin(F.broadcast(totals)).select(
        "term",
        F.log(
            (F.col("__N") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf"),
        (F.col("__toks").cast("double") / F.col("__N")).alias("avgdl"),
    )
    term_score = F.round(
        F.col("idf")
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * (F.col("dl") / F.col("avgdl")))
        ),
        9,
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .select("doc_id", term_score.cast("decimal(28,12)").alias("__s"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_matched"),
            F.round(F.sum("__s").cast("double"), 6).alias("score"),
        )
    )
