"""Unit tests for operators/curation.py — the edge cases the oracle gate
can't exercise on the synthetic corpus (empty docs, boundary-straddling
chunks, split stability under corpus growth, explicit contamination)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_repetition_signals_edge_docs(spark):
    d = _docs(
        spark,
        [
            (1, "a b a b a b", "s"),      # one bigram dominates
            (2, "w x y z", "s"),          # all bigrams unique
            (3, "solo", "s"),             # 1 token → no bigrams
            (4, "   ", "s"),              # no tokens at all
        ],
    )
    out = {
        r["doc_id"]: r
        for r in curation.repetition_signals(d).collect()
    }
    # doc 1: tokens [a b a b a b] → 5 bigrams: a_b ×3, b_a ×2 — all dup
    assert out[1]["n_tokens"] == 6
    assert out[1]["top_bigram_frac"] == 0.6
    assert out[1]["dup_bigram_frac"] == 1.0
    assert out[1]["repetitive"] is True
    assert out[1]["distinct_token_ratio"] == round(2 / 6, 6)
    # doc 2: 3 unique bigrams
    assert out[2]["top_bigram_frac"] == round(1 / 3, 6)
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["repetitive"] is False
    # doc 3: no bigrams → NULL fracs, NULL flag
    assert out[3]["n_tokens"] == 1
    assert out[3]["top_bigram_frac"] is None
    assert out[3]["repetitive"] is None
    # doc 4: whitespace-only → zero tokens, every ratio NULL
    assert out[4]["n_tokens"] == 0
    assert out[4]["distinct_token_ratio"] is None


def test_contaminated_ids_explicit_overlap(spark):
    ev = _docs(spark, [(100, "the quick brown fox jumps", "eval")])
    tr = _docs(
        spark,
        [
            (1, "lazy dog saw the quick brown fox leap", "s"),  # shares 4-gram
            (2, "totally different words entirely here now", "s"),
            (3, "quick brown fox jumps high", "s"),              # shares 4-gram
        ],
    )
    bad = sorted(
        r["doc_id"]
        for r in curation.contaminated_ids(tr, ev, n=4).collect()
    )
    assert bad == [1, 3]


def test_hash_split_deterministic_and_stable(spark):
    d1 = _docs(spark, [(i, "t", "s") for i in range(200)])
    d2 = _docs(spark, [(i, "t", "s") for i in range(400)])  # corpus grew
    s1 = {
        r["doc_id"]: r["split"]
        for r in curation.hash_split(d1).collect()
    }
    s2 = {
        r["doc_id"]: r["split"]
        for r in curation.hash_split(d2).collect()
    }
    # growth never reassigns an existing doc
    assert all(s2[i] == s1[i] for i in range(200))
    # matches the documented bucket formula
    for i in (0, 7, 123):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        want = "train" if b < 90 else ("val" if b < 95 else "test")
        assert s1[i] == want
    assert set(s1.values()) <= {"train", "val", "test"}


def test_pack_chunks_boundaries(spark):
    # per-shard streams: chunk = floor(preceding_tokens / 4)
    d = _docs(
        spark,
        [
            (1, "a b c", "s1"),    # preceding 0 → chunk 0
            (2, "d e f", "s1"),    # preceding 3 → chunk 0 (straddles)
            (3, "g", "s1"),        # preceding 6 → chunk 1
            (4, "h i j k l", "s2"),  # other shard restarts at 0
        ],
    )
    out = {
        r["doc_id"]: r
        for r in curation.pack_chunks(d, chunk_tokens=4).collect()
    }
    assert [out[i]["chunk_id"] for i in (1, 2, 3)] == [0, 0, 1]
    assert out[4]["chunk_id"] == 0 and out[4]["source"] == "s2"
    assert out[1]["n_tok"] == 3


def test_unigram_logprob_orders_docs_by_typicality(spark):
    """A doc made of corpus-common tokens must outscore a doc of
    hapaxes; scores are negative; n_tokens matches the whitespace
    contract."""
    from reddit_apache_airflow_postgres_pipeline_spark.operators.textstats import (
        unigram_logprob,
    )

    rows = [
        (1, "common common common common"),
        (2, "common common common rare1"),
        (3, "rare2 rare3 rare4 rare5"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_logprob(df).collect()
    }
    assert all(v[0] == 4 for v in got.values())
    assert all(v[1] < 0 for v in got.values())
    assert got[1][1] > got[2][1] > got[3][1]


def test_strip_duplicate_chunks_semantics(spark):
    """Shared 8-token chunks vanish from EVERY doc; tails and unique
    chunks survive in order; all-boilerplate docs come back empty;
    empty-text docs emit no row."""
    from reddit_apache_airflow_postgres_pipeline_spark.operators.curation import strip_duplicate_chunks

    # 8 tokens exactly → one shared chunk, no tail inside the boilerplate
    boiler = "please accept our cookie policy before you continue"
    rows = [
        (1, boiler + " actual article content here"),
        (2, boiler + " different article body text"),
        (3, "a completely standalone document with its own words only"),
        (4, boiler),          # 100% boilerplate
        (5, ""),              # no chunks → no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in strip_duplicate_chunks(df, k=8).collect()}

    assert set(got) == {1, 2, 3, 4}
    # docs 1/2/4 share the 8-token boilerplate chunk; distinct tails stay
    assert got[1]["dropped_chunks"] == 1
    assert got[1]["text_clean"] == "actual article content here"
    assert got[2]["text_clean"] == "different article body text"
    # doc 4 is boilerplate-only → rewritten to empty
    assert got[4]["text_clean"] == ""
    assert got[4]["dropped_chunks"] == got[4]["n_chunks"] == 1
    # untouched doc round-trips to its normalized token stream
    assert got[3]["dropped_chunks"] == 0
    assert got[3]["text_clean"] == rows[2][1]


def test_token_chunks_with_tail_reassembles(spark):
    """Concatenating tail-keeping chunks reproduces the normalized
    token stream for every length mod k."""
    from pyspark.sql import functions as F

    from reddit_apache_airflow_postgres_pipeline_spark.operators.neardup import token_chunks_with_tail

    texts = [
        (" ".join(f"t{i}" for i in range(n)),) for n in [1, 3, 8, 9, 16, 20]
    ]
    df = spark.createDataFrame(texts, "text string")
    out = df.select(
        "text",
        F.array_join(token_chunks_with_tail("text", 8), " ").alias("rejoined"),
    ).collect()
    for r in out:
        assert r["rejoined"] == r["text"]


def test_sliding_chunks_window_rule(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators import chunking

    text10 = " ".join(f"t{i}" for i in range(10))
    d = _docs(
        spark,
        [
            (1, text10, "s"),    # 10 tokens, chunk 4 / overlap 1 → stride 3
            (2, "a b", "s"),     # shorter than one window → 1 chunk
            (3, "   ", "s"),     # whitespace-only → no rows
            (4, "Keep CASE", "s"),
        ],
    )
    out = chunking.sliding_chunks(d, chunk_tokens=4, overlap=1)
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["start_token"], r["n_tokens"], r["chunk_text"])
         for r in out.collect())
    )
    # doc 1: ceil((10-1)/3) = 3 chunks at starts 0,3,6
    d1 = [r for r in rows if r[0] == 1]
    assert [(r[1], r[2], r[3]) for r in d1] == [(0, 0, 4), (1, 3, 4), (2, 6, 4)]
    assert d1[0][4] == "t0 t1 t2 t3" and d1[2][4] == "t6 t7 t8 t9"
    # neighbours share exactly `overlap` tokens
    assert d1[0][4].split()[-1:] == d1[1][4].split()[:1]
    assert [r for r in rows if r[0] == 2] == [(2, 0, 0, 2, "a b")]
    assert not [r for r in rows if r[0] == 3]
    assert [r for r in rows if r[0] == 4][0][4] == "Keep CASE"  # case preserved


def test_sliding_chunks_rejects_bad_overlap(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators import chunking

    try:
        chunking.sliding_chunks(_docs(spark, [(1, "a", "s")]), chunk_tokens=4, overlap=4)
    except ValueError as e:
        assert "overlap" in str(e)
    else:
        raise AssertionError("overlap >= chunk_tokens must raise")


def test_bloom_contamination_superset_of_exact(spark):
    ev = _docs(spark, [(100, "the quick brown fox jumps", "eval")])
    tr = _docs(
        spark,
        [
            (1, "the quick brown fox sleeps here", "s"),  # shares 4-gram? quick brown fox sleeps no; the quick brown fox YES
            (2, "completely different words entirely now", "s"),
            (3, "the quick brown fox jumps again", "s"),
        ],
    )
    exact = {r["doc_id"] for r in curation.contaminated_ids(tr, ev, n=4).collect()}
    bits = curation.bloom_filter_bits(ev, n=4, k=4, m=4096)
    bloom = {
        r["doc_id"]
        for r in curation.bloom_contaminated_ids(tr, bits, n=4, k=4, m=4096).collect()
    }
    assert exact == {1, 3}
    assert exact <= bloom  # no false negatives, ever


def test_bloom_bits_capped_by_m(spark):
    ev = _docs(
        spark,
        [(i, " ".join(f"w{i}_{j}" for j in range(30)), "e") for i in range(40)],
    )
    m = 64  # tiny filter, heavily overloaded
    bits = curation.bloom_filter_bits(ev, n=4, k=4, m=m)
    vals = [r["pos"] for r in bits.collect()]
    assert len(vals) <= m and all(0 <= v < m for v in vals)


def test_bigram_logprob_flags_word_salad(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators.textstats import bigram_logprob

    # coherent docs repeat the same bigrams; the salad doc uses the same
    # common tokens in never-seen orders
    d = _docs(
        spark,
        [
            (1, "the cat sat on the mat", "s"),
            (2, "the cat sat on the mat", "s"),
            (3, "the cat sat on the mat", "s"),
            (4, "mat the on sat cat the", "s"),  # word salad
            (5, "solo", "s"),                    # < 2 tokens → no row
        ],
    )
    out = {r["doc_id"]: r for r in bigram_logprob(d).collect()}
    assert 5 not in out
    assert out[1]["n_bigrams"] == 5
    assert out[1]["avg_logprob"] == out[2]["avg_logprob"]
    assert out[4]["avg_logprob"] < out[1]["avg_logprob"]


def test_psi_drift_identical_snapshots_zero_and_empty_bins_finite(spark):
    from pyspark.sql import functions as F

    binned = spark.createDataFrame(
        [(i, i % 3) for i in range(60)], "doc_id long, bin int"
    )
    same = curation.psi_drift(binned, binned, bins=5)
    rows = {r["bin"]: r for r in same.collect()}
    assert set(rows) == {0, 1, 2, 3, 4}  # spine includes empty bins
    for r in rows.values():
        assert r["psi_term"] == 0.0  # identical dists -> zero drift
        assert r["p_ref"] == r["p_cur"] > 0  # smoothing keeps them finite

    shifted = spark.createDataFrame(
        [(i, 4) for i in range(60)], "doc_id long, bin int"
    )
    drift = curation.psi_drift(binned, shifted, bins=5)
    total = drift.agg(F.sum("psi_term")).collect()[0][0]
    assert total > 0.25  # full redistribution = major drift


def test_dedup_lines_counts_occurrences_not_docs(spark):
    # the CCNet distinction: a doc repeating its OWN line 3 times trips
    # min_occurrences=3 even though only one document carries it
    docs = spark.createDataFrame(
        [
            (1, "nav bar\nnav bar\nnav bar\nreal content"),
            (2, "other text\nmore text"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.dedup_lines(docs, min_occurrences=3).collect()}
    assert out[1]["n_lines"] == 4 and out[1]["dropped_lines"] == 3
    assert out[1]["text_clean"] == "real content"
    assert out[2]["dropped_lines"] == 0
    # strip_duplicate_chunks' distinct-doc counting would NOT have
    # dropped it: 1 distinct doc < min_df


def test_dedup_lines_normalized_key_but_original_bytes(spark):
    # 'Cookie NOTICE!' and 'cookie notice' share a normalized key; both
    # occurrences count toward the threshold, and the KEPT lines retain
    # their original bytes
    docs = spark.createDataFrame(
        [
            (1, "Cookie NOTICE!\nKeep Me #1"),
            (2, "cookie notice\nKeep Me #2"),
            (3, "COOKIE notice?\nunique tail"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.dedup_lines(docs, min_occurrences=3).collect()}
    assert [out[i]["dropped_lines"] for i in (1, 2, 3)] == [1, 1, 1]
    assert out[1]["text_clean"] == "Keep Me #1"  # original case/punct kept
    assert out[3]["text_clean"] == "unique tail"


def test_dedup_lines_blank_lines_always_kept(spark):
    # blank / punctuation-only lines normalize to '' and are structure,
    # not boilerplate evidence — kept in every doc no matter how common
    docs = spark.createDataFrame(
        # tails differ in LETTERS (digits would normalize away and
        # correctly become duplicates themselves)
        [(i, "a b c\n\n---\nuniq" + "x" * i) for i in range(5)],
        "doc_id long, text string",
    )
    out = curation.dedup_lines(docs, min_occurrences=2).collect()
    for r in out:
        assert r["n_lines"] == 4
        assert r["dropped_lines"] == 1  # only the 'a b c' banner
        assert r["text_clean"].startswith("\n---\n")  # blanks survive


def test_dedup_spans_edges(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators.curation import dedup_spans

    shared = "one two three four"  # the duplicated 4-token span
    docs = spark.createDataFrame(
        [
            (1, f"{shared} alpha beta"),          # span + unique tail
            (2, f"gamma {shared} delta"),         # span mid-doc
            (3, "tiny doc"),                      # shorter than k: untouched
            (4, ""),                              # empty: passes through
            (5, f"{shared} {shared}"),            # self-repeat: all copies go
            (6, "unique tokens only here now"),   # no dup span
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_spans(docs, k=4, min_occurrences=2).collect()
    }
    assert out[1]["text_clean"] == "alpha beta"
    assert out[1]["dropped_tokens"] == 4
    assert out[2]["text_clean"] == "gamma delta"
    assert out[3]["text_clean"] == "tiny doc" and out[3]["dropped_tokens"] == 0
    assert out[4] == (4, 0, 0, "") or (
        out[4]["n_tokens"] == 0 and out[4]["text_clean"] == ""
    )
    # self-repeated span: overlapping 4-gram starts cover everything
    assert out[5]["text_clean"] == "" and out[5]["dropped_tokens"] == 8
    assert out[6]["text_clean"] == "unique tokens only here now"
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        dedup_spans(docs, k=1)
