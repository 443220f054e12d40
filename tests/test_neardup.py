"""Near-dup operator edge cases (operators/neardup.py).

The oracle-harness (test_entry_oracle.py) checks the sf0.001 corpus; this
file pins the edge cases that corpus doesn't contain — in particular
empty / whitespace-only / NULL documents, which must be EXCLUDED from the
SimHash doc universe on both engines (ADVICE r01: split(trim(''))=['']
previously gave every empty doc the md5('') signature, pairing them all
at hamming 0 — an O(n²) identical-signature blowup and an oracle hash
mismatch, since the DuckDB SQL filters them via WHERE trim(...) <> '').
"""

from __future__ import annotations

import duckdb
import pytest

from reddit_apache_airflow_postgres_pipeline_spark.operators import neardup
from reddit_apache_airflow_postgres_pipeline_spark.plans.registry_ml import _simhash_sql


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


EDGE_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1/2
    (4, "completely different text about spark engines and shuffles"),
    (5, ""),            # empty — must not participate
    (6, "   \t  \n "),  # whitespace-only — must not participate
    (7, None),          # NULL — must not participate
    (8, ""),            # second empty: would pair with 5 at hamming 0 if unfiltered
]


def test_simhash_excludes_empty_docs(spark):
    df = _docs_df(spark, EDGE_ROWS)
    pairs = neardup.simhash_near_dups(df, "doc_id", "text", bits=32, max_hamming=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    participants = {d for p in got for d in p}
    assert participants.isdisjoint({5, 6, 7, 8}), (
        f"empty/NULL docs leaked into candidate pairs: {got}"
    )
    assert (1, 2) in got  # identical docs still pair at hamming 0


def test_simhash_signatures_drop_empty_docs(spark):
    sigs = neardup.simhash_signatures(_docs_df(spark, EDGE_ROWS), "doc_id", "text")
    assert {r.doc for r in sigs.collect()} == {1, 2, 3, 4}


def test_simhash_matches_oracle_with_empty_docs(spark):
    """Exact parity vs the DuckDB oracle SQL on a corpus containing the
    empty-doc edge cases (the driver's q_dedup_simhash gate, but on a
    universe the sf corpora don't cover)."""
    df = _docs_df(spark, EDGE_ROWS)
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in neardup.simhash_near_dups(
            df, "doc_id", "text", bits=32, max_hamming=3
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", EDGE_ROWS)
    want = sorted(tuple(r) for r in con.execute(_simhash_sql(32, 3)).fetchall())
    assert got == want


def test_minhash_lsh_excludes_empty_docs(spark):
    df = _docs_df(spark, EDGE_ROWS)
    pairs = neardup.minhash_lsh_pairs(
        df, "doc_id", "text", n=3, num_hashes=12, bands=4, threshold=0.7
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    participants = {d for p in got for d in p}
    assert participants.isdisjoint({5, 6, 7, 8})
    assert (1, 2) in got


def test_ngram_jaccard_excludes_empty_docs(spark):
    df = _docs_df(spark, EDGE_ROWS)
    pairs = neardup.ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.8)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    participants = {d for p in got for d in p}
    assert participants.isdisjoint({5, 6, 7, 8})
    assert (1, 2) in got


def test_chunk_dup_stats_semantics(spark):
    """Fixed-window chunk dedup: known shared/unique 4-token chunks."""
    a = "w1 w2 w3 w4 u1 u2 u3 u4"          # chunks: [w1..w4], [u1..u4]
    b = "w1 w2 w3 w4 v1 v2 v3 v4"          # shares chunk 1 with a
    c = "x1 x2 x3 x4 y1 y2 y3 y4 tail"     # trailing partial dropped
    d = "short doc"                        # < k tokens → whole-doc chunk
    e = "short doc"                        # exact dup of d at chunk level
    df = _docs_df(spark, [(1, a), (2, b), (3, c), (4, d), (5, e)])
    got = {
        r["doc_id"]: (r["n_chunks"], r["dup_chunks"], r["dup_chunk_frac"])
        for r in neardup.chunk_dup_stats(df, k=4).collect()
    }
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (2, 0, 0.0)   # 9 tokens → 2 full chunks, tail dropped
    assert got[4] == (1, 1, 1.0)   # whole-doc chunk duplicated by doc 5
    assert got[5] == (1, 1, 1.0)


def test_chunk_dup_stats_within_doc_repeat_needs_second_doc(spark):
    """A chunk repeated INSIDE one doc counts both occurrences but is
    not 'duplicated' unless another doc has it."""
    df = _docs_df(spark, [(1, "r1 r2 r3 r4 r1 r2 r3 r4")])
    (row,) = neardup.chunk_dup_stats(df, k=4).collect()
    assert (row["n_chunks"], row["dup_chunks"]) == (2, 0)


def test_token_chunks_empty_and_null(spark):
    from pyspark.sql import functions as F

    df = _docs_df(spark, [(1, ""), (2, None), (3, "   ")])
    out = (
        df.select("doc_id", F.explode(neardup.token_chunks("text", 4)).alias("c"))
        .filter(F.col("c") != "")
        .collect()
    )
    assert out == []  # degenerate docs contribute no chunks


def test_spread_partitions_size_aware(spark):
    """The spread count must scale with input size: a tiny parquet scan
    gets ~1 partition (never defaultParallelism micro-tasks — the r3
    contention lesson); unknown-stats relations (local/in-memory) are
    treated as big — the safe direction — and get the full spread."""
    par = spark.sparkContext.defaultParallelism
    tiny = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_tiny = neardup._spread_partitions(tiny)
    # 65 KB scan → a handful of 16 KB tasks, capped at parallelism
    assert 1 <= n_tiny <= min(par, 5)

    unknown = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert neardup._spread_partitions(unknown) == par


def test_plan_size_bytes_sane(spark):
    pq = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    b = neardup._plan_size_bytes(pq)
    # the real file-size estimate (~594 KB), not the huge unknown fallback
    assert 100_000 < b < 10_000_000


def test_chunk_containment_asymmetric_semantics(spark):
    """A small doc fully embedded in a big one: containment 1.0 even
    though Jaccard is low; unrelated docs produce nothing."""
    small = "c1 c2 c3 c4 c5 c6 c7 c8"  # one 8-token chunk
    big = (
        small
        + " x1 x2 x3 x4 x5 x6 x7 x8 y1 y2 y3 y4 y5 y6 y7 y8"
        + " z1 z2 z3 z4 z5 z6 z7 z8"
    )  # 4 chunks, contains small's chunk
    other = "o1 o2 o3 o4 o5 o6 o7 o8"
    df = _docs_df(spark, [(1, small), (2, big), (3, other)])
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in neardup.chunk_containment_pairs(
            df, k=8, threshold=0.6, max_df=10
        ).collect()
    }
    assert got == {(1, 2): 1.0}
    # jaccard over the same chunk-sets would be 1/4 — below any
    # near-dup threshold; containment is the signal that fires here


def test_whitespace_class_cross_engine_vertical_tab(spark):
    """\\x0B (vertical tab) is whitespace to Java's \\s but NOT to
    RE2's — a latent oracle divergence while the SQL said '\\s+'. The
    oracles now spell out Java's class [ \\t\\n\\x0b\\f\\r]+, so both
    engines must tokenize a \\x0B doc identically: doc 1 (vtab) and
    doc 2 (space) carry the same token set and pair at hamming 0."""
    rows = [
        (1, "alpha\x0bbeta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
    ]
    df = _docs_df(spark, rows)
    got = sorted(
        (r.id_a, r.id_b)
        for r in neardup.simhash_near_dups(
            df, "doc_id", "text", bits=32, max_hamming=0
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        (a, b) for a, b, _h in con.execute(_simhash_sql(32, 0)).fetchall()
    )
    assert got == want
    assert (1, 2) in got


def test_verify_routing_branches_agree(spark, monkeypatch):
    """The size-aware verify routing (corpus-wide arrays below
    _RESTRICT_VERIFY_BYTES, candidate-restricted above) is a pure
    execution-strategy choice: both branches must emit identical pairs
    and scores. Force each branch via the threshold and compare."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog by the river"),
        (2, "the quick brown fox jumps over the lazy dog by the stream"),
        (3, "entirely different content about parquet footers and shuffles"),
        (4, "the quick brown fox jumps over the lazy dog by the river"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run():
        out = {}
        for fn, kw in (
            (neardup.minhash_lsh_pairs, dict(num_hashes=12, bands=4, threshold=0.5)),
            (neardup.minhash_estimate_quality, dict(num_hashes=12, bands=4)),
        ):
            out[fn.__name__] = sorted(
                tuple(r) for r in fn(df, "doc_id", "text", n=3, **kw).collect()
            )
        return out

    monkeypatch.setattr(neardup, "_RESTRICT_VERIFY_BYTES", 1 << 62)
    corpus_wide = run()
    spark.catalog.clearCache()
    monkeypatch.setattr(neardup, "_RESTRICT_VERIFY_BYTES", 0)
    restricted = run()
    spark.catalog.clearCache()
    assert corpus_wide == restricted
    assert any(corpus_wide.values())  # non-vacuous: some pairs found


def test_signature_near_dups_rejects_degenerate_banding(spark):
    import pytest
    from pyspark.sql import functions as F

    from reddit_apache_airflow_postgres_pipeline_spark.operators.neardup import (
        signature_near_dups,
    )

    sig = spark.createDataFrame([(1, 5), (2, 7)], "doc long, sig long")
    # max_hamming >= bits would zero the band width and degenerate the
    # banded join into a full cross product (review r6)
    with pytest.raises(ValueError, match="max_hamming"):
        signature_near_dups(sig, bits=60, max_hamming=60)
    with pytest.raises(ValueError, match="max_hamming"):
        signature_near_dups(sig, bits=8, max_hamming=-1)
    ok = signature_near_dups(sig.withColumn("sig", F.col("sig")), 8, 2)
    assert ok.collect()[0]["hamming"] == 1  # 5 xor 7 = 2 -> popcount 1
