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
