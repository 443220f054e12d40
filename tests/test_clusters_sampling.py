"""Cluster-resolution and deterministic-sampling operator tests.

The oracle gate (test_entry_oracle.py) checks the registry shapes on the
sf corpora; this file pins operator semantics on constructed graphs and
edge cases the corpora don't cover (transitive chains, disjoint
components, rate boundaries, stratum fall-through)."""

from __future__ import annotations

import hashlib

import pytest

from reddit_apache_airflow_postgres_pipeline_spark.operators.clusters import (
    canonical_docs,
    connected_components,
)
from reddit_apache_airflow_postgres_pipeline_spark.operators.sampling import (
    sample_by_hash,
    stratified_sample_by_hash,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_connected_components_transitive_chain(spark):
    # A~B, B~C, plus a disjoint pair and an isolated chain of 2
    comp = connected_components(
        _pairs(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)])
    )
    got = {r.doc: r.canonical for r in comp.collect()}
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20,
    }


def test_connected_components_long_path_converges(spark):
    # worst case for min propagation: a path graph; min label must walk
    # the full length (diameter rounds)
    n = 12
    comp = connected_components(_pairs(spark, [(i, i + 1) for i in range(n)]))
    got = {r.doc: r.canonical for r in comp.collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_connected_components_max_iter_guard(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, [(i, i + 1) for i in range(5)]), max_iter=2)


def test_canonical_docs_keeps_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(1, 2), (2, 4)])
    kept = sorted(r.doc_id for r in canonical_docs(docs, pairs).collect())
    # cluster {1,2,4} → keep 1; singletons 0,3,5 pass through
    assert kept == [0, 1, 3, 5]


def _py_bucket(salt: str, key) -> int:
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16)


def test_sample_by_hash_matches_python_reference(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    rate = 0.3
    got = sorted(r.k for r in sample_by_hash(df, "k", rate, salt="z").collect())
    want = sorted(
        i for i in range(500) if _py_bucket("z", i) < int(rate * (1 << 32))
    )
    assert got == want
    assert 0 < len(got) < 500  # neither empty nor everything
    # deterministic: a second run selects the identical set
    again = sorted(r.k for r in sample_by_hash(df, "k", rate, salt="z").collect())
    assert again == got


def test_sample_by_hash_rate_bounds(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "k long")
    assert sample_by_hash(df, "k", 1.0).count() == 50
    assert sample_by_hash(df, "k", 0.0).count() == 0
    with pytest.raises(ValueError, match="rate"):
        sample_by_hash(df, "k", 1.5)


def test_stratified_sample_rates_and_default(spark):
    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr"))
            for i in range(600)]
    df = spark.createDataFrame(rows, "k long, lang string")
    kept = stratified_sample_by_hash(
        df, "k", "lang", {"en": 0.5, "de": 0.0}, default_rate=1.0, salt="q"
    ).collect()
    by_lang: dict[str, list[int]] = {}
    for r in kept:
        by_lang.setdefault(r.lang, []).append(r.k)
    assert "de" not in by_lang  # rate 0 drops the stratum
    assert len(by_lang["fr"]) == 200  # default 1.0 keeps everything
    want_en = [k for k, lang in rows if lang == "en"
               and _py_bucket("q", k) < int(0.5 * (1 << 32))]
    assert sorted(by_lang["en"]) == sorted(want_en)
