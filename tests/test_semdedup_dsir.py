"""Unit tests for the round-5 data-selection operators — SemDeDup
(similarity.semantic_dedup) and DSIR importance weights
(curation.dsir_weights) — covering the edge semantics the oracle gate's
synthetic corpus can't isolate: survivor rule, cross-cell blindness,
zero-feature docs, and target-likeness ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators import curation
from reddit_apache_airflow_postgres_pipeline_spark.operators.similarity import (
    semantic_dedup,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _cents(spark, rows):
    return spark.createDataFrame(rows, "cell long, cv array<float>")


def test_semantic_dedup_lowest_id_wins(spark):
    # two well-separated cells; ids 1/2/3 identical (dups), 10 alone
    vecs = _vecs(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),
            (3, [0.99, 0.01]),
            (10, [0.0, 1.0]),
        ],
    )
    cents = _cents(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(vecs, cents, threshold=0.9).collect()
    }
    assert out[1]["keep"] is True and out[1]["max_dup_cos"] is None
    assert out[2]["keep"] is False and out[2]["max_dup_cos"] == 1.0
    assert out[3]["keep"] is False  # near-dup of 1 and 2
    assert out[10]["keep"] is True  # alone in its cell


def test_semantic_dedup_is_blind_across_cells(spark):
    # identical vectors forced into DIFFERENT cells are never compared —
    # the designed recall trade of cluster-blocked dedup
    vecs = _vecs(spark, [(1, [1.0, 0.1]), (2, [0.1, 1.0])])
    cents = _cents(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    out = semantic_dedup(vecs, cents, threshold=0.0).collect()
    # cos(v1, v2) ≈ 0.198 ≥ 0.0 would mark id 2 a dup — but they sit in
    # different cells, so both survive
    assert {r["vec_id"] for r in out if r["keep"]} == {1, 2}
    assert {r["cell"] for r in out} == {0, 1}


def test_semantic_dedup_emits_every_input_vector(spark):
    vecs = _vecs(spark, [(i, [float(i % 3 + 1), 1.0]) for i in range(20)])
    cents = _cents(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    out = semantic_dedup(vecs, cents, threshold=2.0)  # nothing can match
    rows = out.collect()
    assert len(rows) == 20
    assert all(r["keep"] for r in rows)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_ranks_target_like_docs_higher(spark):
    target_text = "alpha beta gamma delta alpha beta"
    offtarget_text = "zig zag zoom zip zig zag"
    corpus = _docs(
        spark,
        [
            (1, target_text),            # pure target-like
            (2, offtarget_text),         # pure off-target
            (3, "alpha beta zig zag"),   # mixed
        ],
    )
    target = _docs(spark, [(100, target_text)])
    out = {
        r["doc_id"]: r["logw"]
        for r in curation.dsir_weights(corpus, target, n=2, m=4096).collect()
    }
    assert out[1] > out[3] > out[2]
    assert out[2] < 0  # off-target mass is always penalized


def test_dsir_zero_feature_docs_score_zero(spark):
    corpus = _docs(spark, [(1, "alpha beta"), (2, ""), (3, None)])
    target = _docs(spark, [(9, "alpha beta")])
    out = {
        (r["doc_id"]): (r["n_feats"], r["logw"])
        for r in curation.dsir_weights(corpus, target, n=2, m=4096).collect()
    }
    assert out[2] == (0, 0.0) and out[3] == (0, 0.0)
    # raw and target distributions coincide → the importance ratio is
    # exactly 1 for every bucket, so the lone featured doc scores 0 too
    assert out[1] == (1, 0.0)


def test_dsir_empty_target_penalizes_common_buckets_only_via_raw(spark):
    # with NO target mass every bucket has p_tgt = 1/(0+m): docs with
    # RARER grams (smaller p_raw) score higher — the formula degrades
    # to an inverse-typicality score instead of erroring
    corpus = _docs(
        spark,
        [(1, "x y"), (2, "x y"), (3, "x y"), (4, "unique gram")],
    )
    target = _docs(spark, []).filter(F.lit(False))
    out = {
        r["doc_id"]: r["logw"]
        for r in curation.dsir_weights(corpus, target, n=2, m=4096).collect()
    }
    assert out[4] > out[1] == out[2] == out[3]


def test_hard_negative_miner_excludes_planted_duplicates(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators.similarity import (
        mine_hard_negatives,
    )

    vecs = _vecs(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.001]),   # near-copy of 0 — a false negative
            (2, [0.9, 0.4]),     # similar but legitimately different
            (3, [0.0, 1.0]),     # easy negative
        ],
    )
    dups = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    out = mine_hard_negatives(
        vecs, vecs.filter(F.col("vec_id") == 0), dups, k=2
    ).collect()
    got = [r["neighbor_id"] for r in sorted(out, key=lambda r: -r["score"])]
    assert got == [2, 3]  # 1 is excluded despite being the most similar
