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


def test_sample_to_target_mix_proportions_and_determinism(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators.sampling import (
        hash_bucket,
        sample_to_target_mix,
    )
    from pyspark.sql import functions as F

    # 300 a / 100 b / 600 c; target 50/25/25 → N = min(300/.5, 100/.25,
    # 600/.25) = 400 → keep-rates a 2/3, b 1.0, c 1/6
    rows = (
        [(i, "a") for i in range(300)]
        + [(1000 + i, "b") for i in range(100)]
        + [(2000 + i, "c") for i in range(600)]
    )
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    kept = sample_to_target_mix(
        df, "doc_id", "stratum", {"a": 0.5, "b": 0.25, "c": 0.25}, salt="t"
    )
    counts = {
        r["stratum"]: r["n"]
        for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert counts["b"] == 100  # rate 1.0 keeps everything
    # hash sampling is binomial around the rate; loose bounds
    assert 160 <= counts["a"] <= 240     # E=200
    assert 60 <= counts["c"] <= 140      # E=100
    # deterministic: the same call yields the identical set
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in sample_to_target_mix(
            df, "doc_id", "stratum", {"a": 0.5, "b": 0.25, "c": 0.25}, salt="t"
        ).collect()
    )
    assert ids1 == ids2
    # strata not in the target mix are dropped entirely
    df2 = spark.createDataFrame(rows + [(9000, "z")], "doc_id long, stratum string")
    kept2 = sample_to_target_mix(
        df2, "doc_id", "stratum", {"a": 0.5, "b": 0.25, "c": 0.25}, salt="t"
    )
    assert kept2.filter(F.col("stratum") == "z").count() == 0


def test_sample_to_target_mix_rejects_nonpositive_share(spark):
    import pytest as _pytest

    from reddit_apache_airflow_postgres_pipeline_spark.operators.sampling import (
        sample_to_target_mix,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id long, stratum string")
    with _pytest.raises(ValueError):
        sample_to_target_mix(df, "doc_id", "stratum", {"a": 0.0})
    with _pytest.raises(ValueError, match="non-empty"):
        sample_to_target_mix(df, "doc_id", "stratum", {})


def test_kmeans_refine_separates_obvious_clusters(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators import similarity

    # two tight direction-clusters on the unit circle-ish; seeds are the
    # two lowest ids, one from each cluster
    rows = [
        (0, [1.0, 0.0]), (1, [0.0, 1.0]),
        (2, [0.9, 0.1]), (3, [0.95, 0.05]),
        (4, [0.1, 0.9]), (5, [0.05, 0.95]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = similarity.kmeans_refine(df, n_cells=2, iters=2)
    out = {r["cell"]: list(r["cv"]) for r in cents.collect()}
    assert set(out) == {0, 1}
    # cell 0's centroid points along x, cell 1's along y
    assert out[0][0] > out[0][1] and out[1][1] > out[1][0]
    # centroid = rounded mean of its members
    assert out[0][0] == round((1.0 + 0.9 + 0.95) / 3, 6)
    # assignment with the refined centroids is stable (a 3rd pass moves nothing)
    a = similarity.ivf_assign(df, cents, out_id="vec_id")
    got = {r["vec_id"]: r["cell"] for r in a.collect()}
    assert got == {0: 0, 2: 0, 3: 0, 1: 1, 4: 1, 5: 1}


def test_kmeans_refine_drops_emptied_cells(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators import similarity

    # seeds 0 and 1 are nearly identical directions: every vector lands
    # on one of them after refinement and the other cell empties out
    rows = [
        (0, [1.0, 0.0]), (1, [1.0, 0.001]),
        (2, [1.0, 0.0002]), (3, [1.0, 0.0001]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = similarity.kmeans_refine(df, n_cells=2, iters=2)
    cells = {r["cell"] for r in cents.collect()}
    assert len(cells) <= 2 and cells  # never invents cells; may drop one


def test_pagerank_star_hub_dominates_and_mass_conserves(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators.clusters import pagerank

    # star: 0 is the hub of a 5-doc template family, plus a detached pair
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(10, 11)], "id_a long, id_b long"
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(pairs, iters=3).collect()}
    assert len(ranks) == 8
    assert ranks[0] == max(ranks.values())  # the hub
    assert ranks[1] == ranks[2] == ranks[3] == ranks[4] == ranks[5]  # leaves tie
    assert ranks[10] == ranks[11]  # symmetric pair ties
    assert abs(sum(ranks.values()) - 1.0) < 1e-6  # mass conservation


def test_pagerank_iteration_count_is_a_contract(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators.clusters import pagerank

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    r1 = {r["node"]: r["rank"] for r in pagerank(pairs, iters=1).collect()}
    r3 = {r["node"]: r["rank"] for r in pagerank(pairs, iters=3).collect()}
    assert r1 != r3  # the chain has not converged after one round
    again = {r["node"]: r["rank"] for r in pagerank(pairs, iters=3).collect()}
    assert r3 == again  # bit-identical re-runs


def test_weighted_sample_monotone_and_extremes(spark):
    from pyspark.sql import functions as F

    from reddit_apache_airflow_postgres_pipeline_spark.operators.sampling import (
        sample_weighted_by_hash,
    )

    df = spark.createDataFrame(
        [(i, 0.0 if i % 3 == 0 else (1.0 if i % 3 == 1 else 0.5)) for i in range(300)],
        "doc_id long, rate double",
    )
    kept = sample_weighted_by_hash(df, "doc_id", "rate").collect()
    by_rate = {}
    for r in kept:
        by_rate.setdefault(r["rate"], []).append(r["doc_id"])
    assert 0.0 not in by_rate                      # rate 0 keeps nothing
    assert len(by_rate[1.0]) == 100                # rate 1 keeps all
    assert 20 < len(by_rate[0.5]) < 80             # rate .5 keeps ~half
    # monotone: raising every rate to 1.0 keeps a superset
    all_kept = sample_weighted_by_hash(
        df.withColumn("rate", F.lit(1.0)), "doc_id", "rate"
    ).collect()
    assert {r["doc_id"] for r in kept} <= {r["doc_id"] for r in all_kept}
    # out-of-range rates are clamped, not errors
    clamped = sample_weighted_by_hash(
        df.withColumn("rate", F.col("rate") * 3 - 1), "doc_id", "rate"
    )
    assert clamped.count() > 0


def test_token_budget_rates_and_clamping(spark):
    import pytest

    from reddit_apache_airflow_postgres_pipeline_spark.operators.sampling import (
        sample_to_token_budget,
    )

    # stratum a: 1000 tokens available, targets 200 -> rate .2
    # stratum b: 50 available, targets 200 -> clamps to 1.0 (kept whole)
    # stratum c: not in shares -> dropped entirely
    rows = (
        [(i, "a", 10) for i in range(100)]
        + [(1000 + i, "b", 10) for i in range(5)]
        + [(2000 + i, "c", 10) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, stratum string, nt long")
    kept = sample_to_token_budget(
        df, "doc_id", "stratum", {"a": 0.5, "b": 0.5}, 400.0, "nt"
    ).collect()
    by = {}
    for r in kept:
        by.setdefault(r["stratum"], []).append(r["doc_id"])
    assert "c" not in by
    assert sorted(by["b"]) == [1000, 1001, 1002, 1003, 1004]  # clamped: all kept
    # rate 0.2 over 100 docs: expected ~20 kept, deterministic exact set
    assert 5 < len(by["a"]) < 50
    again = sample_to_token_budget(
        df, "doc_id", "stratum", {"a": 0.5, "b": 0.5}, 400.0, "nt"
    ).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in kept}

    with pytest.raises(ValueError, match="budget_tokens"):
        sample_to_token_budget(df, "doc_id", "stratum", {"a": 1.0}, 0.0, "nt")
    with pytest.raises(ValueError, match="share"):
        sample_to_token_budget(df, "doc_id", "stratum", {"a": -0.1}, 10.0, "nt")


def test_negative_ring_sampling_properties(spark):
    import pytest
    from pyspark.sql import functions as F

    from reddit_apache_airflow_postgres_pipeline_spark.operators.sampling import (
        sample_negatives_ring,
    )

    docs = spark.range(300).select(F.col("id").alias("doc_id"))
    anchors = docs.filter("doc_id < 10")
    out = sample_negatives_ring(docs, anchors, k=5).collect()
    rows = {(r["anchor"], r["neg_rank"]): r["neg_id"] for r in out}
    # every anchor gets k draws minus the occasional filtered self-hit
    per_anchor = {}
    for (a, _), n in rows.items():
        assert n != a  # no self-negatives
        per_anchor.setdefault(a, 0)
        per_anchor[a] += 1
    assert set(per_anchor) == set(range(10))
    assert all(4 <= c <= 5 for c in per_anchor.values())
    # negatives spread across the corpus, not one hot doc
    assert len(set(rows.values())) > 10
    # consistent-hashing: growing the corpus preserves most assignments
    grown = {
        (r["anchor"], r["neg_rank"]): r["neg_id"]
        for r in sample_negatives_ring(
            docs.unionAll(
                spark.range(300, 330).select(F.col("id").alias("doc_id"))
            ),
            anchors,
            k=5,
        ).collect()
    }
    same = sum(1 for k_ in rows if grown.get(k_) == rows[k_])
    assert same >= len(rows) * 0.7  # only ring-adjacent probes moved
    with pytest.raises(ValueError, match="k must be"):
        sample_negatives_ring(docs, anchors, k=0)


def test_negative_ring_sampling_rejects_non_integral_ids(spark):
    import pytest
    from pyspark.sql import functions as F

    from reddit_apache_airflow_postgres_pipeline_spark.operators.sampling import (
        sample_negatives_ring,
    )

    # a string id column would cast('long') to NULL ring positions and
    # silently drop docs; the precondition is now validated (ADVICE r6)
    docs = spark.range(20).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id")
    )
    with pytest.raises(TypeError, match="integral id column"):
        sample_negatives_ring(docs, docs.limit(2), k=2)


def test_weighted_topk_exact_k_and_nonpositive_weight_fails_loudly(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from pyspark.sql import functions as F

    from reddit_apache_airflow_postgres_pipeline_spark.operators.sampling import (
        sample_weighted_topk,
    )

    df = spark.createDataFrame(
        [(i, 100.0 if i < 5 else 0.01) for i in range(200)],
        "doc_id long, w double",
    )
    got = sample_weighted_topk(df, "doc_id", "w", k=10).collect()
    assert len(got) == 10  # exact-k, not in-expectation
    # the 5 overwhelming-weight docs are essentially certain picks
    assert {r["doc_id"] for r in got} >= {0, 1, 2, 3, 4}
    # w=0 would divide by zero and w<0 would deterministically win the
    # race — both must raise, not silently corrupt the sample (r9 ADVICE)
    for bad in (0.0, -1.0):
        poisoned = df.withColumn(
            "w", F.when(F.col("doc_id") == 7, bad).otherwise(F.col("w"))
        )
        with pytest.raises((Py4JJavaError, SparkRuntimeException)):
            sample_weighted_topk(poisoned, "doc_id", "w", k=10).collect()
