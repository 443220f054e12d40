"""Count-min sketch properties the oracle gate can't isolate: the
never-underestimate guarantee, unseen-key zero, bounded relation size,
and — the scale property — shard-merge equals monolithic build."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators import sketches


def _occ(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_cms_never_underestimates_and_bounds_size(spark):
    keys = ["a"] * 50 + ["b"] * 7 + ["c"] * 1 + [f"x{i}" for i in range(200)]
    occ = _occ(spark, keys)
    cms = sketches.cms_build(occ, "k", d=4, w=16)  # tiny w → forced collisions
    assert cms.count() <= 4 * 16
    exact = occ.groupBy("k").agg(F.count("*").alias("exact"))
    est = sketches.cms_estimate(cms, exact.select("k"), "k", d=4, w=16)
    joined = exact.join(est, "k").collect()
    assert len(joined) == len(set(keys))
    assert all(r["est"] >= r["exact"] for r in joined)
    # with w=16 and 203 distinct keys, SOME overcount must exist
    assert any(r["est"] > r["exact"] for r in joined)


def test_cms_unseen_key_estimates_zero_or_collision(spark):
    cms = sketches.cms_build(_occ(spark, ["only"]), "k", d=4, w=256)
    est = {
        r["k"]: r["est"]
        for r in sketches.cms_estimate(
            cms, _occ(spark, ["only", "never-inserted"]), "k", d=4, w=256
        ).collect()
    }
    assert est["only"] == 1
    # one insertion into 4×256 cells: an unseen key collides on ALL 4
    # rows with probability ~ (1/256)^4 — deterministically 0 here
    assert est["never-inserted"] == 0


def test_cms_shard_merge_equals_monolithic_build(spark):
    all_keys = [f"k{i % 37}" for i in range(500)]
    shard_a, shard_b = all_keys[:200], all_keys[200:]
    mono = sketches.cms_build(_occ(spark, all_keys), "k", d=4, w=64)
    merged = sketches.cms_merge(
        sketches.cms_build(_occ(spark, shard_a), "k", d=4, w=64),
        sketches.cms_build(_occ(spark, shard_b), "k", d=4, w=64),
    )
    m = {(r["row"], r["col"]): r["c"] for r in mono.collect()}
    g = {(r["row"], r["col"]): r["c"] for r in merged.collect()}
    assert m == g


def test_cms_estimate_rejects_mismatched_grid(spark):
    import pytest

    occ = _occ(spark, [f"k{i}" for i in range(300)])
    cms = sketches.cms_build(occ, "k", d=4, w=256)
    # probing a 4×256 sketch as if it were 4×64 must raise, not
    # silently mis-estimate (ADVICE r5); with 300 keys some col ≥ 64
    # exists with near-certainty
    bad = sketches.cms_estimate(cms, _occ(spark, ["k0"]), "k", d=4, w=64)
    with pytest.raises(Exception, match="different parameters"):
        bad.collect()
    # declaring the true grid still works
    ok = sketches.cms_estimate(cms, _occ(spark, ["k0"]), "k", d=4, w=256)
    assert ok.collect()[0]["est"] >= 1


def test_cms_merge_validates_declared_grid(spark):
    import pytest

    a = sketches.cms_build(_occ(spark, [f"a{i}" for i in range(200)]), "k", d=4, w=256)
    b = sketches.cms_build(_occ(spark, [f"b{i}" for i in range(200)]), "k", d=2, w=64)
    with pytest.raises(Exception, match="different parameters"):
        sketches.cms_merge(a, b, d=2, w=64).collect()
    # without a declared grid the merge is unchecked (back-compat)
    assert sketches.cms_merge(a, b).count() <= 4 * 256 + 2 * 64


def test_hll_merge_equals_monolithic_and_accuracy(spark):
    from pyspark.sql import functions as F

    keys = [(f"g{i % 3}", f"u{i % 113}") for i in range(1000)]
    df = spark.createDataFrame(keys, "g string, k string")
    mono = sketches.hll_build(df, "k", ["g"], p=5)
    a, b = df.filter("k < 'u5'"), df.filter("k >= 'u5'")
    merged = sketches.hll_merge(
        sketches.hll_build(a, "k", ["g"], p=5),
        sketches.hll_build(b, "k", ["g"], p=5),
    )
    m = {(r["g"], r["register"]): r["maxrank"] for r in mono.collect()}
    g = {(r["g"], r["register"]): r["maxrank"] for r in merged.collect()}
    assert m == g
    # sketch size is bounded per group
    assert mono.groupBy("g").count().agg(F.max("count")).collect()[0][0] <= 32
    est = {r["g"]: r["est"] for r in sketches.hll_estimate(mono, ["g"], p=5).collect()}
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.count_distinct("k").alias("n")).collect()
    }
    for grp, ex in exact.items():
        assert abs(est[grp] - ex) / ex < 0.45  # m=32 → σ ≈ 1.04/√32 ≈ 18%


def test_hll_duplicates_do_not_change_the_sketch(spark):
    one = spark.createDataFrame([("x",)], "k string")
    many = spark.createDataFrame([("x",)] * 500, "k string")
    s1 = {(r["register"], r["maxrank"]) for r in sketches.hll_build(one, "k").collect()}
    s2 = {(r["register"], r["maxrank"]) for r in sketches.hll_build(many, "k").collect()}
    assert s1 == s2 and len(s1) == 1


def test_qsketch_bounds_merge_and_clamping(spark):
    import pytest

    vals = [float(v) for v in range(100)] + [-5.0, 1e9]  # out-of-range tails
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    sk = sketches.qsketch_build(df, "x", 0.0, 100.0, bins=10)
    rows = {r["bin"]: r["n"] for r in sk.collect()}
    assert set(rows) <= set(range(10))  # clamped into the grid
    assert sum(rows.values()) == len(vals)
    assert rows[0] == 11 and rows[9] == 11  # 10 in-range + 1 clamped tail each
    # shard-merge equals monolithic
    a = spark.createDataFrame([(v,) for v in vals[:50]], "x double")
    b = spark.createDataFrame([(v,) for v in vals[50:]], "x double")
    merged = sketches.qsketch_merge(
        sketches.qsketch_build(a, "x", 0.0, 100.0, bins=10),
        sketches.qsketch_build(b, "x", 0.0, 100.0, bins=10),
    )
    assert {r["bin"]: r["n"] for r in merged.collect()} == rows
    with pytest.raises(ValueError, match="lo < hi"):
        sketches.qsketch_build(df, "x", 5.0, 5.0, bins=10)


def test_qsketch_quantiles_interpolate_within_bin_width(spark):
    # uniform 0..999: every quantile estimate must sit within one bin
    # width (100) of the true value, and the q=0 / q=1 edges must not
    # fall outside the data's bin range
    df = spark.createDataFrame([(float(v),) for v in range(1000)], "x double")
    sk = sketches.qsketch_build(df, "x", 0.0, 1000.0, bins=10)
    qs = [0.0, 0.25, 0.5, 0.75, 1.0]
    est = {r["q"]: r["est"] for r in sketches.qsketch_quantiles(sk, qs, 0.0, 1000.0, 10).collect()}
    for q in qs:
        true = q * 999
        assert abs(est[q] - true) <= 100.0, (q, est[q], true)
    assert est[0.0] >= 0.0 and est[1.0] <= 1000.0


def test_bpe_learn_hand_checked_merges(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators.textstats import bpe_learn

    docs = spark.createDataFrame(
        [(1, "abab abab ac")], "doc_id long, text string"
    )
    rows = {
        r["step"]: (r["l_sym"], r["r_sym"], r["merged"], r["cnt"])
        for r in bpe_learn(docs, k=3).collect()
    }
    # 'abab' x2: (a,b) appears twice per word -> 4; then (ab,ab) -> 2;
    # then only (a,c) remains -> 1
    assert rows[1] == ("a", "b", "ab", 4)
    assert rows[2] == ("ab", "ab", "abab", 2)
    assert rows[3] == ("a", "c", "ac", 1)


def test_bpe_degenerate_corpus_stops_short_not_empty(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators.textstats import (
        bpe_compression_stats,
        bpe_learn,
    )

    # single-char words exhaust after 0 merges; k=3 must NOT annihilate
    # the sequence relation via an empty-argmax crossJoin (ADVICE r5):
    # bpe_learn returns fewer than k steps, compression stats still
    # cover the whole vocabulary
    docs = spark.createDataFrame([(1, "a b c a")], "doc_id long, text string")
    assert bpe_learn(docs, k=3).collect() == []
    stats = bpe_compression_stats(docs, k=3).collect()
    assert len(stats) == 1
    r = stats[0]
    assert r["vocab_size"] == 3 and r["total_tokens"] == 4
    assert r["compression"] == 1.0

    # merges exhaust mid-run: 'aa aa' learns (a,a) then nothing —
    # exactly 1 step out of k=3, later rounds are no-ops
    docs2 = spark.createDataFrame([(1, "aa aa")], "doc_id long, text string")
    rows = bpe_learn(docs2, k=3).collect()
    assert [(r["step"], r["merged"], r["cnt"]) for r in rows] == [(1, "aa", 2)]
    st2 = bpe_compression_stats(docs2, k=3).collect()[0]
    assert st2["vocab_size"] == 1 and st2["syms_per_token_merged"] == 1.0


def test_bpe_apply_tokenizes_with_learned_merges(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators.textstats import (
        bpe_apply,
        bpe_learn,
    )

    train = spark.createDataFrame(
        [(1, "abab abab ac")], "doc_id long, text string"
    )
    merges = bpe_learn(train, k=3)  # (a,b)->ab, (ab,ab)->abab, (a,c)->ac
    # apply to UNSEEN text: learned merges generalize per-word
    docs = spark.createDataFrame([(7, "abc abab zq")], "doc_id long, text string")
    out = {
        r["w"]: list(r["syms"])
        for r in bpe_apply(docs, merges, k=3).collect()
    }
    assert out["abc"] == ["ab", "c"]  # merge 1 applies, no (ab,c) merge learned
    assert out["abab"] == ["abab"]  # merges 1 then 2 cascade
    assert out["zq"] == ["z", "q"]  # untouched by any merge
    # k beyond the learned table: missing steps are no-ops, not
    # annihilation
    out5 = {
        r["w"]: list(r["syms"])
        for r in bpe_apply(docs, merges, k=5).collect()
    }
    assert out5 == out


def test_bpe_merge_application_is_leftmost_nonoverlapping(spark):
    from reddit_apache_airflow_postgres_pipeline_spark.operators.textstats import bpe_learn

    # 'aaa': pair (a,a) counts both positions (2), but applying the
    # merge is leftmost non-overlapping: {a}{a}{a} -> {aa}{a}, so round
    # 2 sees the (aa, a) pair — classic BPE count-vs-apply semantics
    docs = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    rows = {
        r["step"]: (r["l_sym"], r["r_sym"], r["cnt"])
        for r in bpe_learn(docs, k=2).collect()
    }
    assert rows[1] == ("a", "a", 2)
    assert rows[2] == ("aa", "a", 1)


def test_hll_estimate_rejects_mismatched_geometry(spark):
    import pytest

    occ = _occ(spark, [f"k{i}" for i in range(200)])
    big = sketches.hll_build(occ, "k", p=6)  # 64 registers
    # estimating a p=6 sketch as p=5 must raise, not silently garbage
    with pytest.raises(Exception, match="different parameters"):
        sketches.hll_estimate(big, p=5).collect()
    with pytest.raises(Exception, match="different parameters"):
        sketches.hll_merge(big, big, p=5).collect()
    # declared correctly it works
    assert sketches.hll_estimate(big, p=6).collect()[0]["est"] > 0


def test_qsketch_wild_outlier_clamps_instead_of_crashing(spark):
    # a single corrupt value >= bins * 2^31 * width used to
    # CAST_OVERFLOW under ANSI mode and kill the whole pass
    df = spark.createDataFrame(
        [(0.5,), (1.6e7,), (1e300,), (-1e300,)], "x double"
    )
    rows = {r["bin"]: r["n"] for r in
            sketches.qsketch_build(df, "x", 0.0, 1.0, bins=256).collect()}
    assert rows[128] == 1   # the sane value
    assert rows[255] == 2   # both wild highs clamp to the top bin
    assert rows[0] == 1     # wild low clamps to bin 0


def test_qsketch_grouped_quantiles_partition_independently(spark):
    # group a: uniform 0..99; group b: uniform 100..199 — grouped
    # medians must reflect each group's own distribution
    rows = [("a", float(v)) for v in range(100)] + [
        ("b", float(100 + v)) for v in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    sk = sketches.qsketch_build(df, "x", 0.0, 200.0, bins=20, group_cols=["g"])
    est = {
        (r["g"], r["q"]): r["est"]
        for r in sketches.qsketch_quantiles(
            sk, [0.5], 0.0, 200.0, 20, group_cols=["g"]
        ).collect()
    }
    assert abs(est[("a", 0.5)] - 50.0) <= 10.0
    assert abs(est[("b", 0.5)] - 150.0) <= 10.0


def test_cms_inner_product_never_underestimates_join_size(spark):
    import pytest

    a_keys = [f"k{i % 20}" for i in range(300)]
    b_keys = [f"k{i % 35}" for i in range(200)]
    a = sketches.cms_build(_occ(spark, a_keys), "k", d=4, w=64)
    b = sketches.cms_build(_occ(spark, b_keys), "k", d=4, w=64)
    est = sketches.cms_inner_product(a, b, d=4, w=64).collect()[0]["est"]
    from collections import Counter

    ca, cb = Counter(a_keys), Counter(b_keys)
    exact = sum(ca[k] * cb[k] for k in ca)
    assert est >= exact
    # with 35 distinct keys in a 4x64 grid the estimate is tight-ish
    assert est <= exact * 2
    # mismatched grids raise instead of silently mis-estimating
    small = sketches.cms_build(_occ(spark, a_keys), "k", d=4, w=256)
    with pytest.raises(Exception, match="different parameters"):
        sketches.cms_inner_product(small, b, d=4, w=64).collect()


def test_cms_inner_product_disjoint_keys_estimates_zero(spark):
    # disjoint key sets with a wide grid: some hash row shares no cell,
    # whose true dot 0 must clamp the min — not vanish into NULL or an
    # inflated positive estimate (review r6)
    a = sketches.cms_build(_occ(spark, ["only-a"]), "k", d=4, w=4096)
    b = sketches.cms_build(_occ(spark, ["only-b"]), "k", d=4, w=4096)
    est = sketches.cms_inner_product(a, b, d=4, w=4096).collect()[0]["est"]
    assert est == 0


def test_qsketch_nan_follows_the_null_no_evidence_contract(spark):
    # NaN survives a double cast and the least/greatest clamp routes it
    # into the TOP edge bin, silently inflating upper quantiles — it
    # must be excluded like NULL (ADVICE r6)
    df = spark.createDataFrame(
        [(0.55,), (float("nan"),), (None,), (0.75,)], "x double"
    )
    rows = {r["bin"]: r["n"] for r in
            sketches.qsketch_build(df, "x", 0.0, 1.0, bins=10).collect()}
    assert rows == {5: 1, 7: 1}  # only the two real values
