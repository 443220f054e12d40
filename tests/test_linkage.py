"""Fellegi–Sunter linkage edges the synthetic-corpus oracle can't show:
NULL-as-disagree, the hot-block cap, two-feed linkage, threshold
classification boundaries, and parameter validation."""

from __future__ import annotations

import math

import pytest

from reddit_apache_airflow_postgres_pipeline_spark.operators import linkage

M = {"city": 0.9, "year": 0.8}
U = {"city": 0.1, "year": 0.2}


def _feed(spark, rows):
    return spark.createDataFrame(rows, "rec_id long, blk string, city string, year int")


def test_weights_are_rounded_log_likelihood_ratios():
    w = linkage.fs_weights(M, U)
    assert w["city"] == (round(math.log2(9.0), 6), round(math.log2(0.1 / 0.9), 6))
    assert w["city"][0] > 0 > w["city"][1]
    with pytest.raises(ValueError, match="0 < u < m < 1"):
        linkage.fs_weights({"f": 0.2}, {"f": 0.5})  # u > m


def test_two_feed_linkage_scores_and_classifies(spark):
    left = _feed(spark, [(1, "b1", "rome", 1990), (2, "b1", "oslo", 1985)])
    right = _feed(spark, [(10, "b1", "rome", 1990), (11, "b2", "rome", 1990)])
    out = linkage.fs_link(
        left, right, ["blk"], M, U, t_upper=4.0, t_lower=0.0
    ).collect()
    # rec 11 is in block b2 with no left partner: blocked out entirely
    got = {(r["id_l"], r["id_r"]): r for r in out}
    assert set(got) == {(1, 10), (2, 10)}
    w = linkage.fs_weights(M, U)
    full = round(w["city"][0] + w["year"][0], 6)
    none = round(w["city"][1] + w["year"][1], 6)
    assert got[(1, 10)]["weight"] == full and got[(1, 10)]["decision"] == "match"
    assert got[(2, 10)]["weight"] == none and got[(2, 10)]["decision"] == "non_match"


def test_null_fields_count_as_disagreement(spark):
    left = _feed(spark, [(1, "b", None, 1990)])
    right = _feed(spark, [(2, "b", None, 1990)])
    r = linkage.fs_link(left, right, ["blk"], M, U).collect()[0]
    # NULL city on both sides: no evidence, scored as disagree — not
    # as a NULL weight and not as agreement
    assert r["agree_city"] is False and r["agree_year"] is True
    w = linkage.fs_weights(M, U)
    assert r["weight"] == round(w["city"][1] + w["year"][0], 6)


def test_self_dedupe_emits_each_pair_once(spark):
    feed = _feed(
        spark, [(1, "b", "rome", 1990), (2, "b", "rome", 1990), (3, "b", "oslo", 1)]
    )
    out = linkage.fs_link(feed, feed, ["blk"], M, U, self_dedupe=True).collect()
    pairs = {(r["id_l"], r["id_r"]) for r in out}
    assert pairs == {(1, 2), (1, 3), (2, 3)}


def test_max_block_size_drops_hot_blocks(spark):
    rows = [(i, "hot", "x", 1) for i in range(10)] + [
        (100, "cold", "y", 2),
        (101, "cold", "y", 2),
    ]
    feed = _feed(spark, rows)
    out = linkage.fs_link(
        feed, feed, ["blk"], M, U, self_dedupe=True, max_block_size=5
    ).collect()
    # the 10-record hot block (45 pairs) is dropped; the cold block pair
    # survives
    assert {(r["id_l"], r["id_r"]) for r in out} == {(100, 101)}


def test_threshold_order_validated(spark):
    feed = _feed(spark, [(1, "b", "rome", 1990)])
    with pytest.raises(ValueError, match="t_lower"):
        linkage.fs_link(feed, feed, ["blk"], M, U, t_upper=0.0, t_lower=4.0)


def test_fs_fit_em_separates_planted_matches(spark):
    # planted structure: 50 "match" pairs agree on both fields, 450
    # "non-match" pairs agree on nothing -> EM must push m up, u down,
    # and p toward 0.1 from the (0.1, 0.8, 0.2) start
    rows = [(True, True)] * 50 + [(False, False)] * 450
    scored = spark.createDataFrame(rows, "agree_city boolean, agree_year boolean")
    out = linkage.fs_fit_em(scored, ["city", "year"], rounds=3).collect()
    by = {r["field"]: r for r in out}
    assert set(by) == {"city", "year"}
    for f in by.values():
        assert f["m"] > 0.9        # matches agree almost surely
        assert f["u"] < 0.1        # chance agreement rare
        assert 0.05 < f["p_match"] < 0.2
    # deterministic: re-running yields identical parameters
    again = {r["field"]: r for r in linkage.fs_fit_em(
        scored, ["city", "year"], rounds=3).collect()}
    assert {k: (v["m"], v["u"], v["p_match"]) for k, v in by.items()} == {
        k: (v["m"], v["u"], v["p_match"]) for k, v in again.items()
    }


def test_fs_fit_em_degenerate_single_pattern(spark):
    # all pairs share one agreement pattern: EM has nothing to separate
    # and must return finite parameters (guarded divisions), not NaN/err
    scored = spark.createDataFrame(
        [(True, False)] * 20, "agree_city boolean, agree_year boolean"
    )
    out = {r["field"]: r for r in linkage.fs_fit_em(scored, ["city", "year"]).collect()}
    for f in out.values():
        assert f["m"] is not None and f["u"] is not None
        assert 0.0 <= f["m"] <= 1.0 and 0.0 <= f["u"] <= 1.0

    import pytest
    with pytest.raises(ValueError, match="fields"):
        linkage.fs_fit_em(scored, [])


def test_fs_fit_em_empty_pairs_yields_empty_output(spark):
    scored = spark.createDataFrame(
        [], "agree_city boolean, agree_year boolean"
    )
    # no candidate pairs: no parameters to learn — 0 rows, matching the
    # SQL oracle's empty aggregate (review r6)
    assert linkage.fs_fit_em(scored, ["city", "year"]).collect() == []


def test_fs_fit_em_field_names_are_data_not_identifiers(spark):
    # a field name that is not a bare SQL identifier must work: output
    # is built relationally, never through an expr/stack string
    scored = spark.createDataFrame(
        [(True,)] * 5 + [(False,)] * 45, "`agree_bal-band` boolean"
    )
    out = linkage.fs_fit_em(scored, ["bal-band"], rounds=2).collect()
    assert len(out) == 1 and out[0]["field"] == "bal-band"
