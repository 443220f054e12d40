"""Streaming heavy-hitter tracker: the no-miss guarantee vs exact
counts, sound reporting (est ≥ φ·N), re-probe aging, checkpointed
restart, and compaction invariance on both stores."""

from __future__ import annotations

import os
from collections import Counter

from reddit_apache_airflow_postgres_pipeline_spark.streaming import hh_stream

SCHEMA = "doc_id long, text string"
PHI = 0.2


def _write(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        path,
    )


def _rows():
    # 'hot' dominates; 'warm' crosses phi=0.2 only early; singles pad N
    return [
        (1, "hot hot hot warm"),
        (2, "hot hot warm pad1 pad2"),
        (3, "hot hot hot pad3 pad4 pad5"),
        (4, "hot hot pad6 pad7 pad8 pad9 pad10"),
    ]


def _exact_hh(rows, phi):
    toks = [t for _, s in rows for t in s.split()]
    c = Counter(toks)
    n = len(toks)
    return {k for k, v in c.items() if v >= phi * n}, c, n


def test_no_misses_sound_reports_and_restart(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inbox)
    rows = _rows()
    for i, chunk in enumerate([rows[:1], rows[1:2]]):
        _write(os.path.join(inbox, f"f{i}.parquet"), chunk)
    hh_stream.run_hh_available_now(
        spark, inbox, SCHEMA, state, ckpt, PHI, text_col="text", d=4, w=256
    )
    # second run picks up only the new files (checkpoint)
    for i, chunk in enumerate([rows[2:3], rows[3:]], start=2):
        _write(os.path.join(inbox, f"f{i}.parquet"), chunk)
    hh_stream.run_hh_available_now(
        spark, inbox, SCHEMA, state, ckpt, PHI, text_col="text", d=4, w=256
    )
    got = {r["key"]: r for r in hh_stream.heavy_hitters(spark, state, PHI).collect()}
    exact, counts, n = _exact_hh(rows, PHI)
    # one-sided guarantee: every TRUE heavy hitter is reported
    assert exact <= set(got)
    # sound: every report's estimate meets the bar and bounds its count
    for k, r in got.items():
        assert r["n_total"] == n
        assert r["est"] >= counts.get(k, 0)
        assert r["est"] >= PHI * n
    # 'warm' was flagged early (2/4 of the first batch) but fell below
    # phi as N grew: the re-probe must age it OUT of the final report
    assert counts["warm"] < PHI * n
    cands = {
        r["key"] for r in hh_stream.read_candidates(spark, state).collect()
    }
    assert "warm" in cands and "warm" not in got


def test_compaction_preserves_reports(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inbox)
    rows = _rows()
    for i, r in enumerate(rows):
        _write(os.path.join(inbox, f"f{i}.parquet"), [r])
    hh_stream.run_hh_available_now(
        spark, inbox, SCHEMA, state, ckpt, PHI,
        text_col="text", d=4, w=256, compact_after_dirs=2,
    )
    before = {
        (r["key"], r["est"], r["n_total"])
        for r in hh_stream.heavy_hitters(spark, state, PHI).collect()
    }
    hh_stream.compact_candidates(spark, state)
    from reddit_apache_airflow_postgres_pipeline_spark.streaming import cms_stream

    cms_stream.compact_state(spark, hh_stream._cms_dir(state))
    after = {
        (r["key"], r["est"], r["n_total"])
        for r in hh_stream.heavy_hitters(spark, state, PHI).collect()
    }
    assert before == after and before


def test_tracker_audit_no_miss_invariant(spark):
    """The registry replay (q_hh_tracker_audit) must never show a true
    heavy hitter the tracker missed — the relational statement of the
    one-sided CMS guarantee the stream tests pin operationally."""
    from reddit_apache_airflow_postgres_pipeline_spark.plans.registry import queries

    rows = queries()["q_hh_tracker_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "bar too high: audit selected no keys at all"
    missed = [r for r in rows if r["hh_exact"] and not r["hh_tracker"]]
    assert not missed, f"tracker missed true heavy hitters: {missed}"
