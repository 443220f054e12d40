"""Direct contract tests for the shared counting-state store
(streaming/counting_state.py) with a synthetic cell schema unlike
either production client (CMS grid / qsketch bins) — pinning the
abstraction itself: liveness under the manifest, retry exclusion,
transitive generations, and interrupted-GC completion."""

from __future__ import annotations

import os
import shutil

from reddit_apache_airflow_postgres_pipeline_spark.streaming import counting_state as cs

SCHEMA = "k string, v long"
KEYS = ["k"]


def _write(spark, state, bid, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(
        os.path.join(state, f"batch_id={bid}")
    )


def _read(spark, state, before=None):
    return {
        r["k"]: r["v"]
        for r in cs.read_counts(
            spark, state, SCHEMA, KEYS, "v", before_batch=before
        ).collect()
    }


def test_read_fold_retry_and_empty(spark, tmp_path):
    state = str(tmp_path / "st")
    assert _read(spark, state) == {}  # missing store: empty relation
    _write(spark, state, 0, [("a", 2), ("b", 1)])
    _write(spark, state, 1, [("a", 3), ("c", 5)])
    assert _read(spark, state) == {"a": 5, "b": 1, "c": 5}
    # retry of batch 1 must not see its own failed attempt
    assert _read(spark, state, before=1) == {"a": 2, "b": 1}


def test_compaction_transitive_manifest_and_gc(spark, tmp_path):
    state = str(tmp_path / "st")
    for bid, rows in enumerate([[("a", 1)], [("a", 2), ("b", 4)], [("b", 8)]]):
        _write(spark, state, bid, rows)
    expect = {"a": 3, "b": 12}
    keep = str(tmp_path / "copy1")
    shutil.copytree(os.path.join(state, "batch_id=1"), keep)

    cs.compact_counts(spark, state, SCHEMA, KEYS, "v")
    assert set(cs.state_subdirs(state).values()) == {-1}
    assert cs.subsumed_ids(state) == {0, 1, 2}
    assert _read(spark, state) == expect

    # crash-before-GC leftover must not double-count
    shutil.copytree(keep, os.path.join(state, "batch_id=1"))
    assert _read(spark, state) == expect

    # second-generation manifest is transitive over the first
    _write(spark, state, 3, [("c", 7)])
    cs.compact_counts(spark, state, SCHEMA, KEYS, "v")
    assert cs.subsumed_ids(state) == {-1, 0, 1, 2, 3}
    assert _read(spark, state) == {"a": 3, "b": 12, "c": 7}
    assert not os.path.isdir(os.path.join(state, "batch_id=1"))
    assert cs.live_dir_count(state) == 1


def test_compaction_excludes_in_flight_batch(spark, tmp_path):
    state = str(tmp_path / "st")
    for bid in range(3):
        _write(spark, state, bid, [("x", 1)])
    cs.compact_counts(spark, state, SCHEMA, KEYS, "v", exclude_from=2)
    # batch 2's dir survives the fold so its retry path still works
    ids = set(cs.state_subdirs(state).values())
    assert 2 in ids and -1 in ids and 0 not in ids
    assert _read(spark, state) == {"x": 3}
    assert _read(spark, state, before=2) == {"x": 2}


def test_meta_marker_stamp_and_mismatch_rejection(spark, tmp_path):
    state = str(tmp_path / "st")
    meta = {"format": "test-cells", "width": 8}
    cs.stamp_meta(state, meta)
    # idempotent re-stamp with the same values
    cs.stamp_meta(state, meta)
    # matching / subset / missing-store checks all pass
    cs.check_meta(state, meta)
    cs.check_meta(state, {"format": "test-cells"})
    cs.check_meta(str(tmp_path / "absent"), meta)
    # pre-marker store (dirs, no _meta.json) passes: nothing to verify
    legacy = str(tmp_path / "legacy")
    _write(spark, legacy, 0, [("a", 1)])
    cs.check_meta(legacy, meta)
    # any shared-key disagreement is rejected, stamp or check
    import pytest

    with pytest.raises(ValueError, match="format mismatch"):
        cs.check_meta(state, {"format": "test-cells", "width": 16})
    with pytest.raises(ValueError, match="format mismatch"):
        cs.stamp_meta(state, {"format": "other"})
    # keys the caller doesn't constrain are ignored
    cs.check_meta(state, {"width": 8, "unrelated_hint": True})


def test_legacy_store_refuses_auto_stamp(spark, tmp_path):
    """A marker-LESS store that already holds batch dirs has unknown
    format: stamping it would bless its state as the caller's format —
    the exact silent-merge the marker exists to stop (ADVICE r7). Only
    migrate=True (caller asserts the format) or a genuinely empty
    store may stamp."""
    import pytest

    meta = {"format": "test-cells", "width": 8}
    legacy = str(tmp_path / "legacy")
    _write(spark, legacy, 0, [("a", 1)])
    with pytest.raises(ValueError, match="refusing to stamp"):
        cs.stamp_meta(legacy, meta)
    assert not os.path.exists(os.path.join(legacy, cs.META))
    # explicit migration assertion stamps, and later writers verify
    cs.stamp_meta(legacy, meta, migrate=True)
    cs.stamp_meta(legacy, meta)
    with pytest.raises(ValueError, match="format mismatch"):
        cs.stamp_meta(legacy, {"format": "test-cells", "width": 16})
    # an empty dir (mkdir'd but never written) still auto-stamps
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    cs.stamp_meta(empty, meta)
    cs.check_meta(empty, meta)


def test_distinct_mode_set_semantics_and_compaction(spark, tmp_path):
    state = str(tmp_path / "st")
    kschema = "k string"

    def wset(bid, keys):
        spark.createDataFrame([(k,) for k in keys], kschema).write.mode(
            "overwrite"
        ).parquet(os.path.join(state, f"batch_id={bid}"))

    def rset(before=None):
        return {
            r["k"]
            for r in cs.read_counts(
                spark, state, kschema, ["k"], None,
                before_batch=before, agg="distinct",
            ).collect()
        }

    wset(0, ["a", "b"])
    wset(1, ["b", "c"])
    wset(2, ["c", "d"])
    assert rset() == {"a", "b", "c", "d"}
    assert rset(before=2) == {"a", "b", "c"}  # retry exclusion
    import shutil as sh

    keep = str(tmp_path / "copy")
    sh.copytree(os.path.join(state, "batch_id=1"), keep)
    cs.compact_counts(spark, state, kschema, ["k"], None, agg="distinct")
    # distinct generations DO carry the manifest (raw set-readers like
    # the IVF postings probe path skip the fold and need the exclusion
    # set); folded dirs deleted
    assert cs.subsumed_ids(state) == {0, 1, 2}
    assert set(cs.state_subdirs(state).values()) == {-1}
    assert rset() == {"a", "b", "c", "d"}
    # crash leftover beside the generation is absorbed by distinct AND
    # named by the manifest — exact either way
    sh.copytree(keep, os.path.join(state, "batch_id=1"))
    assert rset() == {"a", "b", "c", "d"}
    # value column is meaningless for a set store
    import pytest

    with pytest.raises(ValueError, match="no value column"):
        cs.read_counts(spark, state, kschema, ["k"], "v", agg="distinct")
