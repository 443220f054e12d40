"""Orchestration parity tests (SURVEY.md §2.G O1-O7)."""

from __future__ import annotations

import csv
import os
import time

import pytest

from reddit_apache_airflow_postgres_pipeline_spark import runner as R
from reddit_apache_airflow_postgres_pipeline_spark.config import EngineConfig


def test_retry_policy_schedules():
    # fetch: 5 retries, 5-min delay, exponential capped at 1h (O3)
    p = R.FETCH_RETRY
    assert [p.delay(i) for i in range(5)] == [300.0, 600.0, 1200.0, 2400.0, 3600.0]
    assert R.LOAD_RETRY.retries == 1 and R.LOAD_RETRY.delay(0) == 300.0


def test_run_with_retries_exhausts_and_reraises():
    calls, sleeps = [], []

    def fail():
        calls.append(1)
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        R.run_with_retries(fail, R.FETCH_RETRY, sleep=sleeps.append)
    assert len(calls) == 6  # initial + 5 retries
    assert sleeps == [300.0, 600.0, 1200.0, 2400.0, 3600.0]


def test_run_with_retries_recovers():
    state = {"n": 0}

    def flaky():
        state["n"] += 1
        if state["n"] < 3:
            raise OSError("transient")
        return "ok"

    assert R.run_with_retries(flaky, R.FETCH_RETRY, sleep=lambda s: None) == "ok"
    assert state["n"] == 3


def test_run_with_timeout():
    assert R.run_with_timeout(lambda: 42, timeout_s=5) == 42
    with pytest.raises(TimeoutError, match="exceeded"):
        R.run_with_timeout(lambda: time.sleep(2), timeout_s=0.2)


def test_run_with_timeout_returns_promptly_for_hung_job():
    # The deadline must be enforced even when fn outlives it by a lot:
    # a `with ThreadPoolExecutor()` would block in shutdown(wait=True)
    # until fn finished (10s here), delivering the TimeoutError late.
    t0 = time.monotonic()
    with pytest.raises(TimeoutError, match="hung exceeded"):
        R.run_with_timeout(lambda: time.sleep(10), timeout_s=0.2, job_name="hung")
    elapsed = time.monotonic() - t0
    assert elapsed < 5, f"timeout delivered only after {elapsed:.1f}s (fn still running)"


def test_run_with_timeout_propagates_fn_exception():
    def boom():
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        R.run_with_timeout(boom, timeout_s=5)


def test_combine_load_job_end_to_end(spark, tmp_path):
    cfg = EngineConfig(
        gdpr_salt="test-salt",
        data_dir=str(tmp_path / "data"),
        combine_dir=str(tmp_path / "combined"),
        loaded_dir=str(tmp_path / "loaded"),
    )
    os.makedirs(cfg.data_dir)
    cols = ["thing_key", "thing_type", "id", "created_at", "score", "num_comments",
            "title_sanitized", "author_hash", "permalink", "subreddit", "flair_text"]
    with open(os.path.join(cfg.data_dir, "italytravel_t.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(cols)
        w.writerow(["k1", "t3", "a", "2026-08-13T00:00:00Z", "1", "0", "t", "h",
                    "/p/a", "S", ""])

    loaded_paths: list[str] = []
    res = R.combine_load_job(spark, cfg, "20260813T000000", load=loaded_paths.append)
    assert res.rows == 1
    assert loaded_paths == [res.combined_path]  # XCom handoff (O2)

    # O7: empty inbox on the next tick fails the run
    with pytest.raises(FileNotFoundError, match="no CSV files"):
        R.combine_load_job(spark, cfg, "20260813T010000", load=loaded_paths.append)


def test_load_failure_retries_once_then_fails(spark, tmp_path):
    cfg = EngineConfig(
        gdpr_salt="test-salt",
        data_dir=str(tmp_path / "data"),
        combine_dir=str(tmp_path / "combined"),
        loaded_dir=str(tmp_path / "loaded"),
    )
    os.makedirs(cfg.data_dir)
    with open(os.path.join(cfg.data_dir, "italytravel_t.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["thing_key", "score"])
        w.writerow(["k1", "5"])

    attempts = []

    def bad_load(path: str) -> None:
        attempts.append(path)
        raise ConnectionError("pg down")

    with pytest.raises(ConnectionError):
        R.combine_load_job(spark, cfg, "20260813T000000", load=bad_load,
                           sleep=lambda s: None)
    assert len(attempts) == 2  # initial + 1 retry (load policy)
