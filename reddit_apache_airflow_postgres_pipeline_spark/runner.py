"""Run-level orchestration parity (SURVEY.md §2.G).

The reference delegates orchestration to Airflow: task graphs (O1), XCom
handoff (O2), task retries with exponential backoff (O3,
Fetch_reddit.py:281-289; Combine_send_to_postgresql.py:267-272), a
20-minute dagrun timeout (O4, Fetch_reddit.py:297), and fail-the-run
error semantics (O7, Combine_send_to_postgresql.py:129-130, 176,
214-215). In the Spark engine a pipeline is ONE driver program — the
task graph is the call sequence, XCom is a return value — so this module
provides the remaining run-level machinery: retry policies, a job
timeout, and the two composed jobs.

Spark-level task retries (``spark.task.maxFailures``) handle partition
failures; these policies handle whole-job failures (network, sink
unavailable), exactly the split the reference has between Airflow task
retries and in-task HTTP retries (A3, sources/reddit.py).
"""

from __future__ import annotations

import concurrent.futures
import logging
import time
from dataclasses import dataclass
from typing import Callable, TypeVar

from pyspark.sql import SparkSession

from reddit_apache_airflow_postgres_pipeline_spark.config import EngineConfig
from reddit_apache_airflow_postgres_pipeline_spark.plans.pipelines import (
    CombineResult,
    FetchResult,
    run_combine,
    run_fetch,
)

log = logging.getLogger("reddit_apache_airflow_postgres_pipeline_spark.runner")

T = TypeVar("T")


@dataclass(frozen=True)
class RetryPolicy:
    """Airflow ``default_args`` analog: N retries, fixed delay, optional
    exponential backoff with a cap."""

    retries: int
    delay_s: float
    exponential: bool = False
    max_delay_s: float = 3600.0

    def delay(self, attempt: int) -> float:
        if not self.exponential:
            return self.delay_s
        return min(self.delay_s * (2**attempt), self.max_delay_s)


# Reference policies (Fetch_reddit.py:281-289; Combine_send_to_postgresql.py:267-272)
FETCH_RETRY = RetryPolicy(retries=5, delay_s=300.0, exponential=True, max_delay_s=3600.0)
LOAD_RETRY = RetryPolicy(retries=1, delay_s=300.0)

FETCH_JOB_TIMEOUT_S = 20 * 60  # dagrun_timeout, Fetch_reddit.py:297


def run_with_retries(
    fn: Callable[[], T],
    policy: RetryPolicy,
    sleep: Callable[[float], None] = time.sleep,
    job_name: str = "job",
) -> T:
    """Run ``fn``; on exception retry per policy, re-raising after the
    last attempt (an Airflow task's lifecycle)."""
    last: Exception | None = None
    for attempt in range(policy.retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — task retry catches everything
            last = e
            if attempt == policy.retries:
                break
            d = policy.delay(attempt)
            log.warning("%s attempt %d failed (%s); retrying in %.0fs",
                        job_name, attempt + 1, e, d)
            sleep(d)
    assert last is not None
    raise last


def run_with_timeout(fn: Callable[[], T], timeout_s: float, job_name: str = "job") -> T:
    """Fail the run if ``fn`` exceeds ``timeout_s`` (dagrun_timeout O4).

    Runs ``fn`` in a worker thread and returns control at the deadline:
    the executor is shut down with ``wait=False`` on the timeout path
    (a ``with`` block would call ``shutdown(wait=True)`` and block until
    ``fn`` finishes on its own, defeating the deadline). The abandoned
    worker thread keeps running ``fn`` to completion in the background —
    Python threads can't be killed — so callers owning a SparkSession
    should follow up with ``sparkContext.cancelAllJobs`` to stop any
    Spark work the orphaned job submits."""
    pool = concurrent.futures.ThreadPoolExecutor(
        max_workers=1, thread_name_prefix=f"{job_name}-timeout"
    )
    fut = pool.submit(fn)
    try:
        result = fut.result(timeout=timeout_s)
    except concurrent.futures.TimeoutError:
        pool.shutdown(wait=False, cancel_futures=True)
        raise TimeoutError(f"{job_name} exceeded {timeout_s:.0f}s") from None
    except BaseException:
        pool.shutdown(wait=False)
        raise
    pool.shutdown(wait=False)
    return result


def fetch_job(
    spark: SparkSession,
    cfg: EngineConfig,
    run_ts: str,
    rows: list | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> FetchResult:
    """DAG 1 (`fetch >> done`): fetch with the reference's task retry
    policy and run deadline; returns the written CSV path (the XCom)."""
    return run_with_timeout(
        lambda: run_with_retries(
            lambda: run_fetch(spark, cfg, run_ts, rows=rows),
            FETCH_RETRY,
            sleep=sleep,
            job_name="fetch",
        ),
        FETCH_JOB_TIMEOUT_S,
        job_name="fetch",
    )


def combine_load_job(
    spark: SparkSession,
    cfg: EngineConfig,
    run_ts: str,
    load: Callable[[str], None] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> CombineResult:
    """DAG 2 (`combine >> load >> done`): combine (O7 fail semantics live
    in run_combine), then hand the combined path to ``load`` (default: the
    staged Postgres upsert) under the load retry policy. The return-value
    handoff is the XCom (O2)."""
    result = run_combine(spark, cfg, run_ts)
    if load is None:
        from reddit_apache_airflow_postgres_pipeline_spark.sinks.postgres import load_csv_to_postgres

        def load(path: str) -> None:  # noqa: F811
            load_csv_to_postgres(path, cfg)

    run_with_retries(lambda: load(result.combined_path), LOAD_RETRY,
                     sleep=sleep, job_name="load")
    log.info("combined %d rows from %d files; archived %d",
             result.rows, len(result.used_files), len(result.archived))
    return result
