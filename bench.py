#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is forced with the noop sink (full materialization, no
collect-to-driver cost polluting the numbers). Pass --explain to dump
each query's formatted physical plan instead of timing it.

Host-steal hardening (r12 verdict #2): the r12 driver record was taken
in a contention window and overstated the round ~2x with byte-identical
plans. Defenses, all visible in the emitted JSON:
  * REPS=3 full suite passes with per-query min ACROSS passes — a
    query's three runs are now separated by minutes, so a single steal
    window can no longer poison every run of one query (the old layout
    ran a query's attempts back-to-back, inside one window).
  * /proc loadavg sampled BEFORE SparkSession creation and after stop,
    plus per-pass wall totals, emitted under "load".
  * "contaminated": true when start load1 > cpus*0.5 (external load —
    the bench itself hasn't started) or when max/min pass total > 1.5
    (a pass-sized steal window mid-run). A contaminated record
    self-identifies; it should be discarded and re-run idle.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reddit_apache_airflow_postgres_pipeline_spark.plans.registry import headline_queries, queries as all_queries
from reddit_apache_airflow_postgres_pipeline_spark.session import get_spark

# Non-headline family representatives (r9 verdict #6): the serving and
# ingest-chain families dominate the codebase but had no round-over-round
# perf signal. Timed the same way (untimed warm-up + min-across-passes)
# but reported under a SEPARATE "families" block so the 10-query headline
# total stays comparable across rounds. The chain query's warm-up also
# builds the session-memoized checkpointed replay, so the recorded
# number is the steady-state consumer cost (the shape every one of the
# 5+ chain consumers pays after the shared split).
FAMILY_QUERIES = [
    "q_sim_ivfpq",
    "q_sim_sq8",
    "q_ingest_chain_decisions",
    "q_text_embed_ivfpq",  # r10: the raw-text -> vector -> serve loop
    "q_ingest_chain_text_serve",  # r11: admission composed with serving
    "q_media_ivfpq_topk",  # r11: the media modality through the same index
    "q_neardup_gate_replay",  # r11: verified incremental admission
    "q_multimodal_topk",  # r12: cross-modal RRF over both served indexes
    "q_snapshot_training_mix",  # r12: pinned corpus -> deterministic split
    "q_multimodal_gate_replay",  # r13: unified either-modality admission
]

REPS = 3  # full suite passes; per-query value = min across passes


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover - non-Linux fallback
        return []


def _steal_ticks() -> int | None:
    """Cumulative hypervisor steal ticks (/proc/stat cpu col 8).
    Loadavg is BLIND to co-tenant CPU steal — measured on this host:
    a run whose loadavg started at 0.17 lost up to ~12 cores for a
    ~90 s window (steal sampler, r14) while every in-process metric
    looked healthy. Sampling steal around the run lets the
    contamination flag name the actual cause instead of guessing
    from pass-ratio symptoms."""
    try:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])
    except Exception:  # pragma: no cover - non-Linux fallback
        return None


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def run_full_registry(spark, sf_dir: str, sf: str) -> None:
    """--full sidecar (r13 verdict #5): ONE warm-up + ONE timed pass
    over EVERY registered query, written as one JSON line to
    BENCH_FULL_sf{sf}.json (and stdout). Gives the ~200-query registry
    tail a per-round perf signal without touching the headline
    contract — the driver never passes --full, and the headline JSON
    line is unchanged. Single-pass numbers are ranking-grade, not
    regression-grade: use them to find the slow tail, then measure the
    suspects with the min-of-3 machinery."""
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    sc = spark.sparkContext
    for name, fn in all_queries().items():
        sc.setJobGroup(f"bench-full:{name}", name)
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            errors[name] = repr(exc)
    line = json.dumps(
        {
            "metric": "full_registry_single_warm_pass",
            "value": round(sum(times.values()), 3),
            "unit": "sec",
            "n_queries": len(times),
            "queries": times,
            "errors": errors,
            "load": {"end": _loadavg()},
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
    )
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"BENCH_FULL_sf{sf}.json"
    )
    with open(out_path, "w") as fh:
        fh.write(line + "\n")
    print(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    full = "--full" in sys.argv
    if full:
        # sidecar default: the driver-correctness SF, not the bench SF
        sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
        )
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    explain = "--explain" in sys.argv
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 1))

    load_start = _loadavg()  # BEFORE Spark: pure external-load signal
    steal_start = _steal_ticks()
    wall_start = time.perf_counter()

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM warm-up OUTSIDE the timed region: codegen compiler, shuffle
    # machinery, parquet reader, broadcast + window machinery, noop sink.
    # Touches no benchmark-SF table and computes no query result —
    # measured ~6s of one-time cost that otherwise lands on whichever
    # query happens to run first.
    spark.range(0, 1_000_000, 1, 8).selectExpr(
        "sum(id) as s", "count(distinct id % 97) as d"
    ).write.format("noop").mode("overwrite").save()
    try:
        tiny = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
        from pyspark.sql import Window, functions as F

        (
            tiny.join(F.broadcast(tiny.select("r_regionkey")), "r_regionkey")
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("r_regionkey").orderBy("r_name")
                ),
            )
            .write.format("noop").mode("overwrite").save()
        )
    except Exception:
        pass  # warm-up only — never fail the bench

    if full:
        run_full_registry(spark, sf_dir, sf)
        spark.stop()
        return

    qs = headline_queries()
    sc = spark.sparkContext
    stage_counts: dict[str, int] = {}
    warmup_errors: dict[str, str] = {}

    if explain:
        # emitted by --explain itself so a snapshot regeneration can
        # never drop the scope note again (r11 advice)
        print(
            "# HEADLINE-ONLY SNAPSHOT (10 queries) — bench.py --explain"
            " output.\n"
            "# This file intentionally covers ONLY the bench headline"
            " queries; the\n"
            "# full-registry plan audit (every registered query,"
            " exchange/scan/\n"
            "# cartesian counts) lives in PLAN_AUDIT_sf0.01.md."
            " (r9 verdict #3)\n"
        )
        for name, fn in qs.items():
            print(f"==== {name} ====")
            fn(spark, sf_dir).explain("formatted")
        spark.stop()
        return

    fam_all = all_queries()
    timed = list(qs.items()) + [(n, fam_all[n]) for n in FAMILY_QUERIES]

    def run_once(name, fn, record_stages):
        """One timed execution (construction + materialization — some
        operators materialize intermediates eagerly), cache cleared
        after so passes stay independent."""
        group = f"bench:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if record_stages:
            # NOTE on stage-count bounces (r9 verdict watch-item,
            # diagnosed r10): q_dedup_ngram_jaccard's recorded 56 vs 59
            # is AQE JOB-SPLITTING variance, not plan growth — the extra
            # job is an AQE query-stage materialization decision driven
            # by runtime state, with an identical final plan; treat ±1
            # job's worth of stages as noise.
            try:
                tracker = sc.statusTracker()
                jobs = tracker.getJobIdsForGroup(group)
                stage_counts[name] = sum(
                    len(tracker.getJobInfo(j).stageIds)
                    for j in jobs
                    if tracker.getJobInfo(j) is not None
                )
            except Exception:
                pass  # diagnostics only — never fail the bench
        spark.catalog.clearCache()
        return dt

    # Untimed warm-up of EVERY timed query before pass 1. Two reasons:
    # cold first runs (JIT, page cache, IVFPQ training, chain replays)
    # make pass 1 systematically slower — min-across-passes would
    # discard the cold numbers anyway, but an asymmetric pass 1 would
    # trip the pass-ratio contamination heuristic on a perfectly idle
    # host (observed: 79s cold vs 34s warm at sf0.001); with all
    # passes warm, a pass-sized spread IS external interference.
    for name, fn in timed:
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            print(f"WARMUP FAILED for {name}: {exc!r}", file=sys.stderr)
            warmup_errors[name] = repr(exc)

    runs: dict[str, list[float]] = {n: [] for n, _ in timed}
    pass_totals: list[float] = []
    for _rep in range(REPS):
        # UNTIMED between-pass hygiene (r14): each pass's replay
        # constructions localCheckpoint fresh RDD blocks whose
        # unpersist waits on the async ContextCleaner behind Python/JVM
        # GC; on the low-core leg the backlog grew pass totals
        # monotonically (observed 33→51→57 s on an idle host) and
        # tripped the pass-ratio contamination flag that exists to
        # catch EXTERNAL steal. Forcing both GCs between passes keeps
        # passes independent — nothing timed changes, the flag keeps
        # meaning what it says.
        if _rep:
            import gc as _gc

            _gc.collect()
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
            time.sleep(1.0)
        p0 = time.perf_counter()
        for name, fn in timed:
            runs[name].append(run_once(name, fn, record_stages=_rep == 0))
        pass_totals.append(round(time.perf_counter() - p0, 3))

    timings = {n: round(min(r), 3) for n, r in runs.items()}
    spreads = {n: round(max(r) - min(r), 3) for n, r in runs.items()}
    # median alongside min (r13 verdict #8): with REPS=3 the reported
    # min can sit far below a noisy pair's typical run (observed
    # spreads >1s on the heavy dedup pair); the median makes that
    # self-diagnosing without changing the comparable "queries" block.
    medians = {n: round(_median(r), 3) for n, r in runs.items()}
    families = {
        n: {"sec": timings.pop(n), "spread": spreads.pop(n),
            "median": medians.pop(n),
            "stages": stage_counts.pop(n, None)}
        for n in FAMILY_QUERIES
    }
    total = round(sum(timings.values()), 3)

    spark.stop()
    load_end = _loadavg()
    steal_end = _steal_ticks()
    wall = time.perf_counter() - wall_start
    steal_cores = None
    if steal_start is not None and steal_end is not None and wall > 0:
        # USER_HZ=100: ticks/s / 100 = average cores stolen
        steal_cores = round((steal_end - steal_start) / wall / 100.0, 2)

    contaminated = bool(
        (load_start and load_start[0] > cpus * 0.5)
        or (min(pass_totals) > 0 and max(pass_totals) / min(pass_totals) > 1.5)
        # co-tenant steal big enough to distort min-of-3: calibrated
        # on this host — a clean-pass run with 1.72 avg stolen cores
        # of 32 (5%) produced the day's best numbers, while the runs
        # with pass-sized blowups averaged several cores; <8% of the
        # core budget is below run-to-run JVM variance
        or (steal_cores is not None and steal_cores >= 0.08 * cpus)
    )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "median": medians,
                "stages": stage_counts,
                "families": families,
                "warmup_errors": warmup_errors,
                "load": {
                    "start": load_start,
                    "end": load_end,
                    "cpus": cpus,
                    "pass_totals": pass_totals,
                    "reps": REPS,
                    "steal_cores_avg": steal_cores,
                },
                "contaminated": contaminated,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
