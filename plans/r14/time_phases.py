#!/usr/bin/env python
"""Split each bench query's wall time into CONSTRUCTION (the Python
call that builds the DataFrame — py4j expression building plus any
param-collect jobs) vs EXECUTION (the noop materialization), after one
untimed warm-up pass. Diagnostic only."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from reddit_apache_airflow_postgres_pipeline_spark.plans.registry import (  # noqa: E402
    headline_queries,
    queries as all_queries,
)
from reddit_apache_airflow_postgres_pipeline_spark.session import get_spark  # noqa: E402

FAMILY_QUERIES = [
    "q_sim_ivfpq", "q_sim_sq8", "q_ingest_chain_decisions",
    "q_text_embed_ivfpq", "q_ingest_chain_text_serve", "q_media_ivfpq_topk",
    "q_neardup_gate_replay", "q_multimodal_topk", "q_snapshot_training_mix",
    "q_multimodal_gate_replay",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="phase-times-r14")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(headline_queries())
    fam = all_queries()
    for n in FAMILY_QUERIES:
        qs[n] = fam[n]
    wanted = sys.argv[1:] or list(qs)
    reps = int(os.environ.get("PHASE_REPS", "2"))
    for name in wanted:
        fn = qs[name]
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: WARMUP FAILED {exc!r}")
            continue
        best_c, best_e = None, None
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.catalog.clearCache()
            c, e = t1 - t0, t2 - t1
            best_c = c if best_c is None else min(best_c, c)
            best_e = e if best_e is None else min(best_e, e)
        print(f"{name:45s} construct={best_c:7.3f}s execute={best_e:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
