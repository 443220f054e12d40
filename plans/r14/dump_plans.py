#!/usr/bin/env python
"""Dump .explain('formatted') for the bench headline + family queries
into plans/r14/<query>_<tag>.txt (tag = before/after).

Usage: python plans/r14/dump_plans.py <tag> [query ...]
Defaults to all headline + FAMILY_QUERIES at $SPARK_GRAFT_SF_DIR
(default sf0.1). Plan capture only — nothing is timed.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

from reddit_apache_airflow_postgres_pipeline_spark.plans.registry import (  # noqa: E402
    headline_queries,
    queries as all_queries,
)
from reddit_apache_airflow_postgres_pipeline_spark.session import get_spark  # noqa: E402

FAMILY_QUERIES = [
    "q_sim_ivfpq",
    "q_sim_sq8",
    "q_ingest_chain_decisions",
    "q_text_embed_ivfpq",
    "q_ingest_chain_text_serve",
    "q_media_ivfpq_topk",
    "q_neardup_gate_replay",
    "q_multimodal_topk",
    "q_snapshot_training_mix",
    "q_multimodal_gate_replay",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"plans-r14-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(headline_queries())
    fam = all_queries()
    for n in FAMILY_QUERIES:
        qs[n] = fam[n]
    wanted = sys.argv[2:] or list(qs)
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in wanted:
        df = qs[name](spark, sf_dir)
        # public API: _explainString via the classic DataFrame explain path
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        ) if isinstance(df, DataFrame) else None
        if txt is None:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
