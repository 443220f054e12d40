"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of the reference pipeline (``NavidTavakoli/reddit-apache-airflow-postgres-pipeline``),
re-expressed Spark-first.

Design stance (SURVEY.md §7.1): a library + runner of pure
``DataFrame -> DataFrame`` functions — declare the logical plan with the
DataFrame/SQL API and let Catalyst/Tungsten pick the physical strategy.
Connectors live at the edges; everything in between is deterministic and
oracle-testable.

Scale posture: every operator is partitioned and spillable — no driver-side
``collect()`` in any hot path, ``LongType`` counters, broadcast hints for
small dimensions, AQE enabled by default (see ``session.get_spark``).
"""

from reddit_apache_airflow_postgres_pipeline_spark.config import EngineConfig
from reddit_apache_airflow_postgres_pipeline_spark.session import get_spark


def __getattr__(name: str):
    """Lazy submodule access (``rs.pipelines``, ``rs.runner``, …) without
    importing Spark-heavy modules at package import."""
    import importlib

    lazy = {
        "pipelines": "reddit_apache_airflow_postgres_pipeline_spark.plans.pipelines",
        "registry": "reddit_apache_airflow_postgres_pipeline_spark.plans.registry",
        "runner": "reddit_apache_airflow_postgres_pipeline_spark.runner",
        "expr": "reddit_apache_airflow_postgres_pipeline_spark.functions.expr",
        "schemas": "reddit_apache_airflow_postgres_pipeline_spark.schemas",
    }
    if name in lazy:
        return importlib.import_module(lazy[name])
    raise AttributeError(name)


__all__ = ["EngineConfig", "get_spark", "pipelines", "registry", "runner",
           "expr", "schemas"]
__version__ = "0.1.0"
