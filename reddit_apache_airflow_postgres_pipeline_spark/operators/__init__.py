from reddit_apache_airflow_postgres_pipeline_spark.operators.dedup import dedup_exact, dedup_first
from reddit_apache_airflow_postgres_pipeline_spark.operators.merge import upsert_merge

__all__ = ["dedup_exact", "dedup_first", "upsert_merge"]
