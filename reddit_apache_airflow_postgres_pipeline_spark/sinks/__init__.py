from reddit_apache_airflow_postgres_pipeline_spark.sinks.csv import write_atomic_csv
from reddit_apache_airflow_postgres_pipeline_spark.sinks.archive import archive_files

__all__ = ["write_atomic_csv", "archive_files"]
