from reddit_apache_airflow_postgres_pipeline_spark.sinks.archive import archive_files
from reddit_apache_airflow_postgres_pipeline_spark.sinks.bucketed import colocated_join, write_bucketed
from reddit_apache_airflow_postgres_pipeline_spark.sinks.csv import write_atomic_csv
from reddit_apache_airflow_postgres_pipeline_spark.sinks.parquet import write_partitioned

__all__ = [
    "archive_files",
    "colocated_join",
    "write_atomic_csv",
    "write_bucketed",
    "write_partitioned",
]
