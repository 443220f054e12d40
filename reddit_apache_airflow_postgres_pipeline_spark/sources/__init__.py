from reddit_apache_airflow_postgres_pipeline_spark.sources.files import read_csv_inbox
from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table, load_tables

__all__ = ["read_csv_inbox", "load_table", "load_tables"]
