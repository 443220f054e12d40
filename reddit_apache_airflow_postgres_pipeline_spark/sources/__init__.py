from reddit_apache_airflow_postgres_pipeline_spark.sources.files import (
    list_inbox,
    read_csv_inbox,
    read_csv_paths,
    resolve_latest,
)
from reddit_apache_airflow_postgres_pipeline_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA,
    read_jsonl,
    read_jsonl_with_quarantine,
    write_jsonl,
)
from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table, load_tables

__all__ = [
    "list_inbox",
    "load_table",
    "load_tables",
    "read_csv_inbox",
    "DOCUMENTS_SCHEMA",
    "read_jsonl",
    "read_jsonl_with_quarantine",
    "write_jsonl",
    "read_csv_paths",
    "resolve_latest",
]
