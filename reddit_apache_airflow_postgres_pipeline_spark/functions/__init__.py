"""Column-expression builders (all JVM-side, zero Python UDFs for parity ops)."""

from reddit_apache_airflow_postgres_pipeline_spark.functions.expr import (
    build_url,
    epoch_to_iso,
    falsy_or,
    fullname_fallback,
    normalize_permalink,
    safe_int,
    salted_sha256,
    sanitize_title,
    thing_key_fallback,
)

__all__ = [
    "build_url",
    "epoch_to_iso",
    "falsy_or",
    "fullname_fallback",
    "normalize_permalink",
    "safe_int",
    "salted_sha256",
    "sanitize_title",
    "thing_key_fallback",
]
