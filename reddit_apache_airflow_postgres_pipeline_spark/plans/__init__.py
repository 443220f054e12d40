from reddit_apache_airflow_postgres_pipeline_spark.plans.pipelines import (
    combine_pipeline,
    fetch_transform,
    normalize_rows,
    run_combine,
)

__all__ = ["combine_pipeline", "fetch_transform", "normalize_rows", "run_combine"]
