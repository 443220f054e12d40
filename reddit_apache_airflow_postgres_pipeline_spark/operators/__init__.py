from reddit_apache_airflow_postgres_pipeline_spark.operators.asof import asof_join
from reddit_apache_airflow_postgres_pipeline_spark.operators.clusters import (
    canonical_docs,
    connected_components,
)
from reddit_apache_airflow_postgres_pipeline_spark.operators.curation import (
    contaminated_ids,
    hash_split,
    pack_chunks,
    repetition_signals,
)
from reddit_apache_airflow_postgres_pipeline_spark.operators.dedup import (
    dedup_exact,
    dedup_first,
    dedup_first_agg,
)
from reddit_apache_airflow_postgres_pipeline_spark.operators.diff import snapshot_diff
from reddit_apache_airflow_postgres_pipeline_spark.operators.incremental import merge_rollup
from reddit_apache_airflow_postgres_pipeline_spark.operators.merge import upsert_merge
from reddit_apache_airflow_postgres_pipeline_spark.operators.neardup import (
    exact_jaccard_verify,
    minhash_estimate_quality,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_near_dups,
    simhash_signatures,
)
from reddit_apache_airflow_postgres_pipeline_spark.operators.sampling import (
    hash_bucket,
    sample_by_hash,
    stratified_sample_by_hash,
)
from reddit_apache_airflow_postgres_pipeline_spark.operators.scd2 import scd2_apply
from reddit_apache_airflow_postgres_pipeline_spark.operators.similarity import (
    embedding_near_dups,
    ivf_knn,
    knn_bruteforce,
)
from reddit_apache_airflow_postgres_pipeline_spark.operators.skew import Agg, salted_agg, salted_join
from reddit_apache_airflow_postgres_pipeline_spark.operators.timeseries import (
    activity_islands,
    ewma_bounded,
    max_concurrency,
)

__all__ = [
    "Agg",
    "activity_islands",
    "contaminated_ids",
    "ewma_bounded",
    "hash_split",
    "max_concurrency",
    "pack_chunks",
    "repetition_signals",
    "asof_join",
    "canonical_docs",
    "connected_components",
    "dedup_exact",
    "dedup_first",
    "dedup_first_agg",
    "embedding_near_dups",
    "exact_jaccard_verify",
    "hash_bucket",
    "ivf_knn",
    "knn_bruteforce",
    "minhash_estimate_quality",
    "minhash_lsh_pairs",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "salted_agg",
    "salted_join",
    "sample_by_hash",
    "scd2_apply",
    "simhash_near_dups",
    "simhash_signatures",
    "stratified_sample_by_hash",
    "merge_rollup",
    "snapshot_diff",
    "upsert_merge",
]
