"""Persisted IVF index: build → query roundtrip equals the in-memory
operator, rebuilds are deterministic, and the probed-cell filter reaches
the postings scan as a partition filter (the pruning that makes a
served 100 TB index read ~n_probe/n_cells of its data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators.similarity import ivf_knn
from reddit_apache_airflow_postgres_pipeline_spark.sinks.vector_index import (
    query_ivf_index,
    write_ivf_index,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_persisted_index_matches_inmemory_operator(spark, tmp_path):
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 8)
    write_ivf_index(e, str(tmp_path / "ix"), n_cells=16, refine_iters=0)
    got = query_ivf_index(spark, str(tmp_path / "ix"), q, n_probe=4, k=5)
    want = ivf_knn(e, q, n_cells=16, n_probe=4, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_index_rebuild_is_deterministic(spark, tmp_path):
    e = _emb(spark)
    write_ivf_index(e, str(tmp_path / "a"), n_cells=8, refine_iters=1)
    write_ivf_index(e, str(tmp_path / "b"), n_cells=8, refine_iters=1)
    ca = sorted(map(tuple, spark.read.parquet(str(tmp_path / "a/centroids")).collect()))
    cb = sorted(map(tuple, spark.read.parquet(str(tmp_path / "b/centroids")).collect()))
    assert ca == cb
    pa = spark.read.parquet(str(tmp_path / "a/postings")).groupBy("cell").count()
    pb = spark.read.parquet(str(tmp_path / "b/postings")).groupBy("cell").count()
    assert sorted(map(tuple, pa.collect())) == sorted(map(tuple, pb.collect()))


def test_probed_cells_prune_postings_partitions(spark, tmp_path):
    e = _emb(spark)
    write_ivf_index(e, str(tmp_path / "ix"), n_cells=16, refine_iters=0)
    postings = spark.read.parquet(str(tmp_path / "ix/postings"))
    pruned = postings.filter(F.col("cell").isin(0, 3))
    plan = spark._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    # the filter must appear in the partition-filter slot, not the data filter
    seg = plan[plan.index("PartitionFilters"):]
    assert "cell" in seg[: seg.index("\n")]
    # and the scan truly reads only the 2 probed directories
    assert pruned.select("cell").distinct().count() == 2
