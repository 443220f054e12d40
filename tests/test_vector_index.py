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


def test_append_equals_monolithic_build(spark, tmp_path):
    e = _emb(spark)
    base = e.filter(F.col("vec_id") < 400)
    delta = e.filter(F.col("vec_id") >= 400)
    q = e.filter(F.col("vec_id") < 8)

    inc = str(tmp_path / "inc")
    write_ivf_index(base, inc, n_cells=16, refine_iters=1)
    from reddit_apache_airflow_postgres_pipeline_spark.sinks.vector_index import append_to_ivf_index

    append_to_ivf_index(delta, inc)

    # centroids are seeded from the lowest 16 ids, all in `base`, and
    # Lloyd-refined over base only — a monolithic rebuild over the full
    # corpus would refine over the union, so equality must be asserted
    # against an index built with the SAME frozen quantizer: build full
    # postings by assigning the union against inc's centroids
    got = {
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in query_ivf_index(spark, inc, q, n_probe=4, k=5).collect()
    }
    cents = spark.read.parquet(f"{inc}/centroids")
    from reddit_apache_airflow_postgres_pipeline_spark.operators.similarity import ivf_assign

    mono = str(tmp_path / "mono")
    full = ivf_assign(e, cents, out_id="neighbor_id")
    spark.read.parquet(f"{inc}/centroids").write.parquet(f"{mono}/centroids")
    full.write.partitionBy("cell").parquet(f"{mono}/postings")
    want = {
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in query_ivf_index(spark, mono, q, n_probe=4, k=5).collect()
    }
    assert got == want
    # every indexed vector is present exactly once
    n = spark.read.parquet(f"{inc}/postings").count()
    assert n == e.count()


def test_append_touches_only_delta_cells(spark, tmp_path):
    e = _emb(spark)
    path = str(tmp_path / "ix")
    write_ivf_index(e.filter(F.col("vec_id") < 495), path, n_cells=16)
    import os

    def mtimes():
        root = f"{path}/postings"
        return {
            d: max(
                (os.path.getmtime(os.path.join(root, d, f))
                 for f in os.listdir(os.path.join(root, d))
                 if not f.startswith(".")),
                default=0,
            )
            for d in os.listdir(root)
            if d.startswith("cell=")
        }

    before = mtimes()
    from reddit_apache_airflow_postgres_pipeline_spark.sinks.vector_index import append_to_ivf_index

    delta = e.filter(F.col("vec_id") >= 495)
    append_to_ivf_index(delta, path)
    after = mtimes()
    untouched = [d for d in before if after.get(d) == before[d]]
    touched = [d for d in after if after.get(d) != before.get(d)]
    # a 5-vector delta lands in at most 5 cells; the rest stay untouched —
    # the dynamic-partition append property that bounds write cost
    assert touched and untouched
