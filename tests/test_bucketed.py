"""Bucketed-table co-location: the join over two same-bucketed tables
must plan with ZERO Exchange operators (no shuffle), and its result must
equal the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.sinks.bucketed import colocated_join, write_bucketed
from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8,
                   str(base / "orders"), sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8,
                   str(base / "lineitem"), sort_cols=["l_orderkey"])
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_no_shuffle_and_correct(spark, bucketed_tables):
    j = colocated_join(
        spark, "orders_b", "lineitem_b", on=[("o_orderkey", "l_orderkey")]
    ).select("o_orderkey", "l_quantity")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan

    # equality against the plain (shuffled) join
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    want = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select("o_orderkey", "l_quantity")
    assert j.count() == want.count()
    assert j.exceptAll(want).count() == 0 and want.exceptAll(j).count() == 0


def test_partitioned_write_prunes(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from reddit_apache_airflow_postgres_pipeline_spark.sinks.parquet import write_partitioned

    ev = load_table(spark, SF, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "ev_part")
    write_partitioned(ev, out, ["event_type"], max_records_per_file=10_000)
    assert sorted(
        d for d in os.listdir(out) if d.startswith("event_type=")
    ) == sorted(f"event_type={t}" for t in
                ["click", "error", "purchase", "signup", "view"])

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # pruned at the partition level — the predicate is a PartitionFilter,
    # not a post-scan data filter
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan
    assert back.count() == ev.filter(F.col("event_type") == "click").count()


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    """Inbox-style small files → ~target-sized output files, content
    preserved, optional in-file clustering for footer-stat pushdown."""
    import glob
    import os

    from reddit_apache_airflow_postgres_pipeline_spark.sinks.parquet import compact_parquet

    src = str(tmp_path / "small")
    # 40 tiny files
    spark.range(0, 40_000).withColumn("k", F.col("id") % 7).repartition(40).write.parquet(src)
    assert len(glob.glob(os.path.join(src, "part-*"))) == 40

    dest = str(tmp_path / "compact")
    total = sum(os.path.getsize(p) for p in glob.glob(os.path.join(src, "part-*")))
    n = compact_parquet(spark, src, dest, target_file_bytes=total // 3,
                        sort_within_by=["k", "id"])
    files = glob.glob(os.path.join(dest, "part-*"))
    assert len(files) == n
    assert 2 <= len(files) <= 6  # ~3-4 files, far fewer than 40
    # content identical
    a = sorted(r.id for r in spark.read.parquet(src).collect())
    b = sorted(r.id for r in spark.read.parquet(dest).collect())
    assert a == b

    with pytest.raises(ValueError, match="dest must differ"):
        compact_parquet(spark, src, src)
