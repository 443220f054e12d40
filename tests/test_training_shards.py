"""End-to-end training-shard export: split assignment, packing, layout,
partition pruning, and file-size bounding."""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.sinks.training_shards import write_training_shards
from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_training_shard_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "shards")
    written = write_training_shards(
        docs, path, chunk_tokens=512, max_records_per_file=20
    )

    # hive layout: one directory per split, and only those
    parts = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(path, "split=*"))
    )
    assert parts and all(re.match(r"split=(train|val|test)$", p) for p in parts)

    back = spark.read.parquet(path)
    # no doc lost or duplicated, full payload preserved
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    assert set(back.columns) == set(docs.columns) | {
        "split", "n_tok", "chunk_id"
    }

    # the returned audit frame matches the sink contents
    a = sorted(
        tuple(r)
        for r in back.select("doc_id", "split", "chunk_id").collect()
    )
    b = sorted(
        tuple(r)
        for r in written.select("doc_id", "split", "chunk_id").collect()
    )
    assert a == b

    # partition pruning: a val-only read filters at the partition level
    q = back.filter(F.col("split") == "val").select("doc_id")
    plan = spark._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "split" in m.group(1), plan

    # maxRecordsPerFile honored: no parquet file holds more than 20 rows
    for f in glob.glob(os.path.join(path, "split=*", "*.parquet")):
        n = spark.read.parquet(f).count()
        assert n <= 20, f


def test_chunk_ids_monotone_within_shard(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    written = write_training_shards(
        docs, str(tmp_path / "s2"), chunk_tokens=256
    )
    rows = written.select("source", "doc_id", "chunk_id").collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["source"], []).append((r["doc_id"], r["chunk_id"]))
    for seq in by_shard.values():
        seq.sort()
        chunk_ids = [c for _, c in seq]
        assert chunk_ids[0] == 0
        assert all(b >= a for a, b in zip(chunk_ids, chunk_ids[1:]))
