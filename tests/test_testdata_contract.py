"""Testdata-drift tripwire.

The driver regenerates ``/root/testdata`` between rounds and has already
changed physical encodings once (``events.parquet:ts`` went
TIMESTAMP(NANOS) → TIMESTAMP(MICROS) before round 3, silently breaking
three stream/batch parity tests). These assertions state the engine's
assumptions about the synthetic tables directly against the parquet
footers (no Spark session needed), so the next incompatible
regeneration fails HERE with a readable message instead of as a
mysterious downstream failure.

If one of these fails: the fix belongs in the readers
(``sources/tables.py`` + ``streaming/events.py`` both auto-detect the
``ts`` encoding), not in the data.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import TABLE_NAMES

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# Columns the engine's queries/operators depend on, per table. Extra
# columns in the data are fine; missing or retyped ones are drift.
REQUIRED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey"},
    "part": {"p_partkey", "p_name", "p_brand"},
    "orders": {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"},
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source"},
    "embeddings": {"vec_id", "embedding", "label"},
}

# The two ts encodings the readers auto-detect. Anything else (e.g.
# TIMESTAMP(MILLIS), int96, a string column) is new drift the readers
# have never seen — fail loudly.
_SUPPORTED_TS = {
    pa.timestamp("ns"),
    pa.timestamp("us"),
    pa.timestamp("ns", tz="UTC"),
    pa.timestamp("us", tz="UTC"),
    pa.int64(),
}


def _schema(sf_dir: str, name: str) -> pa.Schema:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent in this environment")
    return pq.read_schema(path)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", TABLE_NAMES)
def test_required_columns_present(sf_dir, name):
    schema = _schema(sf_dir, name)
    missing = REQUIRED_COLUMNS[name] - set(schema.names)
    assert not missing, (
        f"TESTDATA DRIFT: {sf_dir}/{name}.parquet lost columns {sorted(missing)} "
        f"(has {schema.names}). The driver regenerated testdata with a new "
        f"shape; update the registry queries that read these columns."
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_encoding_supported(sf_dir):
    schema = _schema(sf_dir, "events")
    ts = schema.field("ts").type
    assert ts in _SUPPORTED_TS, (
        f"TESTDATA DRIFT: events.parquet:ts is now physical {ts!r}. The "
        f"readers auto-detect TIMESTAMP(NANOS)-as-long and "
        f"TIMESTAMP(MICROS) (sources/tables.py, streaming/events.py); "
        f"teach them this encoding before touching anything else — this "
        f"exact drift broke 3 stream/batch parity tests in round 3."
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embeddings_vec_is_float_list(sf_dir):
    schema = _schema(sf_dir, "embeddings")
    vec = schema.field("embedding").type
    assert pa.types.is_list(vec) or pa.types.is_large_list(vec), (
        f"TESTDATA DRIFT: embeddings.parquet:vec is {vec!r}, expected a "
        f"list<float> — similarity operators index into it positionally."
    )
    assert pa.types.is_floating(vec.value_type), (
        f"TESTDATA DRIFT: embeddings vec element type {vec.value_type!r} "
        f"is not floating — cosine/dot math assumes float elements."
    )
