"""JSONL source/sink: schema-enforced scan, corrupt-line quarantine,
parquet→jsonl→DataFrame roundtrip fidelity."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.sources import (
    DOCUMENTS_SCHEMA,
    load_table,
    read_jsonl,
    read_jsonl_with_quarantine,
    write_jsonl,
)

SF = "/root/testdata/sf0.001"


def test_documents_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    # multi-file distributed write, not a coalesce(1) bottleneck
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) >= 1
    back = read_jsonl(spark, out, DOCUMENTS_SCHEMA)
    assert back.count() == docs.count() > 0
    assert back.schema == docs.schema
    assert back.exceptAll(docs).count() == 0
    assert docs.exceptAll(back).count() == 0


def test_quarantine_splits_bad_lines(spark, tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    good = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "source": "s", "n_chars": 11},
        {"doc_id": 2, "text": None, "lang": "de", "source": "s", "n_chars": 0},
    ]
    with open(p / "a.jsonl", "w") as f:
        for g in good:
            f.write(json.dumps(g) + "\n")
        f.write("{not json at all\n")
        f.write('{"doc_id": "NOT_A_NUMBER", "text": "x"}\n')
    ok, quarantine = read_jsonl_with_quarantine(spark, str(p), DOCUMENTS_SCHEMA)
    assert ok.count() == 2
    assert set(r.doc_id for r in ok.collect()) == {1, 2}
    qrows = quarantine.collect()
    qlines = [r.raw_line for r in qrows]
    assert len(qlines) == 2
    assert "{not json at all" in qlines
    # quarantined lines carry the verbatim input for replay
    assert any("NOT_A_NUMBER" in l for l in qlines)
    # PERMISSIVE half-parse: the type-mismatch line keeps its good fields
    mismatch = [r for r in qrows if r.raw_line and "NOT_A_NUMBER" in r.raw_line][0]
    assert mismatch.doc_id is None and mismatch.text == "x"


def test_failfast_raises(spark, tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    (p / "a.jsonl").write_text('{"doc_id": 1}\nnot-json\n')
    with pytest.raises(Exception):
        read_jsonl(spark, str(p), DOCUMENTS_SCHEMA, mode="FAILFAST").collect()


def test_dropmalformed_drops(spark, tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    (p / "a.jsonl").write_text('{"doc_id": 1}\nnot-json\n{"doc_id": 2}\n')
    df = read_jsonl(spark, str(p), DOCUMENTS_SCHEMA, mode="DROPMALFORMED")
    assert sorted(r.doc_id for r in df.collect()) == [1, 2]
