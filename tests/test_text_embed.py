"""similarity.embed_text — the deterministic hashed-n-gram
signed-random-projection featurizer that closes the raw-text → vector →
index → serve loop (registry: q_text_embed, q_text_embed_ivfpq)."""

from __future__ import annotations

import hashlib
import math
import re

from reddit_apache_airflow_postgres_pipeline_spark.operators import similarity as sim


def _py_embed(text: str, d: int, n: int, salt: str) -> list[float] | None:
    """Pure-Python reference: same tokenizer, same md5 sign idiom."""
    toks = re.split(r"\s+", text.strip().lower())
    toks = [t for t in toks if t != ""] or [""]
    if len(toks) < n:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    grams = [g for g in grams if g != ""]
    if not grams:
        return None
    comps = [0] * d
    for g in grams:
        for j in range(d):
            h = int(hashlib.md5(f"{salt}{g}:{j}".encode()).hexdigest()[:8], 16)
            comps[j] += 1 if h % 2 == 0 else -1
    nrm = math.sqrt(sum(c * c for c in comps))
    if nrm == 0:
        return [0.0] * d
    return [c / nrm for c in comps]


def test_embed_matches_python_reference_and_is_unit_norm(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "hello"),                      # < n tokens: full-join gram
        (3, "to be or not to be"),         # repeated grams: TF counts
        (4, "the quick brown fox jumps over the lazy dog"),  # dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: list(r["embedding"])
        for r in sim.embed_text(df, d=8, n=2, salt="emb").collect()
    }
    assert set(out) == {1, 2, 3, 4}
    for doc_id, text in rows:
        ref = _py_embed(text, d=8, n=2, salt="emb")
        got = out[doc_id]
        assert len(got) == 8
        assert all(abs(a - b) < 1e-12 for a, b in zip(got, ref)), (
            doc_id, got, ref
        )
        nrm = math.sqrt(sum(v * v for v in got))
        assert abs(nrm - 1.0) < 1e-9
    assert out[1] == out[4]  # content-addressed: same text, same vector


def test_embed_empty_and_whitespace_docs_produce_no_row(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   \t\n "), (3, None), (4, "real text here")],
        "doc_id long, text string",
    )
    got = sim.embed_text(df, d=4, n=2).collect()
    assert [r["doc_id"] for r in got] == [4]


def test_embed_rejects_bad_params(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="d must be"):
        sim.embed_text(df, d=0)
    with pytest.raises(ValueError, match="n must be"):
        sim.embed_text(df, n=0)


def test_embed_components_are_scaled_integer_sums(spark):
    """The pre-normalization components are exact integers: embedding
    × norm must recover integers to 1e-9 — the property that makes the
    featurizer bit-replayable cross-engine with no decimal contract."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta alpha beta")],
        "doc_id long, text string",
    )
    [row] = sim.embed_text(df, d=8, n=2).collect()
    emb = list(row["embedding"])
    # reconstruct: components c_j = emb_j * nrm where nrm² = Σc², and
    # Σ emb² = 1 so nrm is recoverable only from the integer grid —
    # scan small norms for one where all components land on integers
    n_grams = 5  # 6 tokens → 5 bigrams; |c_j| <= n_grams
    candidates = [
        math.sqrt(s) for s in range(1, n_grams * n_grams * 8 + 1)
    ]
    ok = False
    for nrm in candidates:
        scaled = [v * nrm for v in emb]
        if all(abs(s - round(s)) < 1e-9 for s in scaled) and any(
            round(s) != 0 for s in scaled
        ):
            ok = True
            break
    assert ok, emb


def test_embed_edge_whitespace_tokenization(spark):
    """The r10 review catch: leading/trailing tabs/newlines must not
    leave phantom empty edge tokens. '\\tfoo' is a 1-token doc (full
    token-join fallback, NOT silently dropped); '\\tfoo bar' equals
    'foo bar'; whitespace-only docs produce no row — verified against
    the pure-Python reference AND the DuckDB oracle CTE."""
    import duckdb
    import pandas as pd

    from reddit_apache_airflow_postgres_pipeline_spark.plans.registry_ml import _embed_ctes

    rows = [
        (1, "\tfoo bar"),
        (2, "foo bar"),
        (3, "\tfoo"),
        (4, " x  y\n"),
        (5, " \t\n"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["embedding"])
        for r in sim.embed_text(df, d=8, n=2, salt="emb").collect()
    }
    assert set(got) == {1, 2, 3, 4}  # whitespace-only doc 5: no row
    assert got[1] == got[2]  # edge tab must not change the grams
    for doc_id, text in rows[:4]:
        ref = _py_embed(text, d=8, n=2, salt="emb")
        assert all(
            abs(a - b) < 1e-12 for a, b in zip(got[doc_id], ref)
        ), (doc_id, got[doc_id], ref)

    # cross-engine: the oracle CTE on the same rows must produce the
    # identical embeddings (the exact divergence the review reproduced)
    con = duckdb.connect()
    con.register(
        "edge_docs", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    sql = f"""
    WITH {_embed_ctes(src="edge_docs")}
    SELECT vec_id, embedding FROM temb
    """
    duck = {int(r[0]): list(r[1]) for r in con.execute(sql).fetchall()}
    assert duck == got
