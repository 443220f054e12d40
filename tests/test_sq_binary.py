"""SQ8 / binary-sign / Matryoshka operators (operators/similarity.py):
reconstruction error bounds, signature bit correctness, and the funnel
invariant — with an unbounded candidate budget the staged retrievals
must EQUAL the exact L2 top-k."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _exact_l2_topk(e, q, k=5):
    qv = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("__q"))
    sc = (
        e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__c"))
        .join(F.broadcast(qv))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dist", F.round(sim.l2sq("__c", "__q"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        sc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "dist")
    )


def test_sq8_reconstruction_error_is_bounded_by_half_a_bucket(spark):
    """Every reconstructed component must sit within half a bucket
    width of the raw value: |recon - v| <= (mx-mn)/512, plus the 1e-6
    slack the 6dp param rounding can add at the range edges (a raw
    value may exceed the rounded mx by <1e-6 and clamp)."""
    e = _emb(spark)
    mm = sim.sq8_minmax(e)
    recon = sim.sq8_dequant(sim.sq8_encode(e, mm, "embedding", "codes"), mm, "codes", "recon")
    pars = {r["dim"]: (r["mn"], r["mx"]) for r in mm.collect()}
    viol = (
        recon.select(
            F.posexplode(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    "recon",
                    lambda a, b: F.abs(a - b),
                )
            ).alias("dim", "err")
        )
        .groupBy("dim")
        .agg(F.max("err").alias("max_err"))
        .collect()
    )
    for r in viol:
        mn, mx = pars[r["dim"]]
        assert r["max_err"] <= (mx - mn) / 512.0 + 1e-6, (r["dim"], r["max_err"])


def test_sq8_codes_are_uint8(spark):
    e = _emb(spark)
    mm = sim.sq8_minmax(e)
    coded = sim.sq8_encode(e, mm, "embedding", "codes")
    mmx = coded.select(
        F.array_min("codes").alias("lo"), F.array_max("codes").alias("hi")
    ).agg(F.min("lo"), F.max("hi")).collect()[0]
    assert mmx[0] >= 0 and mmx[1] <= 255


def test_sign_signature_bits_match_component_signs(spark):
    """Hamming distance between two signatures == the count of dims
    whose (v > 0) signs differ — recomputed independently per pair."""
    e = _emb(spark).filter(F.col("vec_id") < 12)
    sigs = {
        r["vec_id"]: r["sig"]
        for r in sim.sign_signature(e, "embedding", "sig").collect()
    }
    vecs = {r["vec_id"]: r["embedding"] for r in e.collect()}
    for a in list(vecs)[:6]:
        for b in list(vecs)[6:]:
            want = sum(
                1 for x, y in zip(vecs[a], vecs[b]) if (x > 0) != (y > 0)
            )
            got = sum(
                bin((wa ^ wb) & 0xFFFFFFFFFFFFFFFF).count("1")
                for wa, wb in zip(sigs[a], sigs[b])
            )
            assert got == want, (a, b, got, want)


def test_full_rerank_budget_equals_exact_l2(spark):
    """The funnel invariant: with rerank >= corpus size, both staged
    retrievals (binary and Matryoshka) must return EXACTLY the exact
    L2 top-k — the coarse stage can only prune, never re-rank."""
    e = _emb(spark).filter(F.col("vec_id") < 128)
    q = e.filter(F.col("vec_id") < 4)
    want = sorted(map(tuple, _exact_l2_topk(e, q, 5).collect()))
    got_b = sorted(
        map(tuple, sim.binary_rerank_topk(e, q, k=5, rerank=128).collect())
    )
    got_m = sorted(
        map(tuple, sim.matryoshka_topk(e, q, k=5, rerank=128).collect())
    )
    assert got_b == want
    assert got_m == want


def test_binary_and_matryoshka_are_deterministic(spark):
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 4)
    a = sorted(map(tuple, sim.binary_hamming_topk(e, q, k=5).collect()))
    b = sorted(map(tuple, sim.binary_hamming_topk(e, q, k=5).collect()))
    assert a == b and len(a) == 4 * 5
    m1 = sorted(map(tuple, sim.matryoshka_topk(e, q, k=5).collect()))
    m2 = sorted(map(tuple, sim.matryoshka_topk(e, q, k=5).collect()))
    assert m1 == m2 and len(m1) == 4 * 5


def test_sign_signature_ragged_corpus_fails_loudly(spark):
    """A ragged corpus must raise (the pq_subvectors discipline), not
    silently truncate signatures to the probed row's dimension."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    ragged = spark.createDataFrame(
        [(1, [0.5, -0.5, 0.5, -0.5]), (2, [0.5] * 8)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        sim.sign_signature(ragged).collect()


def test_sign_signature_empty_input_keeps_bigint_type(spark, tmp_path):
    """An empty input (e.g. an empty micro-batch through the binary
    index stream) must produce a parquet-writable array<bigint> sig
    column, not array<void>."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = sim.sign_signature(empty)
    assert out.schema["sig"].dataType.simpleString() == "array<bigint>"
    out.write.mode("overwrite").parquet(str(tmp_path / "sigs"))  # must not raise
    assert spark.read.parquet(str(tmp_path / "sigs")).count() == 0


def test_sign_signature_null_embedding_fails_loudly_any_row(spark):
    """NULL vectors must fail loudly wherever they sit (r9 ADVICE +
    r10 review): a null in the PROBED first row raises the clear
    ValueError at build time; a null in any LATER row — which the
    probe can't see — trips the per-row runtime assert instead of
    silently packing a NULL sig into the store."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    nulled_first = spark.createDataFrame(
        [(1, None), (2, [0.5] * 4)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="null embedding"):
        sim.sign_signature(nulled_first)

    nulled_later = spark.createDataFrame(
        [(1, [0.5] * 4), (2, None)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        sim.sign_signature(nulled_later).collect()


def test_sq8_params_coerce_and_nonfinite_literals(spark):
    """r13 advice hardening: list-path params are float()-coerced (a
    numpy scalar would repr as np.float64(...) under numpy>=2 and embed
    invalid SQL) and non-finite mins/maxes embed as string-cast double
    literals instead of bare tokens that fail analysis. A NaN-poisoned
    dim degrades deterministically: encode emits code 0 (mx > mn is
    False), dequant reproduces the NaN arithmetic."""
    import math

    class FakeScalar(float):  # numpy-scalar stand-in: float sub, odd repr
        def __repr__(self):
            return f"np.float64({float(self)!r})"

    rows = spark.createDataFrame(
        [(1, [0.25, 0.5]), (2, [0.75, 0.5])], "vec_id long, embedding array<double>"
    )
    pars = [(FakeScalar(0.0), FakeScalar(1.0)), (float("nan"), float("nan"))]
    enc = sim.sq8_encode(rows, pars)
    got = {r["vec_id"]: r["codes"] for r in enc.collect()}
    assert got[1] == [64, 0] and got[2] == [192, 0]
    dec = sim.sq8_dequant(enc, pars)
    out = {r["vec_id"]: r["embedding"] for r in dec.collect()}
    # dim 0 reconstructs the bucket midpoint; dim 1 is NaN arithmetic
    assert abs(out[1][0] - (64 + 0.5) / 256.0) < 1e-12
    assert math.isnan(out[1][1]) and math.isnan(out[2][1])


def test_ivf_assign_fast_path_rejects_non_numeric_cell(spark):
    """r13 advice hardening: the n_probe=1 aggregate pick negates the
    cell id for its ascending tiebreak, which silently assumed numeric
    cells; a string cell column must fail loudly at build time, not
    with an opaque analysis error."""
    import pytest

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [("a", [1.0, 0.0])], "cell string, cv array<double>"
    )
    with pytest.raises(TypeError, match="NUMERIC cell column"):
        sim.ivf_assign(vecs, cents, n_probe=1)
