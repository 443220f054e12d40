"""Query registry, part 6: statistical profiling — exact-arithmetic
Pearson correlation over the fact table and an embedding covariance
(Gram) matrix. Both are built from decimal-exact sums so the results
are bit-identical across engines: the only floating-point ops left at
the end (divide, sqrt) are IEEE-754 correctly-rounded and therefore
engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.plans.registry import _q
from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table

_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _pearson_sql() -> str:
    sums = ["COUNT(*) AS n"]
    for m in _MEASURES:
        sums.append(f"SUM(CAST({m} AS DECIMAL(18,2))) AS s_{m}")
    for i, a in enumerate(_MEASURES):
        for b in _MEASURES[i + 1 :]:
            sums.append(
                f"SUM(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2)))"
                f" AS s_{a}_{b}"
            )
        sums.append(
            f"SUM(CAST({a} AS DECIMAL(18,2)) * CAST({a} AS DECIMAL(18,2)))"
            f" AS s_{a}_{a}"
        )
    pairs = []
    for i, a in enumerate(_MEASURES):
        for b in _MEASURES[i + 1 :]:
            r = (
                f"(n * CAST(s_{a}_{b} AS DOUBLE) - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
                f" / sqrt((n * CAST(s_{a}_{a} AS DOUBLE) - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
                f" * (n * CAST(s_{b}_{b} AS DOUBLE) - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
            )
            pairs.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, round({r}, 6) AS r FROM agg"
            )
    return (
        "WITH agg AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(pairs)
    )


@_q("q_lineitem_pearson", _pearson_sql())
def q_lineitem_pearson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation across the four lineitem measures in
    ONE aggregation pass (n + 4 sums + 10 product sums, all
    decimal-exact since the inputs are 2-dp quantities), then the r
    formula in doubles — divide and sqrt are correctly-rounded IEEE ops,
    so no engine divergence and no rounding tricks needed until the
    final 6-dp display round. One scan, one 1-row reduce: the profile
    pass a 100 TB table gets from ``df.stat`` without the second job per
    pair."""
    li = load_table(spark, sf_dir, "lineitem")

    def dec(m):
        return F.col(m).cast("decimal(18,2)")

    aggs = [F.count("*").alias("n")]
    for m in _MEASURES:
        aggs.append(F.sum(dec(m)).alias(f"s_{m}"))
    for i, a in enumerate(_MEASURES):
        for b in _MEASURES[i + 1 :]:
            aggs.append(F.sum(dec(a) * dec(b)).alias(f"s_{a}_{b}"))
        aggs.append(F.sum(dec(a) * dec(a)).alias(f"s_{a}_{a}"))
    agg = li.agg(*aggs)

    def d(c):
        return F.col(c).cast("double")

    r_cols, stack_args = [], []
    for i, a in enumerate(_MEASURES):
        for b in _MEASURES[i + 1 :]:
            num = F.col("n") * d(f"s_{a}_{b}") - d(f"s_{a}") * d(f"s_{b}")
            var_a = F.col("n") * d(f"s_{a}_{a}") - d(f"s_{a}") * d(f"s_{a}")
            var_b = F.col("n") * d(f"s_{b}_{b}") - d(f"s_{b}") * d(f"s_{b}")
            name = f"r_{a}_{b}"
            r_cols.append(
                F.round(num / F.sqrt(var_a * var_b), 6).alias(name)
            )
            stack_args.append(f"'{a}', '{b}', {name}")
    # one scan, one 1-row reduce, then stack() unpivots the 6 pair
    # columns into rows — no unionAll re-aggregation per pair.
    return agg.select(*r_cols).select(
        F.expr(
            f"stack({len(stack_args)}, "
            + ", ".join(stack_args)
            + ") AS (col_a, col_b, r)"
        )
    )


@_q(
    "q_embedding_covariance",
    """
    WITH el AS (
      SELECT vec_id, g.i AS i, embedding[g.i] AS x
      FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS i) g
      WHERE len(embedding) >= 8),
    pairs AS (
      SELECT a.i AS dim_i, b.i AS dim_j,
             CAST(round(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE), 9)
                  AS DECIMAL(28,12)) AS xy,
             CAST(round(CAST(a.x AS DOUBLE), 9) AS DECIMAL(28,12)) AS xa,
             CAST(round(CAST(b.x AS DOUBLE), 9) AS DECIMAL(28,12)) AS xb
      FROM el a JOIN el b ON b.vec_id = a.vec_id AND b.i >= a.i)
    SELECT dim_i, dim_j,
           round(CAST(SUM(xy) AS DOUBLE) / COUNT(*)
                 - (CAST(SUM(xa) AS DOUBLE) / COUNT(*))
                   * (CAST(SUM(xb) AS DOUBLE) / COUNT(*)), 6) AS cov
    FROM pairs GROUP BY dim_i, dim_j
    """,
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding covariance (Gram) matrix over the first 8 dimensions —
    the statistics a whitening / PCA preprocessing stage needs. Products
    are rounded to 9 dp per row and summed as DECIMAL so the reduce is
    order-free (the quantize-audit determinism recipe); cov then comes
    from exact sums with correctly-rounded double division at the end.
    Plan: posexplode → self-equi-join on vec_id (64× fan-out bounded to
    the selected dims) → one hash agg; at 100 TB the same shape runs
    per-partition as a map-side partial Gram before one 36-row reduce.
    The dim cap keeps the demo output small; lift it for the full 64×64
    matrix (2080 upper-triangle cells)."""
    em = load_table(spark, sf_dir, "embeddings")
    el = em.select(
        "vec_id", F.posexplode("embedding").alias("p", "x")
    ).select(
        "vec_id", (F.col("p") + 1).alias("i"), F.col("x").cast("double").alias("x")
    ).filter(F.col("i") <= 8)
    a = el.alias("a")
    b = el.alias("b")
    pairs = a.join(
        b,
        (F.col("b.vec_id") == F.col("a.vec_id")) & (F.col("b.i") >= F.col("a.i")),
    ).select(
        F.col("a.i").alias("dim_i"),
        F.col("b.i").alias("dim_j"),
        F.round(F.col("a.x") * F.col("b.x"), 9)
        .cast("decimal(28,12)")
        .alias("xy"),
        F.round(F.col("a.x"), 9).cast("decimal(28,12)").alias("xa"),
        F.round(F.col("b.x"), 9).cast("decimal(28,12)").alias("xb"),
    )
    cnt = F.count("*")
    return pairs.groupBy("dim_i", "dim_j").agg(
        F.round(
            F.sum("xy").cast("double") / cnt
            - (F.sum("xa").cast("double") / cnt)
            * (F.sum("xb").cast("double") / cnt),
            6,
        ).alias("cov")
    )
