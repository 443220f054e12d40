"""Query registry, part 5: time-series / interval analytics over the
events stream (operators/timeseries.py) plus distribution histograms —
sweep-line concurrency, gaps-and-islands, bounded EWMA smoothing, and
fixed-width binning, each with a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.operators import timeseries
from reddit_apache_airflow_postgres_pipeline_spark.plans.registry import _q
from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table


@_q(
    "q_events_max_concurrency",
    """
    WITH pts AS (
      SELECT event_type AS key, ts AS t, 1 AS delta, event_id AS id FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 10 MINUTE, -1, event_id FROM events),
    c AS (
      SELECT key, delta,
             SUM(delta) OVER (PARTITION BY key
                              ORDER BY t ASC, delta DESC, id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
      FROM pts)
    SELECT key AS event_type,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
           CAST(MAX(cum) AS BIGINT) AS max_concurrent
    FROM c GROUP BY key
    """,
)
def q_events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency: treat each event as a 10-minute
    open interval and report, per event type, the peak number open at
    once. ±1 deltas, one per-key ordered running sum, max per key —
    the running-max is invariant to equal-time tie order, which is what
    makes the result deterministic (and the oracle replayable)."""
    e = load_table(spark, sf_dir, "events")
    out = timeseries.max_concurrency(
        e, "event_type", "ts", "event_id", "INTERVAL 10 MINUTES"
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("max_concurrent").cast("long").alias("max_concurrent"),
    )


@_q(
    "q_events_gaps_islands",
    """
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    r AS (SELECT user_id, day,
                 day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                               ORDER BY day) AS INT) AS grp
          FROM d),
    isl AS (SELECT user_id, grp, COUNT(*) AS island_len FROM r
            GROUP BY user_id, grp)
    SELECT CAST(island_len AS BIGINT) AS island_len,
           COUNT(*) AS n_islands,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM isl GROUP BY island_len
    """,
)
def q_events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active days per
    user (rn-difference idiom), summarized as an island-length
    histogram. The window partitions by user — distinct-day lists are
    tiny per user, so the sort is per-key and parallel at any scale."""
    e = load_table(spark, sf_dir, "events")
    isl = timeseries.activity_islands(e, "user_id", "ts")
    return isl.groupBy(F.col("island_len").cast("long").alias("island_len")).agg(
        F.count("*").alias("n_islands"),
        F.count_distinct("key").alias("n_users"),
    )


@_q(
    "q_events_ewma",
    """
    WITH w AS (
      SELECT event_id, user_id, value,
             lag(value, 1) OVER win AS l1,
             lag(value, 2) OVER win AS l2,
             lag(value, 3) OVER win AS l3,
             lag(value, 4) OVER win AS l4
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
    SELECT event_id, user_id,
           round((((value * 1.0
                    + coalesce(0.5 * l1, 0.0))
                    + coalesce(0.25 * l2, 0.0))
                    + coalesce(0.125 * l3, 0.0)
                    + coalesce(0.0625 * l4, 0.0))
                 / ((((1.0
                    + CASE WHEN l1 IS NULL THEN 0.0 ELSE 0.5 END)
                    + CASE WHEN l2 IS NULL THEN 0.0 ELSE 0.25 END)
                    + CASE WHEN l3 IS NULL THEN 0.0 ELSE 0.125 END)
                    + CASE WHEN l4 IS NULL THEN 0.0 ELSE 0.0625 END), 6)
             AS ewma
    FROM w
    """,
)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth EWMA (alpha = 0.5, depth 4) of event values per
    user: a lag-chain window expression, not recursive state — fixed
    size, codegen'd, and arithmetically identical across engines
    (weights are exact powers of two; additions associate
    left-to-right in both). Series heads renormalize over the weights
    present."""
    e = load_table(spark, sf_dir, "events")
    ew = timeseries.ewma_bounded(
        F.col("value"),
        [F.col("ts").asc(), F.col("event_id").asc()],
        F.col("user_id"),
        alpha=0.5,
        depth=4,
    )
    return e.select(
        "event_id", "user_id", F.round(ew, 6).alias("ewma")
    )


@_q(
    "q_orders_price_histogram",
    """
    WITH b AS (
      SELECT least(CAST(floor(CAST(o_totalprice AS DOUBLE) / 25000.0) AS BIGINT),
                   23) AS bucket,
             o_totalprice
      FROM orders)
    SELECT bucket,
           CAST(bucket * 25000.0 AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM b GROUP BY bucket
    """,
)
def q_orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width distribution histogram: 25k-wide price buckets with a
    top catch-all at 23 (the width_bucket idiom spelled as floor
    arithmetic so both engines run the identical IEEE ops). Map-side
    bucket derivation + one hash agg — the shape a data-profiler runs
    over 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice").cast("double") / 25000.0).cast("long"),
        F.lit(23).cast("long"),
    )
    return (
        o.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 25000.0).alias("bucket_lo"),
            "n",
            "total",
        )
    )


@_q(
    "q_events_winsorize_clip",
    """
    WITH p AS (
      SELECT event_type,
             round(quantile_cont(value, 0.05), 6) AS p05,
             round(quantile_cont(value, 0.95), 6) AS p95
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(least(greatest(e.value, p.p05), p.p95), 2)
                         AS DECIMAL(18,2))) AS DOUBLE) AS clipped_sum,
           CAST(SUM(CASE WHEN e.value < p.p05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_lo,
           CAST(SUM(CASE WHEN e.value > p.p95 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_hi
    FROM events e JOIN p USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_events_winsorize_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping at p05/p95 per event type): exact
    per-group percentiles, broadcast back onto the stream, clip, and
    re-aggregate. Percentile bounds are rounded to 6 dp BEFORE the
    comparison so both engines clip the identical row set; clipped sums
    are 2-dp-decimal exact. At 100 TB swap the exact percentile for
    approx_percentile — the join-back shape is unchanged."""
    e = load_table(spark, sf_dir, "events")
    pct = (
        e.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.05D, 0.95D))").alias("__p"))
        .select(
            "event_type",
            F.round(F.element_at("__p", 1), 6).alias("p05"),
            F.round(F.element_at("__p", 2), 6).alias("p95"),
        )
    )
    j = e.join(F.broadcast(pct), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return j.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(clipped, 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("clipped_sum"),
        F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_lo"),
        F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_hi"),
    )


@_q(
    "q_crosstab_source_lang",
    """
    WITH cells AS (
      SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
    rt AS (SELECT source, SUM(n) AS row_tot FROM cells GROUP BY source),
    ct AS (SELECT lang, SUM(n) AS col_tot FROM cells GROUP BY lang),
    tot AS (SELECT SUM(n) AS total FROM cells)
    SELECT c.source, c.lang,
           CAST(c.n AS BIGINT) AS n,
           round(c.n * 1.0 * t.total / (r.row_tot * l.col_tot), 6) AS lift
    FROM cells c
    JOIN rt r ON r.source = c.source
    JOIN ct l ON l.lang = c.lang
    CROSS JOIN tot t
    """,
)
def q_crosstab_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency cross-tab with association lift (observed /
    expected-under-independence) — the data-profiling shape behind
    chi-square drift checks. Cell counts shuffle once; row totals, col
    totals, and the 1-row grand total are all broadcast joins (the BNLJ
    on the scalar is the sanctioned 1-row cross join)."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    rt = cells.groupBy("source").agg(F.sum("n").alias("row_tot"))
    ct = cells.groupBy("lang").agg(F.sum("n").alias("col_tot"))
    tot = cells.agg(F.sum("n").alias("total"))
    return (
        cells.join(F.broadcast(rt), "source")
        .join(F.broadcast(ct), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.col("n") * 1.0 * F.col("total")
                / (F.col("row_tot") * F.col("col_tot")),
                6,
            ).alias("lift"),
        )
    )


@_q(
    "q_events_decayed_trending",
    """
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS mu FROM events),
    aged AS (
      SELECT event_type,
             CAST(floor(floor((mx.mu - epoch_us(ts)) / 86400000000.0) / 7.0)
                  AS INT) AS age_weeks
      FROM events, mx),
    sc AS (
      SELECT event_type, COUNT(*) AS n_events,
             SUM(power(2.0, -age_weeks)) AS decayed
      FROM aged GROUP BY event_type)
    SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
           round(decayed, 6) AS decayed_score,
           CAST(ROW_NUMBER() OVER (ORDER BY decayed DESC, event_type)
                AS BIGINT) AS trend_rank
    FROM sc
    """,
)
def q_events_decayed_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed activity score per event type — the
    trending/recency ranking a feed or monitoring surface computes,
    with a determinism twist: decay is 2^(−age_weeks) with an INTEGER
    exponent, so every weight is an exact dyadic rational and the
    per-type sum is order-free in doubles with no DECIMAL detour
    (the weekly bucket bounds the exponent range well inside 53 bits —
    contrast the HLL Z-sum, which outgrew that budget and went
    integer). Ages anchor on max(ts) so the query is deterministic on
    static data; one scan, one bounded agg, a |types|-row window."""
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max(F.unix_micros("ts")).alias("mu"))
    aged = e.crossJoin(F.broadcast(mx)).select(
        "event_type",
        F.floor(
            F.floor((F.col("mu") - F.unix_micros("ts")) / F.lit(86400000000.0))
            / F.lit(7.0)
        )
        .cast("int")
        .alias("age_weeks"),
    )
    sc = aged.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.pow(F.lit(2.0), -F.col("age_weeks"))).alias("decayed"),
    )
    from pyspark.sql import Window

    return sc.select(
        "event_type",
        "n_events",
        F.round(F.col("decayed"), 6).alias("decayed_score"),
        F.row_number()
        .over(Window.orderBy(F.desc("decayed"), F.asc("event_type")))
        .cast("bigint")
        .alias("trend_rank"),
    )


def _skew_profile_sql(key_col: str, table: str) -> str:
    return f"""
    SELECT '{key_col}' AS key_col,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           round(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS max_share,
           round(CAST(SUM(CASE WHEN rnk_desc <= 10 THEN c ELSE 0 END) AS DOUBLE)
                 / SUM(c), 6) AS top10_share,
           round(2.0 * SUM(i * c) / (COUNT(*) * CAST(SUM(c) AS DOUBLE))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM (
      SELECT c,
             ROW_NUMBER() OVER (ORDER BY c, k) AS i,
             ROW_NUMBER() OVER (ORDER BY c DESC, k) AS rnk_desc
      FROM (SELECT {key_col} AS k, COUNT(*) AS c FROM {table} GROUP BY 1))
    """


@_q(
    "q_join_key_skew_profile",
    _skew_profile_sql("l_suppkey", "lineitem")
    + "\n    UNION ALL\n"
    + _skew_profile_sql("l_orderkey", "lineitem"),
)
def q_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the profile you read BEFORE deciding
    to salt or skew-hint a 100 TB join: per candidate key, distinct-key
    count, hottest-key share, top-10 share, and the Gini coefficient of
    the key-count distribution (0 = uniform, →1 = one key owns the
    table), all exact-integer arithmetic until the final divisions.
    The rank windows run over the |keys|-row COUNT relation, not the
    table — the honest cost of an order statistic; at extreme key
    cardinality profile a hash-sample of keys instead."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")

    def profile(key_col: str) -> DataFrame:
        counts = li.groupBy(F.col(key_col).alias("k")).agg(
            F.count("*").alias("c")
        )
        ranked = counts.select(
            "c",
            F.row_number().over(Window.orderBy(F.asc("c"), F.asc("k"))).alias("i"),
            F.row_number()
            .over(Window.orderBy(F.desc("c"), F.asc("k")))
            .alias("rnk_desc"),
        )
        return ranked.agg(
            F.lit(key_col).alias("key_col"),
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("max_share"),
            F.round(
                F.sum(F.when(F.col("rnk_desc") <= 10, F.col("c")).otherwise(0))
                .cast("double")
                / F.sum("c"),
                6,
            ).alias("top10_share"),
            F.round(
                F.lit(2.0) * F.sum(F.col("i") * F.col("c"))
                / (F.count("*") * F.sum("c").cast("double"))
                - (F.count("*") + F.lit(1.0)) / F.count("*"),
                6,
            ).alias("gini"),
        )
    return profile("l_suppkey").unionAll(profile("l_orderkey"))
