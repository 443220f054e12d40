"""Query registry, part 6: the remainder of the TPC-H-shaped relational
suite (Q2/Q4/Q7–Q9/Q11–Q22), adapted to the driver's subsetted star
schema (TESTDATA.md — no ``partsupp``, no commit/receipt dates, no
comment/address columns).

Why these exist: registry.py carries Q1/Q3/Q5/Q6/Q10 as the headline
relational shapes; a user of a complete engine expects the *whole*
decision-support pattern family — correlated scalar subqueries over
aggregates (Q2/Q15/Q17), EXISTS/NOT-EXISTS with inequality correlation
(Q4/Q21/Q22), disjunctive multi-predicate scans (Q19), two-level
aggregation (Q13/Q16), global-ratio reports (Q8/Q11/Q14/Q20). Each is
re-derived from the public TPC-H spec against the available columns
(adaptations documented per query) and oracle-paired with DuckDB SQL.

Scale notes (the 100 TB story, per shape):

* Fact-fact self-correlations (Q21) are expressed as semi/anti joins on
  ``l_orderkey`` — co-partitioned shuffles, no nested-loop EXISTS.
* Per-group scalar thresholds (Q11/Q15/Q17/Q20) compute the aggregate
  once and broadcast the single-row (or per-key, shuffle-joined)
  threshold — never a recomputed correlated subquery per row.
* Dimension joins broadcast (supplier/part/nation/region are tiny next
  to lineitem at any sf); the only big shuffles are on fact keys.
* All money math is decimal-exact; ratios divide at the end in double
  (see registry.py module docstring for the cross-engine rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.plans.registry import _dec, _dsum, _q
from reddit_apache_airflow_postgres_pipeline_spark.sources.tables import load_table


def _rev():
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


@_q(
    "q02_min_cost_supplier",
    """
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
      SELECT s.s_suppkey, s.s_name, n.n_name
      FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'),
    ec AS (
      SELECT c.l_partkey, c.cost, e.s_name, e.n_name
      FROM costs c JOIN eu e ON c.l_suppkey = e.s_suppkey),
    m AS (SELECT l_partkey, MIN(cost) AS min_cost FROM ec GROUP BY l_partkey)
    SELECT p.p_partkey AS p_partkey, p.p_name AS p_name,
           ec.s_name AS s_name, ec.n_name AS n_name,
           CAST(ec.cost AS DOUBLE) AS cost
    FROM ec
      JOIN m ON ec.l_partkey = m.l_partkey AND ec.cost = m.min_cost
      JOIN part p ON p.p_partkey = ec.l_partkey
    WHERE p.p_size BETWEEN 10 AND 30 AND p.p_type = 'LARGE'
    """,
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier per part). Adaptation: no
    ``partsupp``, so supply cost = MIN observed ``l_extendedprice`` per
    (part, supplier) from lineitem. The correlated min-subquery becomes
    a per-part min aggregate shuffle-joined back on (partkey, cost) —
    decimal equality is exact. Region/nation/supplier broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") >= 10) & (F.col("p_size") <= 30) & (F.col("p_type") == "LARGE")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("cost")
    )
    ec = costs.join(F.broadcast(eu), costs.l_suppkey == eu.s_suppkey).select(
        "l_partkey", "cost", "s_name", "n_name"
    )
    m = ec.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    return (
        ec.join(m, ["l_partkey"])
        .filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.col("cost").cast("double").alias("cost"),
        )
    )


@_q(
    "q04_order_priority_check",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (late-order priority census). Adaptation: no
    commit/receipt dates, so "late" = any lineitem shipped >30 days
    after the order date. EXISTS → left-semi join on l_orderkey with
    the inequality in the join condition (co-partitioned shuffle, no
    per-row subquery)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = li.select("l_orderkey", "l_shipdate")
    return (
        o.join(
            late,
            (o.o_orderkey == late.l_orderkey)
            & (late.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@_q(
    "q07_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           CAST(SUM({rev}) AS DOUBLE) AS revenue
    FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, YEAR(l.l_shipdate)
    """.format(rev="CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))"),
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. Two broadcast nation joins (aliased dims), symmetric
    pair predicate, fact-side group-by."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@_q(
    "q08_market_share",
    """
    WITH base AS (
      SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
             {rev} AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT o_year,
           ROUND(COALESCE(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                        THEN volume END) AS DOUBLE), 0.0)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM base GROUP BY o_year
    """.format(rev="CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))"),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of ECONOMY-part revenue inside
    the AMERICA customer region, by order year. Conditional-sum ratio,
    decimal sums, double division at the end only."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey"))
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_rkey") == r.r_regionkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    nat = F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")))
    return base.groupBy("o_year").agg(
        F.round(
            F.coalesce(nat.cast("double"), F.lit(0.0))
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@_q(
    "q09_product_type_profit",
    """
    SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    - CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
    FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
    """,
)
def q09_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier nation and year). Adaptation:
    no ``ps_supplycost``, so cost = ``p_retailprice * l_quantity``.
    Decimal subtraction keeps the sum order-free exact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = _rev() - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@_q(
    "q11_important_stock",
    """
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS value
    FROM pv
    WHERE CAST(value AS DOUBLE) >
          (SELECT 1.4 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(DISTINCT l_partkey)
           FROM lineitem)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (parts holding an outsized share of total value).
    Adaptation: value = lineitem extendedprice mass per part (no
    partsupp), and the spec's 1/SF-scaled fraction becomes a scale-free
    "1.4× the average per-part value" so the predicate stays selective
    at every sf. The global threshold is ONE scalar aggregate broadcast
    to the per-part relation — not a correlated subquery per row; at
    100 TB that is one extra reduce over an already-scanned column."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(_dec("l_extendedprice")).alias("value"))
    total = li.agg(
        (
            F.lit(1.4)
            * F.sum(_dec("l_extendedprice")).cast("double")
            / F.countDistinct("l_partkey")
        ).alias("__thr")
    )
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("__thr"))
        .select(F.col("l_partkey").alias("p_partkey"), F.col("value").cast("double").alias("value"))
    )


@_q(
    "q12_ship_lag_priority",
    """
    SELECT CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate) <= 30
                THEN 'FAST' ELSE 'SLOW' END AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q12_ship_lag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (priority census by shipping class). Adaptation:
    no ``l_shipmode``, the class is the order→ship lag bucketed at 30
    days. Classic conditional-count pivot over one fact join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30, "FAST"
    ).otherwise("SLOW")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@_q(
    "q13_customer_order_distribution",
    """
    WITH co AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                           AND o.o_orderstatus <> 'P'
      GROUP BY c.c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation — orders per customer
    (COUNT over a filtered LEFT JOIN, nulls counting as zero), then the
    distribution of those counts. Second group-by is tiny (distinct
    counts), so the only real shuffle is the per-customer one."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count("*").alias("custdist"))


@_q(
    "q14_promo_revenue",
    """
    SELECT ROUND(100.0 * COALESCE(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l.l_discount AS DECIMAL(18,2))) END) AS DOUBLE), 0.0)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
           AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue from PROMO
    parts. Broadcast part join, single global conditional-sum ratio."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _rev()))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.coalesce(promo.cast("double"), F.lit(0.0))
                / F.sum(_rev()).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@_q(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM({rev}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
           CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """.format(rev=_REV_SQL),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The MAX is one scalar aggregate over the 100-row revenue relation,
    broadcast back for an exact decimal equality filter — ties kept,
    like the spec's view formulation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("__mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@_q(
    "q16_part_supplier_counts",
    """
    SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 49, 50)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (distinct suppliers per brand/type/size).
    Adaptation: the part↔supplier relation comes from lineitem (no
    partsupp; no supplier-complaint NOT IN — no comment column).
    COUNT(DISTINCT) over a broadcast-joined fact scan: Spark plans the
    standard two-phase distinct-aggregate (partial per partition, exact
    global) — no row explosion beyond the group keys."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 49, 50)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "q17_small_quantity_revenue",
    """
    WITH pa AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < 0.2 * pa.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders. The
    correlated per-part AVG becomes one per-part aggregate shuffle-
    joined back to the fact (both sides partitioned on l_partkey — AQE
    reuses the exchange). Threshold math in double, identical
    expression tree both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    pa = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (_dsum("l_quantity") / F.count("*")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == F.col("pa_key"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (_dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@_q(
    "q18_large_volume_customer",
    """
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
    SELECT c.c_name AS c_name, c.c_custkey AS c_custkey,
           o.o_orderkey AS o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_totalprice AS o_totalprice,
           CAST(b.sum_qty AS DOUBLE) AS sum_qty
    FROM big b
      JOIN orders o ON o.o_orderkey = b.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind >300-unit orders, top 100 by
    order price. The HAVING pre-aggregate shrinks the fact before any
    join; order tie-broken on o_orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@_q(
    "q19_discounted_revenue",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive cross-table predicate (brand ×
    size × quantity bands). The join stays an equi-join on partkey with
    the OR-of-ANDs applied as a post-join filter — Catalyst still pushes
    the per-table conjuncts common to all branches; no theta-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@_q(
    "q20_promo_part_suppliers",
    """
    WITH sp AS (
      SELECT l.l_suppkey,
             SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01'
                       AND l.l_shipdate <  TIMESTAMP '1998-01-01'
                      THEN CAST(l.l_quantity AS DECIMAL(18,2)) END) AS qty97,
             SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty_all
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO'
      GROUP BY l.l_suppkey)
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, n.n_name AS n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN
          (SELECT l_suppkey FROM sp
           WHERE COALESCE(CAST(qty97 AS DOUBLE), 0.0)
                 > 0.18 * CAST(qty_all AS DOUBLE))
    """,
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with excess availability of promo
    parts). Adaptation: no ``ps_availqty``, so the predicate is "shipped
    >18% of their all-time PROMO quantity during 1997" (the data spans
    1995–2001, so uniform shipping ≈14%/yr — 18% selects the top ~10%
    of suppliers at every sf) — same nested aggregate + IN-subquery
    shape. The IN becomes a left-semi join on the tiny aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    in97 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    sp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in97, _dec("l_quantity"))).alias("qty97"),
            F.sum(_dec("l_quantity")).alias("qty_all"),
        )
        .filter(
            F.coalesce(F.col("qty97").cast("double"), F.lit(0.0))
            > F.lit(0.18) * F.col("qty_all").cast("double")
        )
    )
    return (
        s.join(F.broadcast(sp), s.s_suppkey == sp.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@_q(
    "q21_suppliers_kept_waiting",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_linenumber
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    SELECT s.s_name AS s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    finished multi-supplier order. Adaptation: "late" = shipped >60 days
    after the order date (no receipt/commit dates). EXISTS/NOT-EXISTS
    with inequality correlation → left-semi + left-anti self-joins on
    l_orderkey; all three relations shuffle on the same key, so AQE
    lines them up without extra exchanges."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey", "l_linenumber")
    )
    l1 = late
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    survivors = (
        l1.join(l2, (l1.l_orderkey == F.col("k2")) & (l1.l_suppkey != F.col("s2")), "left_semi")
        .join(l3, (l1.l_orderkey == F.col("k3")) & (l1.l_suppkey != F.col("s3")), "left_anti")
    )
    return (
        survivors.join(F.broadcast(s), survivors.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@_q(
    "q22_global_sales_opportunity",
    """
    WITH pool AS (
      SELECT c_custkey, c_acctbal, c_nationkey FROM customer
      WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'HOUSEHOLD')),
    thr AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_bal
      FROM pool WHERE c_acctbal > 0.0)
    SELECT n.n_name AS n_name,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(p.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM pool p JOIN nation n ON p.c_nationkey = n.n_nationkey, thr
    WHERE p.c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = p.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone quiet, by nation.
    Adaptations: the phone-prefix filter becomes a market-segment pool
    (no phone column), and "never ordered" becomes "no order since
    2000-01-01" — with ~10 orders/customer in this data an absolute
    anti-join is empty at every sf; the recency form keeps the
    NOT-EXISTS shape selective. Scalar average broadcast; NOT EXISTS →
    left-anti join against recent-order custkeys."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY", "HOUSEHOLD")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    n = load_table(spark, sf_dir, "nation")
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        (_dsum("c_acctbal") / F.count("*")).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            _dsum("c_acctbal").alias("totacctbal"),
        )
    )
