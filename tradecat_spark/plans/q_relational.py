"""Relational core queries (joins / aggregations / set ops / top-K).

These exercise the reference's relational surface (SURVEY.md §2.3/2.4/
2.6/2.7) on the TPC-H-ish tables. Numeric policy: money sums are cast to
DECIMAL before aggregation so the sum is exact and order-independent —
Spark's parallel partial aggregation then matches the DuckDB oracle
bit-for-bit after a deterministic cast back to double. (A double sum
would differ in the last ulps depending on partition order.)

Scale notes are per-query in docstrings; the common themes: dimension
joins are broadcast, aggregations are partial (map-side combine), and
filters sit directly on the scan so they push into parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.plans.exact import cents, cents_sql, ratio6, ratio6_sql
from tradecat_spark.plans.registry import query

# Exact-money decimal: 2dp source data, products get 4-6dp; scale 12 is
# generous and keeps precision*3 within both engines' DECIMAL(38) cap.
DEC = "decimal(18,6)"
RATE = "decimal(8,6)"


def _money(c) -> Column:
    return (F.col(c) if isinstance(c, str) else c).cast(DEC)


def _rate(c) -> Column:
    """Discount/tax fractions: narrow decimal so triple products stay
    inside DECIMAL(38) without precision-loss rounding on either engine."""
    return (F.col(c) if isinstance(c, str) else c).cast(RATE)


@query(
    "tpch_q1_pricing_summary",
    survey="§2.4 A1/A5 aggregation shape",
    description="TPC-H Q1-style pricing summary over lineitem",
    bench=True,
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_base_price,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
        * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6) AS sum_disc_price,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
        * (1 - CAST(l_discount AS DECIMAL(8,6)))
        * (1 + CAST(l_tax AS DECIMAL(8,6)))) AS DOUBLE), 6) AS sum_charge,
  ROUND(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) / COUNT(*), 6) AS avg_qty,
  ROUND(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 6) / COUNT(*), 6) AS avg_price,
  ROUND(ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(8,6))) AS DOUBLE), 6) / COUNT(*), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One wide hash-aggregate over the fact table. The shipdate filter
    and 7-column projection push into the parquet scan; partial
    aggregation means the shuffle carries |groups| rows per partition."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _money("l_extendedprice") * (1 - _rate("l_discount"))
    charge = disc_price * (1 + _rate("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_money("l_quantity")).cast("double"), 6).alias("sum_qty"),
            F.round(F.sum(_money("l_extendedprice")).cast("double"), 6).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 6).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 6).alias("sum_charge"),
            F.round(F.round(F.sum(_money("l_quantity")).cast("double"), 6) / cnt, 6).alias("avg_qty"),
            F.round(F.round(F.sum(_money("l_extendedprice")).cast("double"), 6) / cnt, 6).alias("avg_price"),
            F.round(F.round(F.sum(_rate("l_discount")).cast("double"), 6) / cnt, 6).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    survey="§2.3 J3 + §2.6 top-K",
    description="Revenue top-10 unshipped-style orders (3-way join + topK)",
    bench=True,
    oracle="""
SELECT
  o.o_orderkey,
  CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
  o.o_orderpriority,
  ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
        * (1 - CAST(l.l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer is the small side → broadcast; lineitem⋈orders shuffles on
    orderkey (bucket both by orderkey at scale to co-locate). Top-K is
    TakeOrderedAndProject — no global sort. Tie-broken by orderkey so the
    LIMIT cutoff is deterministic."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.sum(_money("l_extendedprice") * (1 - _rate("l_discount")))
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue.cast("double"), 6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_region_revenue",
    survey="§2.3 multi-way dimension joins",
    description="Revenue per (region, nation): 6-way star join",
    bench=True,
    oracle="""
SELECT
  r.r_name,
  n.n_name,
  ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
        * (1 - CAST(l.l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6) AS revenue,
  COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY r.r_name, n.n_name
""",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join shape: every dimension (customer/supplier/nation/region)
    broadcasts; the only shuffle is lineitem⋈orders on orderkey plus the
    final small aggregation. This is the 100 TB-safe plan — the fact
    table is touched once, everything else rides along map-side."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(_money("l_extendedprice") * (1 - _rate("l_discount"))).cast("double"),
                6,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "top_customers_by_spend",
    survey="§2.6 W10 global top-K",
    description="Top-10 customers by total order value (global top-K + broadcast dim)",
    oracle="""
SELECT
  c.c_custkey,
  c.c_name,
  n.n_name,
  ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_spend,
  COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 10
""",
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.round(F.sum(_money("o_totalprice")).cast("double"), 6).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select("c_custkey", "c_name", "n_name", "total_spend", "n_orders")
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(10)
    )
    # Aggregate-then-join: the heavy agg runs on (custkey) before touching
    # dimension columns, so the shuffle payload is 2 numeric columns.


@query(
    "orders_with_discounted_lines",
    survey="§2.3 semi-join (reference has only Python set-ops; first-class here)",
    description="Order counts per priority where a deep-discount line exists",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.08
)
GROUP BY o.o_orderpriority
""",
)
def orders_discounted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.08)
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "customers_without_orders",
    survey="§2.3 anti-join (reference expresses as Python set difference)",
    description="Customers that never ordered, per market segment",
    oracle="""
SELECT c.c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "priority_symbol_union",
    survey="§2.7 set ops — priority-selector UNION of ranked CTEs "
    "(reference async_full_engine.py:84-106)",
    description="UNION-distinct of three top-5 customer dimensions",
    oracle="""
WITH spend AS (
  SELECT o_custkey AS c_custkey FROM orders
  GROUP BY o_custkey
  ORDER BY ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) DESC, o_custkey ASC
  LIMIT 5
), freq AS (
  SELECT o_custkey AS c_custkey FROM orders
  GROUP BY o_custkey
  ORDER BY COUNT(*) DESC, o_custkey ASC
  LIMIT 5
), big AS (
  SELECT o_custkey AS c_custkey FROM orders
  GROUP BY o_custkey
  ORDER BY CAST(MAX(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) DESC, o_custkey ASC
  LIMIT 5
)
SELECT c_custkey FROM spend
UNION
SELECT c_custkey FROM freq
UNION
SELECT c_custkey FROM big
""",
)
def priority_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's hot-symbol selector: three ranked dimensions
    UNIONed. Each branch is an agg + top-K over the same shuffled
    grouping; Catalyst reuses the exchange across branches."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_custkey").agg(
        F.sum(_money("o_totalprice")).cast("double").alias("spend"),
        F.count(F.lit(1)).alias("freq"),
        F.max(_money("o_totalprice")).cast("double").alias("big"),
    )
    def top(col: str) -> DataFrame:
        return (
            g.orderBy(F.desc(col), F.asc("o_custkey"))
            .limit(5)
            .select(F.col("o_custkey").alias("c_custkey"))
        )
    return top("spend").union(top("freq")).union(top("big")).distinct()


@query(
    "nation_revenue_share",
    survey="§2.3 J6 market-share window (reference engine.py:282-332 does "
    "this as a cross-DB UPDATE; here it is one window expression)",
    description="Each nation's share of its region's revenue",
    oracle="""
WITH rev AS (
  SELECT
    r.r_name, n.n_name,
    ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT
  r_name, n_name, revenue,
  SHARE_EXPR AS region_share
FROM rev
""".replace(
        "SHARE_EXPR",
        ratio6_sql(
            cents_sql("revenue"),
            f"SUM({cents_sql('revenue')}) OVER (PARTITION BY r_name)",
        ),
    ),
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(_money("o_totalprice")).cast("double"), 6).alias("revenue"))
    )
    w = Window.partitionBy("r_name")
    return rev.select(
        "r_name",
        "n_name",
        "revenue",
        ratio6(cents(F.col("revenue")), F.sum(cents(F.col("revenue"))).over(w))
        .alias("region_share"),
    )


@query(
    "tpch_q6_forecast_revenue",
    survey="§2.2 P-family selective scan + §2.4 global agg: TPC-H Q6 — "
    "the canonical pushed-predicate single-table aggregate",
    description="TPC-H Q6: revenue from discounted small-quantity 1996 lineitems",
    oracle="""
SELECT
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
        * CAST(l_discount AS DECIMAL(8,6))) AS DOUBLE), 6) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four predicates push to the parquet scan (range on shipdate
    prunes row groups); the aggregate is one map-side-combined global
    sum — the plan every columnar engine should produce."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate")
             >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate")
               < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(_money("l_extendedprice") * _rate("l_discount"))
                .cast("double"),
                6,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q14_promo_effect",
    survey="§2.3 fact-dim join + §2.4 conditional agg: TPC-H Q14 — "
    "promo revenue share with the part table broadcast",
    description="TPC-H Q14: promo revenue percentage for 1996-03",
    oracle="""
SELECT
  ROUND(100.0 * ROUND(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
      THEN CAST(l_extendedprice AS DECIMAL(18,6))
           * (1 - CAST(l_discount AS DECIMAL(8,6)))
      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE), 6)
    / ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
        * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6), 6)
    AS promo_revenue_pct,
  ROUND(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
      THEN CAST(l_extendedprice AS DECIMAL(18,6))
           * (1 - CAST(l_discount AS DECIMAL(8,6)))
      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE), 6) AS promo_revenue,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
      * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6)
    AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
""",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part broadcasts against the month-pruned lineitem scan; both
    sums are DECIMAL (order-free), rounded once, and the percentage is
    one float division over the two rounded doubles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_price = _money("l_extendedprice") * (1 - _rate("l_discount"))
    promo = F.when(
        F.col("p_type").like("PROMO%"), disc_price
    ).otherwise(F.lit(0).cast("decimal(18,6)"))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    agg = j.agg(
        F.round(F.sum(promo).cast("double"), 6).alias("promo_revenue"),
        F.round(F.sum(disc_price).cast("double"), 6).alias("total_revenue"),
    )
    return agg.select(
        F.round(
            100.0 * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_revenue_pct"),
        "promo_revenue",
        "total_revenue",
    )


@query(
    "tpch_q10_returned_items",
    survey="§2.3 multi-join + §2.6 top-K: TPC-H Q10 — top-20 customers "
    "by returned-item revenue, dims broadcast, TakeOrdered limit",
    description="TPC-H Q10: top-20 customers by 1996-Q1 returned revenue",
    oracle="""
SELECT c_custkey, c_name, n_name,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
      * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-pruned orders and the 'R' flag push to the scans; nation
    and customer broadcast; the final top-20 is a TakeOrdered (no full
    sort), tie-broken on the customer key so the cutoff is
    deterministic."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate")
           < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    disc_price = _money("l_extendedprice") * (1 - _rate("l_discount"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.round(F.sum(disc_price).cast("double"), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


@query(
    "tpch_q4_order_priority",
    survey="§2.3 semi-join family: TPC-H Q4 shape — EXISTS with a "
    "correlated inter-column predicate, adapted to the driver schema "
    "(no l_commitdate/l_receiptdate; 'late line' = shipped >= 90 days "
    "after the order date)",
    description="TPC-H Q4 (adapted): 1996-H1 order counts per priority "
    "where some lineitem shipped >= 90 days after ordering",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
""",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS compiles to a LEFT SEMI join on the order key with the
    90-day lag as a residual join condition — one shuffle on orderkey,
    no row multiplication however many lines match, and the half-year
    scan predicate pushes to the orders parquet scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate")
           < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"]
           >= o["o_orderdate"] + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "tpch_q12_priority_class",
    survey="§2.4 conditional-CASE aggregation over a fact-fact join: "
    "TPC-H Q12 shape, adapted (no l_shipmode; classes come from "
    "l_returnflag, priority split unchanged)",
    description="TPC-H Q12 (adapted): high/low-priority line counts per "
    "return flag for 1996 shipments",
    oracle="""
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
""",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year predicate pushes to the lineitem scan BEFORE the join, so
    the shuffle carries only the matching year; both CASE counts ride
    the same partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint")
            .alias("low_line_count"),
        )
    )


@query(
    "tpch_q18_large_orders",
    survey="§2.4 HAVING-filtered aggregate joined back to dims + §2.6 "
    "top-K: TPC-H Q18 — large-quantity orders (threshold 180 for the "
    "driver's quantity domain)",
    description="TPC-H Q18 (adapted): top-20 orders with total quantity "
    "> 180, with customer and order info",
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
  ROUND(CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE), 6)
    AS o_totalprice,
  SUM(l_quantity) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(l_quantity) > 180
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT 20
""",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantity rollup happens FIRST on the narrow (orderkey, qty)
    projection and the >180 HAVING prunes before any join — the
    surviving order set is tiny, so the orders and customer joins are
    effectively dim joins and the final top-20 is a TakeOrdered.
    Quantities are integer-valued doubles (< 2^53), so the sum is
    order-independent-exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    j = (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    )
    return j.select(
        "c_name", "c_custkey", "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        F.round(_money("o_totalprice").cast("double"), 6)
        .alias("o_totalprice"),
        "total_qty",
    ).orderBy(F.desc("total_qty"), F.asc("o_orderkey")).limit(20)


@query(
    "tpch_q19_bracket_revenue",
    survey="§2.2 disjunctive predicate pushdown + §2.3 broadcast join: "
    "TPC-H Q19 — OR'd brand/size/quantity brackets (no p_container in "
    "the driver schema; size stands in)",
    description="TPC-H Q19 (adapted): revenue from three OR'd "
    "brand/size/quantity brackets",
    oracle="""
SELECT
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
      * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6)
    AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE
     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      AND l_quantity BETWEEN 1 AND 11)
  OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
      AND l_quantity BETWEEN 10 AND 20)
  OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
      AND l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The brand∈{12,13,14} and quantity<=30 implied conjuncts are
    derivable from the disjunction, so Catalyst pushes them below the
    join (constraint propagation); part broadcasts; the full OR runs
    as the residual join filter."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    bracket = (
        ((brand == "Brand#12") & size.between(1, 15) & qty.between(1, 11))
        | ((brand == "Brand#13") & size.between(1, 25) & qty.between(10, 20))
        | ((brand == "Brand#14") & size.between(1, 35) & qty.between(20, 30))
    )
    disc_price = _money("l_extendedprice") * (1 - _rate("l_discount"))
    return j.filter(bracket).agg(
        F.round(F.sum(disc_price).cast("double"), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q7_volume_shipping",
    survey="§2.3 two-path dim resolution on one fact row: TPC-H Q7 — "
    "supplier nation × customer nation trade volume per year "
    "(NATION_12/NATION_11 stand in for FRANCE/GERMANY — chosen "
    "non-empty even at sf0.001 so the local oracle test is not vacuous)",
    description="TPC-H Q7 (adapted): bilateral NATION_12/NATION_11 "
    "shipping volume per ship year",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
  ROUND(CAST(SUM(volume) AS DOUBLE), 6) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
    CAST(l_extendedprice AS DECIMAL(18,6))
      * (1 - CAST(l_discount AS DECIMAL(8,6))) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_11')
      OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_12'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One fact row resolves TWO independent dimension paths (supplier
    nation and customer nation); all four dims broadcast, the nation
    pair disjunction runs as a residual after the joins, and the
    two-year range pushes to the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount",
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    j = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cu), o["o_custkey"] == cu["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_12")
                & (F.col("cust_nation") == "NATION_11")
            )
            | (
                (F.col("supp_nation") == "NATION_11")
                & (F.col("cust_nation") == "NATION_12")
            )
        )
    )
    volume = _money("l_extendedprice") * (1 - _rate("l_discount"))
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(
        F.round(F.sum(volume).cast("double"), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q8_market_share",
    survey="§2.4 conditional share-of-total over a 5-dim star: TPC-H Q8 "
    "— NATION_1's share of AMERICA-customer revenue per year for one "
    "part type",
    description="TPC-H Q8 (adapted): NATION_1 supplier market share in "
    "AMERICA per order year",
    oracle=f"""
SELECT l_year,
  {ratio6_sql(
      "CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' "
      "THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END) * 100) AS BIGINT)",
      "CAST(ROUND(SUM(volume) * 100) AS BIGINT)",
  )} AS mkt_share,
  ROUND(CAST(SUM(volume) AS DOUBLE), 6) AS total_volume,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS l_year,
    n1.n_name AS supp_nation,
    CAST(l_extendedprice AS DECIMAL(18,6))
      * (1 - CAST(l_discount AS DECIMAL(8,6))) AS volume
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE r_name = 'AMERICA'
    AND p_type LIKE 'PROMO%'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY l_year
""",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five broadcast dims around one fact scan; the share is a
    conditional decimal sum over the total decimal sum, computed via
    the exact scaled-integer ``ratio6`` so the Spark/DuckDB midpoint
    behavior is identical (volumes are DECIMAL(·,6), so ×100 … the
    cents trick generalized — keeps both operands exact int64)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount",
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").like("PROMO%")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate")
           < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    n2 = n.join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    ).select(F.col("n_nationkey").alias("n2_key"))
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cu), o["o_custkey"] == cu["c_custkey"])
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    )
    volume = _money("l_extendedprice") * (1 - _rate("l_discount"))
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", volume)
        .otherwise(F.lit(0).cast("decimal(18,6)"))
    )
    total_vol = F.sum(volume)
    return j.groupBy(
        F.year("o_orderdate").cast("bigint").alias("l_year")
    ).agg(
        ratio6(
            F.round(nation_vol * 100).cast("bigint"),
            F.round(total_vol * 100).cast("bigint"),
        ).alias("mkt_share"),
        F.round(total_vol.cast("double"), 6).alias("total_volume"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q15_top_supplier",
    survey="§2.4/§2.6 share-the-aggregate shape: TPC-H Q15 — the "
    "revenue 'view' reused for both the per-supplier rows and the "
    "MAX threshold (no second scan of the fact table)",
    description="TPC-H Q15 (adapted): supplier(s) with maximum "
    "1996-Q1 revenue",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
        * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6)
      AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic Q15 'view reused twice' shape realized as ONE
    physical pass: the MAX threshold is an unpartitioned window over
    the |suppliers|-row rollup output (tiny — never the fact table), so
    the quarter's lineitem scan and aggregation execute exactly once
    (a broadcast-join formulation would re-execute the rollup subtree
    for the scalar side). Comparing the ROUNDED doubles keeps the
    equality test identical on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    disc_price = _money("l_extendedprice") * (1 - _rate("l_discount"))
    revenue = li.groupBy(
        F.col("l_suppkey").alias("supplier_no")
    ).agg(
        F.round(F.sum(disc_price).cast("double"), 6)
        .alias("total_revenue")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    w = Window.partitionBy()  # over the rollup output, not the fact
    top = revenue.withColumn(
        "mx_rev", F.max("total_revenue").over(w)
    ).filter(F.col("total_revenue") == F.col("mx_rev"))
    return (
        top.join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q17_small_qty_revenue",
    survey="§2.4 correlated-average subquery: TPC-H Q17 — lines under "
    "20% of their part's average quantity, as ONE window pass instead "
    "of a per-part rescan",
    description="TPC-H Q17 (adapted): weekly-ized revenue of "
    "small-quantity orders for one brand",
    oracle="""
SELECT
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
    / 7.0, 6) AS avg_yearly,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM (
  SELECT l_extendedprice, l_quantity,
    AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#12'
)
WHERE l_quantity < 0.2 * avg_qty
""",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic correlated ``l_quantity < 0.2 * (SELECT AVG ...)``
    decorrelates into one window average per part over the
    brand-pruned join — no per-part rescan, no second shuffle beyond
    the window's own. Quantities are integer-valued doubles, so the
    window AVG (exact sum / count) is order-independent and the 0.2×
    comparison lands identically on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#12"
    ).select("p_partkey")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    w = Window.partitionBy("l_partkey")
    small = j.withColumn(
        "avg_qty", F.avg("l_quantity").over(w)
    ).filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    return small.agg(
        F.round(
            F.sum(_money("l_extendedprice")).cast("double") / 7.0, 6
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q22_global_sales_opportunity",
    survey="§2.3 anti-join + scalar-subquery threshold: TPC-H Q22 — "
    "rich never-ordered customers per segment (c_custkey % 7 stands in "
    "for the phone country code the driver schema lacks)",
    description="TPC-H Q22 (adapted): above-average-balance customers "
    "with no orders, counted per derived segment",
    oracle="""
WITH thresh AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
    CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s_cents
  FROM customer WHERE c_acctbal > 0.0
)
SELECT CAST(c_custkey % 7 AS BIGINT) AS cntrycode,
  CAST(COUNT(*) AS BIGINT) AS numcust,
  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 6)
    AS totacctbal
FROM customer, thresh
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * n_pos > s_cents
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY 1
""",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar threshold broadcasts as a 1-row side; NOT EXISTS is a
    LEFT ANTI join on the customer key against the date-pruned orders
    scan (no RECENT orders — lapsed customers; 'no orders ever' is
    empty on the driver data and would gate a trivial hash). The
    'balance above average' test is INTEGER-exact:
    ``cents(bal) · n_pos > Σcents`` avoids both the order-dependent
    double SUM and the division — a double AVG threshold can flip a
    borderline customer between engines (the same midpoint/ulp class
    exact.mean6 exists for); c_acctbal is 2dp so cents are exact."""
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    thresh = cu.filter(F.col("c_acctbal") > 0.0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(cents(F.col("c_acctbal"))).alias("s_cents"),
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate")
        >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    rich = cu.crossJoin(F.broadcast(thresh)).filter(
        cents(F.col("c_acctbal")) * F.col("n_pos") > F.col("s_cents")
    )
    never = rich.join(
        o, rich["c_custkey"] == o["o_custkey"], "left_anti"
    )
    return never.groupBy(
        (F.col("c_custkey") % 7).cast("bigint").alias("cntrycode")
    ).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum(_money("c_acctbal")).cast("double"), 6)
        .alias("totacctbal"),
    )


@query(
    "tpch_q20_excess_shippers",
    survey="§2.3/§2.4 nested correlated aggregate + IN-chain: TPC-H "
    "Q20 — the part→partsupp→supplier subquery ladder re-expressed on "
    "the reduced schema (availqty stands in as the pair's all-time "
    "shipped quantity; the 0.5× correlated SUM survives verbatim)",
    description="TPC-H Q20 (adapted): suppliers with 1996-concentrated "
    "'red' part shipments (year share > 25%, ~1.75x uniform — "
    "scale-free: the fixed-0.5 form went empty at sf0.1)",
    oracle="""
SELECT s_suppkey, s_name, n_name, s_acctbal
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l_suppkey, l_partkey
  HAVING COUNT(*) >= 3
     AND SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                  THEN l_quantity ELSE 0 END) * 4 > SUM(l_quantity)
)
""",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's two IN-subqueries decorrelate into (a) a broadcast semi of
    the name-pruned part keys into the lineitem scan and (b) ONE
    (supplier, part) aggregation whose HAVING carries the correlated
    ``> 0.5 * SUM`` test as a conditional sum — no per-pair rescan.
    The qualifying pair set collapses to distinct supplier keys (tiny:
    bounded by |supplier|), which drives a left-semi against the
    supplier dim. Quantities are integer-valued doubles, so the sums
    and the 0.5× comparison are exact on both engines. At 100 TB the
    only wide shuffle is the pair aggregation, keyed by (suppkey,
    partkey) — naturally high-cardinality, skew-free."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    in_96 = (
        (F.col("l_shipdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    pairs = (
        li.join(F.broadcast(red), li["l_partkey"] == red["p_partkey"],
                "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(in_96, F.col("l_quantity")).otherwise(0.0))
            .alias("qty_96"),
            F.sum("l_quantity").alias("qty_all"),
        )
        .filter((F.col("n_lines") >= 3)
                & (F.col("qty_96") * 4 > F.col("qty_all")))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(pairs, s["s_suppkey"] == pairs["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )


@query(
    "tpch_q21_suppliers_kept_waiting",
    survey="§2.3 triple-correlated EXISTS/NOT EXISTS: TPC-H Q21 — "
    "multi-supplier failed orders where exactly this supplier shipped "
    "late (lateness adapted to shipdate > orderdate + 90 days; the "
    "reduced lineitem has no commit/receipt dates)",
    description="TPC-H Q21 (adapted): suppliers who alone were late "
    "on failed multi-supplier orders, top 100 by wait count",
    oracle="""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hardest TPC-H join shape: l1 (late lines of failed orders)
    survives an EXISTS (another supplier on the order → LEFT SEMI on
    orderkey with a suppkey≠ residual) and a NOT EXISTS (no OTHER late
    supplier → LEFT ANTI against the same late set). Both correlations
    compile to single shuffle joins keyed on l_orderkey — no per-row
    rescans, no cartesian (plan-asserted). The anti join's right side
    reuses the already-filtered late set, so its input is the small
    side. Top-100 is a TakeOrderedAndProject over the per-supplier
    counts (|suppliers| rows), never a global sort of the fact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    kept = (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        kept.join(F.broadcast(s), kept["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "tpch_q2_min_cost_supplier",
    survey="§2.3/§2.4 correlated-MIN subquery over a 4-dim join chain: "
    "TPC-H Q2 — supply cost re-derived as the pair's minimum observed "
    "unit price (the reduced schema has no partsupp)",
    description="TPC-H Q2 (adapted): cheapest ASIA supplier per "
    "LARGE size-25 part, top 100 by balance",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
    MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
),
asia AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'
),
cand AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
    unit_cost,
    MIN(unit_cost) OVER (PARTITION BY p_partkey) AS best
  FROM part
  JOIN cost ON l_partkey = p_partkey
  JOIN asia ON s_suppkey = l_suppkey
  WHERE p_size = 25 AND p_type = 'LARGE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
  ROUND(unit_cost, 6) AS unit_cost
FROM cand WHERE unit_cost = best
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated ``= (SELECT MIN(ps_supplycost) ...)`` becomes a
    window MIN over the per-part candidate set — computed once, after
    the region/size/type filters prune the candidates, never as a
    per-part rescan. The unit cost is a deterministic selection (MIN of
    identical doubles on both engines). Supplier/nation/region dims
    broadcast; the one wide shuffle is the (part, supplier) cost
    rollup. Top-100 is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity"))
        .alias("unit_cost")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 25) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_name")
    cand = (
        cost.join(F.broadcast(p), cost["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(asia), cost["l_suppkey"] == asia["s_suppkey"])
    )
    w = Window.partitionBy("p_partkey")
    best = cand.withColumn("best", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best")
    )
    return (
        best.select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q9_product_type_profit",
    survey="§2.4 multi-fact star + derived-cost aggregation: TPC-H Q9 "
    "— profit per (nation, year), supply cost re-derived as 60% of "
    "the part's retail price (deterministic, decimal-exact)",
    description="TPC-H Q9 (adapted): profit on 'blue' parts per "
    "supplier nation and order year",
    oracle="""
SELECT n_name AS nation,
  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
  ROUND(CAST(SUM(
    CAST(l_extendedprice AS DECIMAL(18,6))
      * (1 - CAST(l_discount AS DECIMAL(8,6)))
    - CAST(p_retailprice AS DECIMAL(18,6)) * CAST(0.6 AS DECIMAL(8,6))
      * CAST(l_quantity AS DECIMAL(18,6))
  ) AS DOUBLE), 6) AS sum_profit,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%blue%'
GROUP BY 1, 2
""",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table star around one lineitem scan: orders joins on the
    order key (the only fact-fact edge), part/supplier/nation all
    broadcast. The profit expression runs entirely in DECIMAL so the
    per-group sums are exact and partition-order-independent. The
    name-LIKE filter prunes via the broadcast part side before any
    arithmetic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%blue%")
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        _money("l_extendedprice") * (1 - _rate("l_discount"))
        - _money("p_retailprice") * F.lit(0.6).cast(RATE)
        * _money("l_quantity")
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("bigint").alias("o_year"),
    ).agg(
        F.round(F.sum(profit).cast("double"), 6).alias("sum_profit"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q11_important_stock",
    survey="§2.4 scalar-subquery threshold over a grouped value: TPC-H "
    "Q11 — per-part value share vs a global fraction, the compare kept "
    "decimal-exact (no double AVG midpoints)",
    description="TPC-H Q11 (adapted): parts whose NATION_3 traded "
    "value exceeds 3x the per-part average (the classic 0.0001/SF "
    "scale-relative threshold; a fixed fraction went empty at sf0.1)",
    oracle="""
WITH natval AS (
  SELECT l_partkey,
    SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
),
total AS (
  SELECT SUM(val) AS tot, CAST(COUNT(*) AS BIGINT) AS n_parts FROM natval
)
SELECT l_partkey AS p_partkey,
  ROUND(CAST(val AS DOUBLE), 6) AS part_value
FROM natval, total
WHERE val * n_parts > 3 * tot
""",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic 'GROUP BY HAVING > (scalar subquery)': the per-part
    rollup materializes ONCE; the threshold is an aggregate of that
    tiny rollup broadcast back as a 1-row side (never a second fact
    scan). The share test compares DECIMAL-sum × integer part-count
    against 3 × the DECIMAL total — all integer/decimal arithmetic, no
    double fraction — so it is exact on both engines AND
    scale-relative (a fixed fraction went empty at sf0.1)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    ).select("n_nationkey")
    nat_sup = s.join(
        F.broadcast(n), s["s_nationkey"] == n["n_nationkey"], "left_semi"
    )
    natval = (
        li.join(F.broadcast(nat_sup), li["l_suppkey"] == nat_sup["s_suppkey"],
                "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_money("l_extendedprice")).alias("val"))
    )
    total = natval.agg(
        F.sum("val").alias("tot"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        natval.crossJoin(F.broadcast(total))
        .filter(F.col("val") * F.col("n_parts") > 3 * F.col("tot"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("val").cast("double"), 6).alias("part_value"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    survey="§2.3/§2.4 outer join + double aggregation: TPC-H Q13 — "
    "order-count distribution incl. zero-order customers (the comment "
    "exclusion adapted to priority, the reduced schema has no "
    "o_comment)",
    description="TPC-H Q13 (adapted): distribution of per-customer "
    "non-urgent order counts",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter lives INSIDE the outer join condition (a WHERE would
    silently drop the zero-order customers the query exists to count).
    Two aggregations: per-customer count, then the count histogram —
    the second group-by input is |customers| rows, so its shuffle is
    trivial at any scale."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    j = c.join(
        o,
        (c["c_custkey"] == o["o_custkey"])
        & (o["o_orderpriority"] != "1-URGENT"),
        "left_outer",
    )
    per_cust = j.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "tpch_q16_parts_supplier_counts",
    survey="§2.3/§2.4 anti-join + COUNT DISTINCT rollup: TPC-H Q16 — "
    "supplier variety per part family, the complaint exclusion adapted "
    "to negative balance (no s_comment in the reduced schema)",
    description="TPC-H Q16 (adapted): distinct good-standing suppliers "
    "per (brand, type, size) part family",
    oracle="""
SELECT p_brand, p_type, p_size,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type <> 'SMALL'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY 1, 2, 3
""",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN compiles to a LEFT ANTI against the (tiny) excluded
    supplier set; the part family filters ride the broadcast dim into
    the distinct-pair rollup. COUNT(DISTINCT) over the deduplicated
    pair set shuffles once on the family key."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    ).distinct()
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "SMALL")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    kept = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"],
              "left_anti")
    )
    return kept.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt")
    )
