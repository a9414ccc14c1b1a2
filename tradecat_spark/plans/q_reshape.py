"""Reshaping & grouping-sets operators — pivot, ROLLUP/GROUPING,
unpivot.

The three relational reshape primitives every BI/reporting layer sits
on, exercised through Spark's first-class APIs (``groupBy().pivot()``,
``rollup()`` + ``F.grouping``, ``DataFrame.unpivot``) rather than
hand-rolled CASE pyramids — Catalyst plans a pivot as ONE aggregate
pass and a rollup as a single expand+aggregate, which is the shape that
survives scale. Oracles state the same results as plain conditional
aggregation / GROUP BY ROLLUP / UNION ALL, all integer- or
decimal-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.plans.registry import query

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _wide_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """day × event_type counts via one explicit-list pivot pass —
    shared by the pivot and unpivot queries."""
    e = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_type"
    )
    return (
        e.groupBy("day")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            *[
                F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
                for t in EVENT_TYPES
            ],
        )
    )


@query(
    "pivot_event_matrix",
    survey="beyond-reference reshape op: groupBy().pivot() — the "
    "day x event_type count matrix as ONE aggregate pass over an "
    "explicit (scale-safe) pivot column list",
    description="Daily event-type count matrix with row totals",
    oracle=f"""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
  {", ".join(
      f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
      f" AS n_{t}" for t in EVENT_TYPES
  )},
  CAST(COUNT(*) AS BIGINT) AS n_total
FROM events GROUP BY 1
""",
)
def pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pivot value list is explicit, so Spark skips the extra
    distinct-values job AND the output schema is fixed — the only
    pivot form that belongs in a production pipeline (an inferred
    pivot is a full distinct scan plus an unbounded-width schema)."""
    out = _wide_event_matrix(spark, sf_dir)
    total = sum(
        (F.col(f"n_{t}") for t in EVENT_TYPES[1:]),
        F.col(f"n_{EVENT_TYPES[0]}"),
    )
    return out.withColumn("n_total", total)


@query(
    "rollup_region_revenue",
    survey="beyond-reference grouping-sets op: rollup() + F.grouping — "
    "(region, nation) revenue with subtotal and grand-total rows in a "
    "single expand+aggregate pass",
    description="Revenue by region/nation with ROLLUP subtotals",
    oracle="""
SELECT
  COALESCE(r_name, '<all>') AS region,
  COALESCE(n_name, '<all>') AS nation,
  CAST(GROUPING(r_name) AS INT) AS g_region,
  CAST(GROUPING(n_name) AS INT) AS g_nation,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6)
    AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def rollup_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle: Catalyst expands each input row into its grouping
    sets and aggregates once — no per-level re-scan. GROUPING() flags
    disambiguate subtotal rows from a hypothetical literal '<all>'
    group, same trick as the SQL."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    j = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    agg = j.rollup("r_name", "n_name").agg(
        F.grouping("r_name").alias("g_region"),
        F.grouping("n_name").alias("g_nation"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double"),
            6,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return agg.select(
        F.coalesce("r_name", F.lit("<all>")).alias("region"),
        F.coalesce("n_name", F.lit("<all>")).alias("nation"),
        F.col("g_region").cast("int").alias("g_region"),
        F.col("g_nation").cast("int").alias("g_nation"),
        "revenue", "n_orders",
    )


@query(
    "unpivot_daily_metrics",
    survey="beyond-reference reshape op: DataFrame.unpivot (wide -> "
    "long melt), the inverse of the pivot — one narrow (day, metric, "
    "value) stream out of the wide daily matrix",
    description="Daily event counts melted to (day, metric, value) rows",
    oracle=f"""
WITH wide AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
    {", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{t}" for t in EVENT_TYPES
    )}
  FROM events GROUP BY 1
)
{" UNION ALL ".join(
    f"SELECT day, 'n_{t}' AS metric, n_{t} AS n_events FROM wide"
    for t in EVENT_TYPES
)}
""",
)
def unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt is a zero-shuffle projection (each wide row fans out to
    |metrics| narrow rows in place); the wide input reuses the pivot
    query's single aggregate pass."""
    wide = _wide_event_matrix(spark, sf_dir)
    return wide.unpivot(
        ["day"],
        [f"n_{t}" for t in EVENT_TYPES],
        "metric",
        "n_events",
    )


@query(
    "ntile_value_quartiles",
    survey="window-function breadth: NTILE bucketing — per-key value "
    "quartiles with a total-order tiebreak so bucket boundaries are "
    "engine-stable",
    description="Quartile summary of value per event_type via NTILE(4)",
    oracle="""
SELECT event_type, CAST(q AS BIGINT) AS quartile,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  MIN(value) AS lo, MAX(value) AS hi
FROM (
  SELECT event_type, value,
    NTILE(4) OVER (PARTITION BY event_type
                   ORDER BY value, event_id) AS q
  FROM events
)
GROUP BY event_type, q
""",
)
def ntile_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE assigns equal-size buckets over the ordered partition; with
    duplicate values the bucket boundary depends on row order, so the
    ordering carries the unique event_id as a tiebreak — the split is
    then identical on every engine. One shuffle on the partition key."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    q = e.withColumn("q", F.ntile(4).over(w))
    return q.groupBy("event_type", F.col("q").cast("long").alias("quartile")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@query(
    "cube_corpus_stats",
    survey="§2.4 grouping sets: CUBE over (source, lang) — all four "
    "grouping combinations in one aggregation pass (completes the "
    "ROLLUP/pivot/unpivot reshape family)",
    description="Doc counts and char sums for every (source, lang) "
    "grouping-set combination",
    oracle="""
SELECT source, lang,
  CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS gid,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY CUBE (source, lang)
""",
)
def cube_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hash-aggregate emits all four grouping sets (map-side
    partials apply per set); grouping_id disambiguates a genuine NULL
    key from an aggregated-out dimension, rendered with the same
    bit order (leftmost column = most significant) on both engines."""
    from tradecat_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    return (
        d.cube("source", "lang")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select("source", "lang", "gid", "n_docs", "total_chars")
    )
