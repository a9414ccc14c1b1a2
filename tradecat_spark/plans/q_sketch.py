"""Sketch/approximate queries — the 100 TB posture for cardinality.

The reference computes no approximate aggregates (SURVEY §2.4: "no
approximate aggregates"); its scale never needs them. At 100 TB,
`COUNT(DISTINCT)` is a full shuffle of every distinct key, so a sketch
whose state is O(k) per group is the right plan (SURVEY §4 flags this
as the designed extension). Spark's built-in `approx_count_distinct`
(HyperLogLog++) is the production path, but its estimate is
implementation-specific and cannot be oracle-checked cross-engine.

This module instead implements a KMV (k-minimum-values) sketch from
first principles in pure column algebra: estimate = (k-1)/h_k where
h_k is the k-th smallest hash mapped into (0,1). md5-based, identical
in Spark and DuckDB, so the ESTIMATE itself is hash-compared by the
verify driver — the correctness gate covers the sketch math, not just
its plumbing. (Beyer et al., "On Synopses for Distinct-Value Estimation
Under Multiset Operations", SIGMOD 2007.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.plans.registry import query

K = 64                                   # sketch size
_DENOM = float(16**12)                   # 12 hex chars → fraction in (0,1)

_HEXMAP_SQL = """hexmap(ch, v) AS (
  VALUES ('0',0),('1',1),('2',2),('3',3),('4',4),('5',5),('6',6),('7',7),
         ('8',8),('9',9),('a',10),('b',11),('c',12),('d',13),('e',14),('f',15)
)"""


@query(
    "approx_distinct_kmv",
    survey="§4 'lazy/approx: none … opportunity: approx_count_distinct at "
    "100TB' — KMV distinct-count sketch, estimate itself oracle-matched "
    "(HLL++ is the non-checkable production twin)",
    description="KMV (k=64) distinct-user estimate per event_type vs exact count",
    oracle=f"""
WITH {_HEXMAP_SQL},
h AS (
  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
  FROM events WHERE user_id IS NOT NULL
),
r AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact,
         MAX(CASE WHEN rn = {K} THEN h END) AS kth
  FROM r GROUP BY 1
),
kv AS (
  SELECT g.event_type,
         CAST(SUM(m.v * power(16, 12 - p.i)) AS BIGINT) AS kv
  FROM g, (SELECT unnest(range(1, 13)) AS i) p
  JOIN hexmap m ON m.ch = substr(g.kth, CAST(p.i AS INTEGER), 1)
  WHERE g.kth IS NOT NULL
  GROUP BY 1
),
est AS (
  SELECT g.event_type, g.n_exact,
    CASE WHEN g.n_exact < {K} THEN CAST(g.n_exact AS DOUBLE)
         ELSE ROUND({K - 1}.0 / (CAST(kv.kv AS DOUBLE) / {_DENOM!r}), 6)
    END AS est_kmv
  FROM g LEFT JOIN kv USING (event_type)
)
SELECT event_type, n_exact, est_kmv,
       ROUND(ABS(est_kmv - n_exact) / n_exact, 6) AS rel_err
FROM est
""",
)
def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group state is the k smallest hashes — O(k), mergeable, one
    shuffle (here realized as distinct + row_number for oracle symmetry;
    the streaming/incremental form keeps a bounded sorted buffer per
    key). Fewer than k distinct keys → the sketch IS the exact count,
    the standard KMV fallback. The k-th hash's first 12 hex chars become
    an integer via positional lookup (exact in doubles: < 2^53), so both
    engines compute bit-identical estimates."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    h = e.select(
        "event_type",
        F.md5(F.col("user_id").cast("string").cast("binary")).alias("h"),
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    r = h.withColumn("rn", rn)
    g = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("rn") == K, F.col("h"))).alias("kth"),
    )
    hexmap = F.create_map(
        *[x for i, c in enumerate("0123456789abcdef") for x in (F.lit(c), F.lit(i))]
    )
    kv = (
        sum(
            (
                F.element_at(hexmap, F.substring("kth", i, 1)).cast("double")
                * F.lit(float(16 ** (12 - i)))
                for i in range(1, 13)
            ),
            F.lit(0.0),
        )
        .cast("long")
        .alias("kv")
    )
    est = F.when(
        F.col("n_exact") < K, F.col("n_exact").cast("double")
    ).otherwise(
        F.round(F.lit(float(K - 1)) / (F.col("kv").cast("double") / _DENOM), 6)
    )
    return (
        g.select("event_type", "n_exact", kv)
        .select("event_type", "n_exact", est.alias("est_kmv"))
        .select(
            "event_type",
            "n_exact",
            "est_kmv",
            F.round(F.abs(F.col("est_kmv") - F.col("n_exact")) / F.col("n_exact"), 6)
            .alias("rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic quantile sketch (min-hash-rank sample)
# ---------------------------------------------------------------------------
QK = 256  # sample size per group


def _interp(sorted_arr, p: float, k_col):
    """Linear interpolation at quantile ``p`` over a sorted array —
    written out manually (lo + (hi-lo)*frac) so BOTH engines run the
    same float ops instead of their own percentile built-ins."""
    idx = (k_col - F.lit(1)) * F.lit(p)
    lo_i = F.floor(idx).cast("int")
    frac = idx - F.floor(idx)
    lo = F.element_at(sorted_arr, lo_i + 1)
    hi = F.element_at(sorted_arr, F.least(lo_i + 2, k_col.cast("int")))
    return lo + (hi - lo) * frac


def _interp_sql(arr: str, p: str, k: str) -> str:
    return (
        f"{arr}[CAST(FLOOR(({k} - 1) * {p}) AS INT) + 1]"
        f" + ({arr}[LEAST(CAST(FLOOR(({k} - 1) * {p}) AS INT) + 2, "
        f"CAST({k} AS INT))]"
        f" - {arr}[CAST(FLOOR(({k} - 1) * {p}) AS INT) + 1])"
        f" * (({k} - 1) * {p} - FLOOR(({k} - 1) * {p}))"
    )


@query(
    "approx_quantiles_sample",
    survey="§4 approx family: deterministic quantile sketch — KMV-style "
    "min-hash-rank sample (k=256) + manual linear interpolation, the "
    "estimate AND its error vs the exact quantile both oracle-matched "
    "(approx_percentile/t-digest is the non-checkable production twin)",
    description="p50/p90/p99 of value per event_type: hash-sample estimate vs exact",
    oracle=f"""
WITH r AS (
  SELECT event_type, value,
    ROW_NUMBER() OVER (PARTITION BY event_type
      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rnk
  FROM events
),
samp AS (
  SELECT event_type,
    list(value ORDER BY value, 1) AS sv,
    CAST(COUNT(*) AS BIGINT) AS k
  FROM r WHERE rnk <= {QK} GROUP BY event_type
),
ex AS (
  SELECT event_type,
    list(value ORDER BY value, 1) AS ev,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
)
SELECT s.event_type, s.k, e.n,
  ROUND({_interp_sql('sv', '0.5', 's.k')}, 6) AS est_p50,
  ROUND({_interp_sql('sv', '0.9', 's.k')}, 6) AS est_p90,
  ROUND({_interp_sql('sv', '0.99', 's.k')}, 6) AS est_p99,
  ROUND({_interp_sql('ev', '0.5', 'e.n')}, 6) AS exact_p50,
  ROUND({_interp_sql('ev', '0.9', 'e.n')}, 6) AS exact_p90,
  ROUND(ABS(ROUND({_interp_sql('sv', '0.5', 's.k')}, 6)
          - ROUND({_interp_sql('ev', '0.5', 'e.n')}, 6)), 6) AS err_p50
FROM samp s JOIN ex e USING (event_type)
""",
)
def approx_quantiles_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sample is the k rows with the smallest md5(event_id) per
    group — a uniform sample that needs no RNG state and is identical
    on every engine and rerun (the KMV trick applied to quantiles).
    Estimates interpolate over the k-row sorted sample, so per-group
    state is O(k) however large the group; the exact side (full
    per-group sort) exists only as the error baseline — at 100 TB you
    ship the sample column and drop the exact branch. Ties in value
    sort safely: equal doubles interpolate to the same result
    regardless of order."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    samp = (
        e.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= QK)
        .groupBy("event_type")
        .agg(
            F.array_sort(F.collect_list("value")).alias("sv"),
            F.count(F.lit(1)).alias("k"),
        )
    )
    ex = e.groupBy("event_type").agg(
        F.array_sort(F.collect_list("value")).alias("ev"),
        F.count(F.lit(1)).alias("n"),
    )
    k, n = F.col("k"), F.col("n")
    sv, ev = F.col("sv"), F.col("ev")
    est50 = F.round(_interp(sv, 0.5, k), 6)
    ex50 = F.round(_interp(ev, 0.5, n), 6)
    return samp.join(ex, "event_type").select(
        "event_type", "k", "n",
        est50.alias("est_p50"),
        F.round(_interp(sv, 0.9, k), 6).alias("est_p90"),
        F.round(_interp(sv, 0.99, k), 6).alias("est_p99"),
        ex50.alias("exact_p50"),
        F.round(_interp(ev, 0.9, n), 6).alias("exact_p90"),
        F.round(F.abs(est50 - ex50), 6).alias("err_p50"),
    )
