"""Indicator queries (SURVEY.md §2.5 window families + §2.9 samples).

Each query computes a reference indicator's math over the events series
(event_type ≈ symbol, value ≈ price). Native window expressions wherever
the recurrence is closed-form; the EWM family uses an ordered fold
(``aggregate`` over a sorted ``collect_list``) that runs entirely
JVM-side — the same sequential recurrence the reference's pandas
``ewm`` evaluates, so results are bit-identical to a sequential oracle
fold (no rounding needed).

Scale notes: ROWS-frame windows per (key) need one shuffle+sort per
distinct partitioning — all queries here share (event_type ORDER BY ts),
so Catalyst plans exactly one exchange per query. The EWM fold holds one
(ts,value) array per key in memory: the reference's own compute contract
is a ≤500-bar tail per key (db/cache.py:33), ENFORCED here — every fold
query pre-limits its input with ``topn_per_group(..., TAIL_BARS)`` before
collecting, so a hot key's unbounded history never materializes; for
truly unbounded recurrences use the streaming/stateful form instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.plans.registry import query

DEC = "decimal(18,8)"


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    )


def _w(*, rows: tuple[int, int] | None = None) -> Window:
    w = Window.partitionBy("event_type").orderBy("ts")
    if rows is not None:
        w = w.rowsBetween(*rows)
    return w


@query(
    "ind_bollinger",
    survey="§2.5 W4 / §2.9 Bollinger (batch/bollinger.py:10-47)",
    description="SMA20 ± 2σ bands, bandwidth, %b per event_type",
    bench=True,
    oracle="""
SELECT
  event_type, ts, value,
  ROUND(AVG(value) OVER w, 6) AS sma20,
  ROUND(STDDEV_SAMP(value) OVER w, 6) AS sd20,
  ROUND(AVG(value) OVER w + 2 * STDDEV_SAMP(value) OVER w, 6) AS upper_band,
  ROUND(AVG(value) OVER w - 2 * STDDEV_SAMP(value) OVER w, 6) AS lower_band,
  ROUND((value - (AVG(value) OVER w - 2 * STDDEV_SAMP(value) OVER w))
        / NULLIF(4 * STDDEV_SAMP(value) OVER w, 0), 6) AS pct_b
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
""",
)
def ind_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-stage select (r14): reusing the sma/sd Column objects across
    # five output expressions made ExtractWindowExpressions emit NINE
    # window aggregates in the Window node (avg x4, stddev x5,
    # identical frames — plans/r14/ind_bollinger_before.txt _we0.._we8)
    # because Catalyst does not dedupe repeated window expressions.
    # Projecting the two base aggregates first pins the Window node to
    # exactly two computations; the band arithmetic is a plain Project
    # over the Window's output attributes (window columns are
    # materialized by the Window operator, so CollapseProject cannot
    # re-expand them). Same expressions, same rounding — identical
    # results, ~4.5x less window compute per row (guide §1.2 step 2).
    e = _series(spark, sf_dir)
    w = _w(rows=(-19, 0))
    base = e.select(
        "event_type", "ts", "value",
        F.avg("value").over(w).alias("_ma20"),
        F.stddev_samp("value").over(w).alias("_sd20"),
    )
    sma, sd = F.col("_ma20"), F.col("_sd20")
    return base.select(
        "event_type", "ts", "value",
        F.round(sma, 6).alias("sma20"),
        F.round(sd, 6).alias("sd20"),
        F.round(sma + 2 * sd, 6).alias("upper_band"),
        F.round(sma - 2 * sd, 6).alias("lower_band"),
        F.round((F.col("value") - (sma - 2 * sd)) / F.nullif(4 * sd, F.lit(0)), 6)
        .alias("pct_b"),
    )


@query(
    "ind_donchian_williams",
    survey="§2.5 W3 / §2.9 Donchian + WilliamsR (lean_indicators.py:163-204)",
    description="20-bar Donchian channel and Williams %R 14",
    oracle="""
SELECT
  event_type, ts,
  MAX(value) OVER w20 AS don_high,
  MIN(value) OVER w20 AS don_low,
  ROUND((MAX(value) OVER w20 + MIN(value) OVER w20) / 2, 6) + 0.0 AS don_mid,
  ROUND((value - MAX(value) OVER w14)
        / NULLIF(MAX(value) OVER w14 - MIN(value) OVER w14, 0) * 100, 6) + 0.0
    AS williams_r
FROM events
WINDOW
  w20 AS (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
  w14 AS (PARTITION BY event_type ORDER BY ts ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
""",
)
def ind_donchian_williams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Williams %R is written ``(value - hi14) / range * 100`` (not the
    textbook ``(hi14 - value) * -100``) so the value==hi14 case yields
    +0.0 in BOTH engines — DuckDB's ``0/range * -100`` produces IEEE
    -0.0 while Spark's BigDecimal round normalizes to +0.0, which flips
    the driver's value hash. ``+ 0.0`` after each ROUND squashes any
    residual -0.0 (tiny negatives rounding to zero) on both sides."""
    e = _series(spark, sf_dir)
    w20, w14 = _w(rows=(-19, 0)), _w(rows=(-13, 0))
    hi20, lo20 = F.max("value").over(w20), F.min("value").over(w20)
    hi14, lo14 = F.max("value").over(w14), F.min("value").over(w14)
    return e.select(
        "event_type", "ts",
        hi20.alias("don_high"),
        lo20.alias("don_low"),
        (F.round((hi20 + lo20) / 2, 6) + F.lit(0.0)).alias("don_mid"),
        (
            F.round(
                (F.col("value") - hi14) / F.nullif(hi14 - lo14, F.lit(0)) * 100, 6
            )
            + F.lit(0.0)
        ).alias("williams_r"),
    )


@query(
    "ind_obv_cvd",
    survey="§2.5 W6 cumulative sums / §2.9 OBV+CVD (incremental/obv.py, cvd.py)",
    description="On-balance volume and cumulative delta (exact decimal cumsum)",
    oracle="""
WITH lagged AS (
  SELECT
    event_type, ts, value,
    LAG(value) OVER (PARTITION BY event_type ORDER BY ts) AS prev
  FROM events
), signed AS (
  SELECT
    event_type, ts,
    CASE WHEN value > prev THEN CAST(value AS DECIMAL(18,8))
         WHEN value < prev THEN -CAST(value AS DECIMAL(18,8))
         ELSE CAST(0 AS DECIMAL(18,8)) END AS s_obv,
    CASE WHEN value >= prev THEN CAST(value AS DECIMAL(18,8))
         ELSE -CAST(value AS DECIMAL(18,8)) END AS s_cvd
  FROM lagged
)
SELECT
  event_type, ts,
  ROUND(CAST(SUM(s_obv) OVER (PARTITION BY event_type ORDER BY ts
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS obv,
  ROUND(CAST(SUM(s_cvd) OVER (PARTITION BY event_type ORDER BY ts
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS cvd
FROM signed
""",
)
def ind_obv_cvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sums run on DECIMAL so the running totals are exact and
    order-independent — Spark's window matches DuckDB's segment-tree
    evaluation bit-for-bit."""
    e = _series(spark, sf_dir)
    prev = F.lag("value").over(_w())
    vdec = F.col("value").cast(DEC)
    signed_obv = (
        F.when(F.col("value") > prev, vdec)
        .when(F.col("value") < prev, -vdec)
        .otherwise(F.lit(0).cast(DEC))
    )
    signed_cvd = F.when(F.col("value") >= prev, vdec).otherwise(-vdec)
    cum = _w(rows=(Window.unboundedPreceding, Window.currentRow))
    return e.select(
        "event_type", "ts",
        F.round(F.sum(signed_obv).over(cum).cast("double"), 6).alias("obv"),
        F.round(F.sum(signed_cvd).over(cum).cast("double"), 6).alias("cvd"),
    )


@query(
    "ind_vwap_bands",
    survey="§2.5 W6 / §2.9 VWAP (batch/vwap.py:9-53)",
    description="Running VWAP (size-weighted) with deviation per event_type",
    oracle="""
SELECT
  event_type, ts,
  ROUND(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))
            * CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) AS DECIMAL(18,2)))
        OVER cum AS DOUBLE), 6)
      / NULLIF(ROUND(CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE)
                 AS DECIMAL(18,2))) OVER cum AS DOUBLE), 6), 0), 6) AS vwap,
  ROUND(value - ROUND(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))
            * CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) AS DECIMAL(18,2)))
        OVER cum AS DOUBLE), 6)
      / NULLIF(ROUND(CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE)
                 AS DECIMAL(18,2))) OVER cum AS DOUBLE), 6), 0), 6), 6) AS vwap_dev
FROM events
WINDOW cum AS (PARTITION BY event_type ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def ind_vwap_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    cum = _w(rows=(Window.unboundedPreceding, Window.currentRow))
    # two-stage select (r14, the ind_bollinger fix): reusing the vwap
    # Column in both outputs duplicated the two cumulative window sums
    # (Catalyst does not dedupe repeated window expressions) — project
    # the sums once, derive both columns from the attributes
    num = F.round(
        F.sum(F.col("value").cast("decimal(18,4)") * k.cast("decimal(18,2)"))
        .over(cum).cast("double"), 6,
    )
    den = F.round(F.sum(k.cast("decimal(18,2)")).over(cum).cast("double"), 6)
    base = e.select(
        "event_type", "ts", "value", num.alias("_num"), den.alias("_den")
    )
    vwap = F.round(F.col("_num") / F.nullif(F.col("_den"), F.lit(0)), 6)
    return base.select(
        "event_type", "ts",
        vwap.alias("vwap"),
        F.round(F.col("value") - vwap, 6).alias("vwap_dev"),
    )


@query(
    "ind_sma_cross_signals",
    survey="§2.5 W7 lag crossovers / §2.10 CROSS_UP condition "
    "(rules/base.py:13-25, incremental/macd.py:15-28)",
    description="SMA5/SMA20 golden & death crosses (prev vs curr lag compare)",
    oracle="""
WITH sma AS (
  SELECT
    event_type, ts,
    AVG(value) OVER (PARTITION BY event_type ORDER BY ts
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sma5,
    AVG(value) OVER (PARTITION BY event_type ORDER BY ts
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sma20,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts) AS rn
  FROM events
), flagged AS (
  SELECT
    event_type, ts, sma5, sma20,
    LAG(sma5) OVER (PARTITION BY event_type ORDER BY ts) AS p5,
    LAG(sma20) OVER (PARTITION BY event_type ORDER BY ts) AS p20
  FROM sma WHERE rn >= 20
)
SELECT
  event_type, ts,
  ROUND(sma5, 6) AS sma5,
  ROUND(sma20, 6) AS sma20,
  CASE WHEN p5 <= p20 AND sma5 > sma20 THEN 'golden_cross'
       ELSE 'death_cross' END AS signal
FROM flagged
WHERE (p5 <= p20 AND sma5 > sma20) OR (p5 >= p20 AND sma5 < sma20)
""",
)
def ind_sma_cross_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    sma5 = F.avg("value").over(_w(rows=(-4, 0)))
    sma20 = F.avg("value").over(_w(rows=(-19, 0)))
    rn = F.row_number().over(_w())
    base = e.select(
        "event_type", "ts",
        sma5.alias("sma5"), sma20.alias("sma20"), rn.alias("rn"),
    ).filter(F.col("rn") >= 20)
    p5 = F.lag("sma5").over(_w())
    p20 = F.lag("sma20").over(_w())
    flagged = base.select(
        "event_type", "ts", "sma5", "sma20",
        p5.alias("p5"), p20.alias("p20"),
    )
    golden = (F.col("p5") <= F.col("p20")) & (F.col("sma5") > F.col("sma20"))
    death = (F.col("p5") >= F.col("p20")) & (F.col("sma5") < F.col("sma20"))
    return flagged.filter(golden | death).select(
        "event_type", "ts",
        F.round("sma5", 6).alias("sma5"),
        F.round("sma20", 6).alias("sma20"),
        F.when(golden, "golden_cross").otherwise("death_cross").alias("signal"),
    )


@query(
    "ind_pivot_points",
    survey="§2.5 W8 pivot detection (batch/tv_rsi.py:28-54, trend_line.py:5-40)",
    description="5-bar centered pivot highs/lows per event_type",
    oracle="""
SELECT event_type, ts, value, is_pivot_high, is_pivot_low
FROM (
  SELECT
    event_type, ts, value,
    value = MAX(value) OVER c AND COUNT(*) OVER c = 5 AS is_pivot_high,
    value = MIN(value) OVER c AND COUNT(*) OVER c = 5 AS is_pivot_low
  FROM events
  WINDOW c AS (PARTITION BY event_type ORDER BY ts
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
)
WHERE is_pivot_high OR is_pivot_low
""",
)
def ind_pivot_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    c = _w(rows=(-2, 2))
    hi = (F.col("value") == F.max("value").over(c)) & (F.count(F.lit(1)).over(c) == 5)
    lo = (F.col("value") == F.min("value").over(c)) & (F.count(F.lit(1)).over(c) == 5)
    return (
        e.select(
            "event_type", "ts", "value",
            hi.alias("is_pivot_high"), lo.alias("is_pivot_low"),
        )
        .filter(F.col("is_pivot_high") | F.col("is_pivot_low"))
    )


@query(
    "ind_zscore_percentile",
    survey="§2.5 W9 / §2.9 futures_aggregate z-score+percentile "
    "(batch/futures_aggregate.py:52-65,176-196)",
    description="Latest value's z-score and percentile rank vs full history, per event_type",
    oracle="""
WITH ranked AS (
  SELECT
    event_type, ts, value,
    PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value) AS pctl,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts DESC) AS rn
  FROM events
), stats AS (
  SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT
  r.event_type,
  r.value AS latest_value,
  ROUND((r.value - s.mu) / NULLIF(s.sigma, 0), 6) AS zscore,
  ROUND(r.pctl, 6) AS percentile_rank
FROM ranked r JOIN stats s ON r.event_type = s.event_type
WHERE r.rn = 1
""",
)
def ind_zscore_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    ranked = e.select(
        "event_type", "ts", "value",
        F.percent_rank().over(Window.partitionBy("event_type").orderBy("value"))
        .alias("pctl"),
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.desc("ts"))
        ).alias("rn"),
    ).filter(F.col("rn") == 1)
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return ranked.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.col("value").alias("latest_value"),
        F.round((F.col("value") - F.col("mu")) / F.nullif("sigma", F.lit(0)), 6)
        .alias("zscore"),
        F.round("pctl", 6).alias("percentile_rank"),
    )


@query(
    "ind_regr_slope",
    survey="§2.4 A8 linreg slope (batch/futures_aggregate.py:18-42) + "
    "liquidity Kyle λ (batch/liquidity.py:12-154)",
    description="7-day OLS slope of value vs hours-elapsed, per event_type",
    oracle="""
WITH mx AS (SELECT MAX(ts) AS mx_ts FROM events),
tail AS (
  SELECT
    event_type, value,
    (epoch(ts) - epoch(mx.mx_ts - INTERVAL 7 DAY)) / 3600.0 AS hrs
  FROM events, mx
  WHERE ts > mx.mx_ts - INTERVAL 7 DAY
)
SELECT
  event_type,
  ROUND(REGR_SLOPE(value, hrs), 6) AS slope_per_hr,
  ROUND(CORR(value, hrs), 6) AS corr_vs_time,
  COUNT(*) AS n_obs
FROM tail
GROUP BY event_type
""",
)
def ind_regr_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    mx = e.agg(F.max("ts").alias("mx_ts"))
    j = e.join(F.broadcast(mx))
    anchor = F.col("mx_ts") - F.expr("INTERVAL 7 DAYS")
    tail = j.filter(F.col("ts") > anchor).select(
        "event_type",
        "value",
        ((F.col("ts").cast("double") - anchor.cast("double")) / 3600.0).alias("hrs"),
    )
    return tail.groupBy("event_type").agg(
        F.round(F.regr_slope("value", "hrs"), 6).alias("slope_per_hr"),
        F.round(F.corr("value", "hrs"), 6).alias("corr_vs_time"),
        F.count(F.lit(1)).alias("n_obs"),
    )


# ---------------------------------------------------------------------------
# W5: the EWM family — ordered fold, JVM-side
# ---------------------------------------------------------------------------
def ema_fold(values_by_ts: Column, alpha: float) -> Column:
    """Final EMA value of a time-ordered series, as a JVM-side fold.

    ``aggregate(tail, head, acc·(1-α) + x·α)`` evaluates the exact
    ``ewm(adjust=False)`` recurrence the reference uses
    (incremental/macd.py:6-12); sequential order makes it bit-identical
    to any single-threaded oracle evaluating the same doubles.
    """
    return F.aggregate(
        F.slice(values_by_ts, 2, F.greatest(F.size(values_by_ts) - 1, F.lit(0))),
        F.element_at(values_by_ts, 1).cast("double"),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
    )


#: Reference window-cache contract: indicator folds run over at most the
#: last 500 bars per key (db/cache.py:33 MAX_ROWS) — bounding the
#: collected array so a hot key's full history never materializes.
TAIL_BARS = 500

_EMA_ORACLE = """
WITH tail AS (
  SELECT event_type, ts, value FROM (
    SELECT event_type, ts, value,
      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts DESC) AS rn
    FROM events) t WHERE rn <= 500
),
series AS (
  SELECT event_type, list(value ORDER BY ts) AS vals
  FROM tail GROUP BY event_type
)
SELECT
  event_type,
  ROUND(list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - {a}::DOUBLE) + x * {a}::DOUBLE), 6) AS ema{n},
  len(vals) AS n_obs
FROM series
"""


@query(
    "ind_ema20_fold",
    survey="§2.5 W5 EWM recurrence (incremental/macd.py:6-12, ema_gc.py:9-59) "
    "— no native Spark EWM; JVM-side ordered fold",
    description="EMA(20) latest value per event_type via higher-order aggregate",
    oracle=(
        _EMA_ORACLE.replace("{a}", f"{2.0 / 21.0!r}").replace("{n}", "20")
    ),
)
def ind_ema20_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tradecat_spark.operators.latest import topn_per_group

    e = topn_per_group(_series(spark, sf_dir), ["event_type"], "ts", TAIL_BARS)
    alpha = 2.0 / 21.0
    series = e.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("ts", "value"))).alias("pairs")
    )
    vals = F.transform(F.col("pairs"), lambda p: p["value"])
    return series.select(
        "event_type",
        F.round(ema_fold(vals, alpha), 6).alias("ema20"),
        F.size("pairs").cast("long").alias("n_obs"),
    )


# ---------------------------------------------------------------------------
# §2.9 VPVR volume profile (SQL-expressible core)
# ---------------------------------------------------------------------------
@query(
    "ind_vpvr_profile",
    survey="§2.9 VPVR volume profile (batch/vpvr.py:46-119): 24-bucket "
    "price histogram, POC, HVN/LVN nodes — the iterative 70% value-area "
    "expansion stays in the applyInPandas surface (indicators/library.py)",
    description="24-bucket volume profile per event_type: POC + HVN/LVN flags",
    oracle="""
WITH r AS (
  SELECT event_type, value,
    MIN(value) OVER (PARTITION BY event_type) AS vmin,
    MAX(value) OVER (PARTITION BY event_type) AS vmax
  FROM events
),
b AS (
  SELECT event_type, value, vmin, vmax,
    CAST(LEAST(23, FLOOR((value - vmin) / (vmax - vmin) * 24)) AS INTEGER)
      AS bucket
  FROM r
),
g AS (
  SELECT event_type, bucket,
    COUNT(*) AS n_trades,
    ROUND(CAST(SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS DOUBLE), 6) AS flow,
    MIN(vmin) AS vmin, MIN(vmax) AS vmax
  FROM b GROUP BY 1, 2
)
SELECT event_type, bucket,
  ROUND(vmin + bucket * ((vmax - vmin) / 24), 6) AS bucket_low,
  n_trades, flow,
  ROW_NUMBER() OVER (PARTITION BY event_type
                     ORDER BY n_trades DESC, bucket ASC) = 1 AS is_poc,
  n_trades > 1.5 * AVG(n_trades) OVER (PARTITION BY event_type) AS is_hvn,
  n_trades < 0.5 * AVG(n_trades) OVER (PARTITION BY event_type) AS is_lvn
FROM g
""",
)
def ind_vpvr_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketing + histogram + node classification in pure column
    algebra: per-key min/max via an unordered window, a width-bucket
    projection, one hash aggregate, then POC (modal bucket, ties to the
    lower price) and HVN/LVN (high/low-volume nodes vs 1.5x/0.5x the
    mean bucket count). Two shuffles total — the per-key extent window
    and the (key, bucket) aggregate; at 100 TB replace the window with a
    pre-aggregated broadcast of per-key extents so the fact table is
    scanned once. Only the 70%-value-area expansion loop is left to the
    pandas indicator (it is inherently sequential)."""
    e = _series(spark, sf_dir)
    wk = Window.partitionBy("event_type")
    vmin = F.min("value").over(wk)
    vmax = F.max("value").over(wk)
    bucket = F.least(
        F.lit(23), F.floor((F.col("value") - vmin) / (vmax - vmin) * 24)
    ).cast("int")
    b = e.select(
        "event_type", "value", bucket.alias("bucket"),
        vmin.alias("vmin"), vmax.alias("vmax"),
    )
    g = b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.round(F.sum(F.abs("value").cast(DEC)).cast("double"), 6).alias("flow"),
        F.min("vmin").alias("vmin"),
        F.min("vmax").alias("vmax"),
    )
    poc = (
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.desc("n_trades"), F.asc("bucket")
            )
        )
        == 1
    )
    avg_n = F.avg("n_trades").over(Window.partitionBy("event_type"))
    return g.select(
        "event_type",
        "bucket",
        F.round(
            F.col("vmin") + F.col("bucket") * ((F.col("vmax") - F.col("vmin")) / 24),
            6,
        ).alias("bucket_low"),
        "n_trades",
        "flow",
        poc.alias("is_poc"),
        (F.col("n_trades") > 1.5 * avg_n).alias("is_hvn"),
        (F.col("n_trades") < 0.5 * avg_n).alias("is_lvn"),
    )


# ---------------------------------------------------------------------------
# §2.9 candlestick patterns (K线形态 — pure-SQL subset)
# ---------------------------------------------------------------------------
@query(
    "ind_candle_patterns",
    survey="§2.9 K-pattern scanner (batch/k_pattern.py:52-241): the "
    "single/two-bar geometric patterns (doji, hammer, shooting star, "
    "engulfing) as column algebra; the TA-Lib 61-pattern set lives in "
    "the applyInPandas surface with the same pure-python fallback the "
    "reference uses (k_pattern.py:52-67)",
    description="Doji/hammer/shooting-star/engulfing flags on 1h bars",
    oracle="""
WITH bars AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    min_by(value, ts) AS open, MAX(value) AS high,
    MIN(value) AS low, max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
l AS (
  SELECT *,
    LAG(open) OVER w AS p_open, LAG(close) OVER w AS p_close
  FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
)
SELECT event_type,
  strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  ROUND(ABS(close - open), 6) AS body,
  ROUND(high - low, 6) AS rng,
  ABS(close - open) < 0.1 * (high - low) AS is_doji,
  (LEAST(open, close) - low) > 2 * ABS(close - open)
    AND (high - GREATEST(open, close)) < ABS(close - open) AS is_hammer,
  (high - GREATEST(open, close)) > 2 * ABS(close - open)
    AND (LEAST(open, close) - low) < ABS(close - open) AS is_shooting_star,
  COALESCE(p_close < p_open AND close > open
           AND close >= p_open AND open <= p_close, FALSE) AS bull_engulf,
  COALESCE(p_close > p_open AND close < open
           AND close <= p_open AND open >= p_close, FALSE) AS bear_engulf
FROM l
""",
)
def ind_candle_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-bar geometry (body vs range, shadow lengths) plus the
    two-bar engulfing test via lag() — entirely JVM-side expressions
    over the 1h rollup, one window sort per key. Every comparison is a
    pure float predicate on identically-derived doubles, so the boolean
    flags are cross-engine deterministic."""
    from tradecat_spark.operators.rollup import ohlcv_rollup

    e = _series(spark, sf_dir)
    bars = ohlcv_rollup(e, ["event_type"], "ts", "value", interval_sec=3600)
    w = Window.partitionBy("event_type").orderBy("bucket_ts")
    p_open = F.lag("open").over(w)
    p_close = F.lag("close").over(w)
    o, h, lo, c = F.col("open"), F.col("high"), F.col("low"), F.col("close")
    body = F.abs(c - o)
    upper = h - F.greatest(o, c)
    lower = F.least(o, c) - lo
    return bars.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.round(body, 6).alias("body"),
        F.round(h - lo, 6).alias("rng"),
        (body < 0.1 * (h - lo)).alias("is_doji"),
        ((lower > 2 * body) & (upper < body)).alias("is_hammer"),
        ((upper > 2 * body) & (lower < body)).alias("is_shooting_star"),
        F.coalesce(
            (p_close < p_open) & (c > o) & (c >= p_open) & (o <= p_close),
            F.lit(False),
        ).alias("bull_engulf"),
        F.coalesce(
            (p_close > p_open) & (c < o) & (c <= p_open) & (o >= p_close),
            F.lit(False),
        ).alias("bear_engulf"),
    )


_BARS_1H_SQL = """
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    min_by(value, ts) AS open, MAX(value) AS high,
    MIN(value) AS low, max_by(value, ts) AS close,
    CAST(COUNT(*) AS BIGINT) AS trade_count
  FROM events GROUP BY 1, 2
"""

# Last ≤500 bars per key — the tail the reference's window cache feeds to
# every indicator (db/cache.py:33). The fold queries consume THIS, so the
# per-key collected array is bounded regardless of history length.
_TAIL_BARS_1H_SQL = f"""
  SELECT event_type, bucket_ts, open, high, low, close, trade_count FROM (
    SELECT b.*, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY bucket_ts DESC) AS rn
    FROM ({_BARS_1H_SQL}) b
  ) tb WHERE rn <= 500
"""


def _bars_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tradecat_spark.operators.rollup import ohlcv_rollup

    return ohlcv_rollup(
        _series(spark, sf_dir), ["event_type"], "ts", "value", interval_sec=3600
    )


def _bars_1h_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last ≤500 1h bars per key (mirrors _TAIL_BARS_1H_SQL)."""
    from tradecat_spark.operators.latest import topn_per_group

    return topn_per_group(
        _bars_1h(spark, sf_dir), ["event_type"], "bucket_ts", TAIL_BARS
    )


# ---------------------------------------------------------------------------
# §2.9 MFI (money flow index)
# ---------------------------------------------------------------------------
@query(
    "ind_mfi",
    survey="§2.9 MFI 14 (batch/mfi.py:8-26): rolling sums of signed "
    "money flow — native windows, no recursion",
    description="MFI-14 over 1h bars (typical price x trade_count flow)",
    oracle=f"""
WITH bars AS ({_BARS_1H_SQL}),
tp AS (
  SELECT event_type, bucket_ts,
    (high + low + close) / 3 AS tp, trade_count,
    LAG((high + low + close) / 3) OVER
      (PARTITION BY event_type ORDER BY bucket_ts) AS prev_tp
  FROM bars
),
mf AS (
  SELECT event_type, bucket_ts,
    CASE WHEN tp > prev_tp
         THEN CAST(tp * trade_count AS DECIMAL(18,8)) ELSE CAST(0 AS DECIMAL(18,8))
    END AS pos_mf,
    CASE WHEN tp < prev_tp
         THEN CAST(tp * trade_count AS DECIMAL(18,8)) ELSE CAST(0 AS DECIMAL(18,8))
    END AS neg_mf
  FROM tp
)
SELECT event_type,
  strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  ROUND(100 * CAST(SUM(pos_mf) OVER w AS DOUBLE)
        / NULLIF(CAST(SUM(pos_mf) OVER w AS DOUBLE)
                 + CAST(SUM(neg_mf) OVER w AS DOUBLE), 0), 6) AS mfi14
FROM mf
WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
""",
)
def ind_mfi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed money flow split by typical-price direction, then two
    14-bar window sums. Flows are decimal-cast before the window sum so
    the rolling sums are exact (associativity-independent) — the only
    float ops are the final ratio, mirrored verbatim in the oracle."""
    bars = _bars_1h(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("bucket_ts")
    tp = (F.col("high") + F.col("low") + F.col("close")) / 3
    b = bars.select(
        "event_type", "bucket_ts", tp.alias("tp"), "trade_count",
        F.lag(tp).over(w).alias("prev_tp"),
    )
    flow = F.col("tp") * F.col("trade_count")
    zero = F.lit(0).cast(DEC)
    mf = b.select(
        "event_type", "bucket_ts",
        F.when(F.col("tp") > F.col("prev_tp"), flow.cast(DEC)).otherwise(zero)
        .alias("pos_mf"),
        F.when(F.col("tp") < F.col("prev_tp"), flow.cast(DEC)).otherwise(zero)
        .alias("neg_mf"),
    )
    wf = w.rowsBetween(-13, 0)
    pos = F.sum("pos_mf").over(wf).cast("double")
    neg = F.sum("neg_mf").over(wf).cast("double")
    return mf.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.round(100 * pos / F.nullif(pos + neg, F.lit(0)), 6).alias("mfi14"),
    )


# ---------------------------------------------------------------------------
# §2.9 Ichimoku
# ---------------------------------------------------------------------------
@query(
    "ind_ichimoku",
    survey="§2.9 Ichimoku 9/26/52 (lean_indicators.py:237-281): rolling "
    "max/min midlines — native windows",
    description="Tenkan/kijun/span A/span B + cloud position on 1h bars",
    oracle=f"""
WITH bars AS ({_BARS_1H_SQL})
SELECT event_type,
  strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  ROUND((MAX(high) OVER w9  + MIN(low) OVER w9)  / 2, 6) AS tenkan,
  ROUND((MAX(high) OVER w26 + MIN(low) OVER w26) / 2, 6) AS kijun,
  ROUND(((MAX(high) OVER w9  + MIN(low) OVER w9) / 2
       + (MAX(high) OVER w26 + MIN(low) OVER w26) / 2) / 2, 6) AS span_a,
  ROUND((MAX(high) OVER w52 + MIN(low) OVER w52) / 2, 6) AS span_b,
  CASE
    WHEN close > GREATEST(
        ((MAX(high) OVER w9  + MIN(low) OVER w9) / 2
       + (MAX(high) OVER w26 + MIN(low) OVER w26) / 2) / 2,
        (MAX(high) OVER w52 + MIN(low) OVER w52) / 2)
      THEN 'above' ELSE 'not_above' END AS cloud_pos
FROM bars
WINDOW
  w9  AS (PARTITION BY event_type ORDER BY bucket_ts ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
  w26 AS (PARTITION BY event_type ORDER BY bucket_ts ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
  w52 AS (PARTITION BY event_type ORDER BY bucket_ts ROWS BETWEEN 51 PRECEDING AND CURRENT ROW)
""",
)
def ind_ichimoku(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rolling-extent midlines; all windows share one (key, ts)
    sort so Catalyst plans a single exchange. Span shift (the 26-bar
    displacement) is a lag over the same sort — omitted here to keep the
    oracle one expression per column; the applyInPandas indicator keeps
    the displaced-cloud variant."""
    bars = _bars_1h(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("bucket_ts")

    def mid(n: int):
        wn = w.rowsBetween(-(n - 1), 0)
        return (F.max("high").over(wn) + F.min("low").over(wn)) / 2

    t9, k26, s52 = mid(9), mid(26), mid(52)
    span_a_raw = (t9 + k26) / 2
    cloud_top = F.greatest(span_a_raw, s52)
    return bars.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.round(t9, 6).alias("tenkan"),
        F.round(k26, 6).alias("kijun"),
        F.round(span_a_raw, 6).alias("span_a"),
        F.round(s52, 6).alias("span_b"),
        F.when(F.col("close") > cloud_top, "above").otherwise("not_above")
        .alias("cloud_pos"),
    )


# ---------------------------------------------------------------------------
# §2.9 CCI — windowed mean-absolute-deviation via ordered list fold
# ---------------------------------------------------------------------------
@query(
    "ind_cci",
    survey="§2.9 CCI 20 (lean_indicators.py:134-159): typical price vs "
    "SMA over mean absolute deviation — the MAD (deviations of every "
    "window member from the CURRENT row's SMA) needs the window as a "
    "list; the fold is sequential in both engines so floats agree",
    description="CCI-20 over 1h bars (list-fold MAD, JVM-side)",
    oracle=f"""
WITH bars AS ({_BARS_1H_SQL}),
tp AS (
  SELECT event_type, bucket_ts, (high + low + close) / 3 AS tp FROM bars
),
w AS (
  SELECT event_type, bucket_ts, tp,
    AVG(tp) OVER win AS sma,
    list(tp) OVER win AS tps
  FROM tp
  WINDOW win AS (PARTITION BY event_type ORDER BY bucket_ts
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT event_type,
  strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  ROUND((tp - sma) / NULLIF(
      0.015 * (list_reduce(list_transform(tps, y -> abs(y - sma)),
                           (a, b) -> a + b) / len(tps)), 0), 6) AS cci20
FROM w
""",
)
def ind_cci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`collect_list` over the ordered frame gives the window members in
    frame order; `aggregate` folds |tp_j − sma_i| left-to-right exactly
    like DuckDB's `list_reduce`, so the MAD is bit-identical. Everything
    stays in whole-stage codegen — no Python. One sort per key shared
    with the SMA window."""
    bars = _bars_1h(spark, sf_dir)
    tp = (F.col("high") + F.col("low") + F.col("close")) / 3
    b = bars.select("event_type", "bucket_ts", tp.alias("tp"))
    win = Window.partitionBy("event_type").orderBy("bucket_ts").rowsBetween(-19, 0)
    sma = F.avg("tp").over(win)
    tps = F.collect_list("tp").over(win)
    w = b.select(
        "event_type", "bucket_ts", "tp", sma.alias("sma"), tps.alias("tps")
    )
    mad = (
        F.aggregate(
            F.transform("tps", lambda y: F.abs(y - F.col("sma"))),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / F.size("tps")
    )
    return w.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.round(
            (F.col("tp") - F.col("sma")) / F.nullif(0.015 * mad, F.lit(0)), 6
        ).alias("cci20"),
    )


# ---------------------------------------------------------------------------
# §2.9 KDJ — double EWM recurrence as one struct fold
# ---------------------------------------------------------------------------
@query(
    "ind_kdj_fold",
    survey="§2.5 W5 / §2.9 KDJ 9,3,3 (incremental/kdj.py:6-50): "
    "K = ewm(RSV, α=1/3), D = ewm(K), J = 3K−2D — the chained EWM pair "
    "evaluated as ONE sequential struct fold per key",
    description="Final KDJ values per event_type (struct-fold over RSV series)",
    oracle=f"""
WITH bars AS ({_TAIL_BARS_1H_SQL}),
rsv AS (
  SELECT event_type, bucket_ts,
    (close - MIN(low) OVER w) / NULLIF(MAX(high) OVER w - MIN(low) OVER w, 0)
      * 100 AS rsv
  FROM bars
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
),
series AS (
  SELECT event_type, list(rsv ORDER BY bucket_ts) AS vals FROM rsv GROUP BY 1
),
folded AS (
  SELECT event_type, len(vals) AS n_bars,
    list_reduce(
      list_transform(vals, x -> struct_pack(k := x, d := x)),
      -- NOTE: d is listed BEFORE k. DuckDB 1.0's list_reduce is
      -- functional on the FIRST fold step but mutates the accumulator
      -- field-by-field from the second step on (see ind_adx_di), so
      -- the only order-stable contract is to never read an acc field
      -- assigned earlier in the struct_pack; putting d first keeps
      -- both fields reading the previous step's values in both
      -- regimes (validated bit-exact vs a sequential Python fold).
      (acc, x) -> struct_pack(
        d := (2 * acc.d + (2 * acc.k + x.k) / 3) / 3,
        k := (2 * acc.k + x.k) / 3
      )
    ) AS kd
  FROM series
)
SELECT event_type, CAST(n_bars AS BIGINT) AS n_bars,
  ROUND(kd.k, 6) AS k,
  ROUND(kd.d, 6) AS d,
  ROUND(3 * kd.k - 2 * kd.d, 6) AS j
FROM folded
""",
)
def ind_kdj_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSV from native rolling-extent windows (partial frames seed the
    series, matching the incremental ewm-from-first-value variant), then
    the K/D pair advances together in one left fold: the accumulator is
    a (k, d) struct and each step computes k' before folding it into d'.
    Sequential order in both engines → bit-identical doubles."""
    bars = _bars_1h_tail(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("bucket_ts").rowsBetween(-8, 0)
    rng = F.max("high").over(w) - F.min("low").over(w)
    rsv = (F.col("close") - F.min("low").over(w)) / F.nullif(rng, F.lit(0)) * 100
    r = bars.select("event_type", "bucket_ts", rsv.alias("rsv"))
    series = r.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("bucket_ts", "rsv"))).alias("pairs")
    )
    vals = F.transform(F.col("pairs"), lambda p: p["rsv"])
    first = F.element_at(vals, 1)

    def step(acc, x):
        new_k = (2 * acc["k"] + x) / 3
        return F.struct(
            new_k.alias("k"), ((2 * acc["d"] + new_k) / 3).alias("d")
        )

    kd = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.struct(first.alias("k"), first.alias("d")),
        step,
    )
    return series.select(
        "event_type",
        F.size("pairs").cast("long").alias("n_bars"),
        F.round(kd["k"], 6).alias("k"),
        F.round(kd["d"], 6).alias("d"),
        F.round(3 * kd["k"] - 2 * kd["d"], 6).alias("j"),
    )


# ---------------------------------------------------------------------------
# §2.9 Keltner — composed EWM recurrences in one struct fold
# ---------------------------------------------------------------------------
@query(
    "ind_keltner_fold",
    survey="§2.9 Keltner EMA20 ± 2×ATR10 (lean_indicators.py:208-233): "
    "two coupled recurrences (EMA of close, Wilder RMA of true range "
    "needing prev close) advanced together in one fold per key",
    description="Final Keltner channel per event_type (EMA/ATR/prev-close fold)",
    oracle=f"""
WITH bars AS ({_TAIL_BARS_1H_SQL}),
series AS (
  SELECT event_type,
    list(struct_pack(h := high, l := low, c := close) ORDER BY bucket_ts)
      AS vals
  FROM bars GROUP BY 1
),
folded AS (
  SELECT event_type, len(vals) AS n_bars,
    list_reduce(
      list_transform(vals, x -> struct_pack(
        ema := x.c, atr := x.h - x.l, pc := x.c,
        h := x.h, l := x.l, c := x.c)),
      -- field order matters: DuckDB 1.0 folds structs by mutating the
      -- accumulator in field order, so every field must be listed
      -- before any field it is read by: atr reads pc (listed later),
      -- ema reads only ema, pc/h/l/c read only x.
      (acc, x) -> struct_pack(
        ema := acc.ema * (1.0 - 2.0 / 21.0) + x.c * (2.0 / 21.0),
        atr := (acc.atr * 9 + GREATEST(x.h - x.l, ABS(x.h - acc.pc),
                                       ABS(x.l - acc.pc))) / 10,
        pc := x.c, h := x.h, l := x.l, c := x.c
      )
    ) AS s
  FROM series
)
SELECT event_type, CAST(n_bars AS BIGINT) AS n_bars,
  ROUND(s.ema, 6) AS ema20,
  ROUND(s.atr, 6) AS atr10,
  ROUND(s.ema + 2 * s.atr, 6) AS upper_band,
  ROUND(s.ema - 2 * s.atr, 6) AS lower_band
FROM folded
""",
)
def ind_keltner_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMA(close, 20) and Wilder ATR(10) advance in lock-step: the
    accumulator carries (ema, atr, prev_close) and each bar folds both
    recurrences in one pass — the composition pattern every
    EMA-of-something indicator (Keltner, MACD signal, KDJ) reduces to.
    Seeded reference-style from the first bar (ema=close0,
    atr=high0-low0). Sequential fold order in both engines keeps the
    doubles bit-identical."""
    bars = _bars_1h_tail(spark, sf_dir)
    series = bars.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("bucket_ts", "high", "low", "close"))
        ).alias("pairs")
    )
    vals = F.transform(
        F.col("pairs"),
        lambda p: F.struct(
            p["high"].alias("h"), p["low"].alias("l"), p["close"].alias("c")
        ),
    )
    first = F.element_at(vals, 1)
    init = F.struct(
        first["c"].alias("ema"),
        (first["h"] - first["l"]).alias("atr"),
        first["c"].alias("pc"),
    )
    a1, a2 = 1.0 / 10.0, 2.0 / 21.0

    def step(acc, x):
        tr = F.greatest(
            x["h"] - x["l"], F.abs(x["h"] - acc["pc"]), F.abs(x["l"] - acc["pc"])
        )
        return F.struct(
            (acc["ema"] * F.lit(1.0 - a2) + x["c"] * F.lit(a2)).alias("ema"),
            ((acc["atr"] * 9 + tr) / 10).alias("atr"),
            x["c"].alias("pc"),
        )

    s = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))), init, step
    )
    return series.select(
        "event_type",
        F.size("pairs").cast("long").alias("n_bars"),
        F.round(s["ema"], 6).alias("ema20"),
        F.round(s["atr"], 6).alias("atr10"),
        F.round(s["ema"] + 2 * s["atr"], 6).alias("upper_band"),
        F.round(s["ema"] - 2 * s["atr"], 6).alias("lower_band"),
    )


# ---------------------------------------------------------------------------
# §2.9 liquidity + fib-sniper — the two remaining closed-form indicator
# classes, individually oracle-matched (shrinks the rows-only surface)
# ---------------------------------------------------------------------------
_LIQ_BARS_SQL = """
  SELECT
    event_type,
    time_bucket(INTERVAL '1 hour', ts) AS b,
    max_by(value, ts) AS close,
    CAST(SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS DOUBLE) AS vol
  FROM events GROUP BY 1, 2
"""


def _vol_bars_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h close+volume bars matching _LIQ_BARS_SQL (decimal volume sum
    rendered as double — exact, order-free)."""
    from tradecat_spark.operators.rollup import bucket_ts

    return _series(spark, sf_dir).groupBy(
        "event_type",
        bucket_ts("ts", 3600).alias("b"),
    ).agg(
        F.max_by("value", "ts").alias("close"),
        F.sum(F.abs(F.col("value")).cast("decimal(18,8)"))
        .cast("double")
        .alias("vol"),
    )


@query(
    "ind_liquidity_profile",
    survey="§2.9 liquidity (batch/liquidity.py:12-154): Amihud z, Kyle "
    "lambda via OLS slope over dollar flow, volatility, sigmoid "
    "composite + level label",
    description="Per-symbol Amihud z / Kyle lambda / volatility / liquidity score over 1h bars",
    oracle=f"""
WITH bars AS ({_LIQ_BARS_SQL}),
d AS (
  SELECT event_type, b, close, vol,
    close * vol AS dollar,
    close / lag(close) OVER w - 1 AS ret,
    CAST(ROW_NUMBER() OVER w AS DOUBLE) AS idx
  FROM bars
  WINDOW w AS (PARTITION BY event_type ORDER BY b)
),
a AS (
  SELECT event_type, b, close, dollar, ret, idx,
    ABS(ret) / NULLIF(dollar, 0) * 1e6 AS amihud
  FROM d
),
g AS (
  SELECT event_type,
    max_by(amihud, b) AS last_amihud,
    AVG(amihud) AS mu, STDDEV_SAMP(amihud) AS sd,
    REGR_SLOPE(close, idx) AS slope,
    AVG(dollar) AS mean_dollar,
    STDDEV_SAMP(ret) AS vol_ret
  FROM a GROUP BY event_type
)
SELECT event_type,
  ROUND((last_amihud - mu) / NULLIF(sd, 0), 6) + 0.0 AS amihud_z,
  ROUND(slope / NULLIF(mean_dollar, 0), 6) + 0.0 AS kyle_lambda,
  ROUND(vol_ret, 6) + 0.0 AS volatility,
  ROUND(100 / (1 + exp(-(0.5 * (-((last_amihud - mu) / NULLIF(sd, 0)))
                         - vol_ret))), 6) AS liq_score,
  CASE
    WHEN ROUND(100 / (1 + exp(-(0.5 * (-((last_amihud - mu) / NULLIF(sd, 0)))
                                - vol_ret))), 6) >= 75 THEN 'excellent'
    WHEN ROUND(100 / (1 + exp(-(0.5 * (-((last_amihud - mu) / NULLIF(sd, 0)))
                                - vol_ret))), 6) >= 50 THEN 'good'
    WHEN ROUND(100 / (1 + exp(-(0.5 * (-((last_amihud - mu) / NULLIF(sd, 0)))
                                - vol_ret))), 6) >= 25 THEN 'fair'
    ELSE 'poor'
  END AS liq_level
FROM g
""",
)
def ind_liquidity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One bar rollup → one window pass (lag + row_number share the
    (symbol ORDER BY bucket) sort) → one group-aggregate; the level
    label derives from the 6dp-rounded score so both engines bin the
    same double."""
    bars = _vol_bars_1h(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("b")
    d = bars.select(
        "event_type", "b", "close",
        (F.col("close") * F.col("vol")).alias("dollar"),
        (F.col("close") / F.lag("close").over(w) - 1).alias("ret"),
        F.row_number().over(w).cast("double").alias("idx"),
    ).withColumn(
        "amihud", F.abs(F.col("ret")) / F.nullif("dollar", F.lit(0.0)) * 1e6
    )
    g = d.groupBy("event_type").agg(
        F.max_by("amihud", "b").alias("last_amihud"),
        F.avg("amihud").alias("mu"),
        F.stddev_samp("amihud").alias("sd"),
        F.regr_slope("close", "idx").alias("slope"),
        F.avg("dollar").alias("mean_dollar"),
        F.stddev_samp("ret").alias("vol_ret"),
    )
    z = (F.col("last_amihud") - F.col("mu")) / F.nullif("sd", F.lit(0.0))
    score6 = F.round(
        100 / (1 + F.exp(-(0.5 * (-z) - F.col("vol_ret")))), 6
    )
    return g.select(
        "event_type",
        (F.round(z, 6) + F.lit(0.0)).alias("amihud_z"),
        (F.round(F.col("slope") / F.nullif("mean_dollar", F.lit(0.0)), 6)
         + F.lit(0.0)).alias("kyle_lambda"),
        (F.round("vol_ret", 6) + F.lit(0.0)).alias("volatility"),
        score6.alias("liq_score"),
        F.when(score6 >= 75, "excellent")
        .when(score6 >= 50, "good")
        .when(score6 >= 25, "fair")
        .otherwise("poor")
        .alias("liq_level"),
    )


@query(
    "ind_fib_vwma_bands",
    survey="§2.9 fib-sniper (batch/tv_fib_sniper.py): VWMA(200) base, "
    "3-sigma rolling deviation bands, band position + state",
    description="Latest VWMA200 fib-band position per symbol over 1h bars",
    oracle=f"""
WITH bars AS ({_LIQ_BARS_SQL}),
v AS (
  SELECT event_type, b, close,
    ROUND(CAST(SUM(CAST(close AS DECIMAL(18,6)) * CAST(vol AS DECIMAL(18,6)))
          OVER w200 AS DOUBLE)
      / NULLIF(CAST(SUM(CAST(vol AS DECIMAL(18,6))) OVER w200 AS DOUBLE), 0), 6)
      AS vwma200
  FROM bars
  WINDOW w200 AS (PARTITION BY event_type ORDER BY b
                  ROWS BETWEEN 199 PRECEDING AND CURRENT ROW)
),
d AS (
  SELECT event_type, b, close, vwma200,
    ROUND(close - vwma200, 6) AS diff,
    ROUND(STDDEV_SAMP(ROUND(close - vwma200, 6))
          OVER (PARTITION BY event_type ORDER BY b
                ROWS BETWEEN 199 PRECEDING AND CURRENT ROW) * 3.0, 6) AS dev
  FROM v
)
SELECT event_type,
  max_by(vwma200, b) AS vwma200,
  max_by(ROUND(diff / NULLIF(dev, 0), 6), b) AS fib_pos,
  max_by(CASE WHEN ROUND(diff / NULLIF(dev, 0), 6) >= 0
              THEN 'up' ELSE 'down' END, b) AS fib_state
FROM d GROUP BY event_type
""",
)
def ind_fib_vwma_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VWMA numerator/denominator are exact decimal window sums rounded
    before the division, and the deviation stddev consumes 6dp-rounded
    diffs — every float that crosses engines is pre-rounded, so the
    window math is bit-stable. One sort serves both window frames."""
    bars = _vol_bars_1h(spark, sf_dir)
    w200 = (
        Window.partitionBy("event_type").orderBy("b").rowsBetween(-199, 0)
    )
    num = F.sum(
        F.col("close").cast("decimal(18,6)") * F.col("vol").cast("decimal(18,6)")
    ).over(w200).cast("double")
    den = F.sum(F.col("vol").cast("decimal(18,6)")).over(w200).cast("double")
    v = bars.withColumn(
        "vwma200", F.round(num / F.nullif(den, F.lit(0.0)), 6)
    )
    diff = F.round(F.col("close") - F.col("vwma200"), 6)
    d = v.withColumn("diff", diff).withColumn(
        "dev", F.round(F.stddev_samp("diff").over(w200) * 3.0, 6)
    )
    pos = F.round(F.col("diff") / F.nullif("dev", F.lit(0.0)), 6)
    return d.groupBy("event_type").agg(
        F.max_by("vwma200", "b").alias("vwma200"),
        F.max_by(pos, "b").alias("fib_pos"),
        F.max_by(F.when(pos >= 0, "up").otherwise("down"), "b").alias("fib_state"),
    )


# ---------------------------------------------------------------------------
# §2.9 harmonic — mean of RSI(2..33) final values, 64 bounded folds
# ---------------------------------------------------------------------------
def _sql_rsi_last(p: int) -> str:
    """DuckDB: final Wilder RSI(p) from the diffs list. Seeds g=l=0 by
    prepending 0.0 (list_reduce uses the head as the accumulator), then
    folds gains/losses with alpha=1/p — the exact recurrence of
    functions/ta.py rsi_last_multi."""
    a = repr(1.0 / p)
    g = (
        f"list_reduce(list_prepend(0.0::DOUBLE, diffs), (acc, x) -> "
        f"acc * (1.0::DOUBLE - {a}::DOUBLE) + greatest(x, 0.0::DOUBLE) * {a}::DOUBLE)"
    )
    l = (  # noqa: E741
        f"list_reduce(list_prepend(0.0::DOUBLE, diffs), (acc, x) -> "
        f"acc * (1.0::DOUBLE - {a}::DOUBLE) + greatest(-x, 0.0::DOUBLE) * {a}::DOUBLE)"
    )
    return (
        f"(CASE WHEN {g} + {l} = 0 THEN 50.0::DOUBLE "
        f"WHEN {l} = 0 THEN 100.0::DOUBLE "
        f"ELSE 100.0::DOUBLE - 100.0::DOUBLE / (1.0::DOUBLE + {g} / {l}) END)"
    )


_HARMONIC_ORACLE = f"""
WITH tail AS (
  SELECT event_type, ts, value FROM (
    SELECT event_type, ts, value,
      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts DESC) AS rn
    FROM events) t WHERE rn <= 500
),
series AS (
  SELECT event_type, list(value ORDER BY ts) AS vals
  FROM tail GROUP BY event_type
),
d AS (
  SELECT event_type, len(vals) AS n_obs,
    list_transform(range(2, len(vals) + 1), i -> vals[i] - vals[i - 1])
      AS diffs
  FROM series
)
SELECT event_type,
  ROUND(({' + '.join(_sql_rsi_last(p) for p in range(2, 34))}) / 32.0, 6)
    AS harmonic_score,
  CAST(n_obs AS BIGINT) AS n_obs
FROM d
"""


@query(
    "ind_harmonic_score",
    survey="§2.9 harmonic (batch/harmonic.py): mean of Wilder RSI(2..33) "
    "final values — 64 bounded JVM folds; per-period recurrences match "
    "functions/ta.py rsi_last_multi exactly, the 32-term mean is "
    "sequential (numpy's pairwise mean differs ~1e-13, under the 6dp "
    "rounding)",
    description="Harmonic score (mean RSI 2..33) per event_type via fold algebra",
    oracle=_HARMONIC_ORACLE,
)
def ind_harmonic_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same tail-bounded collect as the EWM family; the 64 folds share
    one diffs array per key and run inside whole-stage codegen — at any
    scale the cost is 64×tail flops per key, no extra shuffle."""
    from tradecat_spark.operators.latest import topn_per_group

    e = topn_per_group(_series(spark, sf_dir), ["event_type"], "ts", TAIL_BARS)
    series = e.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("ts", "value"))).alias("pairs")
    )
    vals = F.transform(F.col("pairs"), lambda p: p["value"])
    n = F.size("pairs")
    diffs = F.zip_with(
        F.slice(vals, 2, F.greatest(n - 1, F.lit(0))),
        F.slice(vals, 1, F.greatest(n - 1, F.lit(0))),
        lambda a, b: a - b,
    )
    d = series.select(
        "event_type", n.cast("long").alias("n_obs"), diffs.alias("diffs")
    )

    def _rsi_last(p: int) -> Column:
        a = 1.0 / p
        zero = F.lit(0.0)

        def fold(sign: float) -> Column:
            return F.aggregate(
                F.col("diffs"),
                zero,
                lambda acc, x: acc * F.lit(1.0 - a)
                + F.greatest(x * F.lit(sign), zero) * F.lit(a),
            )

        g, l = fold(1.0), fold(-1.0)  # noqa: E741
        return (
            F.when(g + l == 0, F.lit(50.0))
            .when(l == 0, F.lit(100.0))
            .otherwise(F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + g / l))
        )

    total = _rsi_last(2)
    for p in range(3, 34):
        total = total + _rsi_last(p)
    return d.select(
        "event_type",
        F.round(total / F.lit(32.0), 6).alias("harmonic_score"),
        "n_obs",
    )


# ---------------------------------------------------------------------------
# §2.9 scalping + trend cloud — single-fold classes, oracle-matched
# ---------------------------------------------------------------------------
_TWO_EMA_ORACLE = """
WITH tail AS (
  SELECT event_type, ts, value FROM (
    SELECT event_type, ts, value,
      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts DESC) AS rn
    FROM events) t WHERE rn <= 500
),
series AS (
  SELECT event_type, list(value ORDER BY ts) AS vals
  FROM tail GROUP BY event_type
),
f AS (
  SELECT event_type, vals[len(vals)] AS close,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - {a1}::DOUBLE)
                + x * {a1}::DOUBLE) AS e1,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - {a2}::DOUBLE)
                + x * {a2}::DOUBLE) AS e2
  FROM series
)
"""


@query(
    "ind_scalping_emas",
    survey="§2.9 scalping (batch/scalping.py): EMA5 vs EMA13 cross state",
    description="Scalp fast/slow EMA final values + long/short signal per event_type",
    oracle=(
        _TWO_EMA_ORACLE.replace("{a1}", repr(2.0 / 6.0)).replace("{a2}", repr(2.0 / 14.0))
        + """
SELECT event_type,
  ROUND(e1, 6) AS scalp_fast,
  ROUND(e2, 6) AS scalp_slow,
  CASE WHEN e1 > e2 THEN 'long' ELSE 'short' END AS scalp_signal
FROM f
"""
    ),
)
def ind_scalping_emas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two folds over one collected tail; the signal compares the raw
    (un-rounded) folds, identical doubles on both engines."""
    from tradecat_spark.operators.latest import topn_per_group

    e = topn_per_group(_series(spark, sf_dir), ["event_type"], "ts", TAIL_BARS)
    series = e.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("ts", "value"))).alias("pairs")
    )
    vals = F.transform(F.col("pairs"), lambda p: p["value"])
    fast, slow = ema_fold(vals, 2.0 / 6.0), ema_fold(vals, 2.0 / 14.0)
    return series.select(
        "event_type",
        F.round(fast, 6).alias("scalp_fast"),
        F.round(slow, 6).alias("scalp_slow"),
        F.when(fast > slow, "long").otherwise("short").alias("scalp_signal"),
    )


@query(
    "ind_trend_cloud_side",
    survey="§2.9 trend cloud (batch/tv_trend_cloud.py): SMMA200 "
    "(Wilder ewm alpha=1/200) + which side the close sits on",
    description="SMMA200 final value and cloud side per event_type",
    oracle=(
        _TWO_EMA_ORACLE.replace("{a1}", repr(1.0 / 200.0)).replace("{a2}", repr(1.0 / 200.0))
        + """
SELECT event_type,
  ROUND(e1, 6) AS smma200,
  CASE WHEN close >= e1 THEN 'above' ELSE 'below' END AS cloud_side
FROM f
"""
    ),
)
def ind_trend_cloud_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tradecat_spark.operators.latest import topn_per_group

    e = topn_per_group(_series(spark, sf_dir), ["event_type"], "ts", TAIL_BARS)
    series = e.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("ts", "value"))).alias("pairs")
    )
    vals = F.transform(F.col("pairs"), lambda p: p["value"])
    smma = ema_fold(vals, 1.0 / 200.0)
    close = F.element_at(vals, F.size("pairs"))
    return series.select(
        "event_type",
        F.round(smma, 6).alias("smma200"),
        F.when(close >= smma, "above").otherwise("below").alias("cloud_side"),
    )


# ---------------------------------------------------------------------------
# §2.9 zero-lag — ZLEMA70 ± max(ATR70 over 210 bars) × 1.2
# ---------------------------------------------------------------------------
_ZL_LAG = (70 - 1) // 2  # 34
_ZL_ALPHA = repr(2.0 / 71.0)
_ATR_ALPHA = repr(1.0 / 70.0)

_ZL_ORACLE = f"""
WITH bars AS (
  SELECT event_type,
    time_bucket(INTERVAL '1 hour', ts) AS b,
    max(value) AS high, min(value) AS low, max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
tail AS (
  SELECT * FROM (
    SELECT event_type, b, high, low, close,
      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY b DESC) AS rn
    FROM bars) t WHERE rn <= 500
),
arr AS (
  SELECT event_type,
    list(high ORDER BY b) AS hi,
    list(low ORDER BY b) AS lo,
    list(close ORDER BY b) AS cl,
    COUNT(*) AS n
  FROM tail GROUP BY event_type
),
d AS (
  SELECT event_type, cl, n,
    list_transform(range({_ZL_LAG + 1}, n + 1),
                   i -> 2 * cl[i] - cl[i - {_ZL_LAG}]) AS delag,
    list_transform(range(1, n + 1),
      i -> CASE WHEN i = 1 THEN hi[1] - lo[1]
           ELSE greatest(hi[i] - lo[i], abs(hi[i] - cl[i - 1]),
                         abs(lo[i] - cl[i - 1])) END) AS tr
  FROM arr
),
f AS (
  SELECT event_type, cl[n] AS close, n,
    CASE WHEN n > {_ZL_LAG} THEN
      list_reduce(delag, (acc, x) -> acc * (1.0::DOUBLE - {_ZL_ALPHA}::DOUBLE)
                  + x * {_ZL_ALPHA}::DOUBLE)
    END AS zl,
    list_aggregate(
      list_transform(range(greatest(1, n - 209), n + 1),
        i -> list_reduce(list_slice(tr, 1, i),
               (acc, x) -> acc * (1.0::DOUBLE - {_ATR_ALPHA}::DOUBLE)
               + x * {_ATR_ALPHA}::DOUBLE)),
      'max') * 1.2 AS band
  FROM d
)
SELECT event_type,
  ROUND(zl, 6) AS zlema,
  ROUND(zl + band, 6) AS zl_upper,
  ROUND(zl - band, 6) AS zl_lower,
  CASE WHEN close > zl + band THEN 'bull'
       WHEN close < zl - band THEN 'bear'
       ELSE 'range' END AS zl_state
FROM f
"""


@query(
    "ind_zero_lag_bands",
    survey="§2.9 zero-lag (batch/tv_zero_lag.py, super_trend.py:17-107): "
    "ZLEMA70 of the de-lagged close ± 1.2 × highest ATR70 of the last "
    "210 bars, band state vs close",
    description="Zero-lag trend bands per event_type over 1h bars",
    oracle=_ZL_ORACLE,
)
def ind_zero_lag_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ATR series needs per-position prefix folds (no scan
    primitive in either engine) — bounded at 210 positions × ≤500-bar
    folds per key, pure JVM expression work after one tail collect.
    ZLEMA seeds with the first valid de-lagged value exactly like
    pandas ewm skipping the shift-NaN head (functions/ta.py zlema)."""
    from tradecat_spark.operators.latest import topn_per_group
    from tradecat_spark.operators.rollup import bucket_ts

    bars = _series(spark, sf_dir).groupBy(
        "event_type", bucket_ts("ts", 3600).alias("b")
    ).agg(
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
    )
    tail = topn_per_group(bars, ["event_type"], "b", TAIL_BARS)
    arr = tail.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("b", "high", "low", "close"))
        ).alias("rows")
    )
    hi = F.transform(F.col("rows"), lambda r: r["high"])
    lo = F.transform(F.col("rows"), lambda r: r["low"])
    cl = F.transform(F.col("rows"), lambda r: r["close"])
    n = F.size("rows")
    a_zl, a_atr = 2.0 / 71.0, 1.0 / 70.0
    x = arr.select(
        "event_type", cl.alias("cl"), n.alias("n"),
        F.transform(
            F.sequence(F.lit(_ZL_LAG + 1), n),
            lambda i: 2 * F.element_at(cl, i) - F.element_at(cl, i - _ZL_LAG),
        ).alias("delag"),
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.when(
                i == 1, F.element_at(hi, 1) - F.element_at(lo, 1)
            ).otherwise(
                F.greatest(
                    F.element_at(hi, i) - F.element_at(lo, i),
                    F.abs(F.element_at(hi, i) - F.element_at(cl, i - 1)),
                    F.abs(F.element_at(lo, i) - F.element_at(cl, i - 1)),
                )
            ),
        ).alias("tr"),
    )
    zl = F.when(
        F.col("n") > _ZL_LAG,
        F.aggregate(
            F.slice(F.col("delag"), 2, F.greatest(F.size("delag") - 1, F.lit(0))),
            F.element_at(F.col("delag"), 1).cast("double"),
            lambda acc, v: acc * F.lit(1.0 - a_zl) + v * F.lit(a_zl),
        ),
    )
    atr_tail = F.transform(
        F.sequence(F.greatest(F.lit(1), F.col("n") - 209), F.col("n")),
        lambda i: F.aggregate(
            F.slice(F.col("tr"), 2, i - 1),
            F.element_at(F.col("tr"), 1).cast("double"),
            lambda acc, v: acc * F.lit(1.0 - a_atr) + v * F.lit(a_atr),
        ),
    )
    band = F.array_max(atr_tail) * 1.2
    close = F.element_at(F.col("cl"), F.col("n"))
    y = x.select(
        "event_type", close.alias("close"), zl.alias("zl"), band.alias("band")
    )
    return y.select(
        "event_type",
        F.round("zl", 6).alias("zlema"),
        F.round(F.col("zl") + F.col("band"), 6).alias("zl_upper"),
        F.round(F.col("zl") - F.col("band"), 6).alias("zl_lower"),
        F.when(F.col("close") > F.col("zl") + F.col("band"), "bull")
        .when(F.col("close") < F.col("zl") - F.col("band"), "bear")
        .otherwise("range")
        .alias("zl_state"),
    )


# ---------------------------------------------------------------------------
# §2.9 ADX/±DI — three coupled Wilder recurrences in ONE struct fold
# ---------------------------------------------------------------------------
_ADX_A = repr(1.0 / 14.0)
_ADX_1MA = repr(1.0 - 1.0 / 14.0)

# New smoother values, inlined wherever a field needs the post-update
# rma (dx_i reads the rma AT i).  All acc.* references are to fields
# assigned LATER in the struct_pack — the only contract stable under
# BOTH of DuckDB list_reduce's observed regimes (functional on the
# first fold step, accumulator-mutating field-by-field from the second
# step on; verified empirically on 1.0.0 with a [s, z] fold where
# z := acc.z + (acc.s + x.s) sees the new s from step 2).
_NSP = (
    "(acc.sp * {_ADX_1MA}::DOUBLE + (CASE WHEN (x.h - acc.h) > (acc.l - x.l)"
    " AND (x.h - acc.h) > 0 THEN x.h - acc.h ELSE 0.0::DOUBLE END)"
    " * {_ADX_A}::DOUBLE)"
)
_NSM = (
    "(acc.sm * {_ADX_1MA}::DOUBLE + (CASE WHEN (acc.l - x.l) > (x.h - acc.h)"
    " AND (acc.l - x.l) > 0 THEN acc.l - x.l ELSE 0.0::DOUBLE END)"
    " * {_ADX_A}::DOUBLE)"
)
_NST = (
    "(acc.st * {_ADX_1MA}::DOUBLE + greatest(x.h - x.l, abs(x.h - acc.c),"
    " abs(x.l - acc.c)) * {_ADX_A}::DOUBLE)"
)

_ADX_ORACLE = """
WITH bars AS ({bars}),
series AS (
  SELECT event_type,
    list(struct_pack(
      adx := 0.0::DOUBLE, sp := 0.0::DOUBLE, sm := 0.0::DOUBLE,
      st := high - low, h := high, l := low, c := close
    ) ORDER BY bucket_ts) AS vals,
    COUNT(*) AS n_bars
  FROM bars GROUP BY event_type
),
folded AS (
  SELECT event_type, n_bars,
    list_reduce(vals, (acc, x) -> struct_pack(
      adx := acc.adx * {_ADX_1MA}::DOUBLE
             + (CASE WHEN {_NST} = 0 THEN 0.0::DOUBLE
                     WHEN 100 * {_NSP} / {_NST} + 100 * {_NSM} / {_NST} = 0
                       THEN 0.0::DOUBLE
                     ELSE 100 * abs(100 * {_NSP} / {_NST} - 100 * {_NSM} / {_NST})
                          / (100 * {_NSP} / {_NST} + 100 * {_NSM} / {_NST})
                END) * {_ADX_A}::DOUBLE,
      sp := {_NSP},
      sm := {_NSM},
      st := {_NST},
      h := x.h, l := x.l, c := x.c
    )) AS s
  FROM series
)
SELECT event_type, CAST(n_bars AS BIGINT) AS n_bars,
  ROUND(s.adx, 6) AS adx,
  ROUND(CASE WHEN s.st = 0 THEN NULL ELSE 100 * s.sp / s.st END, 6) AS plus_di,
  ROUND(CASE WHEN s.st = 0 THEN NULL ELSE 100 * s.sm / s.st END, 6) AS minus_di
FROM folded
""".replace("{_ADX_A}", _ADX_A).replace("{_ADX_1MA}", _ADX_1MA).replace(
    "{_NSP}", _NSP.replace("{_ADX_A}", _ADX_A).replace("{_ADX_1MA}", _ADX_1MA)
).replace(
    "{_NSM}", _NSM.replace("{_ADX_A}", _ADX_A).replace("{_ADX_1MA}", _ADX_1MA)
).replace(
    "{_NST}", _NST.replace("{_ADX_A}", _ADX_A).replace("{_ADX_1MA}", _ADX_1MA)
)


@query(
    "ind_adx_di",
    survey="§2.9 ADX/±DI 14 (lean_indicators.py:88-130): Wilder rma of "
    "±DM and TR plus the rma of DX — three coupled recurrences advanced "
    "together in one struct fold per key (functions/ta.py adx)",
    description="Final ADX and ±DI per event_type via one sequential struct fold",
    oracle=_ADX_ORACLE.format(bars=_TAIL_BARS_1H_SQL),
)
def ind_adx_di(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeds mirror pandas: ±DM smoothers start at the fillna(0) first
    diff, the TR smoother at the first bar's high-low (prev-close NaN
    is fmax-ignored), the DX smoother at 0 (0/0 → NaN → fillna).
    dx_i reads the rma values AT i (post-update), matching the series
    form; Spark's functional lambda computes the same values the
    DuckDB fold produces under the field-order contract above —
    pinned bit-exact against functions/ta.adx in
    tests/test_indicators.py."""
    bars = _bars_1h_tail(spark, sf_dir)
    series = bars.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("bucket_ts", "high", "low", "close"))
        ).alias("rows")
    )
    a = 1.0 / 14.0
    one_m = F.lit(1.0 - a)
    al = F.lit(a)
    zero = F.lit(0.0)

    first = F.element_at(F.col("rows"), 1)
    seed = F.struct(
        zero.alias("adx"), zero.alias("sp"), zero.alias("sm"),
        (first["high"] - first["low"]).alias("st"),
        first["high"].alias("h"), first["low"].alias("l"),
        first["close"].alias("c"),
    )

    def step(acc, x):
        up = x["high"] - acc["h"]
        dn = acc["l"] - x["low"]
        pdm = F.when((up > dn) & (up > 0), up).otherwise(zero)
        mdm = F.when((dn > up) & (dn > 0), dn).otherwise(zero)
        tr = F.greatest(
            x["high"] - x["low"],
            F.abs(x["high"] - acc["c"]),
            F.abs(x["low"] - acc["c"]),
        )
        nsp = acc["sp"] * one_m + pdm * al
        nsm = acc["sm"] * one_m + mdm * al
        nst = acc["st"] * one_m + tr * al
        pdi = 100 * nsp / nst
        mdi = 100 * nsm / nst
        dx = (
            F.when(nst == 0, zero)
            .when(pdi + mdi == 0, zero)
            .otherwise(100 * F.abs(pdi - mdi) / (pdi + mdi))
        )
        return F.struct(
            (acc["adx"] * one_m + dx * al).alias("adx"),
            nsp.alias("sp"), nsm.alias("sm"), nst.alias("st"),
            x["high"].alias("h"), x["low"].alias("l"), x["close"].alias("c"),
        )

    s = F.aggregate(
        F.slice(F.col("rows"), 2, F.greatest(F.size("rows") - 1, F.lit(0))),
        seed,
        step,
    )
    return series.select(
        "event_type",
        F.size("rows").cast("long").alias("n_bars"),
        F.round(s["adx"], 6).alias("adx"),
        F.round(
            F.when(s["st"] != 0, 100 * s["sp"] / s["st"]), 6
        ).alias("plus_di"),
        F.round(
            F.when(s["st"] != 0, 100 * s["sm"] / s["st"]), 6
        ).alias("minus_di"),
    )


# ---------------------------------------------------------------------------
# §2.9 SuperTrend — Wilder-ATR band flips as ONE struct fold
# ---------------------------------------------------------------------------
_ST_A = repr(1.0 / 10.0)
_ST_1MA = repr(1.0 - 1.0 / 10.0)

# order-stable contract (see ind_adx_di): fields only read acc fields
# assigned LATER; dir inlines the new fu/fl/atr expressions.
_ST_NATR = (
    "(acc.atr * {_ST_1MA}::DOUBLE + greatest(x.h - x.l, abs(x.h - acc.c),"
    " abs(x.l - acc.c)) * {_ST_A}::DOUBLE)"
)
_ST_NFU = (
    "(CASE WHEN ((x.h + x.l) / 2 + 3.0 * {_ST_NATR}) < acc.fu"
    " OR acc.c > acc.fu THEN ((x.h + x.l) / 2 + 3.0 * {_ST_NATR})"
    " ELSE acc.fu END)"
)
_ST_NFL = (
    "(CASE WHEN ((x.h + x.l) / 2 - 3.0 * {_ST_NATR}) > acc.fl"
    " OR acc.c < acc.fl THEN ((x.h + x.l) / 2 - 3.0 * {_ST_NATR})"
    " ELSE acc.fl END)"
)

_ST_ORACLE = """
WITH bars AS ({bars}),
series AS (
  SELECT event_type,
    list(struct_pack(
      dir := 1.0::DOUBLE,
      fu := (high + low) / 2 + 3.0 * (high - low),
      fl := (high + low) / 2 - 3.0 * (high - low),
      atr := high - low, h := high, l := low, c := close
    ) ORDER BY bucket_ts) AS vals,
    COUNT(*) AS n_bars
  FROM bars GROUP BY event_type
),
folded AS (
  SELECT event_type, n_bars,
    list_reduce(vals, (acc, x) -> struct_pack(
      dir := CASE WHEN x.c > {_ST_NFU} THEN 1.0::DOUBLE
                  WHEN x.c < {_ST_NFL} THEN -1.0::DOUBLE
                  ELSE acc.dir END,
      fu := {_ST_NFU},
      fl := {_ST_NFL},
      atr := {_ST_NATR},
      h := x.h, l := x.l, c := x.c
    )) AS s
  FROM series
)
SELECT event_type, CAST(n_bars AS BIGINT) AS n_bars,
  ROUND(CASE WHEN s.dir = 1.0 THEN s.fl ELSE s.fu END, 6) AS st_line,
  s.dir AS st_dir,
  CASE WHEN s.dir > 0 THEN 'up' ELSE 'down' END AS st_state
FROM folded
""".replace("{_ST_NFU}", _ST_NFU).replace("{_ST_NFL}", _ST_NFL).replace(
    "{_ST_NATR}", _ST_NATR
).replace("{_ST_A}", _ST_A).replace("{_ST_1MA}", _ST_1MA)


@query(
    "ind_supertrend_fold",
    survey="§2.9 SuperTrend 10/3.0 (lean_indicators.py:29-84, "
    "functions/ta.py supertrend): Wilder ATR, conditional band carry, "
    "trend flips — the flagship path-dependent recurrence as one fold",
    description="Final SuperTrend line/direction/state per event_type",
    oracle=_ST_ORACLE.format(bars=_TAIL_BARS_1H_SQL),
)
def ind_supertrend_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State = (dir, fu, fl, atr, prev h/l/c). Each bar advances the
    ATR, carries or resets the final bands (band ratchet: the upper
    band only moves down unless the prev close broke it), and flips
    the direction against the NEW bands — the exact per-row loop of
    the pandas reference, pinned bit-exact by
    tests/test_indicators.py::test_supertrend_fold_query_matches_pandas."""
    bars = _bars_1h_tail(spark, sf_dir)
    series = bars.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("bucket_ts", "high", "low", "close"))
        ).alias("rows")
    )
    a = 1.0 / 10.0
    one_m = F.lit(1.0 - a)
    al = F.lit(a)

    first = F.element_at(F.col("rows"), 1)
    atr0 = first["high"] - first["low"]
    mid0 = (first["high"] + first["low"]) / 2
    seed = F.struct(
        F.lit(1.0).alias("dir"),
        (mid0 + 3.0 * atr0).alias("fu"),
        (mid0 - 3.0 * atr0).alias("fl"),
        atr0.alias("atr"),
        first["high"].alias("h"), first["low"].alias("l"),
        first["close"].alias("c"),
    )

    def step(acc, x):
        tr = F.greatest(
            x["high"] - x["low"],
            F.abs(x["high"] - acc["c"]),
            F.abs(x["low"] - acc["c"]),
        )
        natr = acc["atr"] * one_m + tr * al
        mid = (x["high"] + x["low"]) / 2
        upper = mid + 3.0 * natr
        lower = mid - 3.0 * natr
        nfu = F.when(
            (upper < acc["fu"]) | (acc["c"] > acc["fu"]), upper
        ).otherwise(acc["fu"])
        nfl = F.when(
            (lower > acc["fl"]) | (acc["c"] < acc["fl"]), lower
        ).otherwise(acc["fl"])
        ndir = (
            F.when(x["close"] > nfu, F.lit(1.0))
            .when(x["close"] < nfl, F.lit(-1.0))
            .otherwise(acc["dir"])
        )
        return F.struct(
            ndir.alias("dir"), nfu.alias("fu"), nfl.alias("fl"),
            natr.alias("atr"),
            x["high"].alias("h"), x["low"].alias("l"), x["close"].alias("c"),
        )

    s = F.aggregate(
        F.slice(F.col("rows"), 2, F.greatest(F.size("rows") - 1, F.lit(0))),
        seed,
        step,
    )
    return series.select(
        "event_type",
        F.size("rows").cast("long").alias("n_bars"),
        F.round(
            F.when(s["dir"] == 1.0, s["fl"]).otherwise(s["fu"]), 6
        ).alias("st_line"),
        s["dir"].alias("st_dir"),
        F.when(s["dir"] > 0, "up").otherwise("down").alias("st_state"),
    )


# ---------------------------------------------------------------------------
# §2.9 EMA-GC regime + smoothed Heikin-Ashi long/short — fold queries
# ---------------------------------------------------------------------------
_EMA3_ORACLE = """
WITH tail AS (
  SELECT event_type, ts, value FROM (
    SELECT event_type, ts, value,
      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts DESC) AS rn
    FROM events) t WHERE rn <= 500
),
series AS (
  SELECT event_type, list(value ORDER BY ts) AS vals
  FROM tail GROUP BY event_type
),
f AS (
  SELECT event_type,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - {a7}::DOUBLE)
                + x * {a7}::DOUBLE) AS e7,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - {a25}::DOUBLE)
                + x * {a25}::DOUBLE) AS e25,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - {a99}::DOUBLE)
                + x * {a99}::DOUBLE) AS e99
  FROM series
)
SELECT event_type,
  ROUND(e7, 6) AS ema7, ROUND(e25, 6) AS ema25, ROUND(e99, 6) AS ema99,
  CASE WHEN e7 > e25 AND e25 > e99 THEN 'bull_stack'
       WHEN e7 < e25 AND e25 < e99 THEN 'bear_stack'
       ELSE 'tangled' END AS regime,
  ROUND(100 * (1 - exp(-(CASE WHEN e99 <> 0 THEN abs(e7 - e99) / e99
                              ELSE 0.0::DOUBLE END) / 0.05)), 6) AS bw_score
FROM f
""".replace("{a7}", repr(2.0 / 8.0)).replace("{a25}", repr(2.0 / 26.0)).replace(
    "{a99}", repr(2.0 / 100.0)
)


@query(
    "ind_ema_gc_regime",
    survey="§2.9 EMA-GC (incremental/ema_gc.py:9-59): EMA7/25/99 stack "
    "regime labels + exponential bandwidth score",
    description="EMA7/25/99 regime + bw score per event_type via three folds",
    oracle=_EMA3_ORACLE,
)
def ind_ema_gc_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tradecat_spark.operators.latest import topn_per_group

    e = topn_per_group(_series(spark, sf_dir), ["event_type"], "ts", TAIL_BARS)
    series = e.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("ts", "value"))).alias("pairs")
    )
    vals = F.transform(F.col("pairs"), lambda p: p["value"])
    e7 = ema_fold(vals, 2.0 / 8.0)
    e25 = ema_fold(vals, 2.0 / 26.0)
    e99 = ema_fold(vals, 2.0 / 100.0)
    bw = F.when(e99 != 0, F.abs(e7 - e99) / e99).otherwise(F.lit(0.0))
    return series.select(
        "event_type",
        F.round(e7, 6).alias("ema7"),
        F.round(e25, 6).alias("ema25"),
        F.round(e99, 6).alias("ema99"),
        F.when((e7 > e25) & (e25 > e99), "bull_stack")
        .when((e7 < e25) & (e25 < e99), "bear_stack")
        .otherwise("tangled")
        .alias("regime"),
        F.round(100 * (1 - F.exp(-bw / 0.05)), 6).alias("bw_score"),
    )


_HA_A = repr(2.0 / 11.0)  # EMA(10) smoothing for the input legs

_HA_ORACLE = """
WITH bars AS ({bars}),
series AS (
  SELECT event_type,
    -- order-stable field contract (see ind_adx_di): ha_o first (reads
    -- only acc.ha_o/ha_c, assigned at-or-after), ha_c inlines the new
    -- EMA registers, the registers come last.
    list(struct_pack(
      so := (open + close) / 2,
      sc := (open + high + low + close) / 4,
      ha_o := (open + close) / 2,
      ha_c := (open + high + low + close) / 4,
      eo := open, eh := high, el := low, ec := close
    ) ORDER BY bucket_ts) AS vals,
    COUNT(*) AS n_bars
  FROM bars GROUP BY event_type
),
folded AS (
  SELECT event_type, n_bars,
    -- so/sc are the EMA(10)s of the HA outputs (the reference smooths
    -- after as well); they inline the NEW ha_o/ha_c expressions and
    -- precede every field they read, per the order-stable contract.
    list_reduce(vals, (acc, x) -> struct_pack(
      so := acc.so * (1.0::DOUBLE - {_HA_A}::DOUBLE)
            + ((acc.ha_o + acc.ha_c) / 2) * {_HA_A}::DOUBLE,
      sc := acc.sc * (1.0::DOUBLE - {_HA_A}::DOUBLE)
            + (((acc.eo * (1.0::DOUBLE - {_HA_A}::DOUBLE) + x.eo * {_HA_A}::DOUBLE)
              + (acc.eh * (1.0::DOUBLE - {_HA_A}::DOUBLE) + x.eh * {_HA_A}::DOUBLE)
              + (acc.el * (1.0::DOUBLE - {_HA_A}::DOUBLE) + x.el * {_HA_A}::DOUBLE)
              + (acc.ec * (1.0::DOUBLE - {_HA_A}::DOUBLE) + x.ec * {_HA_A}::DOUBLE)) / 4)
              * {_HA_A}::DOUBLE,
      ha_o := (acc.ha_o + acc.ha_c) / 2,
      ha_c := ((acc.eo * (1.0::DOUBLE - {_HA_A}::DOUBLE) + x.eo * {_HA_A}::DOUBLE)
             + (acc.eh * (1.0::DOUBLE - {_HA_A}::DOUBLE) + x.eh * {_HA_A}::DOUBLE)
             + (acc.el * (1.0::DOUBLE - {_HA_A}::DOUBLE) + x.el * {_HA_A}::DOUBLE)
             + (acc.ec * (1.0::DOUBLE - {_HA_A}::DOUBLE) + x.ec * {_HA_A}::DOUBLE)) / 4,
      eo := acc.eo * (1.0::DOUBLE - {_HA_A}::DOUBLE) + x.eo * {_HA_A}::DOUBLE,
      eh := acc.eh * (1.0::DOUBLE - {_HA_A}::DOUBLE) + x.eh * {_HA_A}::DOUBLE,
      el := acc.el * (1.0::DOUBLE - {_HA_A}::DOUBLE) + x.el * {_HA_A}::DOUBLE,
      ec := acc.ec * (1.0::DOUBLE - {_HA_A}::DOUBLE) + x.ec * {_HA_A}::DOUBLE
    )) AS s
  FROM series
)
SELECT event_type, CAST(n_bars AS BIGINT) AS n_bars,
  ROUND(s.so, 6) AS ha_open,
  ROUND(s.sc, 6) AS ha_close,
  CASE WHEN s.sc >= s.so THEN 'long' ELSE 'short' END AS ls_signal
FROM folded
""".replace("{_HA_A}", _HA_A)


@query(
    "ind_heikin_long_short",
    survey="§2.9 long/short (batch/tv_long_short.py, functions/ta.py "
    "heikin_ashi): EMA(10)-smoothed inputs, recursive HA open, final "
    "long/short flip",
    description="Smoothed Heikin-Ashi open/close + long/short signal per event_type",
    oracle=_HA_ORACLE.format(bars=_TAIL_BARS_1H_SQL),
)
def ind_heikin_long_short(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State = four EMA registers + the recursive HA pair. ha_o reads
    the PREVIOUS ha_o/ha_c; ha_c averages the NEW registers (inlined).
    Seeds mirror the pandas form: registers start at bar 1's raw OHLC,
    ha_c0 = their mean, ha_o0 = (eo0+ec0)/2. Pinned bit-exact against
    functions/ta.heikin_ashi in tests/test_indicators.py."""
    bars = _bars_1h_tail(spark, sf_dir)
    series = bars.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(
                F.struct("bucket_ts", "open", "high", "low", "close")
            )
        ).alias("rows")
    )
    a = 2.0 / 11.0
    one_m = F.lit(1.0 - a)
    al = F.lit(a)

    first = F.element_at(F.col("rows"), 1)
    ha_o0 = (first["open"] + first["close"]) / 2
    ha_c0 = (first["open"] + first["high"] + first["low"] + first["close"]) / 4
    seed = F.struct(
        ha_o0.alias("so"), ha_c0.alias("sc"),
        ha_o0.alias("ha_o"), ha_c0.alias("ha_c"),
        first["open"].alias("eo"), first["high"].alias("eh"),
        first["low"].alias("el"), first["close"].alias("ec"),
    )

    def step(acc, x):
        neo = acc["eo"] * one_m + x["open"] * al
        neh = acc["eh"] * one_m + x["high"] * al
        nel = acc["el"] * one_m + x["low"] * al
        nec = acc["ec"] * one_m + x["close"] * al
        nha_o = (acc["ha_o"] + acc["ha_c"]) / 2
        nha_c = (neo + neh + nel + nec) / 4
        return F.struct(
            (acc["so"] * one_m + nha_o * al).alias("so"),
            (acc["sc"] * one_m + nha_c * al).alias("sc"),
            nha_o.alias("ha_o"), nha_c.alias("ha_c"),
            neo.alias("eo"), neh.alias("eh"), nel.alias("el"), nec.alias("ec"),
        )

    s = F.aggregate(
        F.slice(F.col("rows"), 2, F.greatest(F.size("rows") - 1, F.lit(0))),
        seed,
        step,
    )
    return series.select(
        "event_type",
        F.size("rows").cast("long").alias("n_bars"),
        F.round(s["so"], 6).alias("ha_open"),
        F.round(s["sc"], 6).alias("ha_close"),
        F.when(s["sc"] >= s["so"], "long").otherwise("short").alias("ls_signal"),
    )


# ---------------------------------------------------------------------------
# §2.9 Madrid ribbon — 18 EMAs now + one bar ago = 36 folds, final state
# ---------------------------------------------------------------------------
_RIBBON_ORACLE = """
WITH tail AS (
  SELECT event_type, ts, value FROM (
    SELECT event_type, ts, value,
      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts DESC) AS rn
    FROM events) t WHERE rn <= 500
),
series AS (
  SELECT event_type, list(value ORDER BY ts) AS vals
  FROM tail GROUP BY event_type
),
f AS (
  SELECT event_type, len(vals) AS n, vals[len(vals)] AS cur,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.3333333333333333::DOUBLE) + x * 0.3333333333333333::DOUBLE) AS f5,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.18181818181818182::DOUBLE) + x * 0.18181818181818182::DOUBLE) AS f10,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.125::DOUBLE) + x * 0.125::DOUBLE) AS f15,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.09523809523809523::DOUBLE) + x * 0.09523809523809523::DOUBLE) AS f20,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.07692307692307693::DOUBLE) + x * 0.07692307692307693::DOUBLE) AS f25,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.06451612903225806::DOUBLE) + x * 0.06451612903225806::DOUBLE) AS f30,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.05555555555555555::DOUBLE) + x * 0.05555555555555555::DOUBLE) AS f35,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.04878048780487805::DOUBLE) + x * 0.04878048780487805::DOUBLE) AS f40,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.043478260869565216::DOUBLE) + x * 0.043478260869565216::DOUBLE) AS f45,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.0392156862745098::DOUBLE) + x * 0.0392156862745098::DOUBLE) AS f50,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.03571428571428571::DOUBLE) + x * 0.03571428571428571::DOUBLE) AS f55,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.03278688524590164::DOUBLE) + x * 0.03278688524590164::DOUBLE) AS f60,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.030303030303030304::DOUBLE) + x * 0.030303030303030304::DOUBLE) AS f65,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.028169014084507043::DOUBLE) + x * 0.028169014084507043::DOUBLE) AS f70,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.02631578947368421::DOUBLE) + x * 0.02631578947368421::DOUBLE) AS f75,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.024691358024691357::DOUBLE) + x * 0.024691358024691357::DOUBLE) AS f80,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.02197802197802198::DOUBLE) + x * 0.02197802197802198::DOUBLE) AS f90,
    list_reduce(vals, (acc, x) -> acc * (1.0::DOUBLE - 0.019801980198019802::DOUBLE) + x * 0.019801980198019802::DOUBLE) AS f100,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.3333333333333333::DOUBLE) + x * 0.3333333333333333::DOUBLE) AS p5,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.18181818181818182::DOUBLE) + x * 0.18181818181818182::DOUBLE) AS p10,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.125::DOUBLE) + x * 0.125::DOUBLE) AS p15,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.09523809523809523::DOUBLE) + x * 0.09523809523809523::DOUBLE) AS p20,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.07692307692307693::DOUBLE) + x * 0.07692307692307693::DOUBLE) AS p25,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.06451612903225806::DOUBLE) + x * 0.06451612903225806::DOUBLE) AS p30,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.05555555555555555::DOUBLE) + x * 0.05555555555555555::DOUBLE) AS p35,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.04878048780487805::DOUBLE) + x * 0.04878048780487805::DOUBLE) AS p40,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.043478260869565216::DOUBLE) + x * 0.043478260869565216::DOUBLE) AS p45,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.0392156862745098::DOUBLE) + x * 0.0392156862745098::DOUBLE) AS p50,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.03571428571428571::DOUBLE) + x * 0.03571428571428571::DOUBLE) AS p55,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.03278688524590164::DOUBLE) + x * 0.03278688524590164::DOUBLE) AS p60,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.030303030303030304::DOUBLE) + x * 0.030303030303030304::DOUBLE) AS p65,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.028169014084507043::DOUBLE) + x * 0.028169014084507043::DOUBLE) AS p70,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.02631578947368421::DOUBLE) + x * 0.02631578947368421::DOUBLE) AS p75,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.024691358024691357::DOUBLE) + x * 0.024691358024691357::DOUBLE) AS p80,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.02197802197802198::DOUBLE) + x * 0.02197802197802198::DOUBLE) AS p90,
    list_reduce(list_slice(vals, 1, len(vals) - 1), (acc, x) -> acc * (1.0::DOUBLE - 0.019801980198019802::DOUBLE) + x * 0.019801980198019802::DOUBLE) AS p100
  FROM series
),
r AS (
  SELECT event_type, n, cur, f100,
    ((CASE WHEN f5 > f100 AND f5 - p5 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f10 > f100 AND f10 - p10 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f15 > f100 AND f15 - p15 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f20 > f100 AND f20 - p20 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f25 > f100 AND f25 - p25 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f30 > f100 AND f30 - p30 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f35 > f100 AND f35 - p35 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f40 > f100 AND f40 - p40 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f45 > f100 AND f45 - p45 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f50 > f100 AND f50 - p50 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f55 > f100 AND f55 - p55 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f60 > f100 AND f60 - p60 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f65 > f100 AND f65 - p65 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f70 > f100 AND f70 - p70 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f75 > f100 AND f75 - p75 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f80 > f100 AND f80 - p80 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f90 > f100 AND f90 - p90 > 0 THEN 1 ELSE 0 END) + (CASE WHEN f100 > f100 AND f100 - p100 > 0 THEN 1 ELSE 0 END)) / 18.0 AS bull,
    ((CASE WHEN f5 < f100 AND f5 - p5 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f10 < f100 AND f10 - p10 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f15 < f100 AND f15 - p15 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f20 < f100 AND f20 - p20 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f25 < f100 AND f25 - p25 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f30 < f100 AND f30 - p30 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f35 < f100 AND f35 - p35 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f40 < f100 AND f40 - p40 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f45 < f100 AND f45 - p45 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f50 < f100 AND f50 - p50 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f55 < f100 AND f55 - p55 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f60 < f100 AND f60 - p60 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f65 < f100 AND f65 - p65 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f70 < f100 AND f70 - p70 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f75 < f100 AND f75 - p75 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f80 < f100 AND f80 - p80 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f90 < f100 AND f90 - p90 < 0 THEN 1 ELSE 0 END) + (CASE WHEN f100 < f100 AND f100 - p100 < 0 THEN 1 ELSE 0 END)) / 18.0 AS bear
  FROM f
)
SELECT event_type,
  CASE WHEN n < 100 THEN 'watch'
       WHEN bull >= 0.7 THEN 'buy'
       WHEN bear >= 0.7 THEN 'sell'
       ELSE 'watch' END AS ribbon_signal,
  CASE WHEN n < 100 THEN 'mixed'
       WHEN bull >= 0.7 THEN 'bull'
       WHEN bear >= 0.7 THEN 'bear'
       WHEN cur > f100 THEN 'bull' ELSE 'bear' END AS ribbon_state,
  CASE WHEN n < 100 THEN 0.0
       WHEN bull >= 0.7 THEN ROUND(bull * 10, 3)
       WHEN bear >= 0.7 THEN ROUND(bear * 10, 3)
       ELSE ROUND(abs((cur - f100) / f100) * 5, 3) END AS ribbon_strength,
  CASE WHEN n < 100 THEN 0.0 ELSE ROUND(bull, 2) END AS bull_ratio,
  CASE WHEN n < 100 THEN 0.0 ELSE ROUND(bear, 2) END AS bear_ratio,
  CASE WHEN n < 100 THEN NULL ELSE ROUND(f100, 6) END AS ma100
FROM r
"""


@query(
    "ind_madrid_ribbon",
    survey="§2.9 ma_ribbon (batch/tv_volume_signal.py:9-39, "
    "indicators/library.py i_ribbon): 18-EMA ladder vs EMA100, "
    "rising/falling agreement ratios, buy/sell/watch ladder",
    description="Madrid ribbon final signal/state/ratios per event_type",
    oracle=_RIBBON_ORACLE,
)
def ind_madrid_ribbon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each EMA's prior-bar value is the same fold over the array minus
    its last element — 36 folds total, sharing one tail collect. The
    insufficient-data branch (< 100 bars) mirrors the pandas
    placeholder row with NULL ma100 on both engines."""
    from tradecat_spark.operators.latest import topn_per_group

    periods = [5, 10, 15, 20, 25, 30, 35, 40, 45, 50, 55, 60, 65, 70, 75, 80, 90, 100]
    e = topn_per_group(_series(spark, sf_dir), ["event_type"], "ts", TAIL_BARS)
    series = e.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("ts", "value"))).alias("pairs")
    )
    vals = F.transform(F.col("pairs"), lambda p: p["value"])
    n = F.size("pairs")
    head = F.slice(vals, 1, F.greatest(n - 1, F.lit(0)))
    cur = F.element_at(vals, n)
    fulls = {p: ema_fold(vals, 2.0 / (p + 1.0)) for p in periods}
    prevs = {p: ema_fold(head, 2.0 / (p + 1.0)) for p in periods}
    ma100 = fulls[100]
    bull = sum(
        (
            F.when((fulls[p] > ma100) & (fulls[p] - prevs[p] > 0), 1).otherwise(0)
            for p in periods
        ),
        F.lit(0),
    ) / 18.0
    bear = sum(
        (
            F.when((fulls[p] < ma100) & (fulls[p] - prevs[p] < 0), 1).otherwise(0)
            for p in periods
        ),
        F.lit(0),
    ) / 18.0
    small = n < 100
    return series.select(
        "event_type",
        F.when(small, "watch")
        .when(bull >= 0.7, "buy")
        .when(bear >= 0.7, "sell")
        .otherwise("watch")
        .alias("ribbon_signal"),
        F.when(small, "mixed")
        .when(bull >= 0.7, "bull")
        .when(bear >= 0.7, "bear")
        .when(cur > ma100, "bull")
        .otherwise("bear")
        .alias("ribbon_state"),
        F.when(small, 0.0)
        .when(bull >= 0.7, F.round(bull * 10, 3))
        .when(bear >= 0.7, F.round(bear * 10, 3))
        .otherwise(F.round(F.abs((cur - ma100) / ma100) * 5, 3))
        .alias("ribbon_strength"),
        F.when(small, 0.0).otherwise(F.round(bull, 2)).alias("bull_ratio"),
        F.when(small, 0.0).otherwise(F.round(bear, 2)).alias("bear_ratio"),
        F.when(~small, F.round(ma100, 6)).alias("ma100"),
    )


# ---------------------------------------------------------------------------
# §2.9 SMC — structure breaks / order block / CHoCH from pivot algebra
# ---------------------------------------------------------------------------
_SMC_ORACLE = """
WITH bars AS ({bars}),
p AS (
  SELECT event_type, bucket_ts, high, low, close,
    high > lag(high, 1) OVER w AND high > lag(high, 2) OVER w
      AND high > lead(high, 1) OVER w AND high > lead(high, 2) OVER w
      AS is_ph,
    low < lag(low, 1) OVER w AND low < lag(low, 2) OVER w
      AND low < lead(low, 1) OVER w AND low < lead(low, 2) OVER w
      AS is_pl
  FROM bars
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
),
g AS (
  SELECT event_type,
    max_by(close, bucket_ts) AS cv,
    list(high ORDER BY bucket_ts) FILTER (WHERE is_ph) AS phs,
    list(low ORDER BY bucket_ts) FILTER (WHERE is_pl) AS pls
  FROM p GROUP BY event_type
),
d AS (
  SELECT event_type, cv,
    CASE WHEN len(phs) >= 1 THEN phs[len(phs)] END AS last_ph,
    CASE WHEN len(phs) >= 2 THEN phs[len(phs) - 1] END AS ph2,
    CASE WHEN len(pls) >= 1 THEN pls[len(pls)] END AS last_pl,
    len(phs) AS nph
  FROM g
),
e AS (
  SELECT event_type, cv, last_ph, last_pl,
    CASE WHEN last_ph IS NOT NULL AND cv > last_ph THEN 'bullish'
         WHEN last_pl IS NOT NULL AND cv < last_pl THEN 'bearish'
         ELSE 'none' END AS bos,
    CASE WHEN nph >= 2 AND last_ph >= ph2 THEN 'up' ELSE 'down' END
      AS prior_trend
  FROM d
)
SELECT event_type, bos,
  ROUND(CASE WHEN bos = 'bullish' THEN last_pl
             WHEN bos = 'bearish' THEN last_ph END, 6) AS order_block,
  CASE WHEN bos = 'bullish' THEN
         (CASE WHEN prior_trend = 'up' THEN 'BOS_up' ELSE 'CHoCH_up' END)
       WHEN bos = 'bearish' THEN
         (CASE WHEN prior_trend = 'down' THEN 'BOS_down' ELSE 'CHoCH_down' END)
       ELSE 'none' END AS struct_event,
  CASE WHEN bos = 'bullish' THEN 'bullish'
       WHEN bos = 'bearish' THEN 'bearish'
       ELSE 'neutral' END AS smc_bias,
  ROUND(CASE WHEN bos <> 'none' AND last_ph IS NOT NULL
              AND last_pl IS NOT NULL AND last_ph - last_pl > 0
         THEN LEAST(100.0::DOUBLE,
                    50.0 + (CASE WHEN bos = 'bullish' THEN cv - last_ph
                                 ELSE last_pl - cv END)
                           / (last_ph - last_pl) * 100.0)
         ELSE 0.0::DOUBLE END, 6) AS smc_score
FROM e
"""


@query(
    "ind_smc_structure",
    survey="§2.9 SMC (batch/tv_big_money.py, indicators/library.py "
    "i_smc): 2-radius swing pivots, break-of-structure vs "
    "change-of-character, order block, 0-100 break score",
    description="SMC structure event / bias / order block / score per event_type",
    oracle=_SMC_ORACLE.format(bars=_TAIL_BARS_1H_SQL),
)
def ind_smc_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivots are strict 2-radius extremes via lag/lead over ONE
    (symbol ORDER BY bucket) sort; the last/second-last pivot values
    come from a filtered ordered collect; every label and the break
    score are pure CASE algebra. The +-inf sentinels of the pandas
    model become NULLs with null-safe comparisons — same decisions,
    hashable cross-engine."""
    bars = _bars_1h_tail(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("bucket_ts")
    h, l = F.col("high"), F.col("low")  # noqa: E741
    is_ph = (
        (h > F.lag("high", 1).over(w)) & (h > F.lag("high", 2).over(w))
        & (h > F.lead("high", 1).over(w)) & (h > F.lead("high", 2).over(w))
    )
    is_pl = (
        (l < F.lag("low", 1).over(w)) & (l < F.lag("low", 2).over(w))
        & (l < F.lead("low", 1).over(w)) & (l < F.lead("low", 2).over(w))
    )
    p = bars.select(
        "event_type", "bucket_ts", "high", "low", "close",
        is_ph.alias("is_ph"), is_pl.alias("is_pl"),
    )
    g = p.groupBy("event_type").agg(
        F.max_by("close", "bucket_ts").alias("cv"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("is_ph"), F.struct("bucket_ts", "high"))
            )
        ).alias("phs"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("is_pl"), F.struct("bucket_ts", "low"))
            )
        ).alias("pls"),
    )
    nph = F.size("phs")
    npl = F.size("pls")
    last_ph = F.when(nph >= 1, F.element_at("phs", -1)["high"])
    ph2 = F.when(nph >= 2, F.element_at("phs", -2)["high"])
    last_pl = F.when(npl >= 1, F.element_at("pls", -1)["low"])
    d = g.select(
        "event_type", "cv",
        last_ph.alias("last_ph"), ph2.alias("ph2"),
        last_pl.alias("last_pl"), nph.alias("nph"),
    )
    bos = (
        F.when(F.col("last_ph").isNotNull() & (F.col("cv") > F.col("last_ph")), "bullish")
        .when(F.col("last_pl").isNotNull() & (F.col("cv") < F.col("last_pl")), "bearish")
        .otherwise("none")
    )
    prior = F.when(
        (F.col("nph") >= 2) & (F.col("last_ph") >= F.col("ph2")), "up"
    ).otherwise("down")
    e = d.select("event_type", "cv", "last_ph", "last_pl",
                 bos.alias("bos"), prior.alias("prior_trend"))
    rng = F.col("last_ph") - F.col("last_pl")
    dist = F.when(F.col("bos") == "bullish", F.col("cv") - F.col("last_ph")).otherwise(
        F.col("last_pl") - F.col("cv")
    )
    return e.select(
        "event_type", "bos",
        F.round(
            F.when(F.col("bos") == "bullish", F.col("last_pl"))
            .when(F.col("bos") == "bearish", F.col("last_ph")), 6
        ).alias("order_block"),
        F.when(
            F.col("bos") == "bullish",
            F.when(F.col("prior_trend") == "up", "BOS_up").otherwise("CHoCH_up"),
        )
        .when(
            F.col("bos") == "bearish",
            F.when(F.col("prior_trend") == "down", "BOS_down").otherwise("CHoCH_down"),
        )
        .otherwise("none")
        .alias("struct_event"),
        F.when(F.col("bos") == "bullish", "bullish")
        .when(F.col("bos") == "bearish", "bearish")
        .otherwise("neutral")
        .alias("smc_bias"),
        F.round(
            F.when(
                (F.col("bos") != "none")
                & F.col("last_ph").isNotNull()
                & F.col("last_pl").isNotNull()
                & (rng > 0),
                F.least(F.lit(100.0), 50.0 + dist / rng * 100.0),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("smc_score"),
    )


# ---------------------------------------------------------------------------
# §2.9 precision trend — per-row ZLEMA band series + flip state machine
# ---------------------------------------------------------------------------
_PT_ZL_A = repr(2.0 / 71.0)
_PT_ATR_A = repr(1.0 / 70.0)

_PT_ORACLE = f"""
WITH bars AS ({{bars}}),
arr AS (
  SELECT event_type,
    list(high ORDER BY bucket_ts) AS hi,
    list(low ORDER BY bucket_ts) AS lo,
    list(close ORDER BY bucket_ts) AS cl,
    COUNT(*) AS n
  FROM bars GROUP BY event_type
),
tr_cte AS (
  SELECT event_type, cl, n,
    list_transform(range(1, n + 1), k ->
      CASE WHEN k = 1 THEN hi[1] - lo[1]
           ELSE greatest(hi[k] - lo[k], abs(hi[k] - cl[k - 1]),
                         abs(lo[k] - cl[k - 1])) END) AS tr
  FROM arr
),
scan_cte AS (
  -- each scan array is materialized ONCE; band then slices it
  SELECT event_type, cl, n,
    list_transform(range(1, n + 1), j ->
      list_reduce(list_slice(tr, 1, j),
        (acc, v) -> acc * (1.0::DOUBLE - {_PT_ATR_A}::DOUBLE)
                    + v * {_PT_ATR_A}::DOUBLE)) AS atr_scan,
    list_transform(range(1, n + 1), i ->
      CASE WHEN i > {_ZL_LAG} THEN
        list_reduce(
          list_transform(range({_ZL_LAG} + 1, i + 1),
                         k -> 2 * cl[k] - cl[k - {_ZL_LAG}]),
          (acc, v) -> acc * (1.0::DOUBLE - {_PT_ZL_A}::DOUBLE)
                      + v * {_PT_ZL_A}::DOUBLE)
      END) AS zl
  FROM tr_cte
),
band_cte AS (
  SELECT event_type, cl, n, zl,
    list_transform(range(1, n + 1), i ->
      list_aggregate(list_slice(atr_scan, greatest(1, i - 209), i), 'max')
        * 1.2) AS band
  FROM scan_cte
),
folded AS (
  SELECT event_type, cl, n, zl, band,
    -- flip state machine; flips precedes state (order-stable contract,
    -- see ind_adx_di) and inlines the new-state expression
    list_reduce(
      list_transform(range(1, n + 1),
                     j -> struct_pack(flips := 0.0::DOUBLE,
                                      state := 0.0::DOUBLE,
                                      j := CAST(j AS DOUBLE))),
      (acc, x) -> struct_pack(
        flips := acc.flips
          + (CASE WHEN x.j >= n - 49 AND
               (CASE WHEN zl[CAST(x.j AS INT)] IS NOT NULL
                      AND cl[CAST(x.j AS INT)] > zl[CAST(x.j AS INT)] + band[CAST(x.j AS INT)]
                     THEN 1.0::DOUBLE
                     WHEN zl[CAST(x.j AS INT)] IS NOT NULL
                      AND cl[CAST(x.j AS INT)] < zl[CAST(x.j AS INT)] - band[CAST(x.j AS INT)]
                     THEN -1.0::DOUBLE
                     ELSE acc.state END) <> acc.state
             THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END),
        state := CASE WHEN zl[CAST(x.j AS INT)] IS NOT NULL
                       AND cl[CAST(x.j AS INT)] > zl[CAST(x.j AS INT)] + band[CAST(x.j AS INT)]
                      THEN 1.0::DOUBLE
                      WHEN zl[CAST(x.j AS INT)] IS NOT NULL
                       AND cl[CAST(x.j AS INT)] < zl[CAST(x.j AS INT)] - band[CAST(x.j AS INT)]
                      THEN -1.0::DOUBLE
                      ELSE acc.state END,
        j := x.j
    )) AS s
  FROM band_cte
)
SELECT event_type,
  ROUND(zl[CAST(n AS INT)], 6) AS pt_line,
  CASE WHEN s.state = 1.0 THEN 'bull'
       WHEN s.state = -1.0 THEN 'bear' ELSE 'range' END AS pt_state,
  CAST(s.flips AS BIGINT) AS pt_flips_50,
  ROUND(CASE WHEN zl[CAST(n AS INT)] IS NULL THEN NULL
             WHEN band[CAST(n AS INT)] <> 0
             THEN LEAST(100.0::DOUBLE,
                        abs(cl[CAST(n AS INT)] - zl[CAST(n AS INT)])
                        / band[CAST(n AS INT)] * 100.0)
             ELSE 0.0::DOUBLE END, 6) AS pt_strength
FROM folded
"""


@query(
    "ind_precision_trend",
    survey="§2.9 precision trend (batch/super_trend.py:17-107, "
    "indicators/library.py i_precision_trend): per-row ZLEMA70 band "
    "series, flip-count state machine over the last 50 bars",
    description="Precision-trend line/state/flip-count/strength per event_type",
    oracle=_PT_ORACLE.format(bars=_TAIL_BARS_1H_SQL),
)
def ind_precision_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-row ATR and ZLEMA prefix scans are O(n^2) expression
    work bounded by the 500-bar tail (each scan array materialized
    once per key — the band's 210-bar rolling max slices the ATR scan
    rather than re-folding it), and the flip counter is a 2-field
    state fold under the order-stable contract. The first 34 bars
    carry NULL ZLEMA (pandas shift-NaN head) so the state machine
    idles there exactly like the reference loop."""
    bars = _bars_1h_tail(spark, sf_dir)
    arr = bars.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("bucket_ts", "high", "low", "close"))
        ).alias("rows")
    )
    hi = F.transform(F.col("rows"), lambda r: r["high"])
    lo = F.transform(F.col("rows"), lambda r: r["low"])
    cl = F.transform(F.col("rows"), lambda r: r["close"])
    n = F.size("rows")
    a_zl, a_atr = 2.0 / 71.0, 1.0 / 70.0

    base = arr.select("event_type", cl.alias("cl"), n.alias("n"),
                      hi.alias("hi"), lo.alias("lo"))
    hic, loc, clc = F.col("hi"), F.col("lo"), F.col("cl")
    tr = F.transform(
        F.sequence(F.lit(1), F.col("n")),
        lambda k: F.when(
            k == 1, F.element_at(hic, 1) - F.element_at(loc, 1)
        ).otherwise(
            F.greatest(
                F.element_at(hic, k) - F.element_at(loc, k),
                F.abs(F.element_at(hic, k) - F.element_at(clc, k - 1)),
                F.abs(F.element_at(loc, k) - F.element_at(clc, k - 1)),
            )
        ),
    )
    t1 = base.withColumn("tr", tr)
    # prefix-EWM SCANS in one pass each: the accumulator is the growing
    # scan array, each step appends f(last, v) — O(n) fold steps with
    # O(n) array growth, vs the O(n^2) per-position re-folds that made
    # the first cut ~40 s on the Spark side (DuckDB's vectorized
    # list_reduce shrugged at the naive form; Spark's interpreted HOF
    # evaluation did not)
    def _scan(src: Column, alpha: float) -> Column:
        return F.aggregate(
            F.slice(src, 2, F.greatest(F.size(src) - 1, F.lit(0))),
            F.array(F.element_at(src, 1).cast("double")),
            lambda acc, v: F.concat(
                acc,
                F.array(
                    F.element_at(acc, -1) * F.lit(1.0 - alpha)
                    + v * F.lit(alpha)
                ),
            ),
        )

    delag = F.transform(
        F.sequence(F.lit(_ZL_LAG + 1), F.col("n")),
        lambda k: 2 * F.element_at(clc, k) - F.element_at(clc, k - _ZL_LAG),
    )
    # zl array is the scan right-aligned: positions 1.._ZL_LAG are NULL
    zl = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.least(F.lit(_ZL_LAG), F.col("n"))),
            lambda _: F.lit(None).cast("double"),
        ),
        F.when(F.col("n") > _ZL_LAG, _scan(delag, a_zl)).otherwise(
            F.array().cast("array<double>")
        ),
    )
    t2 = t1.withColumn("atr_scan", _scan(F.col("tr"), a_atr)).withColumn(
        "zl", zl
    )
    # the 210-bar rolling band max as a NATIVE window over exploded scan
    # rows (whole-stage codegen), not per-position array slices — the
    # interpreted slice+array_max form measured 8 s alone at sf0.01
    rows = t2.select(
        "event_type", "n",
        F.posexplode(F.arrays_zip("atr_scan", "zl", "cl")).alias("pos", "z"),
    )
    wb = (
        Window.partitionBy("event_type").orderBy("pos").rowsBetween(-209, 0)
    )
    rows = rows.select(
        "event_type", "n", "pos",
        F.col("z")["zl"].alias("zlv"),
        F.col("z")["cl"].alias("clv"),
        (F.max(F.col("z")["atr_scan"]).over(wb) * 1.2).alias("bandv"),
    )
    per_key = rows.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.array_sort(
            F.collect_list(F.struct("pos", "zlv", "clv", "bandv"))
        ).alias("bars_arr"),
    )

    def new_state(acc, x_):
        return (
            F.when(
                x_["zlv"].isNotNull() & (x_["clv"] > x_["zlv"] + x_["bandv"]),
                F.lit(1.0),
            )
            .when(
                x_["zlv"].isNotNull() & (x_["clv"] < x_["zlv"] - x_["bandv"]),
                F.lit(-1.0),
            )
            .otherwise(acc["state"])
        )

    def step(acc, x_):
        ns = new_state(acc, x_)
        return F.struct(
            (
                acc["flips"]
                + F.when(
                    (x_["pos"] >= F.col("n") - 50) & (ns != acc["state"]),
                    F.lit(1.0),
                ).otherwise(F.lit(0.0))
            ).alias("flips"),
            ns.alias("state"),
        )

    seed = F.struct(F.lit(0.0).alias("flips"), F.lit(0.0).alias("state"))
    s = F.aggregate(
        F.slice(
            F.col("bars_arr"), 2, F.greatest(F.col("n") - 1, F.lit(0))
        ),
        seed,
        step,
    )
    last = F.element_at(F.col("bars_arr"), F.col("n").cast("int"))
    y = per_key.withColumn("s", s)
    zl_n = last["zlv"]
    band_n = last["bandv"]
    cl_n = last["clv"]
    return y.select(
        "event_type",
        F.round(zl_n, 6).alias("pt_line"),
        F.when(F.col("s")["state"] == 1.0, "bull")
        .when(F.col("s")["state"] == -1.0, "bear")
        .otherwise("range")
        .alias("pt_state"),
        F.col("s")["flips"].cast("long").alias("pt_flips_50"),
        F.round(
            F.when(zl_n.isNull(), F.lit(None).cast("double"))
            .when(
                band_n != 0,
                F.least(F.lit(100.0), F.abs(cl_n - zl_n) / band_n * 100.0),
            )
            .otherwise(F.lit(0.0)),
            6,
        ).alias("pt_strength"),
    )


# ---------------------------------------------------------------------------
# §2.9 trend lines — Pine-model pivot pairs + violation-fold line fit
# ---------------------------------------------------------------------------
# SQL generators verified value-equal to indicators/library.i_trend_line
# per symbol at sf0.01 before registration (fold replication of
# _fit_trendline's repeated level stepping — see that docstring).
_TL_PRD = 20


def _tl_fit_sql(side, p1, p2):
    pv, pq = f"pv_{side}", f"pq_{side}"
    v1, v2 = f"{pv}[{p1 + 1}]", f"{pv}[{p2 + 1}]"
    q1, q2 = f"{pq}[{p1 + 1}]", f"{pq}[{p2 + 1}]"
    sup = side == "sup"
    slope_ok = f"{v1} > {v2}" if sup else f"{v1} < {v2}"
    step = (
        f"(({v1} - {v2}) / CAST({q1} - {q2} AS DOUBLE))" if sup
        else f"(({v2} - {v1}) / CAST({q1} - {q2} AS DOUBLE))"
    )
    lvl0 = f"({v2} {'+' if sup else '-'} {step})"
    bad_cmp = "<" if sup else ">"
    upd = "+" if sup else "-"
    fold = (
        f"list_reduce(list_prepend("
        f"struct_pack(bad := false, level := {lvl0}, x := 0), "
        f"list_transform(range({q2} + 1 - {_TL_PRD}, n), "
        f"xx -> struct_pack(bad := false, level := 0.0::DOUBLE, x := CAST(xx AS INT)))), "
        f"(acc, e) -> struct_pack("
        f"bad := acc.bad OR cl[n - e.x] {bad_cmp} acc.level, "
        f"level := acc.level {upd} {step}, x := e.x))"
    )
    y_end = f"({fold}.level {'-' if sup else '+'} {step})"
    have = f"len({pv}) >= {max(p1, p2) + 1}"
    found = f"({have} AND ({slope_ok}) AND NOT {fold}.bad)"
    return (
        f"struct_pack(found := coalesce({found}, false), "
        f"v2 := CASE WHEN {have} THEN {v2} END, "
        f"y_end := CASE WHEN {have} AND ({slope_ok}) THEN {y_end} END)"
    )


def _tl_line_sql(side):
    f02, f01, f12 = _tl_fit_sql(side, 0, 2), _tl_fit_sql(side, 0, 1), _tl_fit_sql(side, 1, 2)
    return (
        f"CASE WHEN {f02}.found THEN {f02} "
        f"WHEN {f01}.found THEN {f01} "
        f"WHEN {f12}.found THEN {f12} END"
    )


def _tl_pivot_sql(arr, agg, det=False):
    centers = (
        f"list_filter(range({_TL_PRD} + 1, n - {_TL_PRD} + 1), "
        f"j -> {arr}[CAST(j AS INT)] = list_aggregate("
        f"list_slice({arr}, j - {_TL_PRD}, j + {_TL_PRD}), '{agg}'))"
    )
    last3rev = (
        f"list_reverse(list_slice({centers}, "
        f"greatest(1, len({centers}) - 2), len({centers})))"
    )
    if det:
        return f"list_transform({last3rev}, j -> CAST(j - 1 + {_TL_PRD} AS INT))"
    return f"list_transform({last3rev}, j -> {arr}[CAST(j AS INT)])"


_TL_SLOPE_SQL = """
  CASE WHEN m < 2 THEN 0.0 ELSE
    list_reduce(
      list_transform(range(1, m + 1),
        t -> (CAST(t - 1 AS DOUBLE) - (m - 1) / 2.0)
             * (ys[CAST(t AS INT)] - ysum / m)),
      (acc, v) -> acc + v)
    / list_reduce(
        list_transform(range(1, m + 1),
          t -> (CAST(t - 1 AS DOUBLE) - (m - 1) / 2.0)
               * (CAST(t - 1 AS DOUBLE) - (m - 1) / 2.0)),
        (acc, v) -> acc + v)
  END
"""

_TL_ORACLE = f"""
WITH bars AS ({{bars}}),
arr AS (
  SELECT event_type,
    list(high ORDER BY bucket_ts) AS hi,
    list(low ORDER BY bucket_ts) AS lo,
    list(close ORDER BY bucket_ts) AS cl,
    CAST(COUNT(*) AS INT) AS n
  FROM bars GROUP BY event_type
),
pivots AS (
  SELECT event_type, cl, n,
    {_tl_pivot_sql('hi', 'max')} AS pv_res,
    {_tl_pivot_sql('hi', 'max', det=True)} AS pq_res,
    {_tl_pivot_sql('lo', 'min')} AS pv_sup,
    {_tl_pivot_sql('lo', 'min', det=True)} AS pq_sup
  FROM arr
),
lines AS (
  SELECT event_type, cl, n, pv_res, pv_sup,
    {_tl_line_sql('res')} AS res_line,
    {_tl_line_sql('sup')} AS sup_line
  FROM pivots
),
sl AS (
  SELECT event_type, cl, n, pv_res, pv_sup, res_line, sup_line,
    list_slice(cl, greatest(1, n - 49), n) AS ys,
    least(50, n) AS m
  FROM lines
),
sl2 AS (
  SELECT *, list_reduce(ys, (acc, v) -> acc + v) AS ysum FROM sl
),
scored AS (
  SELECT event_type, cl, n, pv_res, pv_sup, res_line, sup_line,
    {_TL_SLOPE_SQL} AS slope
  FROM sl2
)
SELECT event_type,
  ROUND(CASE WHEN len(pv_res) >= 1 THEN pv_res[1] END, 6) AS piv_high,
  ROUND(CASE WHEN len(pv_sup) >= 1 THEN pv_sup[1] END, 6) AS piv_low,
  ROUND(slope, 6) + 0.0 AS trend_slope,
  CASE WHEN slope > 0 THEN 'up' ELSE 'down' END AS tl_state,
  CASE WHEN res_line.found THEN 'short'
       WHEN sup_line.found THEN 'long'
       ELSE 'range' END AS tl_direction,
  ROUND(CASE WHEN res_line.found AND res_line.y_end <> 0
         THEN (cl[n] - res_line.y_end) / res_line.y_end * 100.0
         WHEN NOT coalesce(res_line.found, false)
              AND sup_line.found AND sup_line.y_end <> 0
         THEN (cl[n] - sup_line.y_end) / sup_line.y_end * 100.0
         ELSE 0.0::DOUBLE END, 4) + 0.0 AS tl_dist_pct
FROM scored
"""



@query(
    "ind_trend_line",
    survey="§2.9 trend lines (batch/trend_line.py:5-175, "
    "indicators/library.py i_trend_line): last-3 ±20-bar pivots, "
    "first close-respecting 2-point line per side, resistance "
    "priority, distance-to-line%",
    description="Pine trend-line fit: pivots, direction, 50-bar OLS slope, line distance",
    oracle=_TL_ORACLE.format(bars=_TAIL_BARS_1H_SQL),
)
def ind_trend_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot centers from array algebra, each candidate pair's
    violation scan as a sequential fold (the bad flag reads the level
    BEFORE its step update, per the order-stable contract), the 50-bar
    OLS slope as seeded sequential sums so both engines add in the
    same order."""
    bars = _bars_1h_tail(spark, sf_dir)
    arr = bars.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("bucket_ts", "high", "low", "close"))
        ).alias("rows")
    )
    hi = F.transform(F.col("rows"), lambda r: r["high"])
    lo = F.transform(F.col("rows"), lambda r: r["low"])
    cl = F.transform(F.col("rows"), lambda r: r["close"])
    n = F.size("rows")
    base = arr.select(
        "event_type", hi.alias("hi"), lo.alias("lo"), cl.alias("cl"),
        n.alias("n"),
    )
    P = _TL_PRD
    hic, loc, clc, nc = F.col("hi"), F.col("lo"), F.col("cl"), F.col("n")

    def pivots(src: Column, is_high: bool):
        ext = F.array_max if is_high else F.array_min
        centers = F.filter(
            F.sequence(F.lit(P + 1), nc - P),
            lambda j: F.element_at(src, j)
            == ext(F.slice(src, j - P, 2 * P + 1)),
        )
        m = F.size(centers)
        last3 = F.reverse(
            F.slice(centers, F.greatest(F.lit(1), m - 2), F.least(F.lit(3), m))
        )
        pv = F.transform(last3, lambda j: F.element_at(src, j))
        pq = F.transform(last3, lambda j: (j - 1 + P).cast("int"))
        return pv, pq

    pv_res, pq_res = pivots(hic, True)
    pv_sup, pq_sup = pivots(loc, False)
    piv = base.select(
        "event_type", "cl", "n",
        pv_res.alias("pv_res"), pq_res.alias("pq_res"),
        pv_sup.alias("pv_sup"), pq_sup.alias("pq_sup"),
    )

    def fit(side: str, p1: int, p2: int) -> Column:
        pv = F.col(f"pv_{side}")
        pq = F.col(f"pq_{side}")
        sup = side == "sup"
        have = F.size(pv) >= max(p1, p2) + 1
        v1, v2 = F.element_at(pv, p1 + 1), F.element_at(pv, p2 + 1)
        q1, q2 = F.element_at(pq, p1 + 1), F.element_at(pq, p2 + 1)
        slope_ok = (v1 > v2) if sup else (v1 < v2)
        step = (
            (v1 - v2) / (q1 - q2).cast("double")
            if sup
            else (v2 - v1) / (q1 - q2).cast("double")
        )
        lvl0 = (v2 + step) if sup else (v2 - step)
        xs = F.sequence(q2 + 1 - P, F.col("n") - 1)
        seed = F.struct(F.lit(False).alias("bad"), lvl0.alias("level"))

        def stp(acc, e):
            c = F.element_at(F.col("cl"), (F.col("n") - e).cast("int"))
            bad = acc["bad"] | ((c < acc["level"]) if sup else (c > acc["level"]))
            lvl = acc["level"] + step if sup else acc["level"] - step
            return F.struct(bad.alias("bad"), lvl.alias("level"))

        fold = F.aggregate(xs, seed, stp)
        y_end = (fold["level"] - step) if sup else (fold["level"] + step)
        found = F.coalesce(have & slope_ok & ~fold["bad"], F.lit(False))
        return F.struct(
            found.alias("found"),
            F.when(have, v2).alias("v2"),
            F.when(have & slope_ok, y_end).alias("y_end"),
        )

    def line(side: str) -> Column:
        f02, f01, f12 = fit(side, 0, 2), fit(side, 0, 1), fit(side, 1, 2)
        return (
            F.when(f02["found"], f02)
            .when(f01["found"], f01)
            .when(f12["found"], f12)
        )

    lines = piv.select(
        "event_type", "cl", "n", "pv_res", "pv_sup",
        line("res").alias("res_line"), line("sup").alias("sup_line"),
    )

    ys = F.slice(F.col("cl"), F.greatest(F.lit(1), F.col("n") - 49),
                 F.least(F.lit(50), F.col("n")))
    m = F.least(F.lit(50), F.col("n"))

    def seq_sum(src: Column) -> Column:
        return F.aggregate(
            F.slice(src, 2, F.greatest(F.size(src) - 1, F.lit(0))),
            F.element_at(src, 1).cast("double"),
            lambda acc, v: acc + v,
        )

    ysum = seq_sum(ys)
    xm = (m - 1).cast("double") / 2.0
    num = seq_sum(
        F.transform(
            F.sequence(F.lit(1), m),
            lambda t: ((t - 1).cast("double") - xm)
            * (F.element_at(ys, t.cast("int")) - ysum / m.cast("double")),
        )
    )
    den = seq_sum(
        F.transform(
            F.sequence(F.lit(1), m),
            lambda t: ((t - 1).cast("double") - xm)
            * ((t - 1).cast("double") - xm),
        )
    )
    slope = F.when(m < 2, F.lit(0.0)).otherwise(num / den)

    res, sup = F.col("res_line"), F.col("sup_line")
    dist = (
        F.when(
            res["found"] & (res["y_end"] != 0),
            (F.element_at(F.col("cl"), F.col("n").cast("int")) - res["y_end"])
            / res["y_end"] * 100.0,
        )
        .when(
            ~F.coalesce(res["found"], F.lit(False))
            & sup["found"] & (sup["y_end"] != 0),
            (F.element_at(F.col("cl"), F.col("n").cast("int")) - sup["y_end"])
            / sup["y_end"] * 100.0,
        )
        .otherwise(F.lit(0.0))
    )
    return lines.select(
        "event_type",
        F.round(
            F.when(F.size("pv_res") >= 1, F.element_at("pv_res", 1)), 6
        ).alias("piv_high"),
        F.round(
            F.when(F.size("pv_sup") >= 1, F.element_at("pv_sup", 1)), 6
        ).alias("piv_low"),
        (F.round(slope, 6) + F.lit(0.0)).alias("trend_slope"),
        F.when(slope > 0, "up").otherwise("down").alias("tl_state"),
        F.when(res["found"], "short")
        .when(sup["found"], "long")
        .otherwise("range")
        .alias("tl_direction"),
        (F.round(dist, 4) + F.lit(0.0)).alias("tl_dist_pct"),
    )


# ---------------------------------------------------------------------------
# §2.9 smart RSI — adaptive thresholds, EMA34 gate, pivot divergence
# ---------------------------------------------------------------------------
# SQL generators verified equal to indicators/library.i_smart_rsi on
# every sf0.01 symbol AND on 40 crafted trending frames (6 of which
# fire the divergence branch) before registration.
def _srsi_scan_sql(src, alpha, seed="NULL"):
    a = repr(alpha)
    body = (
        f"(acc, v) -> acc * (1.0::DOUBLE - {a}::DOUBLE) + v * {a}::DOUBLE"
    )
    return f"list_reduce({src}, {body})"


# per-row prefix scans as re-folds over slices (DuckDB is fast at this)
def _srsi_scan_arr_sql(src, alpha):
    a = repr(alpha)
    return (
        f"list_transform(range(1, n + 1), i -> list_reduce("
        f"list_slice({src}, 1, i), (acc, v) -> "
        f"acc * (1.0::DOUBLE - {a}::DOUBLE) + v * {a}::DOUBLE))"
    )


_SRSI_RSI_T = (
    "CASE WHEN {g}[i] + {l}[i] = 0 THEN 50.0::DOUBLE "
    "WHEN {l}[i] = 0 THEN 100.0::DOUBLE "
    "ELSE 100.0::DOUBLE - 100.0::DOUBLE / (1.0::DOUBLE + {g}[i] / {l}[i]) END"
)


def _srsi_rsi_last_sql(p):
    g = _srsi_scan_sql("gains", 1.0 / p)
    l = _srsi_scan_sql("losses", 1.0 / p)
    return (
        f"CASE WHEN {g} + {l} = 0 THEN 50.0::DOUBLE "
        f"WHEN {l} = 0 THEN 100.0::DOUBLE "
        f"ELSE 100.0::DOUBLE - 100.0::DOUBLE / (1.0::DOUBLE + {g} / {l}) END"
    )


_SRSI_ORACLE = f"""
WITH bars AS ({{bars}}),
arr AS (
  SELECT event_type,
    list(high ORDER BY bucket_ts) AS hi,
    list(low ORDER BY bucket_ts) AS lo,
    list(close ORDER BY bucket_ts) AS cl,
    CAST(COUNT(*) AS INT) AS n
  FROM bars GROUP BY event_type
),
gl AS (
  SELECT event_type, hi, lo, cl, n,
    list_transform(range(1, n + 1), k ->
      CASE WHEN k = 1 THEN 0.0::DOUBLE
           ELSE greatest(cl[k] - cl[k - 1], 0.0::DOUBLE) END) AS gains,
    list_transform(range(1, n + 1), k ->
      CASE WHEN k = 1 THEN 0.0::DOUBLE
           ELSE greatest(cl[k - 1] - cl[k], 0.0::DOUBLE) END) AS losses,
    list_transform(range(1, n + 1), k ->
      CASE WHEN k = 1 THEN hi[1] - lo[1]
           ELSE greatest(hi[k] - lo[k], abs(hi[k] - cl[k - 1]),
                         abs(lo[k] - cl[k - 1])) END) AS tr
  FROM arr
),
scans AS (
  SELECT event_type, hi, lo, cl, n, gains, losses,
    {_srsi_scan_arr_sql('gains', 1.0 / 14.0)} AS g14s,
    {_srsi_scan_arr_sql('losses', 1.0 / 14.0)} AS l14s,
    {_srsi_scan_arr_sql('tr', 1.0 / 14.0)} AS atr_scan
  FROM gl
),
vals AS (
  SELECT event_type, hi, lo, cl, n,
    {_srsi_rsi_last_sql(7)} AS r7,
    {_srsi_rsi_last_sql(21)} AS r21,
    (CASE WHEN g14s[n] + l14s[n] = 0 THEN 50.0::DOUBLE
          WHEN l14s[n] = 0 THEN 100.0::DOUBLE
          ELSE 100.0::DOUBLE - 100.0::DOUBLE
               / (1.0::DOUBLE + g14s[n] / l14s[n]) END) AS r14,
    list_transform(range(1, n + 1), i -> {_SRSI_RSI_T.format(g='g14s', l='l14s')})
      AS rsi14s,
    atr_scan[n] AS atr_last,
    list_aggregate(atr_scan, 'max') AS amax,
    list_aggregate(atr_scan, 'min') AS amin,
    {_srsi_scan_sql('cl', 2.0 / 35.0)} AS ema34
  FROM scans
),
th AS (
  SELECT *,
    (r7 + r14 + r21) / 3.0 AS rsi_avg,
    1.0 + ((atr_last - amin) / ((amax - amin) + 1e-10) - 0.5) * 0.2 AS vol_factor,
    CASE WHEN cl[n] > ema34 THEN 'bullish' ELSE 'bearish' END AS trend
  FROM vals
),
th2 AS (
  SELECT *,
    least(80.0::DOUBLE, 70.0 * vol_factor) AS overbought,
    greatest(20.0::DOUBLE, 30.0 / vol_factor) AS oversold
  FROM th
),
votes AS (
  SELECT *,
    (CASE WHEN r7 < oversold THEN 1 ELSE 0 END)
      + (CASE WHEN r14 < oversold THEN 1 ELSE 0 END)
      + (CASE WHEN r21 < oversold THEN 1 ELSE 0 END) AS n_os,
    (CASE WHEN r7 > overbought THEN 1 ELSE 0 END)
      + (CASE WHEN r14 > overbought THEN 1 ELSE 0 END)
      + (CASE WHEN r21 > overbought THEN 1 ELSE 0 END) AS n_ob
  FROM th2
),
sig AS (
  SELECT *,
    CASE WHEN trend = 'bullish' AND n_os >= 2 THEN 'buy'
         WHEN trend = 'bearish' AND n_ob >= 2 THEN 'sell'
         ELSE 'watch' END AS signal0,
    CASE WHEN trend = 'bullish' AND n_os >= 2 THEN 'oversold'
         WHEN trend = 'bullish' AND n_ob >= 2 THEN 'overbought'
         WHEN trend = 'bearish' AND n_ob >= 2 THEN 'overbought'
         WHEN trend = 'bearish' AND n_os >= 2 THEN 'oversold'
         ELSE 'neutral' END AS state
  FROM votes
),
str0 AS (
  SELECT *,
    greatest(0.0::DOUBLE, least(100.0::DOUBLE, abs(
      CASE WHEN signal0 = 'buy' THEN (oversold - rsi_avg) / oversold * 100
           WHEN signal0 = 'sell' THEN (rsi_avg - overbought) / (100 - overbought) * 100
           ELSE abs(50 - rsi_avg) / 50 * 100 END))) AS strength0
  FROM sig
),
divp AS (
  SELECT *,
    CASE WHEN n >= 50 THEN list_slice(hi, n - 49, n) END AS h50,
    CASE WHEN n >= 50 THEN list_slice(lo, n - 49, n) END AS l50,
    CASE WHEN n >= 50 THEN list_slice(rsi14s, n - 49, n) END AS r50
  FROM str0
),
divm AS (
  SELECT *,
    CASE WHEN n >= 50 THEN
      list_filter(range(6, 46), p ->
        h50[CAST(p AS INT)] = list_aggregate(list_slice(h50, p - 5, p + 5), 'max'))
    END AS ph_pos,
    CASE WHEN n >= 50 THEN
      list_filter(range(6, 46), p ->
        l50[CAST(p AS INT)] = list_aggregate(list_slice(l50, p - 5, p + 5), 'min'))
    END AS pl_pos
  FROM divp
),
divv AS (
  SELECT *,
    len(ph_pos) AS nh, len(pl_pos) AS nl,
    CASE WHEN len(ph_pos) >= 2 AND len(pl_pos) >= 2 THEN 1 ELSE 0 END AS has_piv
  FROM divm
),
divr AS (
  SELECT *,
    CASE WHEN n >= 50 AND has_piv = 1
          AND h50[CAST(ph_pos[nh] AS INT)] > h50[CAST(ph_pos[nh - 1] AS INT)]
          AND r50[CAST(ph_pos[nh] AS INT)] < r50[CAST(ph_pos[nh - 1] AS INT)]
         THEN 'bearish_div'
         WHEN n >= 50 AND has_piv = 1
          AND l50[CAST(pl_pos[nl] AS INT)] < l50[CAST(pl_pos[nl - 1] AS INT)]
          AND r50[CAST(pl_pos[nl] AS INT)] > r50[CAST(pl_pos[nl - 1] AS INT)]
         THEN 'bullish_div'
         ELSE 'none' END AS div,
    CASE WHEN n >= 50 AND has_piv = 1
          AND h50[CAST(ph_pos[nh] AS INT)] > h50[CAST(ph_pos[nh - 1] AS INT)]
          AND r50[CAST(ph_pos[nh] AS INT)] < r50[CAST(ph_pos[nh - 1] AS INT)]
         THEN least(100.0::DOUBLE,
              (r50[CAST(ph_pos[nh - 1] AS INT)] - r50[CAST(ph_pos[nh] AS INT)])
              / r50[CAST(ph_pos[nh - 1] AS INT)] * 100)
         WHEN n >= 50 AND has_piv = 1
          AND l50[CAST(pl_pos[nl] AS INT)] < l50[CAST(pl_pos[nl - 1] AS INT)]
          AND r50[CAST(pl_pos[nl] AS INT)] > r50[CAST(pl_pos[nl - 1] AS INT)]
         THEN least(100.0::DOUBLE,
              (r50[CAST(pl_pos[nl] AS INT)] - r50[CAST(pl_pos[nl - 1] AS INT)])
              / r50[CAST(pl_pos[nl - 1] AS INT)] * 100)
         ELSE 0.0::DOUBLE END AS div_strength
  FROM divv
),
boost AS (
  SELECT *,
    CASE WHEN div = 'bullish_div' AND trend = 'bullish' AND n_os >= 2 THEN 'buy'
         WHEN div = 'bearish_div' AND trend = 'bearish' AND n_ob >= 2 THEN 'sell'
         ELSE signal0 END AS rsi_signal,
    CASE WHEN div = 'bullish_div' AND trend = 'bullish' AND n_os >= 2
         THEN least(100.0::DOUBLE, strength0 + div_strength * 0.5)
         WHEN div = 'bearish_div' AND trend = 'bearish' AND n_ob >= 2
         THEN least(100.0::DOUBLE, strength0 + div_strength * 0.5)
         ELSE strength0 END AS rsi_strength
  FROM divr
)
SELECT event_type,
  ROUND(r7, 6) AS rsi7, ROUND(r14, 6) AS rsi14, ROUND(r21, 6) AS rsi21,
  ROUND(rsi_avg, 6) AS rsi_avg,
  state AS rsi_state, div AS rsi_divergence, rsi_signal,
  trend AS rsi_trend,
  ROUND(rsi_strength, 6) AS rsi_strength,
  ROUND(least(80.0::DOUBLE, 70.0 * vol_factor), 6) AS ob_threshold,
  ROUND(greatest(20.0::DOUBLE, 30.0 / vol_factor), 6) AS os_threshold
FROM boost
"""



@query(
    "ind_smart_rsi",
    survey="§2.9 smart RSI (batch/tv_rsi.py:14-174, indicators/library.py "
    "i_smart_rsi): RSI 7/14/21, ATR-adaptive OB/OS thresholds, EMA34 "
    "trend gate, 2-of-3 zone vote, ±5-bar pivot divergence with "
    "divergence-boosted signal",
    description="Full smart-RSI surface per event_type, divergence included",
    oracle=_SRSI_ORACLE.format(bars=_TAIL_BARS_1H_SQL),
)
def ind_smart_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every recursive series (gain/loss smoothers for three RSI
    periods, the ATR scan, EMA34) is a sequential fold or single-pass
    scan; the divergence pivot windows are 11-bar array extremes over
    the last-50 slice. The signal/strength ladders are pure CASE
    algebra on unrounded doubles, identical in both engines."""
    bars = _bars_1h_tail(spark, sf_dir)
    arr = bars.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("bucket_ts", "high", "low", "close"))
        ).alias("rows")
    )
    hi = F.transform(F.col("rows"), lambda r: r["high"])
    lo = F.transform(F.col("rows"), lambda r: r["low"])
    cl = F.transform(F.col("rows"), lambda r: r["close"])
    n = F.size("rows")
    base = arr.select(
        "event_type", hi.alias("hi"), lo.alias("lo"), cl.alias("cl"),
        n.alias("n"),
    )
    hic, loc, clc, nc = F.col("hi"), F.col("lo"), F.col("cl"), F.col("n")
    zero = F.lit(0.0)
    gains = F.transform(
        F.sequence(F.lit(1), nc),
        lambda k: F.when(k == 1, zero).otherwise(
            F.greatest(F.element_at(clc, k) - F.element_at(clc, k - 1), zero)
        ),
    )
    losses = F.transform(
        F.sequence(F.lit(1), nc),
        lambda k: F.when(k == 1, zero).otherwise(
            F.greatest(F.element_at(clc, k - 1) - F.element_at(clc, k), zero)
        ),
    )
    tr = F.transform(
        F.sequence(F.lit(1), nc),
        lambda k: F.when(
            k == 1, F.element_at(hic, 1) - F.element_at(loc, 1)
        ).otherwise(
            F.greatest(
                F.element_at(hic, k) - F.element_at(loc, k),
                F.abs(F.element_at(hic, k) - F.element_at(clc, k - 1)),
                F.abs(F.element_at(loc, k) - F.element_at(clc, k - 1)),
            )
        ),
    )
    gl = base.select(
        "event_type", "hi", "lo", "cl", "n",
        gains.alias("gains"), losses.alias("losses"), tr.alias("tr"),
    )

    def fold(src: Column, alpha: float) -> Column:
        return F.aggregate(
            F.slice(src, 2, F.greatest(F.size(src) - 1, F.lit(0))),
            F.element_at(src, 1).cast("double"),
            lambda acc, v: acc * F.lit(1.0 - alpha) + v * F.lit(alpha),
        )

    def scan(src: Column, alpha: float) -> Column:
        return F.aggregate(
            F.slice(src, 2, F.greatest(F.size(src) - 1, F.lit(0))),
            F.array(F.element_at(src, 1).cast("double")),
            lambda acc, v: F.concat(
                acc,
                F.array(
                    F.element_at(acc, -1) * F.lit(1.0 - alpha)
                    + v * F.lit(alpha)
                ),
            ),
        )

    def rsi_case(g: Column, l: Column) -> Column:
        return (
            F.when(g + l == 0, F.lit(50.0))
            .when(l == 0, F.lit(100.0))
            .otherwise(F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + g / l))
        )

    a14 = 1.0 / 14.0
    scans = gl.select(
        "event_type", "hi", "lo", "cl", "n", "gains", "losses",
        scan(F.col("gains"), a14).alias("g14s"),
        scan(F.col("losses"), a14).alias("l14s"),
        scan(F.col("tr"), a14).alias("atr_scan"),
    )
    r7 = rsi_case(fold(F.col("gains"), 1.0 / 7.0), fold(F.col("losses"), 1.0 / 7.0))
    r21 = rsi_case(fold(F.col("gains"), 1.0 / 21.0), fold(F.col("losses"), 1.0 / 21.0))
    g14n = F.element_at(F.col("g14s"), nc.cast("int"))
    l14n = F.element_at(F.col("l14s"), nc.cast("int"))
    rsi14s = F.transform(
        F.sequence(F.lit(1), nc),
        lambda i: rsi_case(
            F.element_at(F.col("g14s"), i.cast("int")),
            F.element_at(F.col("l14s"), i.cast("int")),
        ),
    )
    vals = scans.select(
        "event_type", "hi", "lo", "cl", "n",
        r7.alias("r7"), r21.alias("r21"),
        rsi_case(g14n, l14n).alias("r14"),
        rsi14s.alias("rsi14s"),
        F.element_at(F.col("atr_scan"), nc.cast("int")).alias("atr_last"),
        F.array_max("atr_scan").alias("amax"),
        F.array_min("atr_scan").alias("amin"),
        fold(F.col("cl"), 2.0 / 35.0).alias("ema34"),
    )
    vf = (
        1.0
        + (
            (F.col("atr_last") - F.col("amin"))
            / ((F.col("amax") - F.col("amin")) + 1e-10)
            - 0.5
        )
        * 0.2
    )
    th = vals.withColumns(
        {
            "rsi_avg": (F.col("r7") + F.col("r14") + F.col("r21")) / 3.0,
            "vol_factor": vf,
            "trend": F.when(
                F.element_at(F.col("cl"), F.col("n").cast("int"))
                > F.col("ema34"),
                "bullish",
            ).otherwise("bearish"),
        }
    ).withColumns(
        {
            "overbought": F.least(F.lit(80.0), 70.0 * F.col("vol_factor")),
            "oversold": F.greatest(F.lit(20.0), 30.0 / F.col("vol_factor")),
        }
    )
    n_os = sum(
        (
            F.when(F.col(c) < F.col("oversold"), 1).otherwise(0)
            for c in ("r7", "r14", "r21")
        ),
        F.lit(0),
    )
    n_ob = sum(
        (
            F.when(F.col(c) > F.col("overbought"), 1).otherwise(0)
            for c in ("r7", "r14", "r21")
        ),
        F.lit(0),
    )
    sig = th.withColumns({"n_os": n_os, "n_ob": n_ob}).withColumns(
        {
            "signal0": F.when(
                (F.col("trend") == "bullish") & (F.col("n_os") >= 2), "buy"
            )
            .when((F.col("trend") == "bearish") & (F.col("n_ob") >= 2), "sell")
            .otherwise("watch"),
            "state": F.when(
                (F.col("trend") == "bullish") & (F.col("n_os") >= 2), "oversold"
            )
            .when((F.col("trend") == "bullish") & (F.col("n_ob") >= 2), "overbought")
            .when((F.col("trend") == "bearish") & (F.col("n_ob") >= 2), "overbought")
            .when((F.col("trend") == "bearish") & (F.col("n_os") >= 2), "oversold")
            .otherwise("neutral"),
        }
    )
    strength0 = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(100.0),
            F.abs(
                F.when(
                    F.col("signal0") == "buy",
                    (F.col("oversold") - F.col("rsi_avg")) / F.col("oversold") * 100,
                )
                .when(
                    F.col("signal0") == "sell",
                    (F.col("rsi_avg") - F.col("overbought"))
                    / (100 - F.col("overbought"))
                    * 100,
                )
                .otherwise(F.abs(50 - F.col("rsi_avg")) / 50 * 100)
            ),
        ),
    )
    big = F.col("n") >= 50
    h50 = F.when(big, F.slice(F.col("hi"), F.col("n") - 49, 50))
    l50 = F.when(big, F.slice(F.col("lo"), F.col("n") - 49, 50))
    r50 = F.when(big, F.slice(F.col("rsi14s"), F.col("n") - 49, 50))
    d0 = sig.withColumns(
        {"strength0": strength0, "h50": h50, "l50": l50, "r50": r50}
    )
    ph_pos = F.when(
        big,
        F.filter(
            F.sequence(F.lit(6), F.lit(45)),
            lambda p: F.element_at(F.col("h50"), p.cast("int"))
            == F.array_max(F.slice(F.col("h50"), p - 5, 11)),
        ),
    )
    pl_pos = F.when(
        big,
        F.filter(
            F.sequence(F.lit(6), F.lit(45)),
            lambda p: F.element_at(F.col("l50"), p.cast("int"))
            == F.array_min(F.slice(F.col("l50"), p - 5, 11)),
        ),
    )
    d1 = d0.withColumns({"ph_pos": ph_pos, "pl_pos": pl_pos}).withColumns(
        {"nh": F.size("ph_pos"), "nl": F.size("pl_pos")}
    )
    has_piv = (F.col("nh") >= 2) & (F.col("nl") >= 2)

    def at(arr_name: str, pos_name: str, idx: Column) -> Column:
        return F.element_at(
            F.col(arr_name), F.element_at(F.col(pos_name), idx).cast("int")
        )

    hlast, hprev = at("h50", "ph_pos", F.col("nh")), at("h50", "ph_pos", F.col("nh") - 1)
    rh_last, rh_prev = at("r50", "ph_pos", F.col("nh")), at("r50", "ph_pos", F.col("nh") - 1)
    llast, lprev = at("l50", "pl_pos", F.col("nl")), at("l50", "pl_pos", F.col("nl") - 1)
    rl_last, rl_prev = at("r50", "pl_pos", F.col("nl")), at("r50", "pl_pos", F.col("nl") - 1)
    bear_cond = big & has_piv & (hlast > hprev) & (rh_last < rh_prev)
    bull_cond = big & has_piv & (llast < lprev) & (rl_last > rl_prev)
    div = (
        F.when(bear_cond, "bearish_div")
        .when(bull_cond, "bullish_div")
        .otherwise("none")
    )
    div_strength = (
        F.when(
            bear_cond,
            F.least(F.lit(100.0), (rh_prev - rh_last) / rh_prev * 100),
        )
        .when(
            bull_cond,
            F.least(F.lit(100.0), (rl_last - rl_prev) / rl_prev * 100),
        )
        .otherwise(F.lit(0.0))
    )
    d2 = d1.withColumns({"div": div, "div_strength": div_strength})
    boost_buy = (
        (F.col("div") == "bullish_div")
        & (F.col("trend") == "bullish")
        & (F.col("n_os") >= 2)
    )
    boost_sell = (
        (F.col("div") == "bearish_div")
        & (F.col("trend") == "bearish")
        & (F.col("n_ob") >= 2)
    )
    rsi_signal = (
        F.when(boost_buy, "buy").when(boost_sell, "sell").otherwise(F.col("signal0"))
    )
    rsi_strength = F.when(
        boost_buy | boost_sell,
        F.least(F.lit(100.0), F.col("strength0") + F.col("div_strength") * 0.5),
    ).otherwise(F.col("strength0"))
    return d2.select(
        "event_type",
        F.round("r7", 6).alias("rsi7"),
        F.round("r14", 6).alias("rsi14"),
        F.round("r21", 6).alias("rsi21"),
        F.round("rsi_avg", 6).alias("rsi_avg"),
        F.col("state").alias("rsi_state"),
        F.col("div").alias("rsi_divergence"),
        rsi_signal.alias("rsi_signal"),
        F.col("trend").alias("rsi_trend"),
        F.round(rsi_strength, 6).alias("rsi_strength"),
        F.round("overbought", 6).alias("ob_threshold"),
        F.round("oversold", 6).alias("os_threshold"),
    )


# ---------------------------------------------------------------------------
# Single-bar CDL parity — the numpy detector vs an independent SQL replay
# ---------------------------------------------------------------------------
#: Single-bar labels of indicators/candles.py's 61-CDL set.
CDL_SINGLES = (
    "dragonfly_doji", "takuri", "gravestone_doji", "doji",
    "long_legged_doji", "rickshaw_man", "marubozu", "closing_marubozu",
    "belt_hold", "long_line", "short_line", "spinning_top", "high_wave",
)

_CDL_TAIL = 500


def _cdl_scan(src: str) -> str:
    """Sequential prefix sums — the np.cumsum order, so the TA-Lib
    trailing-mean thresholds are bit-identical."""
    return (
        f"list_reduce(list_transform({src}, v -> [v]), "
        f"(acc, x) -> list_append(acc, acc[-1] + x[1]))"
    )


def _cdl_mean(cum: str, vals: str, period: int, idx: str = "i") -> str:
    """factor-free trailing mean of the ``period`` bars strictly before
    1-based row ``idx`` (numpy: (cum[i_py] - cum[i_py-n]) / n,
    n=min(p, i_py); falls back to the bar's own value when there is no
    history)."""
    j = f"({idx})"
    n = f"LEAST({period}, {j} - 1)"
    return (
        f"(CASE WHEN {j} = 1 THEN {vals}[{j}] "
        f"ELSE ({cum}[{j} - 1] - CASE WHEN {j} - 1 - {n} = 0 THEN 0.0 "
        f"ELSE {cum}[{j} - 1 - {n}] END) / {n} END)"
    )


def _cdl_singles_oracle() -> str:
    m10b = _cdl_mean("cbody", "body", 10)     # body_long / body_short
    m10h = _cdl_mean("chl", "hl", 10)         # body_doji / shadow_very_short
    m10s = _cdl_mean("cshad", "shad", 10)     # shadow_short (halved)
    m5h = _cdl_mean("chl", "hl", 5)           # near
    preds = f"""
  SELECT event_type, i, bs[i] AS b,
    os[i] AS o, hs[i] AS h, ls[i] AS l, cs[i] AS c,
    body[i] AS bd,
    hs[i] - GREATEST(os[i], cs[i]) AS upsh,
    LEAST(os[i], cs[i]) - ls[i] AS losh,
    cs[i] > os[i] AS white,
    body[i] <= 0.1 * {m10h} AS doji,
    hs[i] - GREATEST(os[i], cs[i]) < 0.1 * {m10h} AS tinyu,
    LEAST(os[i], cs[i]) - ls[i] < 0.1 * {m10h} AS tinyl,
    hs[i] - GREATEST(os[i], cs[i]) > body[i] AS longu,
    LEAST(os[i], cs[i]) - ls[i] > body[i] AS longl,
    hs[i] - GREATEST(os[i], cs[i]) > 2.0 * body[i] AS vlongu,
    LEAST(os[i], cs[i]) - ls[i] > 2.0 * body[i] AS vlongl,
    body[i] > {m10b} AS longb,
    body[i] < {m10b} AS shortb,
    hs[i] - GREATEST(os[i], cs[i]) < {m10s} / 2.0 AS shortu,
    LEAST(os[i], cs[i]) - ls[i] < {m10s} / 2.0 AS shortl,
    ABS((LEAST(os[i], cs[i]) + GREATEST(os[i], cs[i])) / 2.0
        - (hs[i] + ls[i]) / 2.0) <= 0.2 * {m5h} AS nearmid
  FROM rows_
"""
    labels = [
        ("dragonfly_doji", "doji AND tinyu AND NOT tinyl", "'bull'"),
        ("takuri", "doji AND tinyu AND NOT tinyl AND vlongl", "'bull'"),
        ("gravestone_doji", "doji AND tinyl AND NOT tinyu", "'bear'"),
        ("doji",
         "doji AND NOT (tinyu AND NOT tinyl) AND NOT (tinyl AND NOT tinyu)",
         "'neutral'"),
        ("long_legged_doji", "doji AND (longl OR longu)", "'neutral'"),
        ("rickshaw_man", "doji AND longl AND longu AND nearmid",
         "'neutral'"),
        ("marubozu", "longb AND tinyu AND tinyl", "clr"),
        ("closing_marubozu",
         "longb AND NOT (tinyu AND tinyl) "
         "AND (CASE WHEN white THEN tinyu ELSE tinyl END)", "clr"),
        ("belt_hold",
         "longb AND NOT (tinyu AND tinyl) "
         "AND (CASE WHEN white THEN tinyl ELSE tinyu END)", "clr"),
        ("long_line",
         "longb AND NOT (tinyu AND tinyl) AND shortu AND shortl", "clr"),
        ("short_line",
         "NOT longb AND shortb AND NOT doji AND shortu AND shortl",
         "clr"),
        ("spinning_top",
         "NOT longb AND shortb AND NOT doji AND upsh > bd AND losh > bd",
         "'neutral'"),
        ("high_wave",
         "NOT longb AND shortb AND NOT doji AND vlongu AND vlongl",
         "clr"),
    ]
    unions = "\nUNION ALL\n".join(
        f"SELECT event_type, b, '{name}' AS pattern, {direction} AS "
        f"direction FROM preds WHERE {cond}"
        for name, cond, direction in labels
    )
    return f"""
WITH bars_all AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
    min_by(value, ts) AS open, MAX(value) AS high,
    MIN(value) AS low, max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
bars AS (
  SELECT event_type, b, open, high, low, close FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY b DESC) AS rnd
    FROM bars_all
  ) WHERE rnd <= {_CDL_TAIL}
),
s AS (
  SELECT event_type,
    list(b ORDER BY b) AS bs, list(open ORDER BY b) AS os,
    list(high ORDER BY b) AS hs, list(low ORDER BY b) AS ls,
    list(close ORDER BY b) AS cs
  FROM bars GROUP BY event_type
),
g AS (
  SELECT *,
    list_transform(range(1, len(cs) + 1),
      i -> ABS(cs[i] - os[i])) AS body,
    list_transform(range(1, len(cs) + 1), i -> hs[i] - ls[i]) AS hl,
    list_transform(range(1, len(cs) + 1),
      i -> (hs[i] - GREATEST(os[i], cs[i]))
         + (LEAST(os[i], cs[i]) - ls[i])) AS shad
  FROM s
),
cm AS (
  SELECT *, {_cdl_scan("body")} AS cbody, {_cdl_scan("hl")} AS chl,
    {_cdl_scan("shad")} AS cshad
  FROM g
),
rows_ AS (
  SELECT event_type, bs, os, hs, ls, cs, body, hl, shad,
    cbody, chl, cshad,
    unnest(range(1, len(cs) + 1)) AS i
  FROM cm
),
preds AS (
  SELECT *, CASE WHEN white THEN 'bull' ELSE 'bear' END AS clr
  FROM ({preds})
)
SELECT event_type,
  strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts, pattern, direction
FROM ({unions})
"""


@query(
    "ind_cdl_singles_parity",
    survey="§2.9 k_pattern fidelity (batch/k_pattern.py:9-48): the "
    "REAL numpy 61-CDL detector's single-bar subset, hash-checked "
    "against an independent SQL replay of the TA-Lib threshold "
    "machinery (sequential prefix-sum trailing means, decision tree "
    "mirrored from candles.py:547-580)",
    description="13 single-bar CDL labels from the numpy detector, "
    "SQL-replayed",
    oracle=_cdl_singles_oracle(),
)
def ind_cdl_singles_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark side runs indicators/candles.py's actual detector
    (applyInPandas per key over the 500-bar tail) and keeps the
    single-bar labels; the oracle re-derives those labels from scratch
    in DuckDB — prefix sums in np.cumsum order so every trailing-mean
    threshold is bit-identical, then the same decision tree. A label
    flip on either side is a hash mismatch, so the detector's geometry
    predicates are driver-verified, not just fixture-verified."""
    import pandas as pd

    from tradecat_spark.indicators.candles import Candles

    singles = set(CDL_SINGLES)
    e = load_table(spark, sf_dir, "events")
    bars = e.groupBy(
        "event_type",
        F.timestamp_seconds(
            (F.col("ts").cast("long") / 3600).cast("long") * 3600
        ).alias("bucket_ts"),
    ).agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
    )
    wdesc = Window.partitionBy("event_type").orderBy(F.desc("bucket_ts"))
    bars = (
        bars.withColumn("_rnd", F.row_number().over(wdesc))
        .filter(F.col("_rnd") <= _CDL_TAIL)
        .drop("_rnd")
    )

    def detect(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts")
        cd = Candles(
            pdf["open"].to_numpy(), pdf["high"].to_numpy(),
            pdf["low"].to_numpy(), pdf["close"].to_numpy(),
        )
        key = pdf["event_type"].iloc[0]
        ts = pdf["bucket_ts"].dt.strftime("%Y-%m-%d %H:%M:%S").tolist()
        rows = []
        for i in range(len(pdf)):
            for name, direction in cd.detect(i):
                if name in singles:
                    rows.append((key, ts[i], name, direction))
        return pd.DataFrame(
            rows,
            columns=["event_type", "bucket_ts", "pattern", "direction"],
        )

    return bars.repartition("event_type").groupBy("event_type").applyInPandas(
        detect,
        "event_type string, bucket_ts string, pattern string, "
        "direction string",
    )


#: Two-bar labels of the 61-CDL set (candles.py "---- two-bar ----").
CDL_PAIRS = (
    "bullish_engulfing", "bearish_engulfing", "harami_cross", "harami",
    "doji_star", "piercing", "dark_cloud_cover", "on_neck", "in_neck",
    "thrusting", "counterattack", "separating_lines", "matching_low",
    "homing_pigeon", "kicking", "kicking_by_length", "hammer",
    "hanging_man", "inverted_hammer", "shooting_star",
)


def _cdl_pairs_oracle() -> str:
    m10b_i = _cdl_mean("cbody", "body", 10)
    m10b_p = _cdl_mean("cbody", "body", 10, "i - 1")
    m10h_i = _cdl_mean("chl", "hl", 10)
    m10h_p = _cdl_mean("chl", "hl", 10, "i - 1")
    m5h_p = _cdl_mean("chl", "hl", 5, "i - 1")
    preds = f"""
  SELECT event_type, i, bs[i] AS b,
    os[i] AS o, hs[i] AS h, ls[i] AS l, cs[i] AS c,
    os[i-1] AS op, hs[i-1] AS hp, ls[i-1] AS lp, cs[i-1] AS cp,
    body[i] AS bd, body[i-1] AS bdp,
    GREATEST(os[i], cs[i]) AS tops, LEAST(os[i], cs[i]) AS bots,
    GREATEST(os[i-1], cs[i-1]) AS topsp,
    LEAST(os[i-1], cs[i-1]) AS botsp,
    hs[i] - GREATEST(os[i], cs[i]) AS upsh,
    LEAST(os[i], cs[i]) - ls[i] AS losh,
    hs[i-1] - GREATEST(os[i-1], cs[i-1]) AS upshp,
    LEAST(os[i-1], cs[i-1]) - ls[i-1] AS loshp,
    cs[i] > os[i] AS white, cs[i] < os[i] AS black,
    cs[i-1] > os[i-1] AS whitep, cs[i-1] < os[i-1] AS blackp,
    body[i-1] > {m10b_p} AS long1,
    body[i] > {m10b_i} AS longb,
    body[i] < {m10b_i} AS shortb,
    body[i] <= 0.1 * {m10h_i} AS doji,
    hs[i] - GREATEST(os[i], cs[i]) < 0.1 * {m10h_i} AS tinyu,
    LEAST(os[i], cs[i]) - ls[i] < 0.1 * {m10h_i} AS tinyl,
    hs[i-1] - GREATEST(os[i-1], cs[i-1]) < 0.1 * {m10h_p} AS tinyup,
    LEAST(os[i-1], cs[i-1]) - ls[i-1] < 0.1 * {m10h_p} AS tinylp,
    hs[i] - GREATEST(os[i], cs[i]) > body[i] AS longu,
    LEAST(os[i], cs[i]) - ls[i] > body[i] AS longl,
    0.05 * {m5h_p} AS eq1,
    0.2 * {m5h_p} AS nearp
  FROM rows_ WHERE i >= 2
"""
    labels = [
        ("bullish_engulfing",
         "white AND blackp AND c >= op AND o <= cp "
         "AND (c > op OR o < cp)", "'bull'"),
        ("bearish_engulfing",
         "black AND whitep AND c <= op AND o >= cp "
         "AND (c < op OR o > cp)", "'bear'"),
        ("harami_cross", "long1 AND contained AND doji",
         "CASE WHEN blackp THEN 'bull' ELSE 'bear' END"),
        ("harami", "long1 AND contained AND NOT doji AND shortb",
         "'neutral'"),
        ("doji_star",
         "long1 AND doji AND whitep AND bots > topsp", "'bear'"),
        ("doji_star",
         "long1 AND doji AND blackp AND tops < botsp", "'bull'"),
        ("piercing",
         "blackp AND long1 AND white AND longb AND o < lp "
         "AND cp + 0.5 * bdp < c AND c < op", "'bull'"),
        ("dark_cloud_cover",
         "whitep AND long1 AND black AND o > hp "
         "AND op < c AND c < cp - 0.5 * bdp", "'bear'"),
        ("on_neck",
         "blackp AND long1 AND white AND o < lp "
         "AND ABS(c - lp) <= eq1", "'bear'"),
        ("in_neck",
         "blackp AND long1 AND white AND o < lp "
         "AND NOT (ABS(c - lp) <= eq1) "
         "AND cp <= c AND c <= cp + eq1", "'bear'"),
        ("thrusting",
         "blackp AND long1 AND white AND o < lp "
         "AND NOT (ABS(c - lp) <= eq1) "
         "AND NOT (cp <= c AND c <= cp + eq1) "
         "AND c > cp + eq1 AND c <= cp + 0.5 * bdp", "'bear'"),
        ("counterattack",
         "whitep <> white AND long1 AND longb "
         "AND ABS(c - cp) <= eq1",
         "CASE WHEN white THEN 'bull' ELSE 'bear' END"),
        ("separating_lines",
         "whitep <> white AND ABS(o - op) <= eq1 AND longb "
         "AND (CASE WHEN white THEN tinyl ELSE tinyu END)",
         "CASE WHEN white THEN 'bull' ELSE 'bear' END"),
        ("matching_low",
         "blackp AND black AND ABS(c - cp) <= eq1", "'bull'"),
        ("homing_pigeon",
         "blackp AND long1 AND black AND shortb "
         "AND o < op AND c > cp", "'bull'"),
        ("kicking", "kick_b", "'bull'"),
        ("kicking", "kick_s", "'bear'"),
        ("kicking_by_length", "kick_b OR kick_s",
         "CASE WHEN bd > bdp "
         "THEN (CASE WHEN white THEN 'bull' ELSE 'bear' END) "
         "ELSE (CASE WHEN whitep THEN 'bull' ELSE 'bear' END) END"),
        ("hammer",
         "shortb AND longl AND tinyu AND bots <= lp + nearp", "'bull'"),
        ("hanging_man",
         "shortb AND longl AND tinyu AND bots >= hp - nearp", "'bear'"),
        ("inverted_hammer",
         "shortb AND longu AND tinyl AND tops < botsp", "'bull'"),
        ("shooting_star",
         "shortb AND longu AND tinyl AND bots > topsp", "'bear'"),
    ]
    unions = "\nUNION ALL\n".join(
        f"SELECT event_type, b, '{name}' AS pattern, {direction} AS "
        f"direction FROM preds WHERE {cond}"
        for name, cond, direction in labels
    )
    return f"""
WITH bars_all AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
    min_by(value, ts) AS open, MAX(value) AS high,
    MIN(value) AS low, max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
bars AS (
  SELECT event_type, b, open, high, low, close FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY b DESC) AS rnd
    FROM bars_all
  ) WHERE rnd <= {_CDL_TAIL}
),
s AS (
  SELECT event_type,
    list(b ORDER BY b) AS bs, list(open ORDER BY b) AS os,
    list(high ORDER BY b) AS hs, list(low ORDER BY b) AS ls,
    list(close ORDER BY b) AS cs
  FROM bars GROUP BY event_type
),
g AS (
  SELECT *,
    list_transform(range(1, len(cs) + 1),
      i -> ABS(cs[i] - os[i])) AS body,
    list_transform(range(1, len(cs) + 1), i -> hs[i] - ls[i]) AS hl
  FROM s
),
cm AS (
  SELECT *, {_cdl_scan("body")} AS cbody, {_cdl_scan("hl")} AS chl
  FROM g
),
rows_ AS (
  SELECT event_type, bs, os, hs, ls, cs, body, hl, cbody, chl,
    unnest(range(1, len(cs) + 1)) AS i
  FROM cm
),
preds0 AS (
  SELECT *,
    tops < topsp AND bots > botsp AS contained,
    longb AND tinyu AND tinyl AS maru,
    long1 AND tinyup AND tinylp AS marup
  FROM ({preds})
),
preds AS (
  SELECT *,
    marup AND maru AND blackp AND white AND l > hp AS kick_b,
    marup AND maru AND whitep AND black AND h < lp AS kick_s
  FROM preds0
)
SELECT event_type,
  strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts, pattern, direction
FROM ({unions})
"""


@query(
    "ind_cdl_pairs_parity",
    survey="§2.9 k_pattern fidelity (batch/k_pattern.py:9-48): the "
    "numpy detector's TWO-bar subset (engulfing/harami/star/neck/"
    "kicking/hammer families) hash-checked against an independent SQL "
    "replay — prev-bar thresholds evaluated at i-1 with the same "
    "cumsum-order trailing means",
    description="20 two-bar CDL labels from the numpy detector, SQL-replayed",
    oracle=_cdl_pairs_oracle(),
)
def ind_cdl_pairs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same construction as ind_cdl_singles_parity, over the detector's
    two-bar section — every label needs BOTH bars' geometry and the
    previous bar's own trailing-mean thresholds (long1, eq, near), so
    this gate covers the cross-bar predicate plumbing the single-bar
    gate can't reach."""
    import pandas as pd

    from tradecat_spark.indicators.candles import Candles

    pairs = set(CDL_PAIRS)
    e = load_table(spark, sf_dir, "events")
    bars = e.groupBy(
        "event_type",
        F.timestamp_seconds(
            (F.col("ts").cast("long") / 3600).cast("long") * 3600
        ).alias("bucket_ts"),
    ).agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
    )
    wdesc = Window.partitionBy("event_type").orderBy(F.desc("bucket_ts"))
    bars = (
        bars.withColumn("_rnd", F.row_number().over(wdesc))
        .filter(F.col("_rnd") <= _CDL_TAIL)
        .drop("_rnd")
    )

    def detect(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts")
        cd = Candles(
            pdf["open"].to_numpy(), pdf["high"].to_numpy(),
            pdf["low"].to_numpy(), pdf["close"].to_numpy(),
        )
        key = pdf["event_type"].iloc[0]
        ts = pdf["bucket_ts"].dt.strftime("%Y-%m-%d %H:%M:%S").tolist()
        rows = []
        for i in range(len(pdf)):
            for name, direction in cd.detect(i):
                if name in pairs:
                    rows.append((key, ts[i], name, direction))
        return pd.DataFrame(
            rows,
            columns=["event_type", "bucket_ts", "pattern", "direction"],
        )

    return bars.repartition("event_type").groupBy("event_type").applyInPandas(
        detect,
        "event_type string, bucket_ts string, pattern string, "
        "direction string",
    )


#: Three-bar labels of the 61-CDL set (candles.py "---- three-bar ----").
CDL_TRIPLES = (
    "three_white_soldiers", "advance_block", "stalled_pattern",
    "three_inside", "three_outside", "three_stars_in_south",
    "identical_three_crows", "two_crows", "upside_gap_two_crows",
    "morning_doji_star", "morning_star", "evening_doji_star",
    "evening_star", "abandoned_baby", "tristar", "unique_three_river",
    "stick_sandwich", "tasuki_gap", "gap_side_side_white",
    "xside_gap_three_methods", "hikkake",
)


def _cdl_triples_oracle() -> str:
    mb = {s: _cdl_mean("cbody", "body", 10, x)
          for s, x in (("", "i"), ("1", "i - 1"), ("2", "i - 2"))}
    mh = {s: _cdl_mean("chl", "hl", 10, x)
          for s, x in (("", "i"), ("1", "i - 1"), ("2", "i - 2"))}
    ms = {s: _cdl_mean("cshad", "shad", 10, x)
          for s, x in (("", "i"), ("1", "i - 1"))}
    m5 = {s: _cdl_mean("chl", "hl", 5, x)
          for s, x in (("1", "i - 1"), ("2", "i - 2"))}
    geo = []
    for s, x in (("", "i"), ("1", "i - 1"), ("2", "i - 2")):
        geo += [
            f"os[{x}] AS o{s}, hs[{x}] AS h{s}, ls[{x}] AS l{s}, "
            f"cs[{x}] AS c{s}",
            f"body[{x}] AS bd{s}",
            f"GREATEST(os[{x}], cs[{x}]) AS tops{s}",
            f"LEAST(os[{x}], cs[{x}]) AS bots{s}",
            f"hs[{x}] - GREATEST(os[{x}], cs[{x}]) AS upsh{s}",
            f"LEAST(os[{x}], cs[{x}]) - ls[{x}] AS losh{s}",
            f"cs[{x}] > os[{x}] AS white{s}",
            f"cs[{x}] < os[{x}] AS black{s}",
            f"body[{x}] <= 0.1 * {mh[s]} AS doji{s}",
            f"body[{x}] > {mb[s]} AS longb{s}",
            f"body[{x}] < {mb[s]} AS shortb{s}",
            f"hs[{x}] - GREATEST(os[{x}], cs[{x}]) < 0.1 * {mh[s]} "
            f"AS tinyu{s}",
            f"LEAST(os[{x}], cs[{x}]) - ls[{x}] < 0.1 * {mh[s]} "
            f"AS tinyl{s}",
        ]
    geo += [
        f"hs[i] - GREATEST(os[i], cs[i]) < {ms['']} / 2.0 AS shortu",
        f"hs[i-1] - GREATEST(os[i-1], cs[i-1]) < {ms['1']} / 2.0 "
        f"AS shortu1",
        f"LEAST(os[i-2], cs[i-2]) - ls[i-2] > body[i-2] AS longl2",
        f"0.2 * {m5['1']} AS near1",
        f"0.2 * {m5['2']} AS near2",
        f"0.6 * {m5['2']} AS far2",
        f"0.05 * {m5['1']} AS eq1v",
        f"0.05 * {m5['2']} AS eq2v",
    ]
    preds = (
        "  SELECT event_type, i, bs[i] AS b,\n    "
        + ",\n    ".join(geo)
        + "\n  FROM rows_ WHERE i >= 3"
    )
    allwhite = "white2 AND white1 AND white"
    rising = "c2 < c1 AND c1 < c"
    sws = (f"{allwhite} AND tinyu2 AND tinyu1 AND tinyu AND {rising} "
           "AND o2 < o1 AND o1 < c2 + near2 AND o1 < o AND o < c1 + near1 "
           "AND bd1 > bd2 - near2 AND bd > bd1 - near1")
    adv = (f"{allwhite} AND {rising} AND o2 < o1 AND o1 < c2 "
           "AND o1 < o AND o < c1 AND longb2 AND bd1 < bd2 - far2 "
           "AND bd < bd1 + near1 AND (NOT shortu OR NOT shortu1)")
    stall = (f"{allwhite} AND {rising} AND longb2 AND longb1 AND tinyu1 "
             "AND o1 < o2 + bd2 AND shortb AND o >= c1 - bd - near1")
    labels = [
        ("three_white_soldiers", sws, "'bull'"),
        ("advance_block", f"NOT ({sws}) AND {adv}", "'bear'"),
        ("stalled_pattern",
         f"NOT ({sws}) AND NOT ({adv}) AND {stall}", "'bear'"),
        ("three_inside",
         "longb2 AND shortb1 AND tops1 < tops2 AND bots1 > bots2 "
         "AND black2 AND white AND c > o2", "'bull'"),
        ("three_inside",
         "longb2 AND shortb1 AND tops1 < tops2 AND bots1 > bots2 "
         "AND NOT (black2 AND white AND c > o2) "
         "AND white2 AND black AND c < o2", "'bear'"),
        ("three_outside",
         "white1 AND black2 AND c1 > o2 AND o1 < c2 AND c > c1",
         "'bull'"),
        ("three_outside",
         "NOT (white1 AND black2 AND c1 > o2 AND o1 < c2 AND c > c1) "
         "AND black1 AND white2 AND c1 < o2 AND o1 > c2 AND c < c1",
         "'bear'"),
        ("three_stars_in_south",
         "black2 AND longb2 AND longl2 AND black1 AND bd1 < bd2 "
         "AND c2 < o1 AND o1 < o2 AND l1 > l2 AND NOT tinyl1 "
         "AND black AND shortb AND tinyl AND tinyu "
         "AND l >= l1 AND h <= h1", "'bull'"),
        ("identical_three_crows",
         "black2 AND black1 AND black AND c2 > c1 AND c1 > c "
         "AND ABS(o1 - c2) <= eq2v AND ABS(o - c1) <= eq1v", "'bear'"),
        ("two_crows",
         "white2 AND longb2 AND black1 AND bots1 > tops2 AND black "
         "AND c1 < o AND o < o1 AND o2 < c AND c < c2", "'bear'"),
        ("upside_gap_two_crows",
         "white2 AND longb2 AND black1 AND bots1 > tops2 AND black "
         "AND o > o1 AND c < c1 AND c > c2", "'bear'"),
        ("morning_doji_star",
         "black2 AND longb2 AND tops1 < bots2 AND white "
         "AND c > c2 + 0.3 * bd2 AND doji1", "'bull'"),
        ("morning_star",
         "black2 AND longb2 AND tops1 < bots2 AND white "
         "AND c > c2 + 0.3 * bd2 AND NOT doji1 AND shortb1", "'bull'"),
        ("evening_doji_star",
         "white2 AND longb2 AND bots1 > tops2 AND black "
         "AND c < c2 - 0.3 * bd2 AND doji1", "'bear'"),
        ("evening_star",
         "white2 AND longb2 AND bots1 > tops2 AND black "
         "AND c < c2 - 0.3 * bd2 AND NOT doji1 AND shortb1", "'bear'"),
        ("abandoned_baby",
         "doji1 AND black2 AND longb2 AND h1 < l2 AND white AND l > h1 "
         "AND c > c2 + 0.3 * bd2", "'bull'"),
        ("abandoned_baby",
         "doji1 AND NOT (black2 AND longb2 AND h1 < l2 AND white "
         "AND l > h1 AND c > c2 + 0.3 * bd2) "
         "AND white2 AND longb2 AND l1 > h2 AND black AND h < l1 "
         "AND c < c2 - 0.3 * bd2", "'bear'"),
        ("tristar",
         "doji2 AND doji1 AND doji AND bots1 > tops2 AND tops < tops1",
         "'bear'"),
        ("tristar",
         "doji2 AND doji1 AND doji "
         "AND NOT (bots1 > tops2 AND tops < tops1) "
         "AND tops1 < bots2 AND bots > bots1", "'bull'"),
        ("unique_three_river",
         "black2 AND longb2 AND black1 AND o1 < o2 AND c1 > c2 "
         "AND l1 < l2 AND white AND shortb AND o > l1 AND c < c1",
         "'bull'"),
        ("stick_sandwich",
         "black2 AND white1 AND l1 > c2 AND black "
         "AND ABS(c - c2) <= eq2v", "'bull'"),
        ("tasuki_gap",
         "bots1 > tops2 AND white1 AND black AND bots1 < o AND o < tops1 "
         "AND tops2 < c AND c < bots1 AND ABS(bd - bd1) < near1",
         "'bull'"),
        ("tasuki_gap",
         "NOT (bots1 > tops2 AND white1 AND black AND bots1 < o "
         "AND o < tops1 AND tops2 < c AND c < bots1 "
         "AND ABS(bd - bd1) < near1) "
         "AND tops1 < bots2 AND black1 AND white AND bots1 < o "
         "AND o < tops1 AND bots2 > c AND c > tops1 "
         "AND ABS(bd - bd1) < near1", "'bear'"),
        ("gap_side_side_white",
         "white1 AND white AND ABS(bd - bd1) < near1 "
         "AND ABS(o - o1) < near1 AND bots1 > tops2 AND bots > tops2",
         "'bull'"),
        ("gap_side_side_white",
         "white1 AND white AND ABS(bd - bd1) < near1 "
         "AND ABS(o - o1) < near1 "
         "AND NOT (bots1 > tops2 AND bots > tops2) "
         "AND tops1 < bots2 AND tops < bots2", "'bear'"),
        ("xside_gap_three_methods",
         "bots1 > tops2 AND white2 AND white1 AND black "
         "AND bots1 < o AND o < tops1 AND bots2 < c AND c < tops2",
         "'bull'"),
        ("xside_gap_three_methods",
         "NOT (bots1 > tops2 AND white2 AND white1 AND black "
         "AND bots1 < o AND o < tops1 AND bots2 < c AND c < tops2) "
         "AND tops1 < bots2 AND black2 AND black1 AND white "
         "AND bots1 < o AND o < tops1 AND bots2 < c AND c < tops2",
         "'bear'"),
        ("hikkake",
         "h1 < h2 AND l1 > l2 AND h < h1 AND l < l1", "'bull'"),
        ("hikkake",
         "h1 < h2 AND l1 > l2 AND NOT (h < h1 AND l < l1) "
         "AND h > h1 AND l > l1", "'bear'"),
    ]
    unions = "\nUNION ALL\n".join(
        f"SELECT event_type, b, '{name}' AS pattern, {direction} AS "
        f"direction FROM preds WHERE {cond}"
        for name, cond, direction in labels
    )
    return f"""
WITH bars_all AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
    min_by(value, ts) AS open, MAX(value) AS high,
    MIN(value) AS low, max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
bars AS (
  SELECT event_type, b, open, high, low, close FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY b DESC) AS rnd
    FROM bars_all
  ) WHERE rnd <= {_CDL_TAIL}
),
s AS (
  SELECT event_type,
    list(b ORDER BY b) AS bs, list(open ORDER BY b) AS os,
    list(high ORDER BY b) AS hs, list(low ORDER BY b) AS ls,
    list(close ORDER BY b) AS cs
  FROM bars GROUP BY event_type
),
g AS (
  SELECT *,
    list_transform(range(1, len(cs) + 1),
      i -> ABS(cs[i] - os[i])) AS body,
    list_transform(range(1, len(cs) + 1), i -> hs[i] - ls[i]) AS hl,
    list_transform(range(1, len(cs) + 1),
      i -> (hs[i] - GREATEST(os[i], cs[i]))
         + (LEAST(os[i], cs[i]) - ls[i])) AS shad
  FROM s
),
cm AS (
  SELECT *, {_cdl_scan("body")} AS cbody, {_cdl_scan("hl")} AS chl,
    {_cdl_scan("shad")} AS cshad
  FROM g
),
rows_ AS (
  SELECT event_type, bs, os, hs, ls, cs, body, hl, shad,
    cbody, chl, cshad,
    unnest(range(1, len(cs) + 1)) AS i
  FROM cm
),
preds AS (
{preds}
)
SELECT event_type,
  strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts, pattern, direction
FROM ({unions})
"""


@query(
    "ind_cdl_triples_parity",
    survey="§2.9 k_pattern fidelity (batch/k_pattern.py:9-48): the "
    "numpy detector's THREE-bar subset (soldiers/stars/crows/inside/"
    "outside/tristar/tasuki/hikkake families) hash-checked against an "
    "independent SQL replay, elif-chain negations included",
    description="21 three-bar CDL labels from the numpy detector, SQL-replayed",
    oracle=_cdl_triples_oracle(),
)
def ind_cdl_triples_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same construction as the singles/pairs gates over the detector's
    three-bar section — 21 labels whose conditions span three bars'
    geometry, three bars' trailing-mean thresholds, and the if/elif
    precedence (soldiers > advance_block > stalled_pattern), which the
    oracle reproduces by negating each earlier condition verbatim."""
    import pandas as pd

    from tradecat_spark.indicators.candles import Candles

    triples = set(CDL_TRIPLES)
    e = load_table(spark, sf_dir, "events")
    bars = e.groupBy(
        "event_type",
        F.timestamp_seconds(
            (F.col("ts").cast("long") / 3600).cast("long") * 3600
        ).alias("bucket_ts"),
    ).agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
    )
    wdesc = Window.partitionBy("event_type").orderBy(F.desc("bucket_ts"))
    bars = (
        bars.withColumn("_rnd", F.row_number().over(wdesc))
        .filter(F.col("_rnd") <= _CDL_TAIL)
        .drop("_rnd")
    )

    def detect(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts")
        cd = Candles(
            pdf["open"].to_numpy(), pdf["high"].to_numpy(),
            pdf["low"].to_numpy(), pdf["close"].to_numpy(),
        )
        key = pdf["event_type"].iloc[0]
        ts = pdf["bucket_ts"].dt.strftime("%Y-%m-%d %H:%M:%S").tolist()
        rows = []
        for i in range(len(pdf)):
            for name, direction in cd.detect(i):
                if name in triples:
                    rows.append((key, ts[i], name, direction))
        return pd.DataFrame(
            rows,
            columns=["event_type", "bucket_ts", "pattern", "direction"],
        )

    return bars.repartition("event_type").groupBy("event_type").applyInPandas(
        detect,
        "event_type string, bucket_ts string, pattern string, "
        "direction string",
    )


#: Four- and five-bar labels of the 61-CDL set (the exotic tail).
CDL_WIDE = (
    "breakaway", "ladder_bottom", "mat_hold", "rise_fall_three_methods",
    "concealing_baby_swallow", "three_line_strike", "three_black_crows",
    "hikkake_mod",
)


def _cdl_wide_oracle() -> str:
    sfx = (("", "i"), ("1", "i - 1"), ("2", "i - 2"),
           ("3", "i - 3"), ("4", "i - 4"))
    mb = {s: _cdl_mean("cbody", "body", 10, x) for s, x in sfx}
    mh = {s: _cdl_mean("chl", "hl", 10, x) for s, x in sfx[:4]}
    m5 = {s: _cdl_mean("chl", "hl", 5, x) for s, x in sfx[1:4]}
    geo = []
    for s, x in sfx:
        geo += [
            f"os[{x}] AS o{s}, hs[{x}] AS h{s}, ls[{x}] AS l{s}, "
            f"cs[{x}] AS c{s}",
            f"body[{x}] AS bd{s}",
            f"GREATEST(os[{x}], cs[{x}]) AS tops{s}",
            f"LEAST(os[{x}], cs[{x}]) AS bots{s}",
            f"cs[{x}] > os[{x}] AS white{s}",
            f"cs[{x}] < os[{x}] AS black{s}",
            f"body[{x}] > {mb[s]} AS longb{s}",
            f"body[{x}] < {mb[s]} AS shortb{s}",
        ]
    for s, x in sfx[:4]:
        geo += [
            f"hs[{x}] - GREATEST(os[{x}], cs[{x}]) < 0.1 * {mh[s]} "
            f"AS tinyu{s}",
            f"LEAST(os[{x}], cs[{x}]) - ls[{x}] < 0.1 * {mh[s]} "
            f"AS tinyl{s}",
        ]
    for s in ("1", "2", "3"):
        geo.append(f"0.2 * {m5[s]} AS near{s}v")
    preds = (
        "  SELECT event_type, i, bs[i] AS b,\n    "
        + ",\n    ".join(geo)
        + "\n  FROM rows_ WHERE i >= 4"
    )
    brk_b = ("i >= 5 AND black4 AND longb4 AND black3 AND tops3 < bots4 "
             "AND bots2 < bots3 AND black1 AND c1 < c2 AND white "
             "AND tops3 < c AND c < bots4")
    brk_s = ("i >= 5 AND white4 AND longb4 AND white3 AND bots3 > tops4 "
             "AND tops2 > tops3 AND white1 AND c1 > c2 AND black "
             "AND tops4 < c AND c < bots3")
    smalls_in = ("shortb3 AND shortb2 AND shortb1 "
                 "AND GREATEST(h3, h2, h1) < h4 "
                 "AND LEAST(l3, l2, l1) > l4")
    rf_b = (f"i >= 5 AND white4 AND longb4 AND {smalls_in} "
            "AND black3 AND black2 AND black1 "
            "AND c3 > c2 AND c2 > c1 AND white AND longb "
            "AND o > c1 AND c > c4")
    rf_s = (f"i >= 5 AND black4 AND longb4 AND {smalls_in} "
            "AND white3 AND white2 AND white1 "
            "AND c3 < c2 AND c2 < c1 AND black AND longb "
            "AND o < c1 AND c < c4")
    tls_b = ("white3 AND white2 AND white1 AND c3 < c2 AND c2 < c1 "
             "AND bots3 - near3v <= o2 AND o2 <= tops3 + near3v "
             "AND bots2 - near2v <= o1 AND o1 <= tops2 + near2v "
             "AND black AND o > c1 AND c < o3")
    tls_s = ("black3 AND black2 AND black1 AND c3 > c2 AND c2 > c1 "
             "AND bots3 - near3v <= o2 AND o2 <= tops3 + near3v "
             "AND bots2 - near2v <= o1 AND o1 <= tops2 + near2v "
             "AND white AND o < c1 AND c > o3")
    labels = [
        ("breakaway", brk_b, "'bull'"),
        ("breakaway", f"NOT ({brk_b}) AND {brk_s}", "'bear'"),
        ("ladder_bottom",
         "i >= 5 AND black4 AND black3 AND black2 AND black1 "
         "AND o3 < o4 AND o2 < o3 AND c3 < c4 AND c2 < c3 "
         "AND NOT tinyu1 AND white AND o > o1", "'bull'"),
        ("mat_hold",
         "i >= 5 AND white4 AND longb4 AND bots3 > tops4 "
         "AND shortb3 AND shortb2 AND shortb1 "
         "AND LEAST(bots3, bots2, bots1) > c4 - 0.5 * bd4 "
         "AND white AND o > c1 AND c > GREATEST(h3, h2, h1)", "'bull'"),
        ("rise_fall_three_methods", rf_b, "'bull'"),
        ("rise_fall_three_methods",
         f"NOT ({rf_b}) AND {rf_s}", "'bear'"),
        ("concealing_baby_swallow",
         "black3 AND black2 AND black1 AND black "
         "AND longb3 AND tinyu3 AND tinyl3 "
         "AND longb2 AND tinyu2 AND tinyl2 "
         "AND tops1 < bots2 AND h1 > c2 AND h >= h1 AND c < l1",
         "'bull'"),
        ("three_line_strike", tls_b, "'bull'"),
        ("three_line_strike", f"NOT ({tls_b}) AND {tls_s}", "'bear'"),
        ("three_black_crows",
         "white3 AND black2 AND black1 AND black "
         "AND tinyl2 AND tinyl1 AND tinyl "
         "AND c2 > c1 AND c1 > c AND c2 < o1 AND o1 < o2 "
         "AND c1 < o AND o < o1", "'bear'"),
        ("hikkake_mod",
         "h1 < h2 AND l1 > l2 AND c1 <= l1 + near1v "
         "AND h < h1 AND l < l1", "'bull'"),
        ("hikkake_mod",
         "h1 < h2 AND l1 > l2 "
         "AND NOT (c1 <= l1 + near1v AND h < h1 AND l < l1) "
         "AND c1 >= h1 - near1v AND h > h1 AND l > l1", "'bear'"),
    ]
    unions = "\nUNION ALL\n".join(
        f"SELECT event_type, b, '{name}' AS pattern, {direction} AS "
        f"direction FROM preds WHERE {cond}"
        for name, cond, direction in labels
    )
    return f"""
WITH bars_all AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
    min_by(value, ts) AS open, MAX(value) AS high,
    MIN(value) AS low, max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
bars AS (
  SELECT event_type, b, open, high, low, close FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY b DESC) AS rnd
    FROM bars_all
  ) WHERE rnd <= {_CDL_TAIL}
),
s AS (
  SELECT event_type,
    list(b ORDER BY b) AS bs, list(open ORDER BY b) AS os,
    list(high ORDER BY b) AS hs, list(low ORDER BY b) AS ls,
    list(close ORDER BY b) AS cs
  FROM bars GROUP BY event_type
),
g AS (
  SELECT *,
    list_transform(range(1, len(cs) + 1),
      i -> ABS(cs[i] - os[i])) AS body,
    list_transform(range(1, len(cs) + 1), i -> hs[i] - ls[i]) AS hl
  FROM s
),
cm AS (
  SELECT *, {_cdl_scan("body")} AS cbody, {_cdl_scan("hl")} AS chl
  FROM g
),
rows_ AS (
  SELECT event_type, bs, os, hs, ls, cs, body, hl, cbody, chl,
    unnest(range(1, len(cs) + 1)) AS i
  FROM cm
),
preds AS (
{preds}
)
SELECT event_type,
  strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts, pattern, direction
FROM ({unions})
"""


@query(
    "ind_cdl_wide_parity",
    survey="§2.9 k_pattern fidelity (batch/k_pattern.py:9-48): the "
    "numpy detector's four- and five-bar tail (breakaway, ladder "
    "bottom, mat hold, rising/falling three methods, concealing baby "
    "swallow, three-line strike, three black crows, hikkake mod) — "
    "completing the hash-gated coverage of all 61 CDL names",
    description="8 four/five-bar CDL labels from the numpy detector, "
    "SQL-replayed",
    oracle=_cdl_wide_oracle(),
)
def ind_cdl_wide_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deepest-lookback patterns: conditions span up to five bars'
    geometry, five trailing-mean threshold positions, and two
    marubozu-pair requirements. With singles/pairs/triples this closes
    the loop — every one of the 61 CDL names now has an
    independent-engine replay of its exact firing condition."""
    import pandas as pd

    from tradecat_spark.indicators.candles import Candles

    wide = set(CDL_WIDE)
    e = load_table(spark, sf_dir, "events")
    bars = e.groupBy(
        "event_type",
        F.timestamp_seconds(
            (F.col("ts").cast("long") / 3600).cast("long") * 3600
        ).alias("bucket_ts"),
    ).agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
    )
    wdesc = Window.partitionBy("event_type").orderBy(F.desc("bucket_ts"))
    bars = (
        bars.withColumn("_rnd", F.row_number().over(wdesc))
        .filter(F.col("_rnd") <= _CDL_TAIL)
        .drop("_rnd")
    )

    def detect(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts")
        cd = Candles(
            pdf["open"].to_numpy(), pdf["high"].to_numpy(),
            pdf["low"].to_numpy(), pdf["close"].to_numpy(),
        )
        key = pdf["event_type"].iloc[0]
        ts = pdf["bucket_ts"].dt.strftime("%Y-%m-%d %H:%M:%S").tolist()
        rows = []
        for i in range(len(pdf)):
            for name, direction in cd.detect(i):
                if name in wide:
                    rows.append((key, ts[i], name, direction))
        return pd.DataFrame(
            rows,
            columns=["event_type", "bucket_ts", "pattern", "direction"],
        )

    return bars.repartition("event_type").groupBy("event_type").applyInPandas(
        detect,
        "event_type string, bucket_ts string, pattern string, "
        "direction string",
    )


def _chart_oracle() -> str:
    """SQL replay of library._chart_pattern: 3-radius strict pivot
    extraction, then the exact decision chain (head-and-shoulders >
    double top/bottom > the two-trendline classifier)."""
    def piv(arr: str, op: str) -> str:
        conds = " AND ".join(
            f"{arr}[p - {k}] {op} {arr}[p] AND {arr}[p + {k}] {op} {arr}[p]"
            for k in (1, 2, 3)
        )
        return (
            f"list_transform(list_filter(range(4, len({arr}) - 2), "
            f"p -> {conds}), p -> {arr}[p])"
        )
    return f"""
WITH bars_all AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
    MAX(value) AS high, MIN(value) AS low, max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
bars AS (
  SELECT event_type, b, high, low, close FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY b DESC) AS rnd
    FROM bars_all
  ) WHERE rnd <= {_CDL_TAIL}
),
s AS (
  SELECT event_type,
    list(high ORDER BY b) AS hv, list(low ORDER BY b) AS lv,
    list(close ORDER BY b) AS cv
  FROM bars GROUP BY event_type
),
pv AS (
  SELECT event_type, cv[-1] AS c,
    {piv('hv', '<')} AS ph,
    {piv('lv', '>')} AS pl
  FROM s
),
m AS (
  SELECT event_type, c, ph, pl, len(ph) AS nh, len(pl) AS nl,
    ph[-3] AS h3, ph[-2] AS h2, ph[-1] AS h1,
    pl[-3] AS l3, pl[-2] AS l2, pl[-1] AS l1
  FROM pv
),
d AS (
  SELECT *,
    nh >= 3 AND h2 > h3 AND h2 > h1
      AND ABS(h3 - h1) / h2 < 0.02 AS hst,
    nl >= 3 AND l2 < l3 AND l2 < l1
      AND ABS(l3 - l1) / (CASE WHEN l2 = 0 THEN 1.0 ELSE l2 END) < 0.02
      AS hsb
  FROM m
),
d2 AS (
  SELECT *,
    NOT (hst OR hsb) AND nh >= 2
      AND ABS(h2 - h1) / GREATEST(h2, h1) < 0.015
      AND c < LEAST(h2, h1)
      AND c < (CASE WHEN nl >= 1 THEN l1 ELSE LEAST(h2, h1) END) AS dtop
  FROM d
),
d3 AS (
  SELECT *,
    NOT (hst OR hsb OR dtop) AND nl >= 2
      AND ABS(l2 - l1) / GREATEST(l2, l1, 1e-12) < 0.015
      AND c > GREATEST(l2, l1)
      AND c > (CASE WHEN nh >= 1 THEN h1 ELSE GREATEST(l2, l1) END)
      AS dbot
  FROM d2
),
t AS (
  SELECT *,
    NOT (hst OR hsb OR dtop OR dbot) AND nh >= 2 AND nl >= 2 AS tready,
    ABS(h2 - h1) / GREATEST(h2, h1, 1e-12) < 0.015 AS hiflat,
    ABS(l2 - l1) / GREATEST(l2, l1, 1e-12) < 0.015 AS loflat,
    (h1 - l1) < 0.9 * (h2 - l2) AS narrowing
  FROM d3
),
t2 AS (
  SELECT *,
    NOT hiflat AND h1 > h2 AS hirise,
    NOT hiflat AND h1 < h2 AS hifall,
    NOT loflat AND l1 > l2 AS lorise,
    NOT loflat AND l1 < l2 AS lofall
  FROM t
),
fired AS (
  SELECT event_type, 'head_shoulders_top' AS pattern, 'bear' AS direction
  FROM t2 WHERE hst
  UNION ALL
  SELECT event_type, 'head_shoulders_bottom', 'bull' FROM t2 WHERE hsb
  UNION ALL
  SELECT event_type, 'double_top', 'bear' FROM t2 WHERE dtop
  UNION ALL
  SELECT event_type, 'double_bottom', 'bull' FROM t2 WHERE dbot
  UNION ALL
  SELECT event_type,
    CASE
      WHEN hiflat AND lorise THEN 'ascending_triangle'
      WHEN hifall AND loflat THEN 'descending_triangle'
      WHEN hifall AND lorise THEN 'symmetrical_triangle'
      WHEN hirise AND lorise AND narrowing THEN 'rising_wedge'
      WHEN hirise AND lorise THEN 'rising_channel'
      WHEN hifall AND lofall AND narrowing THEN 'falling_wedge'
      WHEN hifall AND lofall THEN 'falling_channel'
      WHEN hiflat AND loflat THEN 'horizontal_channel'
    END,
    CASE
      WHEN hiflat AND lorise THEN 'bull'
      WHEN hifall AND loflat THEN 'bear'
      WHEN hifall AND lorise THEN 'bull'
      WHEN hirise AND lorise AND narrowing THEN 'bear'
      WHEN hirise AND lorise THEN 'bull'
      WHEN hifall AND lofall AND narrowing THEN 'bull'
      WHEN hifall AND lofall THEN 'bear'
      WHEN hiflat AND loflat THEN 'bull'
    END
  FROM t2
  WHERE tready AND (
    (hiflat AND lorise) OR (hifall AND loflat) OR (hifall AND lorise)
    OR (hirise AND lorise) OR (hifall AND lofall) OR (hiflat AND loflat)
  )
)
SELECT event_type, pattern, direction FROM fired
UNION ALL
SELECT s.event_type, 'none', 'neutral' FROM s
WHERE s.event_type NOT IN (SELECT event_type FROM fired)
"""


@query(
    "ind_chart_patterns_parity",
    survey="§2.9 k_pattern fidelity (batch/k_pattern.py:35-52,89-190 "
    "chart patterns): the REAL numpy chart-pattern classifier "
    "(library._chart_pattern — pivots, head-and-shoulders, double "
    "top/bottom, triangle/wedge/channel chain) hash-checked against "
    "an independent SQL replay",
    description="Per-key chart-pattern label from the numpy classifier, "
    "SQL-replayed",
    oracle=_chart_oracle(),
)
def ind_chart_patterns_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark runs the library's actual classifier over each key's
    500-bar tail; the oracle re-derives the labels from scratch —
    3-radius strict pivot extraction, then the exact precedence chain
    (head-and-shoulders before double top/bottom before the
    two-trendline triangle/wedge/channel classifier). Keys with no
    pattern emit an explicit 'none' row so absence is also checked."""
    import pandas as pd

    from tradecat_spark.indicators.library import _chart_pattern

    e = load_table(spark, sf_dir, "events")
    bars = e.groupBy(
        "event_type",
        F.timestamp_seconds(
            (F.col("ts").cast("long") / 3600).cast("long") * 3600
        ).alias("bucket_ts"),
    ).agg(
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
    )
    wdesc = Window.partitionBy("event_type").orderBy(F.desc("bucket_ts"))
    bars = (
        bars.withColumn("_rnd", F.row_number().over(wdesc))
        .filter(F.col("_rnd") <= _CDL_TAIL)
        .drop("_rnd")
    )

    def detect(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts")
        labels = _chart_pattern(pdf)
        key = pdf["event_type"].iloc[0]
        rows = [(key, n, d) for n, d in labels] or [
            (key, "none", "neutral")
        ]
        return pd.DataFrame(
            rows, columns=["event_type", "pattern", "direction"]
        )

    return bars.repartition("event_type").groupBy("event_type").applyInPandas(
        detect,
        "event_type string, pattern string, direction string",
    )
