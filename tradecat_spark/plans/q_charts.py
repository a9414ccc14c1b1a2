"""Chart-template data queries (SURVEY.md §2.1 S15 breadth).

The reference's vis-service registers ~15 chart templates; each one is
a data query plus a plotly render (services-preview/vis-service/src/
templates/registry.py:1741-2031). Rendering is out of scope — these
queries produce the exact data payload each template plots, per
event_type over the synthetic events table.

Float discipline (see plans/exact.py): every cumulative or averaged
quantity goes through DECIMAL(18,8) element casts so sums are
associative and bit-identical to the DuckDB oracle; single divisions /
subtractions of identical doubles are IEEE-deterministic and need no
special handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.operators.rollup import ohlcv_rollup
from tradecat_spark.plans.registry import query

DEC = "decimal(18,8)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


_BARS_1H_SQL = """
  SELECT
    event_type,
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    min_by(value, ts) AS open,
    MAX(value) AS high,
    MIN(value) AS low,
    max_by(value, ts) AS close,
    SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS volume
  FROM events
  GROUP BY 1, 2
"""


@query(
    "chart_kline_ma_volume",
    survey="§2.1 S15 chart templates: K线+均线+量能 payload "
    "(vis registry.py:123-186 render_kline_basic — candles, MA5/10/30 "
    "overlays, volume bars)",
    description="1h candles with MA5/MA10/MA30 overlays and volume",
    oracle=f"""
WITH bars AS ({_BARS_1H_SQL}),
ma AS (
  SELECT
    event_type,
    strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
    open, high, low, close,
    ROUND(CAST(volume AS DOUBLE), 6) AS volume,
    COUNT(*) OVER w5 AS n5,
    CAST(SUM(CAST(close AS DECIMAL(18,8))) OVER w5 AS DOUBLE) AS s5,
    COUNT(*) OVER w10 AS n10,
    CAST(SUM(CAST(close AS DECIMAL(18,8))) OVER w10 AS DOUBLE) AS s10,
    COUNT(*) OVER w30 AS n30,
    CAST(SUM(CAST(close AS DECIMAL(18,8))) OVER w30 AS DOUBLE) AS s30
  FROM bars
  WINDOW
    w5 AS (PARTITION BY event_type ORDER BY bucket_ts
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
    w10 AS (PARTITION BY event_type ORDER BY bucket_ts
            ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
    w30 AS (PARTITION BY event_type ORDER BY bucket_ts
            ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
)
SELECT
  event_type, bucket_ts, open, high, low, close, volume,
  CASE WHEN n5 = 5 THEN s5 / 5.0 END AS ma5,
  CASE WHEN n10 = 10 THEN s10 / 10.0 END AS ma10,
  CASE WHEN n30 = 30 THEN s30 / 30.0 END AS ma30
FROM ma
""",
)
def chart_kline_ma_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MA windows share ONE partitioning/sort (event_type, bucket_ts) —
    Catalyst evaluates all three frames in a single Window node over a
    single exchange, then the projection divides complete frames only
    (partial head frames render as gaps, matching the template)."""
    e = _events(spark, sf_dir)
    bars = ohlcv_rollup(
        e, ["event_type"], "ts", "value",
        volume=F.abs("value").cast(DEC), interval_sec=3600,
    )

    def _ma(n: int):
        w = (
            Window.partitionBy("event_type").orderBy("bucket_ts")
            .rowsBetween(-(n - 1), 0)
        )
        cnt = F.count(F.lit(1)).over(w)
        s = F.sum(F.col("close").cast(DEC)).over(w).cast("double")
        return F.when(cnt == n, s / float(n)).alias(f"ma{n}")

    return bars.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "open", "high", "low", "close",
        F.round(F.col("volume").cast("double"), 6).alias("volume"),
        _ma(5), _ma(10), _ma(30),
    )


@query(
    "chart_equity_drawdown",
    survey="§2.1 S15 chart templates: 权益+回撤 payload (vis "
    "registry.py:543-577 render_equity_drawdown — equity curve + "
    "running-peak drawdown)",
    description="Daily cumulative equity and drawdown-from-peak",
    oracle="""
WITH daily AS (
  SELECT
    event_type,
    CAST(time_bucket(INTERVAL '1 day', ts) AS DATE) AS day,
    SUM(CAST(value AS DECIMAL(18,8))) AS flow
  FROM events GROUP BY 1, 2
),
eq AS (
  SELECT
    event_type, day,
    SUM(flow) OVER (PARTITION BY event_type ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS equity
  FROM daily
)
SELECT
  event_type,
  strftime(day, '%Y-%m-%d') AS day,
  ROUND(CAST(equity AS DOUBLE), 6) AS equity,
  ROUND(CAST(MAX(equity) OVER (PARTITION BY event_type ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
    AS peak,
  ROUND(CAST(equity - MAX(equity) OVER (PARTITION BY event_type
    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS DOUBLE), 6) AS drawdown
FROM eq
""",
)
def chart_equity_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumsum and running max stay in DECIMAL until the final cast, so
    the curve is exact regardless of partition evaluation order."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(F.col("value").cast(DEC)).alias("flow"))
    w = (
        Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    equity = F.sum("flow").over(w)
    peak = F.max(equity).over(w)
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(equity.cast("double"), 6).alias("equity"),
        F.round(peak.cast("double"), 6).alias("peak"),
        F.round((equity - peak).cast("double"), 6).alias("drawdown"),
    )


@query(
    "chart_intraday_volume_heatmap",
    survey="§2.1 S15 chart templates: 日内成交量热力图 payload (vis "
    "registry.py:1466-1510 — volume by ISO weekday × hour-of-day)",
    description="Volume heatmap cells: ISO weekday × hour, total volume",
    oracle="""
SELECT
  event_type,
  CAST(isodow(ts) AS INTEGER) AS dow,
  CAST(hour(ts) AS INTEGER) AS hod,
  ROUND(CAST(SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS DOUBLE), 6)
    AS volume,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1, 2, 3
""",
)
def chart_intraday_volume_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hash-aggregate; the heatmap has at most 7×24 cells per key,
    so partial aggregation collapses everything map-side."""
    e = _events(spark, sf_dir)
    return e.groupBy(
        "event_type",
        (F.weekday("ts") + 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(
        F.round(
            F.sum(F.abs("value").cast(DEC)).cast("double"), 6
        ).alias("volume"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "chart_intraday_volatility",
    survey="§2.1 S15 chart templates: 日内波动率曲线 payload (vis "
    "registry.py:1512-1560 — mean bar amplitude per hour-of-day)",
    description="Average 1h-bar amplitude (high-low)/open per hour-of-day",
    oracle=f"""
WITH bars AS ({_BARS_1H_SQL}),
amp AS (
  SELECT
    event_type,
    CAST(hour(bucket_ts) AS INTEGER) AS hod,
    CASE WHEN open > 0
         THEN CAST((high - low) / open AS DECIMAL(18,8)) END AS amplitude
  FROM bars
)
SELECT
  event_type, hod,
  CAST(COUNT(amplitude) AS BIGINT) AS n_bars,
  CAST(SUM(amplitude) AS DOUBLE) / COUNT(amplitude) AS mean_amplitude
FROM amp
GROUP BY 1, 2
""",
)
def chart_intraday_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row amplitude is one double division (deterministic), then
    quantized to DECIMAL so the hour-of-day mean is order-independent."""
    e = _events(spark, sf_dir)
    bars = ohlcv_rollup(e, ["event_type"], "ts", "value", interval_sec=3600)
    amp = bars.select(
        "event_type",
        F.hour("bucket_ts").cast("int").alias("hod"),
        F.when(
            F.col("open") > 0,
            ((F.col("high") - F.col("low")) / F.col("open")).cast(DEC),
        ).alias("amplitude"),
    )
    return amp.groupBy("event_type", "hod").agg(
        F.count("amplitude").alias("n_bars"),
        (
            F.sum("amplitude").cast("double") / F.count("amplitude")
        ).alias("mean_amplitude"),
    )


@query(
    "chart_oi_change",
    survey="§2.1 S15 chart templates: OI变化 payload (vis "
    "registry.py:1688-1740 render_oi_change — last OI per bucket, "
    "delta and % change vs previous bucket)",
    description="1h last-value OI with absolute and % change vs prior bar",
    oracle="""
WITH oi AS (
  SELECT
    event_type,
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    max_by(value, ts) AS oi_last
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT
    event_type, bucket_ts, oi_last,
    LAG(oi_last) OVER (PARTITION BY event_type ORDER BY bucket_ts)
      AS oi_prev
  FROM oi
)
SELECT
  event_type,
  strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  oi_last,
  oi_last - oi_prev AS oi_change,
  CASE WHEN oi_prev <> 0 THEN (oi_last - oi_prev) / oi_prev * 100 END
    AS oi_change_pct
FROM lagged
""",
)
def chart_oi_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta and % change are single subtract/divide ops on identical
    doubles — bit-deterministic without decimal help."""
    e = _events(spark, sf_dir)
    oi = e.groupBy(
        "event_type", F.window("ts", "1 hour").start.alias("b")
    ).agg(F.max_by("value", "ts").alias("oi_last"))
    w = Window.partitionBy("event_type").orderBy("b")
    prev = F.lag("oi_last").over(w)
    return oi.select(
        "event_type",
        F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "oi_last",
        (F.col("oi_last") - prev).alias("oi_change"),
        F.when(
            prev != 0, (F.col("oi_last") - prev) / prev * 100
        ).alias("oi_change_pct"),
    )
