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
from tradecat_spark.plans.exact import ratio6, ratio6_sql
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
  -- exact integer ratio: the scale-8 decimal sum is integral in 1e-8
  -- units, so round(sum/count, 6) runs entirely in int64 (a
  -- decimal->double cast differs across engines at ulps; sf0.1 sweep)
  {ratio6_sql('CAST(SUM(amplitude) * 100000000 AS BIGINT)',
               'COUNT(amplitude) * 100000000')}
    AS mean_amplitude
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
        ratio6(
            (F.sum("amplitude") * 100_000_000).cast("long"),
            F.count("amplitude") * 100_000_000,
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


# ---------------------------------------------------------------------------
# Taker-flow proxies (CVD, taker ratio, long/short) — the synthetic events
# table has no taker buy/sell columns, so direction is inferred from the 5m
# bar shape (close>=open => buying pressure), the same proxy the indicator
# library uses for buy_sell_ratio / futures_sentiment.
# ---------------------------------------------------------------------------
_BARS_5M_SQL = """
  SELECT
    event_type,
    time_bucket(INTERVAL '5 minutes', ts) AS b5,
    min_by(value, ts) AS open,
    max_by(value, ts) AS close,
    SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS vol
  FROM events
  GROUP BY 1, 2
"""


def _bars5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlcv_rollup(
        _events(spark, sf_dir), ["event_type"], "ts", "value",
        volume=F.abs(F.col("value")).cast(DEC), interval_sec=300,
        bucket_col="b5",
    ).select("event_type", "b5", "open", "close", F.col("volume").alias("vol"))


@query(
    "chart_cvd_cumulative",
    survey="§2.1 S15 chart templates: CVD累计 payload (vis "
    "registry.py:1638-1686 render_cvd_cumulative — hourly cumulative "
    "volume delta + price overlay)",
    description="Cumulative volume delta per hour with last price",
    oracle=f"""
WITH b5 AS ({_BARS_5M_SQL}),
h AS (
  SELECT
    event_type,
    time_bucket(INTERVAL '1 hour', b5) AS bucket_ts,
    SUM(CASE WHEN close >= open THEN vol ELSE -vol END) AS delta,
    max_by(close, b5) AS price
  FROM b5 GROUP BY 1, 2
)
SELECT
  event_type,
  strftime(bucket_ts, '%Y-%m-%d %H:%M') AS bucket_ts,
  ROUND(CAST(SUM(delta) OVER (PARTITION BY event_type ORDER BY bucket_ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) + 0.0
    AS cvd,
  price
FROM h
""",
)
def chart_cvd_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bar signed volume stays DECIMAL through both aggregation
    levels and the cumulative window, so the running sum is associative
    and bit-identical across engines; one cast+round at the end."""
    from tradecat_spark.operators.rollup import bucket_ts

    b5 = _bars5(spark, sf_dir)
    delta = F.when(F.col("close") >= F.col("open"), F.col("vol")).otherwise(
        -F.col("vol")
    )
    h = b5.groupBy(
        "event_type", bucket_ts("b5", 3600).alias("bucket_ts")
    ).agg(
        F.sum(delta).alias("delta"),
        F.max_by("close", "b5").alias("price"),
    )
    w = (
        Window.partitionBy("event_type").orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return h.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm").alias("bucket_ts"),
        (F.round(F.sum("delta").over(w).cast("double"), 6) + F.lit(0.0))
        .alias("cvd"),
        "price",
    )


@query(
    "chart_taker_ratio_heatmap",
    survey="§2.1 S15 chart templates: 主动买卖比热力图 payload (vis "
    "registry.py:1561-1598 render_taker_ratio_heatmap — symbol × "
    "hour-of-day taker buy ratio)",
    description="Taker buy ratio per event_type and hour-of-day",
    oracle=f"""
WITH b5 AS ({_BARS_5M_SQL}),
c AS (
  SELECT
    event_type,
    CAST(hour(b5) AS INTEGER) AS hour,
    SUM(CASE WHEN close >= open THEN vol
             ELSE CAST(0 AS DECIMAL(18,8)) END) AS buy,
    SUM(vol) AS total,
    CAST(COUNT(*) AS BIGINT) AS n_bars
  FROM b5 GROUP BY 1, 2
)
SELECT
  event_type AS symbol, hour,
  CAST(buy AS DOUBLE) / NULLIF(CAST(total AS DOUBLE), 0)
    AS taker_buy_ratio,
  n_bars
FROM c
""",
)
def chart_taker_ratio_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numerator and denominator are exact DECIMAL sums; the ratio is a
    single double division — deterministic on identical operands. One
    hash-aggregate over at most keys × 24 cells."""
    b5 = _bars5(spark, sf_dir)
    buy = F.when(
        F.col("close") >= F.col("open"), F.col("vol")
    ).otherwise(F.lit(0).cast(DEC))
    c = b5.groupBy(
        F.col("event_type").alias("symbol"),
        F.hour("b5").cast("int").alias("hour"),
    ).agg(
        F.sum(buy).alias("buy"),
        F.sum("vol").alias("total"),
        F.count(F.lit(1)).alias("n_bars"),
    )
    return c.select(
        "symbol", "hour",
        (
            F.col("buy").cast("double")
            / F.nullif(F.col("total").cast("double"), F.lit(0.0))
        ).alias("taker_buy_ratio"),
        "n_bars",
    )


@query(
    "chart_long_short_ratio",
    survey="§2.1 S15 chart templates: 多空比时序 payload (vis "
    "registry.py:1599-1637 render_long_short_ratio — hourly taker and "
    "global long/short ratio lines)",
    description="Hourly long/short ratio: volume-based and count-based",
    oracle=f"""
WITH b5 AS ({_BARS_5M_SQL}),
h AS (
  SELECT
    event_type,
    time_bucket(INTERVAL '1 hour', b5) AS bucket_ts,
    SUM(CASE WHEN close >= open THEN vol
             ELSE CAST(0 AS DECIMAL(18,8)) END) AS buy,
    SUM(CASE WHEN close < open THEN vol
             ELSE CAST(0 AS DECIMAL(18,8)) END) AS sell,
    CAST(SUM(CASE WHEN close >= open THEN 1 ELSE 0 END) AS BIGINT) AS up_n,
    CAST(SUM(CASE WHEN close < open THEN 1 ELSE 0 END) AS BIGINT) AS down_n
  FROM b5 GROUP BY 1, 2
)
SELECT
  event_type,
  strftime(bucket_ts, '%Y-%m-%d %H:%M') AS bucket_ts,
  CAST(buy AS DOUBLE) / NULLIF(CAST(sell AS DOUBLE), 0) AS taker_ratio,
  CAST(up_n AS DOUBLE) / NULLIF(CAST(down_n AS DOUBLE), 0) AS global_ratio
FROM h
""",
)
def chart_long_short_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both ratio lines divide exact aggregates (DECIMAL volume sums,
    integer counts) — single deterministic double ops, no rounding
    needed."""
    from tradecat_spark.operators.rollup import bucket_ts

    b5 = _bars5(spark, sf_dir)
    up = F.col("close") >= F.col("open")
    h = b5.groupBy(
        "event_type", bucket_ts("b5", 3600).alias("bucket_ts")
    ).agg(
        F.sum(F.when(up, F.col("vol")).otherwise(F.lit(0).cast(DEC)))
        .alias("buy"),
        F.sum(F.when(~up, F.col("vol")).otherwise(F.lit(0).cast(DEC)))
        .alias("sell"),
        F.sum(F.when(up, 1).otherwise(0)).cast("long").alias("up_n"),
        F.sum(F.when(~up, 1).otherwise(0)).cast("long").alias("down_n"),
    )
    return h.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm").alias("bucket_ts"),
        (
            F.col("buy").cast("double")
            / F.nullif(F.col("sell").cast("double"), F.lit(0.0))
        ).alias("taker_ratio"),
        (
            F.col("up_n").cast("double")
            / F.nullif(F.col("down_n").cast("double"), F.lit(0.0))
        ).alias("global_ratio"),
    )


@query(
    "chart_bb_zone_strip",
    survey="§2.1 S15 chart templates: 全市场布林带九宫格 payload (vis "
    "registry.py:1194-1465 render_bb_zone_strip — per-symbol %B and "
    "bandwidth classified into 3 bandwidth tertiles × 5 %B bands)",
    description="Latest Bollinger %B and bandwidth per key, zone-classified",
    oracle="""
WITH bars AS (
  SELECT
    event_type,
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
bb AS (
  SELECT
    event_type, bucket_ts, close,
    AVG(close) OVER w AS mid,
    STDDEV_SAMP(close) OVER w AS sd,
    COUNT(*) OVER w AS n,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket_ts DESC)
      AS rn
  FROM bars
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
),
vals AS (
  SELECT
    event_type AS symbol,
    ROUND((close - (mid - 2 * sd)) / NULLIF(4 * sd, 0), 6) AS percent_b,
    ROUND(4 * sd / NULLIF(mid, 0) * 100, 6) AS bandwidth
  FROM bb WHERE rn = 1 AND n = 20
)
SELECT
  symbol, percent_b, bandwidth,
  CAST(NTILE(3) OVER (ORDER BY bandwidth, symbol) - 1 AS INTEGER)
    AS x_zone,
  CAST(LEAST(4, GREATEST(0, FLOOR(
    (LEAST(1.5, GREATEST(-0.5, percent_b)) + 0.5) / 2 * 5
  ))) AS INTEGER) AS y_band
FROM vals
""",
)
def chart_bb_zone_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference buckets bandwidth by 33/66% quantiles; NTILE(3)
    over (bandwidth, symbol) is the deterministic equivalent — identical
    tie-break order in both engines, no interpolated-quantile float
    divergence. %B bands replicate the clip(-0.5, 1.5) → 5-band mapping.
    The NTILE window is a single-partition sort over one row per key —
    at 1000-symbol scale that is thousands of rows, not a bottleneck."""
    e = _events(spark, sf_dir)
    bars = e.groupBy(
        "event_type", F.window("ts", "1 hour").start.alias("bucket_ts")
    ).agg(F.max_by("value", "ts").alias("close"))
    w = (
        Window.partitionBy("event_type").orderBy("bucket_ts")
        .rowsBetween(-19, 0)
    )
    wlast = Window.partitionBy("event_type").orderBy(F.col("bucket_ts").desc())
    mid = F.avg("close").over(w)
    sd = F.stddev_samp("close").over(w)
    bb = bars.select(
        "event_type", "close",
        mid.alias("mid"), sd.alias("sd"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.row_number().over(wlast).alias("rn"),
    ).filter((F.col("rn") == 1) & (F.col("n") == 20))
    vals = bb.select(
        F.col("event_type").alias("symbol"),
        F.round(
            (F.col("close") - (F.col("mid") - 2 * F.col("sd")))
            / F.nullif(4 * F.col("sd"), F.lit(0.0)), 6,
        ).alias("percent_b"),
        F.round(
            4 * F.col("sd") / F.nullif(F.col("mid"), F.lit(0.0)) * 100, 6
        ).alias("bandwidth"),
    )
    wz = Window.orderBy("bandwidth", "symbol")
    pb_clip = F.least(F.lit(1.5), F.greatest(F.lit(-0.5), F.col("percent_b")))
    return vals.select(
        "symbol", "percent_b", "bandwidth",
        (F.ntile(3).over(wz) - 1).cast("int").alias("x_zone"),
        F.least(
            F.lit(4), F.greatest(F.lit(0), F.floor((pb_clip + 0.5) / 2 * 5))
        ).cast("int").alias("y_band"),
    )


@query(
    "chart_vpvr_ridge",
    survey="§2.1 S15 chart templates: VPVR山脊图 payload (vis "
    "registry.py:933-1194 render_vpvr_ridge / trading-service "
    "compute_vpvr_ridge_data — per-period volume-at-price histograms "
    "with period OHLC; 10 periods × 12 bins sized to the synthetic SF "
    "vs the reference's 10 × 48 over 200-bar lookbacks)",
    description="Volume-profile histogram per trailing period with OHLC",
    oracle="""
WITH bars AS (
  SELECT
    event_type,
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    min_by(value, ts) AS open,
    MAX(value) AS high,
    MIN(value) AS low,
    max_by(value, ts) AS close,
    SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS volume
  FROM events GROUP BY 1, 2
),
t AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY bucket_ts DESC) AS rn
  FROM bars
),
tail AS (
  SELECT *, CAST(FLOOR((rn - 1) / 12) AS INTEGER) AS period
  FROM t WHERE rn <= 120
),
ext AS (
  SELECT
    event_type, period,
    MIN(low) AS pmin, MAX(high) AS pmax,
    min_by(open, bucket_ts) AS open,
    MAX(high) AS high, MIN(low) AS low,
    max_by(close, bucket_ts) AS close,
    CAST(COUNT(*) AS BIGINT) AS n_bars
  FROM tail GROUP BY 1, 2
),
binned AS (
  SELECT
    t.event_type, t.period,
    CAST(COALESCE(LEAST(11, FLOOR(
      (t.close - e.pmin) / NULLIF(e.pmax - e.pmin, 0) * 12
    )), 0) AS INTEGER) AS bin,
    t.volume
  FROM tail t JOIN ext e USING (event_type, period)
)
SELECT
  g.event_type, g.period, g.bin,
  ROUND(e.pmin + (g.bin + 0.5) * ((e.pmax - e.pmin) / 12), 6)
    AS bin_center,
  ROUND(CAST(g.vol AS DOUBLE), 6) AS volume,
  g.n AS n_bars_bin,
  e.open, e.high, e.low, e.close
FROM (
  SELECT event_type, period, bin, SUM(volume) AS vol,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM binned GROUP BY 1, 2, 3
) g JOIN ext e USING (event_type, period)
""",
)
def chart_vpvr_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each trailing 12-bar period gets its own price extent and
    12-bucket close-price histogram (floor binning — identical double
    ops in both engines land in identical bins). The period-extent
    aggregate is tiny (keys × 10 rows) and broadcast back to the bin
    rows, so the bars are scanned once and everything downstream of the
    first window is map-side."""
    e = _events(spark, sf_dir)
    bars = ohlcv_rollup(
        e, ["event_type"], "ts", "value",
        volume=F.abs(F.col("value")).cast(DEC), interval_sec=3600,
    )
    wlast = Window.partitionBy("event_type").orderBy(F.col("bucket_ts").desc())
    tail = (
        bars.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") <= 120)
        .withColumn("period", F.floor((F.col("rn") - 1) / 12).cast("int"))
    )
    ext = tail.groupBy("event_type", "period").agg(
        F.min("low").alias("pmin"), F.max("high").alias("pmax"),
        F.min_by("open", "bucket_ts").alias("open"),
        F.max("high").alias("high"), F.min("low").alias("low"),
        F.max_by("close", "bucket_ts").alias("close"),
        F.count(F.lit(1)).alias("n_bars"),
    )
    tail_slim = tail.select("event_type", "period", "close", "volume")
    exts = ext.select("event_type", "period", "pmin", "pmax")
    binned = tail_slim.withColumnRenamed("close", "bar_close").join(
        F.broadcast(exts), ["event_type", "period"]
    ).select(
        "event_type", "period",
        F.coalesce(
            F.least(
                F.lit(11),
                F.floor(
                    (F.col("bar_close") - F.col("pmin"))
                    / F.nullif(F.col("pmax") - F.col("pmin"), F.lit(0.0))
                    * 12
                ),
            ),
            F.lit(0),
        ).cast("int").alias("bin"),
        "volume",
    )
    g = binned.groupBy("event_type", "period", "bin").agg(
        F.sum("volume").alias("vol"),
        F.count(F.lit(1)).alias("n_bars_bin"),
    )
    return g.join(F.broadcast(ext), ["event_type", "period"]).select(
        "event_type", "period", "bin",
        F.round(
            F.col("pmin")
            + (F.col("bin") + 0.5) * ((F.col("pmax") - F.col("pmin")) / 12),
            6,
        ).alias("bin_center"),
        F.round(F.col("vol").cast("double"), 6).alias("volume"),
        "n_bars_bin", "open", "high", "low", "close",
    )


@query(
    "chart_macd_series",
    survey="§2.1 S15 chart templates: MACD双面板 payload (vis "
    "registry.py:491-541 render_macd — per-bar EMA12/EMA26, MACD line, "
    "EMA9 signal, histogram; ewm(adjust=False) recurrence from "
    "incremental/macd.py:6-12)",
    description="Per-bar MACD(12,26,9) series over the last 120 1h bars",
    oracle="""
WITH bars AS (
  SELECT
    event_type,
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
tail AS (
  SELECT event_type, bucket_ts, close FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY bucket_ts DESC) AS rn
    FROM bars) t WHERE rn <= 120
),
series AS (
  SELECT
    event_type,
    list(strftime(bucket_ts, '%Y-%m-%d %H:%M') ORDER BY bucket_ts) AS tss,
    list(close ORDER BY bucket_ts) AS vals
  FROM tail GROUP BY event_type
),
scans AS (
  SELECT
    event_type, tss, vals,
    list_transform(range(1, len(vals) + 1), i -> list_reduce(
      list_slice(vals, 1, i),
      (acc, x) -> acc * (1.0::DOUBLE - {a12}::DOUBLE) + x * {a12}::DOUBLE
    )) AS e12,
    list_transform(range(1, len(vals) + 1), i -> list_reduce(
      list_slice(vals, 1, i),
      (acc, x) -> acc * (1.0::DOUBLE - {a26}::DOUBLE) + x * {a26}::DOUBLE
    )) AS e26
  FROM series
),
m AS (
  SELECT *, list_transform(range(1, len(vals) + 1), i -> e12[i] - e26[i])
    AS macd_arr
  FROM scans
),
s AS (
  SELECT *, list_transform(range(1, len(vals) + 1), i -> list_reduce(
      list_slice(macd_arr, 1, i),
      (acc, x) -> acc * (1.0::DOUBLE - {a9}::DOUBLE) + x * {a9}::DOUBLE
    )) AS sig_arr
  FROM m
)
SELECT
  event_type,
  unnest(tss) AS bucket_ts,
  unnest(vals) AS close,
  unnest(list_transform(range(1, len(vals) + 1),
    i -> ROUND(e12[i], 6) + 0.0)) AS ema12,
  unnest(list_transform(range(1, len(vals) + 1),
    i -> ROUND(e26[i], 6) + 0.0)) AS ema26,
  unnest(list_transform(range(1, len(vals) + 1),
    i -> ROUND(macd_arr[i], 6) + 0.0)) AS macd,
  unnest(list_transform(range(1, len(vals) + 1),
    i -> ROUND(sig_arr[i], 6) + 0.0)) AS signal_line,
  unnest(list_transform(range(1, len(vals) + 1),
    i -> ROUND(macd_arr[i] - sig_arr[i], 6) + 0.0)) AS hist
FROM s
""".replace("{a12}", repr(2.0 / 13.0))
   .replace("{a26}", repr(2.0 / 27.0))
   .replace("{a9}", repr(2.0 / 10.0)),
)
def chart_macd_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bar EMA output needs a prefix scan, not just a final fold.
    Each prefix i re-folds slice(vals, 1, i) — O(n²) element visits per
    key, but n is the chart's 120-bar payload bound, all JVM-side
    higher-order functions, and every prefix fold executes the exact
    fold order of the oracle (bit-identical doubles). Unbounded series
    belong to the incremental streaming MACD (streaming/signals.py),
    not a chart payload."""
    from tradecat_spark.operators.latest import topn_per_group
    from tradecat_spark.plans.q_indicators import ema_fold

    e = _events(spark, sf_dir)
    bars = e.groupBy(
        "event_type", F.window("ts", "1 hour").start.alias("bucket_ts")
    ).agg(F.max_by("value", "ts").alias("close"))
    tail = topn_per_group(bars, ["event_type"], "bucket_ts", 120)
    series = tail.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("bucket_ts", "close")))
        .alias("pairs")
    )
    vals = F.transform(F.col("pairs"), lambda p: p["close"])
    tss = F.transform(
        F.col("pairs"),
        lambda p: F.date_format(p["bucket_ts"], "yyyy-MM-dd HH:mm"),
    )

    def ema_scan(arr, alpha):
        return F.transform(
            F.sequence(F.lit(1), F.size(arr)),
            lambda i: ema_fold(F.slice(arr, 1, i), alpha),
        )

    # Chained projections: each array is a named column before the next
    # stage references it, so every scan is evaluated once per key row —
    # no join, one explode at the end.
    arrs = (
        series
        .withColumn("tss", tss)
        .withColumn("vals", vals)
        .withColumn("e12", ema_scan(F.col("vals"), 2.0 / 13.0))
        .withColumn("e26", ema_scan(F.col("vals"), 2.0 / 27.0))
        .withColumn(
            "macd_arr",
            F.zip_with(F.col("e12"), F.col("e26"), lambda a, b: a - b),
        )
        .withColumn("sig_arr", ema_scan(F.col("macd_arr"), 2.0 / 10.0))
    )
    z = arrs.select(
        "event_type",
        F.explode(
            F.arrays_zip(
                F.col("tss").alias("bucket_ts"),
                F.col("vals").alias("close"),
                F.col("e12").alias("e12"),
                F.col("e26").alias("e26"),
                F.col("macd_arr").alias("macd"),
                F.col("sig_arr").alias("sig"),
            )
        ).alias("z"),
    )
    return z.select(
        "event_type",
        F.col("z.bucket_ts").alias("bucket_ts"),
        F.col("z.close").alias("close"),
        (F.round(F.col("z.e12"), 6) + F.lit(0.0)).alias("ema12"),
        (F.round(F.col("z.e26"), 6) + F.lit(0.0)).alias("ema26"),
        (F.round(F.col("z.macd"), 6) + F.lit(0.0)).alias("macd"),
        (F.round(F.col("z.sig"), 6) + F.lit(0.0)).alias("signal_line"),
        (F.round(F.col("z.macd") - F.col("z.sig"), 6) + F.lit(0.0))
        .alias("hist"),
    )


@query(
    "chart_market_vpvr_heat",
    survey="§2.1 S15 chart templates: 全市场VPVR热力图 payload (vis "
    "registry.py:620-733 render_market_vpvr_heat — per-symbol volume "
    "share over market-unified price bins, rows normalized per symbol, "
    "ranked by total volume with a top-N cut). Bins are equal-width "
    "over the global close extent (the reference's percentile mode "
    "equalizes bin mass; equal-width keeps the identical heat payload "
    "shape while staying bit-reproducible cross-engine — quantile "
    "interpolation arithmetic is engine-specific)",
    description="Per-symbol volume share over market-wide price bins",
    oracle=f"""
WITH bars AS ({_BARS_1H_SQL}),
ext AS (
  SELECT MIN(close) AS gmin, MAX(close) AS gmax FROM bars
),
binned AS (
  SELECT
    b.event_type,
    CAST(COALESCE(LEAST(23, FLOOR(
      (b.close - e.gmin) / NULLIF(e.gmax - e.gmin, 0) * 24
    )), 0) AS INTEGER) AS bin,
    b.volume, e.gmin, e.gmax
  FROM bars b CROSS JOIN ext e
),
per_bin AS (
  SELECT event_type, bin, MIN(gmin) AS gmin, MIN(gmax) AS gmax,
         SUM(volume) AS vol
  FROM binned GROUP BY 1, 2
),
per_sym AS (
  SELECT event_type, SUM(vol) AS total,
         ROW_NUMBER() OVER (ORDER BY SUM(vol) DESC, event_type)
           AS mkt_rank
  FROM per_bin GROUP BY 1
)
SELECT
  b.event_type, b.bin,
  ROUND(b.gmin + b.bin * ((b.gmax - b.gmin) / 24), 6) AS bin_lo,
  ROUND(b.gmin + (b.bin + 1) * ((b.gmax - b.gmin) / 24), 6) AS bin_hi,
  ROUND(CAST(b.vol AS DOUBLE) / CAST(s.total AS DOUBLE), 6)
    AS vol_share,
  ROUND(CAST(s.total AS DOUBLE), 6) AS total_volume,
  s.mkt_rank
FROM per_bin b JOIN per_sym s USING (event_type)
WHERE s.mkt_rank <= 20
""",
)
def chart_market_vpvr_heat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan builds the 1h bars; the market price extent is a 2-value
    scalar aggregate broadcast back to every bar (no second scan); bins,
    per-symbol totals and the volume-rank cut are plain hash aggregates.
    At 100 TB the only wide operation is the bars groupBy — the heat
    matrix itself is symbols x 24 cells."""
    e = _events(spark, sf_dir)
    bars = ohlcv_rollup(
        e, ["event_type"], "ts", "value",
        volume=F.abs(F.col("value")).cast(DEC), interval_sec=3600,
    )
    ext = bars.agg(
        F.min("close").alias("gmin"), F.max("close").alias("gmax")
    )
    binned = bars.crossJoin(F.broadcast(ext)).select(
        "event_type",
        F.coalesce(
            F.least(
                F.lit(23),
                F.floor(
                    (F.col("close") - F.col("gmin"))
                    / F.nullif(F.col("gmax") - F.col("gmin"), F.lit(0.0))
                    * 24
                ),
            ),
            F.lit(0),
        ).cast("int").alias("bin"),
        "volume", "gmin", "gmax",
    )
    per_bin = binned.groupBy("event_type", "bin").agg(
        F.min("gmin").alias("gmin"), F.min("gmax").alias("gmax"),
        F.sum("volume").alias("vol"),
    )
    w_rank = Window.orderBy(F.col("total").desc(), F.col("event_type"))
    per_sym = (
        per_bin.groupBy("event_type")
        .agg(F.sum("vol").alias("total"))
        .withColumn("mkt_rank", F.row_number().over(w_rank))
    )
    return per_bin.join(
        F.broadcast(per_sym), "event_type"
    ).filter(F.col("mkt_rank") <= 20).select(
        "event_type", "bin",
        F.round(
            F.col("gmin") + F.col("bin") * ((F.col("gmax") - F.col("gmin")) / 24), 6
        ).alias("bin_lo"),
        F.round(
            F.col("gmin")
            + (F.col("bin") + 1) * ((F.col("gmax") - F.col("gmin")) / 24), 6
        ).alias("bin_hi"),
        F.round(
            F.col("vol").cast("double") / F.col("total").cast("double"), 6
        ).alias("vol_share"),
        F.round(F.col("total").cast("double"), 6).alias("total_volume"),
        "mkt_rank",
    )


@query(
    "chart_vpvr_zone_strip",
    survey="§2.1 S15 chart templates: VPVR价值区分布 payload (vis "
    "registry.py:735-900 render_vpvr_zone_strip — each symbol's price "
    "at its relative position inside its own 70% value area, banded "
    "into 6 zones, volume-normalized color factor, price-change edge "
    "color). The value area is the classic POC expansion rendered "
    "set-wise: highest-volume bins first until 70% of total volume is "
    "covered (trading-service's VPVR feeds the reference template the "
    "same va_low/va_high contract)",
    description="Price position in per-symbol VPVR value area, banded",
    oracle=f"""
WITH bars AS ({_BARS_1H_SQL}),
t AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY bucket_ts DESC) AS rn
  FROM bars
),
tail AS (SELECT * FROM t WHERE rn <= 48),
ext AS (
  SELECT event_type, MIN(close) AS pmin, MAX(close) AS pmax,
         max_by(close, bucket_ts) AS price,
         MAX(CASE WHEN rn = 25 THEN close END) AS close_24h,
         SUM(volume) AS total
  FROM tail GROUP BY 1
),
binned AS (
  SELECT
    t.event_type,
    CAST(COALESCE(LEAST(11, FLOOR(
      (t.close - e.pmin) / NULLIF(e.pmax - e.pmin, 0) * 12
    )), 0) AS INTEGER) AS bin,
    t.volume
  FROM tail t JOIN ext e USING (event_type)
),
vol_bins AS (
  SELECT event_type, bin, SUM(volume) AS vol
  FROM binned GROUP BY 1, 2
),
cum AS (
  SELECT *, SUM(vol) OVER (
    PARTITION BY event_type ORDER BY vol DESC, bin
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) - vol AS cum_before
  FROM vol_bins
),
va AS (
  SELECT c.event_type,
         MIN(e.pmin + c.bin * ((e.pmax - e.pmin) / 12)) AS va_low,
         MAX(e.pmin + (c.bin + 1) * ((e.pmax - e.pmin) / 12)) AS va_high
  FROM cum c JOIN ext e USING (event_type)
  WHERE c.cum_before < 0.7 * (SELECT total FROM ext x
                              WHERE x.event_type = c.event_type)
  GROUP BY 1
),
pos AS (
  SELECT
    e.event_type, e.price, v.va_low, v.va_high,
    LEAST(GREATEST((e.price - v.va_low)
                   / NULLIF(v.va_high - v.va_low, 0), 0.0), 1.0) AS y_raw,
    CASE WHEN e.close_24h IS NULL OR e.close_24h = 0 THEN NULL
         ELSE e.price / e.close_24h - 1 END AS price_change,
    LOG10(GREATEST(CAST(e.total AS DOUBLE), 1.0)) AS vol_log
  FROM ext e JOIN va v USING (event_type)
),
norm AS (
  SELECT MIN(vol_log) AS lmin, MAX(vol_log) AS lmax FROM pos
)
SELECT
  p.event_type,
  ROUND(p.price, 6) AS price,
  ROUND(p.va_low, 6) AS va_low,
  ROUND(p.va_high, 6) AS va_high,
  ROUND(p.y_raw, 6) AS y_pos,
  CAST(LEAST(5, FLOOR(p.y_raw * 6)) AS INTEGER) AS band,
  ROUND((p.vol_log - n.lmin) / (n.lmax - n.lmin + 1e-9), 6)
    AS vol_factor,
  ROUND(p.price_change, 6) AS price_change,
  CASE WHEN p.price_change > 0.005 THEN 'green'
       WHEN p.price_change < -0.005 THEN 'red'
       ELSE 'white' END AS edge_color
FROM pos p CROSS JOIN norm n
""",
)
def chart_vpvr_zone_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol work is one 48-bar tail (bounded by the row_number
    window), a 12-bin histogram, and a set-wise value-area expansion —
    the cumulative-volume window runs over at most 12 rows per key. The
    cross-market normalizer is a 2-value scalar aggregate broadcast to
    one row per symbol."""
    e = _events(spark, sf_dir)
    bars = ohlcv_rollup(
        e, ["event_type"], "ts", "value",
        volume=F.abs(F.col("value")).cast(DEC), interval_sec=3600,
    )
    wlast = Window.partitionBy("event_type").orderBy(F.col("bucket_ts").desc())
    tail = bars.withColumn("rn", F.row_number().over(wlast)).filter(
        F.col("rn") <= 48
    )
    ext = tail.groupBy("event_type").agg(
        F.min("close").alias("pmin"), F.max("close").alias("pmax"),
        F.max_by("close", "bucket_ts").alias("price"),
        F.max(F.when(F.col("rn") == 25, F.col("close"))).alias("close_24h"),
        F.sum("volume").alias("total"),
    )
    exts = F.broadcast(ext)
    binned = tail.select("event_type", "close", "volume").join(
        exts.select("event_type", "pmin", "pmax"), "event_type"
    ).select(
        "event_type",
        F.coalesce(
            F.least(
                F.lit(11),
                F.floor(
                    (F.col("close") - F.col("pmin"))
                    / F.nullif(F.col("pmax") - F.col("pmin"), F.lit(0.0))
                    * 12
                ),
            ),
            F.lit(0),
        ).cast("int").alias("bin"),
        "volume",
    )
    vol_bins = binned.groupBy("event_type", "bin").agg(
        F.sum("volume").alias("vol")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy(F.col("vol").desc(), F.col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vol_bins.withColumn(
        "cum_before", F.sum("vol").over(wcum) - F.col("vol")
    )
    va = cum.join(
        exts.select("event_type", "pmin", "pmax", "total"), "event_type"
    ).filter(F.col("cum_before") < 0.7 * F.col("total")).groupBy(
        "event_type"
    ).agg(
        F.min(
            F.col("pmin") + F.col("bin") * ((F.col("pmax") - F.col("pmin")) / 12)
        ).alias("va_low"),
        F.max(
            F.col("pmin")
            + (F.col("bin") + 1) * ((F.col("pmax") - F.col("pmin")) / 12)
        ).alias("va_high"),
    )
    pos = ext.join(F.broadcast(va), "event_type").select(
        "event_type", "price", "va_low", "va_high",
        F.least(
            F.greatest(
                (F.col("price") - F.col("va_low"))
                / F.nullif(F.col("va_high") - F.col("va_low"), F.lit(0.0)),
                F.lit(0.0),
            ),
            F.lit(1.0),
        ).alias("y_raw"),
        F.when(
            F.col("close_24h").isNull() | (F.col("close_24h") == 0),
            F.lit(None).cast("double"),
        ).otherwise(F.col("price") / F.col("close_24h") - 1).alias(
            "price_change"
        ),
        F.log10(
            F.greatest(F.col("total").cast("double"), F.lit(1.0))
        ).alias("vol_log"),
    )
    norm = pos.agg(
        F.min("vol_log").alias("lmin"), F.max("vol_log").alias("lmax")
    )
    return pos.crossJoin(F.broadcast(norm)).select(
        "event_type",
        F.round("price", 6).alias("price"),
        F.round("va_low", 6).alias("va_low"),
        F.round("va_high", 6).alias("va_high"),
        F.round("y_raw", 6).alias("y_pos"),
        F.least(F.lit(5), F.floor(F.col("y_raw") * 6)).cast("int").alias("band"),
        F.round(
            (F.col("vol_log") - F.col("lmin"))
            / (F.col("lmax") - F.col("lmin") + 1e-9),
            6,
        ).alias("vol_factor"),
        F.round("price_change", 6).alias("price_change"),
        F.when(F.col("price_change") > 0.005, F.lit("green"))
        .when(F.col("price_change") < -0.005, F.lit("red"))
        .otherwise(F.lit("white")).alias("edge_color"),
    )


#: LOD ladder (vis registry.py:236-248 _select_intervals_by_span):
#: branch by data-span days -> visible interval levels, coarse first.
_LOD_LEVELS = [
    ("a", 0, "1d"), ("a", 1, "4h"),
    ("b", 0, "1d"), ("b", 1, "4h"), ("b", 2, "1h"),
    ("c", 0, "4h"), ("c", 1, "1h"), ("c", 2, "15m"),
    ("d", 0, "1h"), ("d", 1, "15m"), ("d", 2, "5m"),
    ("e", 0, "15m"), ("e", 1, "5m"), ("e", 2, "1m"),
]
_LOD_INTERVALS = {
    "1d": 86400, "4h": 14400, "1h": 3600,
    "15m": 900, "5m": 300, "1m": 60,
}
_LOD_SQL_VALUES = ", ".join(
    f"('{b}', {r}, '{iv}')" for b, r, iv in _LOD_LEVELS
)


@query(
    "chart_kline_envelope",
    survey="§2.1 S15 chart templates: 多周期K线包络 payload (vis "
    "registry.py:464-488 render_kline_envelope + :236-248 "
    "_select_intervals_by_span + :307-430 _fetch_multi_interval_klines "
    "— the data span picks the visible interval ladder, then each "
    "selected interval contributes its own kline series; 60-bar tails "
    "per level vs the reference's 500-bar base window, scaled to the "
    "synthetic SF)",
    description="Span-adaptive multi-interval kline envelope",
    oracle=f"""
WITH span AS (
  SELECT event_type,
    date_diff('millisecond', MIN(ts), MAX(ts)) / 86400000.0 AS days
  FROM events GROUP BY 1
),
branch AS (
  SELECT event_type, days,
    CASE WHEN days > 180 THEN 'a' WHEN days > 60 THEN 'b'
         WHEN days > 14 THEN 'c' WHEN days > 3 THEN 'd'
         ELSE 'e' END AS b
  FROM span
),
lod(b, lod_rank, interval) AS (VALUES {_LOD_SQL_VALUES}),
sel AS (
  SELECT br.event_type, br.days, l.lod_rank, l.interval
  FROM branch br JOIN lod l USING (b)
),
iv(interval, sec) AS (VALUES
  ('1d', 86400), ('4h', 14400), ('1h', 3600),
  ('15m', 900), ('5m', 300), ('1m', 60)),
bars AS (
  SELECT
    e.event_type, i.interval,
    to_timestamp((epoch_us(e.ts) // (CAST(i.sec AS BIGINT) * 1000000))
                 * i.sec) AS bucket_ts,
    min_by(e.value, e.ts) AS open,
    MAX(e.value) AS high,
    MIN(e.value) AS low,
    max_by(e.value, e.ts) AS close,
    SUM(CAST(ABS(e.value) AS DECIMAL(18,8))) AS volume
  FROM events e CROSS JOIN iv i
  GROUP BY 1, 2, 3
),
tails AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type, interval ORDER BY bucket_ts DESC) AS rn
  FROM bars
)
SELECT
  s.event_type,
  ROUND(s.days, 6) AS span_days,
  s.lod_rank,
  s.interval,
  strftime(t.bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  t.open, t.high, t.low, t.close,
  ROUND(CAST(t.volume AS DOUBLE), 6) AS volume
FROM sel s JOIN tails t USING (event_type, interval)
WHERE t.rn <= 60
""",
)
def chart_kline_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LOD selection is a per-key scalar (span) joined against a
    14-row literal ladder — both broadcast. All six candidate interval
    rollups come from ONE explode+aggregate stage (the fused
    multi-interval pattern), so the envelope costs one scan + one wide
    aggregate regardless of how many levels the span selects; unselected
    intervals are dropped by the broadcast semi-side of the final join
    before the 60-bar tail window runs."""
    from tradecat_spark.operators.rollup import bucket_ts

    e = _events(spark, sf_dir)
    span = e.groupBy("event_type").agg(
        (
            (
                F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))
            ) / F.lit(86400000.0)
        ).alias("days")
    )
    branch = span.withColumn(
        "b",
        F.when(F.col("days") > 180, "a")
        .when(F.col("days") > 60, "b")
        .when(F.col("days") > 14, "c")
        .when(F.col("days") > 3, "d")
        .otherwise("e"),
    )
    lod = spark.createDataFrame(_LOD_LEVELS, "b string, lod_rank int, interval string")
    sel = branch.join(F.broadcast(lod), "b").select(
        "event_type", "days", "lod_rank", "interval"
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("interval"),
                bucket_ts("ts", sec).alias("bucket_ts"),
            )
            for lbl, sec in _LOD_INTERVALS.items()
        ]
    )
    x = e.select(
        "event_type",
        F.col("ts").alias("_ts"),
        F.col("value").alias("_p"),
        F.abs(F.col("value")).cast(DEC).alias("_v"),
        F.explode(pairs).alias("iv"),
    )
    bars = x.groupBy(
        "event_type",
        F.col("iv.interval").alias("interval"),
        F.col("iv.bucket_ts").alias("bucket_ts"),
    ).agg(
        F.min_by("_p", "_ts").alias("open"),
        F.max("_p").alias("high"),
        F.min("_p").alias("low"),
        F.max_by("_p", "_ts").alias("close"),
        F.sum("_v").alias("volume"),
    )
    wtail = Window.partitionBy("event_type", "interval").orderBy(
        F.col("bucket_ts").desc()
    )
    tails = bars.withColumn("rn", F.row_number().over(wtail)).filter(
        F.col("rn") <= 60
    )
    return tails.join(F.broadcast(sel), ["event_type", "interval"]).select(
        "event_type",
        F.round("days", 6).alias("span_days"),
        "lod_rank",
        "interval",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "open", "high", "low", "close",
        F.round(F.col("volume").cast("double"), 6).alias("volume"),
    )
