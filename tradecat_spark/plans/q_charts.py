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
