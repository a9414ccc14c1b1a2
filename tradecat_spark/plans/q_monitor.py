"""Monitoring / base-data indicator queries (SURVEY.md §2.9 tail).

Closes the last §2.9 classes without an individually oracle-matched
query: volume-ratio, support/resistance, base-data panel, data-monitor
completeness, futures-gap monitor, the futures-aggregate composite risk
score, and the last-bar buy/sell ratio. Reference files:

- batch/volume_ratio.py:7-37        (vol / MA20(vol) + label)
- batch/support_resistance.py:12-37 (20-bar hi/lo levels + ATR dist)
- incremental/base_data.py:28-97    (last-bar OHLCV panel + taker split)
- batch/data_monitor.py:16-40       (loaded vs expected bar counts)
- batch/futures_gap_monitor.py:37-76 (gap segments in the 5m series)
- batch/futures_aggregate.py:84-259 (z-score composite risk, flips)
- incremental/buy_sell_ratio.py     (last-bar taker buy/sell ratio)

The synthetic events table carries no taker columns, so buy/sell
direction uses the repo's established 5m bar-shape proxy
(close >= open => buying pressure, see plans/q_charts.py) — the same
proxy documented for buy_sell_ratio/futures_sentiment in the library.

Determinism: volumes are DECIMAL sums (associative) cast to double at
the last step; rolling means are expressed as exact decimal window sums
divided by the window count; all floats that cross engines are rounded
once, and ``+ 0.0`` squashes IEEE -0.0 where a rounded value can hit
zero from below.

Scale: every query is one or two hash-aggregates plus one window sort
per key — no Python, no collect; tails are bounded to the reference's
window-cache contract (db/cache.py:33) before any per-key fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.plans.q_indicators import (
    _BARS_1H_SQL,
    TAIL_BARS,
    _series,
)
from tradecat_spark.plans.registry import query

DEC = "decimal(18,8)"

# 1h close + exact decimal volume — shared bar shape for this module.
_VOL_BARS_1H_SQL = """
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
    max_by(value, ts) AS close,
    SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS vol
  FROM events GROUP BY 1, 2
"""

# 5m bar-shape taker proxy rolled to 1h: exact decimal buy/total sums.
_TAKER_1H_SQL = """
  SELECT event_type, time_bucket(INTERVAL '1 hour', b5) AS b,
    SUM(CASE WHEN close >= open THEN vol
             ELSE CAST(0 AS DECIMAL(18,8)) END) AS buy,
    SUM(vol) AS total
  FROM (
    SELECT event_type,
      time_bucket(INTERVAL '5 minutes', ts) AS b5,
      min_by(value, ts) AS open,
      max_by(value, ts) AS close,
      SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS vol
    FROM events GROUP BY 1, 2
  ) GROUP BY 1, 2
"""


def _vol_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tradecat_spark.operators.rollup import bucket_ts

    return _series(spark, sf_dir).groupBy(
        "event_type", bucket_ts("ts", 3600).alias("b")
    ).agg(
        F.max_by("value", "ts").alias("close"),
        F.sum(F.abs(F.col("value")).cast(DEC)).alias("vol"),
    )


def _taker_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirrors _TAKER_1H_SQL — 5m shape proxy aggregated to 1h."""
    from tradecat_spark.operators.rollup import bucket_ts

    b5 = _series(spark, sf_dir).groupBy(
        "event_type", bucket_ts("ts", 300).alias("b5")
    ).agg(
        F.min_by("value", "ts").alias("open"),
        F.max_by("value", "ts").alias("close"),
        F.sum(F.abs(F.col("value")).cast(DEC)).alias("vol"),
    )
    buy = F.when(F.col("close") >= F.col("open"), F.col("vol")).otherwise(
        F.lit(0).cast(DEC)
    )
    return b5.groupBy(
        "event_type", bucket_ts("b5", 3600).alias("b")
    ).agg(F.sum(buy).alias("buy"), F.sum("vol").alias("total"))


# ---------------------------------------------------------------------------
# §2.9 volume ratio (batch/volume_ratio.py:7-37)
# ---------------------------------------------------------------------------
@query(
    "ind_volume_ratio",
    survey="§2.9 volume-ratio (batch/volume_ratio.py:7-37): vol / "
    "MA20(vol), surge/shrink labels, latest row per symbol",
    description="Latest 1h volume ratio vs its 20-bar mean with signal label",
    oracle=f"""
WITH bars AS ({_VOL_BARS_1H_SQL}),
w AS (
  SELECT event_type, b, close, CAST(vol AS DOUBLE) AS vol,
    CASE WHEN COUNT(*) OVER w20 >= 20
         THEN CAST(SUM(vol) OVER w20 AS DOUBLE) END AS sum20
  FROM bars
  WINDOW w20 AS (PARTITION BY event_type ORDER BY b
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
),
latest AS (
  SELECT * FROM (
    SELECT w.*, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY b DESC) AS rn FROM w
  ) t WHERE rn = 1
)
SELECT event_type,
  ROUND(vol * 20.0 / NULLIF(sum20, 0), 4) AS vol_ratio,
  CASE
    WHEN ROUND(vol * 20.0 / NULLIF(sum20, 0), 4) > 5 THEN 'extreme_surge'
    WHEN ROUND(vol * 20.0 / NULLIF(sum20, 0), 4) > 2 THEN 'abnormal_surge'
    WHEN ROUND(vol * 20.0 / NULLIF(sum20, 0), 4) > 1 THEN 'surge'
    WHEN ROUND(vol * 20.0 / NULLIF(sum20, 0), 4) < 0.7 THEN 'shrink'
    ELSE 'normal'
  END AS vol_signal,
  ROUND(close * vol, 6) AS turnover,
  close AS price
FROM latest
""",
)
def ind_volume_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rolling mean is the exact DECIMAL 20-bar window sum divided
    out as vol*20/sum — both operands identical across engines, one
    float division, rounded once; the label bins the rounded value.
    min_periods=20 (reference) via the window COUNT gate."""
    bars = _vol_bars(spark, sf_dir)
    w20 = Window.partitionBy("event_type").orderBy("b").rowsBetween(-19, 0)
    w = bars.select(
        "event_type", "b", "close",
        F.col("vol").cast("double").alias("vold"),
        F.when(
            F.count(F.lit(1)).over(w20) >= 20,
            F.sum("vol").over(w20).cast("double"),
        ).alias("sum20"),
    )
    wl = Window.partitionBy("event_type").orderBy(F.desc("b"))
    latest = w.withColumn("rn", F.row_number().over(wl)).filter("rn = 1")
    ratio4 = F.round(
        F.col("vold") * 20.0 / F.nullif("sum20", F.lit(0.0)), 4
    )
    return latest.select(
        "event_type",
        ratio4.alias("vol_ratio"),
        F.when(ratio4 > 5, "extreme_surge")
        .when(ratio4 > 2, "abnormal_surge")
        .when(ratio4 > 1, "surge")
        .when(ratio4 < 0.7, "shrink")
        .otherwise("normal")
        .alias("vol_signal"),
        F.round(F.col("close") * F.col("vold"), 6).alias("turnover"),
        F.col("close").alias("price"),
    )


# ---------------------------------------------------------------------------
# §2.9 support / resistance (batch/support_resistance.py:12-37)
# ---------------------------------------------------------------------------
@query(
    "ind_support_resistance",
    survey="§2.9 S/R (batch/support_resistance.py:12-37): 20-bar hi/lo "
    "key levels, Wilder ATR(14), distance-to-level percentages",
    description="Per-symbol 20-bar support/resistance with ATR and level distances",
    oracle=f"""
WITH allbars AS ({_BARS_1H_SQL}),
bars AS (
  SELECT event_type, bucket_ts, open, high, low, close FROM (
    SELECT b.*, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY bucket_ts DESC) AS rn
    FROM allbars b) tb
  WHERE rn <= {TAIL_BARS}
),
levels AS (
  SELECT event_type,
    MIN(CASE WHEN rn <= 20 THEN low END) AS support,
    MAX(CASE WHEN rn <= 20 THEN high END) AS resistance,
    max_by(close, bucket_ts) AS price
  FROM (
    SELECT b.*, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY bucket_ts DESC) AS rn
    FROM bars b) t
  GROUP BY event_type
),
tr AS (
  SELECT event_type, bucket_ts,
    GREATEST(high - low,
             ABS(high - LAG(close) OVER w),
             ABS(low - LAG(close) OVER w)) AS tr
  FROM bars
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
),
atr AS (
  SELECT event_type,
    ROUND(list_reduce(list(tr ORDER BY bucket_ts),
      (acc, x) -> acc * (1.0::DOUBLE - {1.0 / 14.0!r}::DOUBLE)
                  + x * {1.0 / 14.0!r}::DOUBLE), 6) AS atr14
  FROM tr WHERE tr IS NOT NULL GROUP BY event_type
)
SELECT l.event_type,
  ROUND(support, 6) AS support,
  ROUND(resistance, 6) AS resistance,
  price,
  atr14,
  ROUND((price - support) / price * 100, 4) + 0.0 AS dist_support_pct,
  ROUND((resistance - price) / price * 100, 4) + 0.0 AS dist_resistance_pct,
  LEAST(ABS(ROUND((price - support) / price * 100, 4)),
        ABS(ROUND((resistance - price) / price * 100, 4))) AS dist_key_pct
FROM levels l JOIN atr USING (event_type)
""",
)
def ind_support_resistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levels are exact min/max over the last 20 bars of the ≤500-bar
    tail; ATR(14) is the same JVM-side Wilder fold as
    ind_atr_wilder_fold (bit-identical to a sequential oracle);
    distances divide identical doubles and round once."""
    from tradecat_spark.operators.latest import topn_per_group
    from tradecat_spark.operators.rollup import ohlcv_rollup

    e = load_table(spark, sf_dir, "events")
    bars = topn_per_group(
        ohlcv_rollup(e, ["event_type"], "ts", "value", interval_sec=3600),
        ["event_type"], "bucket_ts", TAIL_BARS,
    )
    wd = Window.partitionBy("event_type").orderBy(F.desc("bucket_ts"))
    rn = F.row_number().over(wd)
    levels = bars.withColumn("rn", rn).groupBy("event_type").agg(
        F.min(F.when(F.col("rn") <= 20, F.col("low"))).alias("support"),
        F.max(F.when(F.col("rn") <= 20, F.col("high"))).alias("resistance"),
        F.max_by("close", "bucket_ts").alias("price"),
    )
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
        .agg(
            F.array_sort(F.collect_list(F.struct("bucket_ts", "tr"))).alias("pairs")
        )
    )
    vals = F.transform(F.col("pairs"), lambda p: p["tr"])
    alpha = 1.0 / 14.0
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
    )
    atr = trs.select("event_type", F.round(fold, 6).alias("atr14"))
    d_sup = F.round(
        (F.col("price") - F.col("support")) / F.col("price") * 100, 4
    )
    d_res = F.round(
        (F.col("resistance") - F.col("price")) / F.col("price") * 100, 4
    )
    return levels.join(atr, "event_type").select(
        "event_type",
        F.round("support", 6).alias("support"),
        F.round("resistance", 6).alias("resistance"),
        "price",
        "atr14",
        (d_sup + F.lit(0.0)).alias("dist_support_pct"),
        (d_res + F.lit(0.0)).alias("dist_resistance_pct"),
        F.least(F.abs(d_sup), F.abs(d_res)).alias("dist_key_pct"),
    )


# ---------------------------------------------------------------------------
# §2.9 base data panel (incremental/base_data.py:28-97)
# ---------------------------------------------------------------------------
@query(
    "ind_base_data",
    survey="§2.9 base-data (incremental/base_data.py:28-97): last-bar "
    "OHLCV + amplitude/change/taker split/net flow/avg trade size",
    description="Latest 1h bar panel per symbol with derived flow fields",
    oracle=f"""
WITH bars AS ({_BARS_1H_SQL}),
vols AS ({_VOL_BARS_1H_SQL}),
taker AS ({_TAKER_1H_SQL}),
j AS (
  SELECT b.event_type, b.bucket_ts, b.open, b.high, b.low, b.close,
    CAST(v.vol AS DOUBLE) AS volume, b.trade_count,
    CAST(t.buy AS DOUBLE) AS buy_vol,
    CAST(v.vol - t.buy AS DOUBLE) AS sell_vol
  FROM bars b
  JOIN vols v ON v.event_type = b.event_type AND v.b = b.bucket_ts
  JOIN taker t ON t.event_type = b.event_type AND t.b = b.bucket_ts
),
latest AS (
  SELECT * FROM (
    SELECT j.*, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY bucket_ts DESC) AS rn FROM j
  ) t WHERE rn = 1
)
SELECT event_type,
  strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bar_ts,
  open, high, low, close, volume,
  ROUND(close * volume, 6) AS turnover,
  ROUND((high - low) / NULLIF(low, 0), 6) + 0.0 AS amplitude,
  ROUND((close - open) / NULLIF(open, 0), 6) + 0.0 AS change_rate,
  trade_count,
  buy_vol, sell_vol,
  ROUND(buy_vol / NULLIF(volume, 0), 6) AS buy_ratio,
  ROUND((buy_vol - sell_vol) * close, 6) + 0.0 AS net_flow,
  ROUND(close * volume / NULLIF(trade_count, 0), 6) AS avg_trade_quote
FROM latest
""",
)
def ind_base_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three shared-shape aggregates (OHLC bars, exact decimal volume,
    5m-shape taker split) joined on (key, bucket), then one latest-row
    window — the Spark form of the reference's last-bar panel with its
    derive-don't-fake fallback rules. All sums stay DECIMAL until the
    final projection."""
    from tradecat_spark.operators.rollup import ohlcv_rollup

    e = load_table(spark, sf_dir, "events")
    bars = ohlcv_rollup(
        e, ["event_type"], "ts", "value", interval_sec=3600
    ).select("event_type", "bucket_ts", "open", "high", "low", "close",
             "trade_count")
    vols = _vol_bars(spark, sf_dir).select(
        "event_type", F.col("b").alias("bucket_ts"),
        F.col("vol").cast("double").alias("volume"),
        F.col("vol").alias("_vol_dec"),
    )
    taker = _taker_1h(spark, sf_dir).select(
        "event_type", F.col("b").alias("bucket_ts"),
        F.col("buy").alias("_buy_dec"),
    )
    j = (
        bars.join(vols, ["event_type", "bucket_ts"])
        .join(taker, ["event_type", "bucket_ts"])
        .select(
            "event_type", "bucket_ts", "open", "high", "low", "close",
            "volume", "trade_count",
            F.col("_buy_dec").cast("double").alias("buy_vol"),
            (F.col("_vol_dec") - F.col("_buy_dec")).cast("double")
            .alias("sell_vol"),
        )
    )
    wl = Window.partitionBy("event_type").orderBy(F.desc("bucket_ts"))
    latest = j.withColumn("rn", F.row_number().over(wl)).filter("rn = 1")
    return latest.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bar_ts"),
        "open", "high", "low", "close", "volume",
        F.round(F.col("close") * F.col("volume"), 6).alias("turnover"),
        (F.round((F.col("high") - F.col("low")) / F.nullif("low", F.lit(0.0)), 6)
         + F.lit(0.0)).alias("amplitude"),
        (F.round((F.col("close") - F.col("open")) / F.nullif("open", F.lit(0.0)), 6)
         + F.lit(0.0)).alias("change_rate"),
        "trade_count",
        "buy_vol", "sell_vol",
        F.round(F.col("buy_vol") / F.nullif("volume", F.lit(0.0)), 6)
        .alias("buy_ratio"),
        (F.round((F.col("buy_vol") - F.col("sell_vol")) * F.col("close"), 6)
         + F.lit(0.0)).alias("net_flow"),
        F.round(
            F.col("close") * F.col("volume")
            / F.nullif(F.col("trade_count").cast("double"), F.lit(0.0)), 6
        ).alias("avg_trade_quote"),
    )


# ---------------------------------------------------------------------------
# §2.9 buy/sell ratio (incremental/buy_sell_ratio.py)
# ---------------------------------------------------------------------------
@query(
    "ind_buy_sell_ratio",
    survey="§2.9 buy-sell ratio (incremental/buy_sell_ratio.py): "
    "last-bar taker buy/sell ratio + dominance label (5m shape proxy)",
    description="Latest 1h taker buy/sell ratio per symbol",
    oracle=f"""
WITH taker AS ({_TAKER_1H_SQL}),
latest AS (
  SELECT * FROM (
    SELECT t.*, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY b DESC) AS rn FROM taker t
  ) x WHERE rn = 1
)
SELECT event_type,
  strftime(b, '%Y-%m-%d %H:%M:%S') AS bar_ts,
  CAST(buy AS DOUBLE) AS buy_vol,
  CAST(total - buy AS DOUBLE) AS sell_vol,
  ROUND(CAST(buy AS DOUBLE) / NULLIF(CAST(total - buy AS DOUBLE), 0), 6)
    AS buy_sell_ratio,
  ROUND(CAST(buy AS DOUBLE) / NULLIF(CAST(total AS DOUBLE), 0), 6)
    AS buy_share,
  CASE
    WHEN CAST(buy AS DOUBLE) > CAST(total - buy AS DOUBLE) THEN 'buy_dominant'
    WHEN CAST(buy AS DOUBLE) < CAST(total - buy AS DOUBLE) THEN 'sell_dominant'
    ELSE 'balanced'
  END AS dominance
FROM latest
""",
)
def ind_buy_sell_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numerators/denominators are exact DECIMAL sums; the two ratios
    are single float divisions on identical operands, rounded once."""
    taker = _taker_1h(spark, sf_dir)
    wl = Window.partitionBy("event_type").orderBy(F.desc("b"))
    latest = taker.withColumn("rn", F.row_number().over(wl)).filter("rn = 1")
    buy_d = F.col("buy").cast("double")
    sell_d = (F.col("total") - F.col("buy")).cast("double")
    tot_d = F.col("total").cast("double")
    return latest.select(
        "event_type",
        F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bar_ts"),
        buy_d.alias("buy_vol"),
        sell_d.alias("sell_vol"),
        F.round(buy_d / F.nullif(sell_d, F.lit(0.0)), 6)
        .alias("buy_sell_ratio"),
        F.round(buy_d / F.nullif(tot_d, F.lit(0.0)), 6).alias("buy_share"),
        F.when(buy_d > sell_d, "buy_dominant")
        .when(buy_d < sell_d, "sell_dominant")
        .otherwise("balanced")
        .alias("dominance"),
    )


# ---------------------------------------------------------------------------
# §2.9 data monitor (batch/data_monitor.py:16-40)
# ---------------------------------------------------------------------------
@query(
    "ind_data_monitor",
    survey="§2.9 data-monitor (batch/data_monitor.py:16-40): loaded vs "
    "expected bar counts over a trailing 7-day window",
    description="Per-symbol 1h bar completeness over the last 7 days",
    oracle="""
WITH mx AS (SELECT MAX(ts) AS mx_ts FROM events),
tail AS (
  SELECT e.event_type, time_bucket(INTERVAL '1 hour', e.ts) AS b, e.ts
  FROM events e, mx
  WHERE e.ts > mx.mx_ts - INTERVAL 7 DAY
)
SELECT event_type,
  CAST(COUNT(DISTINCT b) AS BIGINT) AS loaded_bars,
  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts,
  CAST(168 AS BIGINT) AS expected_bars,
  CAST(GREATEST(0, 168 - COUNT(DISTINCT b)) AS BIGINT) AS gap_bars
FROM tail GROUP BY event_type
""",
)
def ind_data_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window completeness audit: count distinct hour buckets
    against the 7*24 calendar expectation, anchored to the global max
    timestamp (the reference anchors to wall-clock; a deterministic
    dataset anchors to its own frontier). One aggregate, no window."""
    from tradecat_spark.operators.rollup import bucket_ts

    e = _series(spark, sf_dir)
    mx = e.agg(F.max("ts").alias("mx_ts"))
    tail = e.join(F.broadcast(mx)).filter(
        F.col("ts") > F.col("mx_ts") - F.expr("INTERVAL 7 DAYS")
    )
    return tail.select(
        "event_type", bucket_ts("ts", 3600).alias("b"), "ts"
    ).groupBy("event_type").agg(
        F.count_distinct("b").alias("loaded_bars"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
        F.lit(168).cast("long").alias("expected_bars"),
        F.greatest(
            F.lit(0).cast("long"),
            F.lit(168).cast("long") - F.count_distinct("b"),
        ).alias("gap_bars"),
    )


# ---------------------------------------------------------------------------
# §2.9 futures gap monitor (batch/futures_gap_monitor.py:37-76)
# ---------------------------------------------------------------------------
@query(
    "ind_futures_gap_monitor",
    survey="§2.9 futures-gap (batch/futures_gap_monitor.py:37-76): gap "
    "segments in the 5m series — total missing, first gap bounds",
    description="Per-symbol 5m-series gap audit: missing bars + first gap",
    oracle="""
WITH mx AS (SELECT MAX(ts) AS mx_ts FROM events),
buckets AS (
  SELECT DISTINCT e.event_type,
    time_bucket(INTERVAL '5 minutes', e.ts) AS b
  FROM events e, mx
  WHERE e.ts > mx.mx_ts - INTERVAL 7 DAY
),
gaps AS (
  SELECT event_type, b,
    LAG(b) OVER (PARTITION BY event_type ORDER BY b) AS prev_b
  FROM buckets
),
seg AS (
  SELECT event_type, b, prev_b,
    CAST(date_diff('second', prev_b, b) / 300 - 1 AS BIGINT) AS missed
  FROM gaps
  WHERE prev_b IS NOT NULL AND date_diff('second', prev_b, b) > 300
)
SELECT g.event_type,
  CAST(COUNT(DISTINCT g.b) AS BIGINT) AS loaded_bars,
  strftime(MAX(g.b), '%Y-%m-%d %H:%M:%S') AS latest_ts,
  CAST(COALESCE(SUM(s.missed), 0) AS BIGINT) AS missing_bars,
  strftime(MIN(s.prev_b + INTERVAL 5 MINUTE), '%Y-%m-%d %H:%M:%S')
    AS first_gap_start,
  strftime(min_by(s.b, s.prev_b) - INTERVAL 5 MINUTE,
           '%Y-%m-%d %H:%M:%S') AS first_gap_end
FROM gaps g
LEFT JOIN seg s ON s.event_type = g.event_type AND s.b = g.b
GROUP BY g.event_type
""",
)
def ind_futures_gap_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD/LAG gap segmentation (S6 machinery) aggregated to the
    reference's gap-report shape: one window pass over distinct 5m
    buckets, then one aggregate; missing counts are integer arithmetic
    on epoch seconds (exact)."""
    from tradecat_spark.operators.rollup import bucket_ts

    e = _series(spark, sf_dir)
    mx = e.agg(F.max("ts").alias("mx_ts"))
    buckets = (
        e.join(F.broadcast(mx))
        .filter(F.col("ts") > F.col("mx_ts") - F.expr("INTERVAL 7 DAYS"))
        .select("event_type", bucket_ts("ts", 300).alias("b"))
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("b")
    gaps = buckets.withColumn("prev_b", F.lag("b").over(w))
    delta = F.col("b").cast("long") - F.col("prev_b").cast("long")
    seg = gaps.filter(F.col("prev_b").isNotNull() & (delta > 300)).select(
        "event_type", "b", "prev_b",
        (delta / 300 - 1).cast("long").alias("missed"),
    )
    j = gaps.join(
        seg.select("event_type", "b", "missed",
                   F.col("prev_b").alias("gap_prev")),
        ["event_type", "b"], "left",
    )
    return j.groupBy("event_type").agg(
        F.count_distinct("b").alias("loaded_bars"),
        F.date_format(F.max("b"), "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
        F.coalesce(F.sum("missed"), F.lit(0)).cast("long")
        .alias("missing_bars"),
        F.date_format(
            F.min(F.col("gap_prev") + F.expr("INTERVAL 5 MINUTES")),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("first_gap_start"),
        F.date_format(
            F.min_by("b", "gap_prev") - F.expr("INTERVAL 5 MINUTES"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("first_gap_end"),
    )


# ---------------------------------------------------------------------------
# §2.9 futures composite risk (batch/futures_aggregate.py:84-259)
# ---------------------------------------------------------------------------
@query(
    "ind_futures_risk_score",
    survey="§2.9 futures-aggregate composite (futures_aggregate.py:"
    "176-233): risk = z(ΔOI%) + z(taker dev) + z(count dev), sentiment "
    "flip + momentum — OI/taker proxied from volume and 5m bar shape",
    description="Per-symbol composite z-score risk with flip signal and momentum",
    oracle=f"""
WITH vols AS ({_VOL_BARS_1H_SQL}),
taker AS ({_TAKER_1H_SQL}),
base AS (
  SELECT v.event_type, v.b,
    CAST(v.vol AS DOUBLE) AS oiv,
    ROUND(CAST(t.buy AS DOUBLE)
          / NULLIF(CAST(t.total - t.buy AS DOUBLE), 0), 6) AS ratio
  FROM vols v JOIN taker t ON t.event_type = v.event_type AND t.b = v.b
),
d AS (
  SELECT event_type, b, oiv, ratio,
    ROUND((oiv - LAG(oiv) OVER w) / NULLIF(LAG(oiv) OVER w, 0), 6)
      AS delta_pct,
    ROUND(ABS(ratio - 1), 6) AS dev,
    LAG(ratio) OVER w AS prev_ratio
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY b)
),
stats AS (
  SELECT event_type,
    AVG(delta_pct) AS mu_d, STDDEV_SAMP(delta_pct) AS sd_d,
    AVG(dev) AS mu_v, STDDEV_SAMP(dev) AS sd_v
  FROM d GROUP BY event_type
),
last AS (
  SELECT event_type, delta_pct AS last_delta, dev AS last_dev,
    ratio AS last_ratio, prev_ratio AS last_prev_ratio
  FROM (
    SELECT d.*, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY b DESC) AS rn FROM d
  ) t WHERE rn = 1
),
g AS (SELECT * FROM stats JOIN last USING (event_type))
SELECT event_type,
  ROUND((last_delta - mu_d) / NULLIF(sd_d, 0), 4) + 0.0 AS z_oi_delta,
  ROUND((last_dev - mu_v) / NULLIF(sd_v, 0), 4) + 0.0 AS z_taker_dev,
  ROUND(COALESCE(ROUND((last_delta - mu_d) / NULLIF(sd_d, 0), 4), 0)
        + COALESCE(ROUND((last_dev - mu_v) / NULLIF(sd_v, 0), 4), 0), 4)
    + 0.0 AS risk_score,
  ROUND(last_ratio - last_prev_ratio, 6) + 0.0 AS taker_momentum,
  CASE
    WHEN last_prev_ratio < 1 AND last_ratio > 1 THEN 1
    WHEN last_prev_ratio > 1 AND last_ratio < 1 THEN -1
    ELSE 0
  END AS flip_signal
FROM g
""",
)
def ind_futures_risk_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's risk law — sum of z-scores of the latest value
    against its own history — over the OI proxy (hourly volume) and the
    taker-dev proxy. Every series member is pre-rounded, so the grouped
    mean/stddev consume identical doubles; z-scores round at 4dp before
    the sum (engine-side association noise sits far below 1e-4)."""
    vols = _vol_bars(spark, sf_dir)
    taker = _taker_1h(spark, sf_dir)
    base = vols.alias("v").join(
        taker.alias("t"),
        (F.col("v.event_type") == F.col("t.event_type"))
        & (F.col("v.b") == F.col("t.b")),
    ).select(
        F.col("v.event_type").alias("event_type"),
        F.col("v.b").alias("b"),
        F.col("v.vol").cast("double").alias("oiv"),
        F.round(
            F.col("t.buy").cast("double")
            / F.nullif((F.col("t.total") - F.col("t.buy")).cast("double"),
                       F.lit(0.0)),
            6,
        ).alias("ratio"),
    )
    w = Window.partitionBy("event_type").orderBy("b")
    lag_oiv = F.lag("oiv").over(w)
    d = base.select(
        "event_type", "b", "oiv", "ratio",
        F.round((F.col("oiv") - lag_oiv) / F.nullif(lag_oiv, F.lit(0.0)), 6)
        .alias("delta_pct"),
        F.round(F.abs(F.col("ratio") - 1), 6).alias("dev"),
        F.lag("ratio").over(w).alias("prev_ratio"),
    )
    stats = d.groupBy("event_type").agg(
        F.avg("delta_pct").alias("mu_d"),
        F.stddev_samp("delta_pct").alias("sd_d"),
        F.avg("dev").alias("mu_v"),
        F.stddev_samp("dev").alias("sd_v"),
    )
    wl = Window.partitionBy("event_type").orderBy(F.desc("b"))
    last = (
        d.withColumn("rn", F.row_number().over(wl))
        .filter("rn = 1")
        .select(
            "event_type",
            F.col("delta_pct").alias("last_delta"),
            F.col("dev").alias("last_dev"),
            F.col("ratio").alias("last_ratio"),
            F.col("prev_ratio").alias("last_prev_ratio"),
        )
    )
    g = stats.join(last, "event_type")
    z_d = F.round(
        (F.col("last_delta") - F.col("mu_d")) / F.nullif("sd_d", F.lit(0.0)), 4
    )
    z_v = F.round(
        (F.col("last_dev") - F.col("mu_v")) / F.nullif("sd_v", F.lit(0.0)), 4
    )
    return g.select(
        "event_type",
        (z_d + F.lit(0.0)).alias("z_oi_delta"),
        (z_v + F.lit(0.0)).alias("z_taker_dev"),
        (F.round(F.coalesce(z_d, F.lit(0.0)) + F.coalesce(z_v, F.lit(0.0)), 4)
         + F.lit(0.0)).alias("risk_score"),
        (F.round(F.col("last_ratio") - F.col("last_prev_ratio"), 6)
         + F.lit(0.0)).alias("taker_momentum"),
        F.when(
            (F.col("last_prev_ratio") < 1) & (F.col("last_ratio") > 1), 1
        ).when(
            (F.col("last_prev_ratio") > 1) & (F.col("last_ratio") < 1), -1
        ).otherwise(0).alias("flip_signal"),
    )


# ---------------------------------------------------------------------------
# §2.3 J6 / §2.9 market share + contribution rank (engine.py:282-332)
# ---------------------------------------------------------------------------
@query(
    "ind_market_share_rank",
    survey="§2.3 J6 market-share enrichment (core/engine.py:282-332): "
    "share = latest OI x 100 / market total per interval, plus the "
    "contribution rank the reference leaves NULL (needs a global pass)",
    description="Per-symbol market share of latest OI and rank, 1h and 1d intervals",
    oracle="""
WITH pairs AS (
  SELECT event_type, iv,
    CASE WHEN iv = '1h' THEN time_bucket(INTERVAL '1 hour', ts)
         ELSE time_bucket(INTERVAL '1 day', ts) END AS b,
    CAST(ABS(value) AS DECIMAL(18,8)) AS av
  FROM events CROSS JOIN (SELECT UNNEST(['1h', '1d']) AS iv)
),
bars AS (
  SELECT event_type, iv, b, SUM(av) AS oiv
  FROM pairs GROUP BY 1, 2, 3
),
latest AS (
  SELECT event_type, iv, oiv FROM (
    SELECT bars.*, ROW_NUMBER() OVER (
      PARTITION BY event_type, iv ORDER BY b DESC) AS rn FROM bars
  ) t WHERE rn = 1
)
SELECT event_type, iv AS interval,
  CAST(oiv AS DOUBLE) AS oi_value,
  ROUND(CAST(oiv AS DOUBLE) * 100.0
        / CAST(SUM(oiv) OVER (PARTITION BY iv) AS DOUBLE), 4)
    AS market_share_pct,
  CAST(RANK() OVER (PARTITION BY iv ORDER BY oiv DESC) AS BIGINT)
    AS contribution_rank
FROM latest
""",
)
def ind_market_share_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's cross-DB UPDATE pass collapses to one window sum
    + rank over the latest-per-key rows (SURVEY.md J6 — 'one line').
    OI totals are exact DECIMAL sums (associative window sum), the
    share is a single rounded float division; rank orders by the exact
    decimal so ties resolve identically in both engines. At 100 TB the
    latest-row extraction rides the same (key, iv) shuffle as the
    rollup and the share window is one tiny per-interval exchange."""
    from tradecat_spark.operators.rollup import bucket_ts

    e = _series(spark, sf_dir)
    pairs = F.array(
        F.struct(F.lit("1h").alias("iv"), bucket_ts("ts", 3600).alias("b")),
        F.struct(F.lit("1d").alias("iv"), bucket_ts("ts", 86400).alias("b")),
    )
    x = e.select(
        "event_type",
        F.abs(F.col("value")).cast(DEC).alias("av"),
        F.explode(pairs).alias("p"),
    )
    bars = x.groupBy(
        "event_type", F.col("p.iv").alias("iv"), F.col("p.b").alias("b")
    ).agg(F.sum("av").alias("oiv"))
    wl = Window.partitionBy("event_type", "iv").orderBy(F.desc("b"))
    latest = (
        bars.withColumn("rn", F.row_number().over(wl))
        .filter("rn = 1")
        .select("event_type", "iv", "oiv")
    )
    wiv = Window.partitionBy("iv")
    return latest.select(
        "event_type",
        F.col("iv").alias("interval"),
        F.col("oiv").cast("double").alias("oi_value"),
        F.round(
            F.col("oiv").cast("double") * 100.0
            / F.sum("oiv").over(wiv).cast("double"),
            4,
        ).alias("market_share_pct"),
        F.rank().over(wiv.orderBy(F.desc("oiv"))).cast("long")
        .alias("contribution_rank"),
    )
