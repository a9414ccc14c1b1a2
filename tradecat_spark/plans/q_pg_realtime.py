"""The PG signal engine's 11 hardcoded realtime checks (SURVEY.md §2.10).

The reference runs a second, SQLite-independent signal engine straight
over PG: every poll it compares each symbol's latest candle+metrics row
to the previous poll's and fires 11 fixed checks
(services/signal-service/src/engines/pg_engine.py:148-404):

  price_surge/dump (±3%), volume_spike (5x), taker_buy/sell_dominance
  (0.7), oi_surge/dump (±5%), top_trader_extreme_long/short (3.0/0.5),
  taker_ratio_flip_long/short (1.0→1.2 / 1.0→0.8)

Here "previous poll" is ``lag()`` over hourly buckets per symbol, and
all 11 checks evaluate in ONE projection over ONE window pass — the
hourly frame, its lags, and every check's condition+strength are
whole-stage-codegen column algebra (no Python). Strength formulas
reproduce the reference exactly, including the int() truncation
(floor — every base is positive) and the min() caps; the reference
swallows ZeroDivisionError into "no signal", reproduced with NULLIF.

Proxies on the synthetic schema (same conventions as q_charts.py):
taker buy/sell volume from the 5m bar shape (close>=open ⇒ buy), open
interest from the hourly event count, top-trader long/short ratio from
the up-bar/down-bar count ratio.

Scale: two stacked aggregations (5m, then 1h) partial-aggregate
map-side; the lag window and the emission share the hourly frame's
(symbol ORDER BY bucket) exchange — one shuffle end-to-end beyond the
rollups, and signal emission via array+explode adds no extra pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.operators.rollup import bucket_ts
from tradecat_spark.plans.registry import query

DEC = "decimal(18,8)"

_HOURLY_SQL = """
WITH bars5 AS (
  SELECT
    event_type AS symbol,
    time_bucket(INTERVAL '5 minutes', ts) AS b5,
    min_by(value, ts) AS open5,
    max_by(value, ts) AS close5,
    MAX(ts) AS last_ts,
    SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS vol5,
    COUNT(*) AS n5
  FROM events GROUP BY 1, 2
),
hourly AS (
  SELECT
    symbol,
    time_bucket(INTERVAL '1 hour', b5) AS b,
    max_by(close5, last_ts) AS close,
    CAST(SUM(vol5) AS DOUBLE) AS quote_volume,
    CAST(SUM(CASE WHEN close5 >= open5 THEN vol5 ELSE CAST(0 AS DECIMAL(18,8)) END)
         AS DOUBLE) AS taker_buy,
    CAST(SUM(n5) AS DOUBLE) AS oi_value,
    CAST(SUM(CASE WHEN close5 >= open5 THEN 1 ELSE 0 END) AS DOUBLE) AS up_bars,
    CAST(SUM(CASE WHEN close5 < open5 THEN 1 ELSE 0 END) AS DOUBLE) AS down_bars
  FROM bars5 GROUP BY 1, 2
),
lagged AS (
  SELECT
    symbol, b, close, quote_volume, taker_buy, oi_value,
    lag(close) OVER w AS prev_close,
    lag(quote_volume) OVER w AS prev_qv,
    lag(oi_value) OVER w AS prev_oi,
    taker_buy / NULLIF(quote_volume, 0) AS buy_ratio,
    up_bars / NULLIF(down_bars, 0) AS tt_ratio,
    taker_buy / NULLIF(quote_volume - taker_buy, 0) AS taker_ls,
    lag(taker_buy / NULLIF(quote_volume - taker_buy, 0)) OVER w AS prev_taker_ls
  FROM hourly
  WINDOW w AS (PARTITION BY symbol ORDER BY b)
)
"""

_CHECKS_SQL = """
SELECT symbol, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
       signal_type, direction, strength, metric
FROM (
  SELECT *, (close - prev_close) / prev_close * 100 AS chg,
         (oi_value - prev_oi) / prev_oi * 100 AS oi_chg,
         quote_volume / NULLIF(prev_qv, 0) AS vol_ratio
  FROM lagged
), LATERAL (
  SELECT * FROM (VALUES
    ('price_surge', 'BUY',
     CASE WHEN prev_close IS NOT NULL AND prev_close <> 0 AND chg >= 3.0
          THEN LEAST(90, CAST(FLOOR(50 + chg * 10) AS BIGINT)) END, chg),
    ('price_dump', 'SELL',
     CASE WHEN prev_close IS NOT NULL AND prev_close <> 0 AND chg <= -3.0
          THEN LEAST(90, CAST(FLOOR(50 + ABS(chg) * 10) AS BIGINT)) END, chg),
    ('volume_spike', 'ALERT',
     CASE WHEN vol_ratio >= 5.0
          THEN LEAST(85, CAST(FLOOR(50 + vol_ratio * 5) AS BIGINT)) END, vol_ratio),
    ('taker_buy_dominance', 'BUY',
     CASE WHEN buy_ratio >= 0.7
          THEN CAST(FLOOR(60 + buy_ratio * 30) AS BIGINT) END, buy_ratio),
    ('taker_sell_dominance', 'SELL',
     CASE WHEN 1 - buy_ratio >= 0.7
          THEN CAST(FLOOR(60 + (1 - buy_ratio) * 30) AS BIGINT) END, 1 - buy_ratio),
    ('oi_surge', 'ALERT',
     CASE WHEN prev_oi IS NOT NULL AND prev_oi <> 0 AND oi_chg >= 5.0
          THEN LEAST(80, CAST(FLOOR(55 + oi_chg * 3) AS BIGINT)) END, oi_chg),
    ('oi_dump', 'ALERT',
     CASE WHEN prev_oi IS NOT NULL AND prev_oi <> 0 AND oi_chg <= -5.0
          THEN LEAST(80, CAST(FLOOR(55 + ABS(oi_chg) * 3) AS BIGINT)) END, oi_chg),
    ('top_trader_extreme_long', 'ALERT',
     CASE WHEN tt_ratio >= 3.0
          THEN LEAST(85, CAST(FLOOR(60 + tt_ratio * 8) AS BIGINT)) END, tt_ratio),
    ('top_trader_extreme_short', 'ALERT',
     CASE WHEN tt_ratio > 0 AND tt_ratio <= 0.5
          THEN LEAST(85, CAST(FLOOR(60 + (1 / tt_ratio) * 5) AS BIGINT)) END, tt_ratio),
    ('taker_ratio_flip_long', 'BUY',
     CASE WHEN prev_taker_ls < 1.0 AND taker_ls >= 1.2
          THEN CAST(70 AS BIGINT) END, taker_ls),
    ('taker_ratio_flip_short', 'SELL',
     CASE WHEN prev_taker_ls > 1.0 AND taker_ls <= 0.8
          THEN CAST(70 AS BIGINT) END, taker_ls)
  ) AS c(signal_type, direction, strength, metric)
) AS sigs
WHERE strength IS NOT NULL
"""


@query(
    "pg_realtime_checks",
    survey="§2.10 PG engine variant: 11 hardcoded prev/curr checks "
    "(engines/pg_engine.py:148-404), strength formulas with int "
    "truncation + min caps, ZeroDivisionError ⇒ no-signal",
    description="The 11 PG realtime checks over hourly prev/curr pairs, one window pass",
    oracle=_HOURLY_SQL + _CHECKS_SQL,
)
def pg_realtime_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bars5 = e.groupBy(
        F.col("event_type").alias("symbol"), bucket_ts("ts", 300).alias("b5")
    ).agg(
        F.min_by("value", "ts").alias("open5"),
        F.max_by("value", "ts").alias("close5"),
        F.max("ts").alias("last_ts"),
        F.sum(F.abs(F.col("value")).cast(DEC)).alias("vol5"),
        F.count(F.lit(1)).alias("n5"),
    )
    up = F.col("close5") >= F.col("open5")
    zero = F.lit(0).cast(DEC)
    hourly = bars5.groupBy(
        "symbol", bucket_ts("b5", 3600).alias("b")
    ).agg(
        F.max_by("close5", "last_ts").alias("close"),
        F.sum("vol5").cast("double").alias("quote_volume"),
        F.sum(F.when(up, F.col("vol5")).otherwise(zero)).cast("double").alias("taker_buy"),
        F.sum("n5").cast("double").alias("oi_value"),
        F.sum(F.when(up, 1).otherwise(0)).cast("double").alias("up_bars"),
        F.sum(F.when(~up, 1).otherwise(0)).cast("double").alias("down_bars"),
    )
    w = Window.partitionBy("symbol").orderBy("b")
    taker_ls = F.col("taker_buy") / F.nullif(
        F.col("quote_volume") - F.col("taker_buy"), F.lit(0.0)
    )
    x = hourly.select(
        "symbol", "b", "close", "quote_volume", "taker_buy", "oi_value",
        F.lag("close").over(w).alias("prev_close"),
        F.lag("quote_volume").over(w).alias("prev_qv"),
        F.lag("oi_value").over(w).alias("prev_oi"),
        (F.col("taker_buy") / F.nullif("quote_volume", F.lit(0.0))).alias("buy_ratio"),
        (F.col("up_bars") / F.nullif("down_bars", F.lit(0.0))).alias("tt_ratio"),
        taker_ls.alias("taker_ls"),
        F.lag(taker_ls).over(w).alias("prev_taker_ls"),
    ).withColumns(
        {
            "chg": (F.col("close") - F.col("prev_close")) / F.col("prev_close") * 100,
            "oi_chg": (F.col("oi_value") - F.col("prev_oi")) / F.col("prev_oi") * 100,
            "vol_ratio": F.col("quote_volume") / F.nullif("prev_qv", F.lit(0.0)),
        }
    )

    def sig(name: str, direction: str, cond: Column, strength: Column, metric: Column) -> Column:
        return F.when(
            cond,
            F.struct(
                F.lit(name).alias("signal_type"),
                F.lit(direction).alias("direction"),
                strength.cast("long").alias("strength"),
                metric.cast("double").alias("metric"),
            ),
        )

    prev_ok = F.col("prev_close").isNotNull() & (F.col("prev_close") != 0)
    oi_ok = F.col("prev_oi").isNotNull() & (F.col("prev_oi") != 0)
    chg, oi_chg = F.col("chg"), F.col("oi_chg")
    br, tt, vr = F.col("buy_ratio"), F.col("tt_ratio"), F.col("vol_ratio")
    checks = F.array_compact(
        F.array(
            sig("price_surge", "BUY", prev_ok & (chg >= 3.0),
                F.least(F.lit(90), F.floor(50 + chg * 10)), chg),
            sig("price_dump", "SELL", prev_ok & (chg <= -3.0),
                F.least(F.lit(90), F.floor(50 + F.abs(chg) * 10)), chg),
            sig("volume_spike", "ALERT", vr >= 5.0,
                F.least(F.lit(85), F.floor(50 + vr * 5)), vr),
            sig("taker_buy_dominance", "BUY", br >= 0.7,
                F.floor(60 + br * 30), br),
            sig("taker_sell_dominance", "SELL", (1 - br) >= 0.7,
                F.floor(60 + (1 - br) * 30), 1 - br),
            sig("oi_surge", "ALERT", oi_ok & (oi_chg >= 5.0),
                F.least(F.lit(80), F.floor(55 + oi_chg * 3)), oi_chg),
            sig("oi_dump", "ALERT", oi_ok & (oi_chg <= -5.0),
                F.least(F.lit(80), F.floor(55 + F.abs(oi_chg) * 3)), oi_chg),
            sig("top_trader_extreme_long", "ALERT", tt >= 3.0,
                F.least(F.lit(85), F.floor(60 + tt * 8)), tt),
            sig("top_trader_extreme_short", "ALERT", (tt > 0) & (tt <= 0.5),
                F.least(F.lit(85), F.floor(60 + (1 / tt) * 5)), tt),
            sig("taker_ratio_flip_long", "BUY",
                (F.col("prev_taker_ls") < 1.0) & (F.col("taker_ls") >= 1.2),
                F.lit(70), F.col("taker_ls")),
            sig("taker_ratio_flip_short", "SELL",
                (F.col("prev_taker_ls") > 1.0) & (F.col("taker_ls") <= 0.8),
                F.lit(70), F.col("taker_ls")),
        )
    )
    return (
        x.select(
            "symbol",
            F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
            F.explode(checks).alias("s"),
        )
        .select(
            "symbol", "bucket_ts",
            F.col("s.signal_type").alias("signal_type"),
            F.col("s.direction").alias("direction"),
            F.col("s.strength").alias("strength"),
            F.col("s.metric").alias("metric"),
        )
    )
