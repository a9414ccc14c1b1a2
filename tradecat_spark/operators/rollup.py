"""Time-bucket rollups — the continuous-aggregate equivalent.

Reference: TimescaleDB continuous aggregates build OHLCV candles per
interval via ``time_bucket + first/max/min/last/sum/bool_and``
(/root/reference/libs/database/db/schema/004_continuous_aggregates.sql:27-45)
and metrics rollups via ``last(oi, t) + sum(numerators/denominators)``
(007_metrics_cagg_from_5m.sql:92-107).

Spark-first design: a single shuffle per rollup — ``groupBy(keys, window)``
with ``min_by/max_by`` ordered aggregates (no window functions, no
self-joins). Partial (map-side) aggregation applies to every agg here, so
at 100 TB the shuffle carries one row per (key, bucket) from each input
partition, not the raw rows. The multi-interval registry mirrors the
reference's 14-interval cagg registry (004:67-81): coarser intervals are
derived from the finest rollup, not from raw data, so raw is scanned once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Interval registry — the reference's FULL 14-interval cagg registry
# (004_continuous_aggregates.sql:67-81: 3m 5m 15m 30m 1h 2h 4h 6h 8h 12h
# 1d 3d 1w 1M) plus the 1m base table. "1M" is calendar-month (variable
# length); everything else is a fixed-width tumbling bucket.
INTERVALS: dict[str, int | str] = {
    "1m": 60,
    "3m": 180,
    "5m": 300,
    "15m": 900,
    "30m": 1800,
    "1h": 3600,
    "2h": 7200,
    "4h": 14400,
    "6h": 21600,
    "8h": 28800,
    "12h": 43200,
    "1d": 86400,
    "3d": 259200,
    "1w": 604800,
    "1M": "month",
}

#: TimescaleDB/DuckDB ``time_bucket`` origin: 2000-01-03 00:00 UTC (a
#: Monday), so week/multi-day buckets start on Mondays. For any interval
#: that divides a day the origin is a multiple of it and this is
#: identical to a plain epoch floor.
BUCKET_ORIGIN = 946_857_600


def bucket_ts(ts: Column | str, interval_sec: int) -> Column:
    """Origin-aligned tumbling bucket start (``time_bucket`` equivalent).

    ``window(ts, iv).start`` gives the same result for day-divisor
    intervals; an arithmetic floor keeps the column a plain timestamp
    (joinable / oracle-comparable), stays inside whole-stage codegen,
    and the explicit origin makes 3d/1w buckets agree with TimescaleDB
    and DuckDB ``time_bucket`` (both anchor at 2000-01-03).
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    org = F.lit(BUCKET_ORIGIN)
    return F.timestamp_seconds(
        F.floor((c.cast("double") - org) / F.lit(interval_sec))
        * F.lit(interval_sec)
        + org
    )


def bucket_ts_any(ts: Column | str, interval: int | str) -> Column:
    """Bucket start for fixed-width (seconds) OR calendar intervals
    ("month" — TimescaleDB INTERVAL '1 month' semantics)."""
    if interval == "month":
        c = F.col(ts) if isinstance(ts, str) else ts
        return F.date_trunc("month", c)
    return bucket_ts(ts, int(interval))


def ohlcv_rollup(
    df: DataFrame,
    keys: list[str],
    ts: str,
    price: str,
    volume: Column | None = None,
    interval_sec: int = 300,
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """OHLCV candle rollup (SURVEY §2.4 A1).

    open = min_by(price, ts), close = max_by(price, ts) — exact
    ``first/last(x, t)`` ordered-aggregate semantics from the reference
    cagg definition; deterministic because ts is unique per key.
    """
    aggs = [
        F.min_by(price, ts).alias("open"),
        F.max(price).alias("high"),
        F.min(price).alias("low"),
        F.max_by(price, ts).alias("close"),
        F.count(F.lit(1)).alias("trade_count"),
    ]
    if volume is not None:
        aggs.append(F.sum(volume).alias("volume"))
    return (
        df.groupBy(*keys, bucket_ts(ts, interval_sec).alias(bucket_col))
        .agg(*aggs)
    )


def metrics_rollup(
    df: DataFrame,
    keys: list[str],
    ts: str,
    value: str,
    num: Column,
    den: Column,
    interval_sec: int = 3600,
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Metrics rollup (SURVEY §2.4 A2): ``last(value, ts)`` snapshot plus
    sum-weighted ratio ``sum(num)/nullif(sum(den),0)``.

    Reference: 007_metrics_cagg_from_5m.sql:92-107 and the weighted-ratio
    projection in 006_candles_meta_views.sql:58-63.
    """
    return (
        df.groupBy(*keys, bucket_ts(ts, interval_sec).alias(bucket_col))
        .agg(
            F.max_by(value, ts).alias("last_value"),
            F.sum(num).alias("num_sum"),
            F.sum(den).alias("den_sum"),
        )
        .withColumn(
            "weighted_ratio",
            F.col("num_sum") / F.nullif(F.col("den_sum"), F.lit(0)),
        )
    )


def cascade_rollup(
    finest: DataFrame,
    keys: list[str],
    from_interval_sec: int,
    to_interval_sec: int | str,
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Derive a coarser candle rollup from a finer one (5m → 1h → 1d,
    1d → 1M).

    At 100 TB this is the only sane shape: the raw table is aggregated
    once into the finest rollup and every coarser interval re-aggregates
    the (tiny) finer rollup, mirroring how the reference chains caggs off
    the 1m hypertable rather than rescanning raw. Calendar-month buckets
    ("month") accept any fine interval that divides a day — every day
    belongs to exactly one month, so the cascade is lossless.
    """
    if to_interval_sec == "month":
        if 86400 % from_interval_sec:
            raise ValueError("month cascade needs a day-divisor fine interval")
    elif int(to_interval_sec) % from_interval_sec:
        raise ValueError("coarse interval must be a multiple of the fine one")
    b = bucket_ts_any(bucket_col, to_interval_sec)
    agg = [
        F.min_by("open", bucket_col).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", bucket_col).alias("close"),
        F.sum("trade_count").alias("trade_count"),
    ]
    if "volume" in finest.columns:
        agg.append(F.sum("volume").alias("volume"))
    return finest.groupBy(*keys, b.alias(bucket_col)).agg(*agg)


def realtime_view(
    rollup: DataFrame,
    raw: DataFrame,
    keys: list[str],
    ts: str,
    price: str,
    interval_sec: int,
    refresh_horizon: Column,
    volume: Column | None = None,
) -> DataFrame:
    """Materialized-rollup ∪ fresh-tail view.

    Reference continuous aggregates run with ``materialized_only=false``:
    reads transparently union the materialized buckets with an on-the-fly
    aggregation of rows newer than the refresh watermark
    (004_continuous_aggregates.sql:49-58). ``refresh_horizon`` is that
    watermark (a timestamp Column); only the raw tail after it is
    re-aggregated, so the union's raw-side scan is partition-pruned.
    """
    # Bucket-align the watermark (TimescaleDB does the same): the stale
    # side serves whole buckets strictly before the horizon's bucket, and
    # the fresh side re-aggregates raw from that bucket BOUNDARY — not
    # from the horizon itself, which would drop the early rows of the
    # boundary bucket and emit a partial bar.
    boundary = bucket_ts(refresh_horizon, interval_sec)
    fresh = ohlcv_rollup(
        raw.filter(F.col(ts) >= boundary),
        keys, ts, price, volume, interval_sec,
    )
    stale = rollup.filter(F.col("bucket_ts") < boundary)
    return stale.unionByName(fresh, allowMissingColumns=True)
