"""Watermarked streaming OHLCV rollups — continuous aggregates as a
Structured Streaming query.

Reference: 14 TimescaleDB continuous aggregates refresh 1m candles into
coarser intervals on a 1-minute schedule with a 1-minute end offset
(004_continuous_aggregates.sql:24-81); late data beyond that is repaired
by the batch backfill loop.

Spark mapping: ``withWatermark`` is the end-offset analog — windows
finalize once event time passes window_end + watermark; later-than-
watermark rows are dropped by the stream and handled by the batch
reconciliation job (exactly the reference's division of labor,
SURVEY.md §2.11). ``min_by/max_by`` keep first/last(x, t) semantics in
one shuffle with partial aggregation, identical to the batch rollup —
the streaming and batch plans share aggregate expressions by
construction, so a backfill recompute bit-matches the stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_ohlcv(
    stream: DataFrame,
    keys: list[str],
    ts: str,
    price: str,
    interval: str = "5 minutes",
    watermark: str = "1 minute",
    volume: Column | None = None,
) -> DataFrame:
    """Windowed OHLCV aggregation over an event stream.

    Same aggregate set as ``operators.rollup.ohlcv_rollup`` (A1); the
    window struct is flattened to ``bucket_ts`` so downstream consumers
    (meta joins, indicator engine) are stream/batch agnostic.
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
        stream.withWatermark(ts, watermark)
        .groupBy(*keys, F.window(ts, interval).alias("w"))
        .agg(*aggs)
        .select(*keys, F.col("w.start").alias("bucket_ts"), *[
            c for c in ("open", "high", "low", "close", "trade_count")
        ] + (["volume"] if volume is not None else []))
    )
