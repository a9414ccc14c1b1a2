"""Order-book projections (SURVEY.md §2.1 S12, preview schema).

Reference: the L1 collector derives spread_bps / mid / imbalance / 1%
depth from each tick before writing raw.crypto_order_book_tick
(order_book.py:120-240); hourly stats roll up with AVG/MAX/PERCENTILE/
STDDEV (03_raw_crypto.sql:391-460 → covered by stats_profile_by_type).

All derived columns are plain projections — they run inside whole-stage
codegen at ingest (or as a view over the raw table), never in Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def l1_projection(ticks: DataFrame,
                  bid: str = "bid_price", ask: str = "ask_price",
                  bid_qty: str = "bid_qty", ask_qty: str = "ask_qty") -> DataFrame:
    """Tick rows → L1 metrics (order_book.py:141-166 equivalents):

    mid, spread, spread_bps, imbalance = (bq-aq)/(bq+aq), microprice.
    """
    b, a = F.col(bid), F.col(ask)
    bq, aq = F.col(bid_qty), F.col(ask_qty)
    mid = (b + a) / 2
    spread = a - b
    return ticks.select(
        "*",
        mid.alias("mid"),
        spread.alias("spread"),
        F.when(mid > 0, spread / mid * 10000).alias("spread_bps"),
        F.when(bq + aq > 0, (bq - aq) / (bq + aq)).alias("imbalance"),
        F.when(bq + aq > 0, (a * bq + b * aq) / (bq + aq)).alias("microprice"),
    )


def depth_bands(levels: DataFrame, mid_col: str = "mid",
                price: str = "price", qty: str = "qty",
                side: str = "side",
                bands_pct: tuple[float, ...] = (0.5, 1.0, 2.0)) -> DataFrame:
    """Full-snapshot depth aggregation: quote volume within ±x% of mid
    per side (order_book.py:180-240's percentage depth bands).

    One conditional-sum aggregate per band — a single pass over the
    levels, grouped by snapshot key columns (everything except
    price/qty/side)."""
    keys = [c for c in levels.columns if c not in (price, qty, side)]
    aggs: list[Column] = []
    for pct in bands_pct:
        lo = F.col(mid_col) * (1 - pct / 100)
        hi = F.col(mid_col) * (1 + pct / 100)
        in_band = F.col(price).between(lo, hi)
        tag = str(pct).replace(".", "_")
        aggs.append(
            F.sum(
                F.when(in_band & (F.col(side) == "bid"), F.col(qty)).otherwise(0.0)
            ).alias(f"bid_depth_{tag}pct")
        )
        aggs.append(
            F.sum(
                F.when(in_band & (F.col(side) == "ask"), F.col(qty)).otherwise(0.0)
            ).alias(f"ask_depth_{tag}pct")
        )
    return levels.groupBy(*keys).agg(*aggs)
