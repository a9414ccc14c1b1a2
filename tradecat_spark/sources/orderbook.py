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


def snapshot_depth_stats(
    snaps: DataFrame,
    bids: str = "bids",
    asks: str = "asks",
    bands_pct: tuple[float, ...] = (1.0, 5.0),
    max_levels: int = 1000,
) -> DataFrame:
    """Full-depth snapshot stats over ARRAY-of-level columns.

    The reference's L2 row keeps the whole book in one row — up to 1000
    ``[price, qty]`` levels per side, best-first — and derives L1 fields
    plus per-band depth/notional/imbalance from it
    (order_book.py:120-240 ``_build_full_row`` + ``_compute_depth_stats``).
    Spark model: ``bids``/``asks`` are ``array<struct<price,qty>>``
    columns; every statistic is a higher-order function over the array
    (slice → filter → aggregate), so the whole computation is one
    JVM-side projection — no explode, no shuffle, no Python. A 1000-level
    book is ~16 KB of struct data per row; at 100 TB the stats live in
    the same map stage as the parquet scan.

    Depth sums are exact: qty accumulates as long (sizes are synthetic
    integers here; a real feed would use DECIMAL qty the same way),
    notional as DECIMAL(18,8) per level summed in DECIMAL(38,8) —
    associative, so bit-identical to the SQL oracle's SUM.
    Imbalance is the reference's (bid−ask)/(bid+ask) over the first
    band's depth, rounded via the exact int64 ``ratio6`` machinery.
    """
    from tradecat_spark.plans.exact import ratio6

    b = F.slice(F.col(bids), 1, max_levels)
    a = F.slice(F.col(asks), 1, max_levels)
    b1, a1 = F.element_at(b, 1), F.element_at(a, 1)
    mid = (b1["price"] + a1["price"]) / 2
    spread = a1["price"] - b1["price"]

    cols: list[Column] = [
        b1["price"].alias("bid1_price"), b1["qty"].alias("bid1_qty"),
        a1["price"].alias("ask1_price"), a1["qty"].alias("ask1_qty"),
        mid.alias("mid"),
        F.when(mid > 0, spread / mid * 10000).alias("spread_bps"),
    ]

    def _depth(side: Column, cond) -> Column:
        return F.aggregate(
            F.filter(side, cond), F.lit(0).cast("long"),
            lambda acc, x: acc + x["qty"].cast("long"),
        )

    def _notional(side: Column, cond) -> Column:
        # accumulator precision 28 keeps the add result within decimal's
        # 38-digit cap, so Spark never demotes the scale below 8 — the
        # sum stays exact and bit-identical to the oracle's DECIMAL SUM
        return F.aggregate(
            F.filter(side, cond), F.lit(0).cast("decimal(28,8)"),
            lambda acc, x: (
                acc + (x["price"] * x["qty"]).cast("decimal(18,8)")
            ).cast("decimal(28,8)"),
        ).cast("double")

    def _bid_in(th: Column):
        return lambda x: (mid - x["price"]) <= th

    def _ask_in(th: Column):
        return lambda x: (x["price"] - mid) <= th

    first_tag = ""
    for pct in bands_pct:
        th = mid * (pct / 100.0)
        bid_in, ask_in = _bid_in(th), _ask_in(th)
        tag = str(pct).rstrip("0").rstrip(".").replace(".", "_")
        first_tag = first_tag or tag
        cols += [
            _depth(b, bid_in).alias(f"bid_depth_{tag}pct"),
            _depth(a, ask_in).alias(f"ask_depth_{tag}pct"),
            _notional(b, bid_in).alias(f"bid_notional_{tag}pct"),
            _notional(a, ask_in).alias(f"ask_notional_{tag}pct"),
        ]
    # imbalance in a SECOND projection over the named depth columns —
    # referencing the aggregates inline would re-inline each array fold
    # several times into one giant expression (painful at 1000 levels)
    bd0 = F.col(f"bid_depth_{first_tag}pct")
    ad0 = F.col(f"ask_depth_{first_tag}pct")
    return snaps.select("*", *cols).withColumn(
        "imbalance", ratio6(bd0 - ad0, bd0 + ad0)
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
