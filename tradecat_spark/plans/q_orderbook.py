"""Full-depth order-book snapshot queries (SURVEY.md §2.1 S12).

Reference: the L2 collector keeps the whole book in one row — up to
1000 ``[price, qty]`` levels per side — and derives percentage depth
bands, notionals, and imbalance from it per snapshot
(services-preview/markets-service/src/crypto/collectors/order_book.py:
120-240, ``_build_full_row`` + ``_compute_depth_stats``).

Spark model: ``array<struct<price,qty>>`` columns and higher-order
functions (``slice`` / ``filter`` / ``aggregate``), so the full-depth
statistics are one whole-stage-codegen projection per snapshot — no
explode, no shuffle, no Python. The synthetic book is deterministic
from the events table so the DuckDB oracle (per-level unnest form)
hash-matches bit-for-bit: prices/mid/spread are identical double
expression trees, depths accumulate as int64, notionals as
DECIMAL(18,8), imbalance via the exact int64 ratio machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.plans.exact import ratio6_sql
from tradecat_spark.plans.registry import query
from tradecat_spark.sources.orderbook import snapshot_depth_stats

N_LEVELS = 40  # synthetic book depth per side (1000 in the reference)


def synth_book(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic L2 snapshots from the event stream: one snapshot
    per sampled event row, N_LEVELS levels per side, best-first."""
    e = load_table(spark, sf_dir, "events")
    lvl = F.sequence(F.lit(1), F.lit(N_LEVELS))
    bids = F.transform(
        lvl,
        lambda i: F.struct(
            (F.col("value") * (F.lit(1.0) - F.lit(0.0021) * i)).alias("price"),
            ((F.col("event_id") + i) % 7 + 1).cast("double").alias("qty"),
        ),
    )
    asks = F.transform(
        lvl,
        lambda i: F.struct(
            (F.col("value") * (F.lit(1.0) + F.lit(0.0021) * i)).alias("price"),
            ((F.col("event_id") + i) % 5 + 1).cast("double").alias("qty"),
        ),
    )
    return (
        e.filter((F.col("value") > 0) & (F.col("event_id") % 17 == 0))
        .select(
            "event_type", "event_id",
            bids.alias("bids"), asks.alias("asks"),
        )
    )


_LEVELS_SQL = f"""
snaps AS (
  SELECT event_type, event_id, value FROM events
  WHERE value > 0 AND event_id % 17 = 0
),
lv AS (
  SELECT event_type, event_id, i,
    value * (CAST(1.0 AS DOUBLE) - CAST(0.0021 AS DOUBLE) * i) AS bid_price,
    CAST((event_id + i) % 7 + 1 AS DOUBLE) AS bid_qty,
    value * (CAST(1.0 AS DOUBLE) + CAST(0.0021 AS DOUBLE) * i) AS ask_price,
    CAST((event_id + i) % 5 + 1 AS DOUBLE) AS ask_qty,
    (value * (CAST(1.0 AS DOUBLE) - CAST(0.0021 AS DOUBLE))
     + value * (CAST(1.0 AS DOUBLE) + CAST(0.0021 AS DOUBLE))) / 2 AS mid
  FROM snaps, (SELECT unnest(range(1, {N_LEVELS + 1})) AS i) t
)"""


def _band_sql(side: str, pct: str, tag: str) -> str:
    diff = (
        f"mid - {side}_price" if side == "bid" else f"{side}_price - mid"
    )
    in_band = f"{diff} <= mid * CAST({pct} AS DOUBLE)"
    return (
        f"CAST(SUM(CASE WHEN {in_band} THEN CAST({side}_qty AS BIGINT)"
        f" ELSE 0 END) AS BIGINT) AS {side}_depth_{tag}pct,\n"
        f"  CAST(SUM(CASE WHEN {in_band} THEN"
        f" CAST({side}_price * {side}_qty AS DECIMAL(18,8))"
        f" ELSE CAST(0 AS DECIMAL(18,8)) END) AS DOUBLE)"
        f" AS {side}_notional_{tag}pct"
    )


@query(
    "orderbook_depth_bands",
    survey="§2.1 S12 full-depth snapshot: % depth bands + notional + "
    "imbalance per book (order_book.py:120-240)",
    description="Per-snapshot 1%/5% depth, notional, and imbalance over "
    "array-of-levels books",
    oracle=f"""
WITH {_LEVELS_SQL},
agg AS (
  SELECT
    event_type, event_id,
    MAX(mid) AS mid,
    (MAX(CASE WHEN i = 1 THEN ask_price END)
     - MAX(CASE WHEN i = 1 THEN bid_price END)) / MAX(mid) * 10000
      AS spread_bps,
    {_band_sql("bid", "0.01", "1")},
    {_band_sql("ask", "0.01", "1")},
    {_band_sql("bid", "0.05", "5")},
    {_band_sql("ask", "0.05", "5")}
  FROM lv GROUP BY event_type, event_id
)
SELECT
  event_type, event_id, mid, spread_bps,
  bid_depth_1pct, ask_depth_1pct, bid_notional_1pct, ask_notional_1pct,
  bid_depth_5pct, ask_depth_5pct, bid_notional_5pct, ask_notional_5pct,
  {ratio6_sql("bid_depth_1pct - ask_depth_1pct",
              "bid_depth_1pct + ask_depth_1pct")} AS imbalance
FROM agg
""",
)
def orderbook_depth_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole stats block is one projection over the array columns —
    at the reference's 1000-level depth this is the same plan, just
    wider arrays, still scan-stage-local."""
    stats = snapshot_depth_stats(synth_book(spark, sf_dir))
    return stats.select(
        "event_type", "event_id", "mid", "spread_bps",
        "bid_depth_1pct", "ask_depth_1pct",
        "bid_notional_1pct", "ask_notional_1pct",
        "bid_depth_5pct", "ask_depth_5pct",
        "bid_notional_5pct", "ask_notional_5pct",
        "imbalance",
    )


@query(
    "orderbook_depth_hourly",
    survey="§2.1 S12 + §2.4 A6: hourly rollup of full-depth band stats "
    "(03_raw_crypto.sql:391-460 shape over the L2 surface)",
    description="Hourly min/max/total depth-band profile per event_type",
    oracle=f"""
WITH {_LEVELS_SQL},
agg AS (
  SELECT
    event_type, event_id,
    {_band_sql("bid", "0.01", "1")},
    {_band_sql("ask", "0.01", "1")}
  FROM lv GROUP BY event_type, event_id
)
SELECT
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n_snapshots,
  MIN(bid_depth_1pct) AS min_bid_depth,
  MAX(bid_depth_1pct) AS max_bid_depth,
  CAST(SUM(bid_depth_1pct) AS BIGINT) AS total_bid_depth,
  MIN(ask_depth_1pct) AS min_ask_depth,
  MAX(ask_depth_1pct) AS max_ask_depth,
  CAST(SUM(ask_depth_1pct) AS BIGINT) AS total_ask_depth
FROM agg
GROUP BY event_type
""",
)
def orderbook_depth_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band depths are int64 at the snapshot level, so every rollup
    aggregate here is exact — the per-symbol liquidity profile the
    reference's hourly stats job materializes."""
    stats = snapshot_depth_stats(synth_book(spark, sf_dir))
    return stats.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_snapshots"),
        F.min("bid_depth_1pct").alias("min_bid_depth"),
        F.max("bid_depth_1pct").alias("max_bid_depth"),
        F.sum("bid_depth_1pct").alias("total_bid_depth"),
        F.min("ask_depth_1pct").alias("min_ask_depth"),
        F.max("ask_depth_1pct").alias("max_ask_depth"),
        F.sum("ask_depth_1pct").alias("total_ask_depth"),
    )
