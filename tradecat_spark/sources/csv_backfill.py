"""Historical backfill from archive CSVs (SURVEY.md §2.1 S7).

Reference: the ZIP backfiller downloads Binance Vision daily archives,
parses the 12-column kline CSV, and upserts through the partial-bar
merge law (collectors/backfill.py:306-460); a re-scan loop repairs any
gaps the merge didn't close (:133-189).

Spark-first: ``spark.read.csv`` with an explicit schema over however
many files exist (a directory of dailies reads as ONE distributed scan —
the reference's per-file loop disappears), normalize to the bronze
candle schema, then merge. At 100 TB the CSV scan parallelizes by file
and the merge co-partitions with the bucketed bronze table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from tradecat_spark.operators.merge import merge_candles

#: Binance Vision kline CSV layout (backfill.py:370-392, headerless)
BINANCE_VISION_COLUMNS = [
    "open_time_ms", "open", "high", "low", "close", "volume",
    "close_time_ms", "quote_volume", "trade_count",
    "taker_buy_volume", "taker_buy_quote_volume", "unused",
]

_SCHEMA = StructType(
    [
        StructField("open_time_ms", LongType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("volume", DoubleType()),
        StructField("close_time_ms", LongType()),
        StructField("quote_volume", DoubleType()),
        StructField("trade_count", LongType()),
        StructField("taker_buy_volume", DoubleType()),
        StructField("taker_buy_quote_volume", DoubleType()),
        StructField("unused", DoubleType()),
    ]
)


def load_vision_csv(
    spark: SparkSession, path: str, symbol: str, exchange: str = "binance"
) -> DataFrame:
    """Parse archive CSV(s) into bronze candle rows.

    Historical archives are CLOSED bars by definition (is_closed=true);
    alignment is enforced at parse time exactly like the hypertable
    CHECK constraint (001_timescaledb.sql:26)."""
    raw = spark.read.csv(path, schema=_SCHEMA, header=False)
    return raw.select(
        F.lit(exchange).alias("exchange"),
        F.lit(symbol).alias("symbol"),
        F.date_trunc("minute", F.timestamp_millis("open_time_ms")).alias(
            "bucket_ts"
        ),
        "open", "high", "low", "close", "volume", "quote_volume",
        "trade_count", "taker_buy_volume", "taker_buy_quote_volume",
        F.lit(True).alias("is_closed"),
    )


def backfill_merge(
    spark: SparkSession,
    store_path: str,
    incoming: DataFrame,
    keys: list[str] = ("exchange", "symbol", "bucket_ts"),
) -> DataFrame:
    """Merge backfilled bars into the bronze store (idempotent: replays
    converge under the merge law). Returns the merged frame; the caller
    writes it (Delta MERGE on a lakehouse, overwrite here)."""
    import os

    keys = list(keys)
    if os.path.exists(store_path):
        target = spark.read.parquet(store_path)
        return merge_candles(target, incoming, keys)
    return incoming.select(
        *keys, "open", "high", "low", "close", "trade_count", "is_closed"
    )
