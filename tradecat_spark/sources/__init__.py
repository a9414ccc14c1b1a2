"""Source adapters (SURVEY.md §2.1): batch backfill loaders and
projection layers that feed the bronze tables.

Network collectors (WebSocket S1, REST S4/S13) are deployment glue, not
engine work — their OUTPUT shapes are what the engine owns. Each module
here implements the normalization/merge path from one source family's
rows to bronze candles/ticks, testable without network.
"""

from tradecat_spark.sources.csv_backfill import (
    BINANCE_VISION_COLUMNS,
    load_vision_csv,
    backfill_merge,
)
from tradecat_spark.sources.orderbook import l1_projection, depth_bands

__all__ = [
    "BINANCE_VISION_COLUMNS",
    "load_vision_csv",
    "backfill_merge",
    "l1_projection",
    "depth_bands",
]
