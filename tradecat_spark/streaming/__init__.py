"""Structured Streaming layer (SURVEY.md §2.11, build-plan Phase 4).

The reference's streaming system is: WebSocket ingest with a 3 s flush
window → idempotent partial-bar upserts → NOTIFY-driven rollup refresh →
a 60 s signal loop holding prev/curr snapshot dicts and cooldown KV
state. Each piece maps to a first-class Structured Streaming construct:

- ingest.py  : micro-batch source → ``foreachBatch`` merge-upsert
               (trigger interval == the reference's flush window)
- rollup.py  : watermarked windowed OHLCV aggregation (continuous
               aggregates as a streaming query)
- signals.py : ``applyInPandasWithState`` — prev/curr comparison and
               per-(rule, key) cooldown as keyed state with timeouts
"""

from tradecat_spark.streaming.ingest import (
    read_store,
    start_candle_ingest,
    upsert_batch,
)
from tradecat_spark.streaming.rollup import streaming_ohlcv
from tradecat_spark.streaming.signals import streaming_signals

__all__ = [
    "read_store",
    "start_candle_ingest",
    "upsert_batch",
    "streaming_ohlcv",
    "streaming_signals",
]
