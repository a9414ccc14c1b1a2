"""Upsert / partial-bar merge semantics.

Reference S2/S3: ingest upserts candles with ``INSERT ... ON CONFLICT DO
UPDATE`` where the conflict action preserves the open of an already-closed
bar, takes GREATEST(high), LEAST(low), the incoming close, OR's is_closed,
and COALESCEs optional fields
(/root/reference/libs/database/db/schema/001_timescaledb.sql:106-119).

Spark-first design: expressed as a batch merge over two DataFrames — the
exact relational form a Delta ``MERGE INTO`` WHEN MATCHED clause would
use; on a lakehouse deployment this function's expressions drop verbatim
into ``DeltaTable.merge().whenMatchedUpdate(set=...)``. The full-outer
join is key-equi and shuffle-partitioned on the merge key, so at 100 TB
it co-partitions with a bucketed target table and never widens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Candle payload columns the merge law applies to.
MERGE_COLS = ("open", "high", "low", "close", "trade_count", "is_closed")


def merge_candles(
    target: DataFrame, source: DataFrame, keys: list[str]
) -> DataFrame:
    """Merge incoming (possibly partial) bars into existing bars.

    Law (001_timescaledb.sql:106-119):
      open       : keep target.open if the target bar is already closed,
                   else take source.open
      high/low   : greatest / least
      close      : source wins (most recent write)
      counts     : greatest (monotone counters)
      is_closed  : OR
    Unmatched rows pass through from either side.
    """
    t = target.select(*keys, *MERGE_COLS).alias("t")
    s = source.select(*keys, *MERGE_COLS).alias("s")
    j = t.join(s, keys, "full_outer")

    tc, sc = (lambda c: F.col(f"t.{c}")), (lambda c: F.col(f"s.{c}"))
    both = tc("open").isNotNull() & sc("open").isNotNull()

    def pick(col: str, merged):
        return (
            F.when(both, merged)
            .when(tc(col).isNotNull(), tc(col))
            .otherwise(sc(col))
            .alias(col)
        )

    return j.select(
        *keys,
        pick("open", F.when(tc("is_closed"), tc("open")).otherwise(sc("open"))),
        pick("high", F.greatest(tc("high"), sc("high"))),
        pick("low", F.least(tc("low"), sc("low"))),
        pick("close", sc("close")),
        pick("trade_count", F.greatest(tc("trade_count"), sc("trade_count"))),
        pick("is_closed", tc("is_closed") | sc("is_closed")),
    )
