"""Streaming candle ingest: micro-batch source → idempotent merge-upsert.

Reference S1/S2/S3: the WebSocket collector buffers 1m candle updates in
a 3 s window (max 1000 rows) and flushes them through a COPY + ``ON
CONFLICT DO UPDATE`` upsert whose conflict action implements the
partial-bar merge law (ws.py:30-114, timescale.py:53-125,
001_timescaledb.sql:106-119).

Spark-first: the buffer window IS the trigger interval; the upsert is a
``foreachBatch`` that applies ``operators.merge.merge_candles`` against
the bronze store. On a lakehouse the body of ``upsert_batch`` is one
``DeltaTable.merge()``; the parquet fallback below rewrites the store
(fine for a bounded serving tail, and what the retention policy keeps it
as). Idempotency: the merge law is associative/commutative-enough that
replaying a micro-batch converges to the same bar — the exactly-once
story the reference gets from ON CONFLICT.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tradecat_spark.operators.merge import MERGE_COLS, merge_candles


def upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    keys: list[str],
) -> None:
    """Merge one micro-batch of (possibly partial) bars into the store.

    Batch-local dedupe first (latest write per key wins within the
    batch), then the partial-bar merge law against the existing store.
    """
    batch = batch.select(*keys, *MERGE_COLS)
    if os.path.exists(store_path):
        target = spark.read.parquet(store_path)
        merged = merge_candles(target, batch, keys)
    else:
        merged = batch
    # materialize before overwriting the path we just read
    pdf = merged.toPandas()
    out = spark.createDataFrame(pdf, merged.schema)
    out.write.mode("overwrite").parquet(store_path)


def start_candle_ingest(
    stream: DataFrame,
    store_path: str,
    keys: list[str],
    checkpoint: str,
    trigger_sec: int = 3,
    available_now: bool = False,
):
    """Start the ingest query: 3 s trigger == the reference flush window.

    ``stream`` must already be shaped as key + MERGE_COLS rows (use
    ``candles_from_events`` or a source adapter).
    """
    spark = stream.sparkSession

    def _sink(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        upsert_batch(spark, batch, store_path, keys)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_sec} seconds")
    return writer.start()
