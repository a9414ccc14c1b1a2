"""Streaming queries surfaced through the driver contract.

Each query here RUNS a Structured Streaming pipeline to completion
(availableNow trigger → memory sink) and returns the materialized
result, so the correctness gate hash-checks STREAMING output against
the batch DuckDB oracle — the stream/batch parity law as a graded
query rather than just a unit test.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.plans.registry import query
from tradecat_spark.streaming.rollup import streaming_ohlcv


@query(
    "streaming_rollup_5m",
    survey="§2.11 tumbling-window streaming agg with watermark "
    "(004 caggs as a readStream→writeStream pipeline); stream/batch "
    "parity — the oracle is the BATCH rollup",
    description="5m OHLCV rollup computed by Structured Streaming (availableNow)",
    oracle="""
SELECT
  event_type,
  strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S')
    AS bucket_ts,
  min_by(value, ts) AS open,
  MAX(value) AS high,
  MIN(value) AS low,
  max_by(value, ts) AS close,
  CAST(COUNT(*) AS BIGINT) AS trade_count
FROM events
GROUP BY 1, 2
""",
)
def streaming_rollup_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → file stream → watermarked windowed agg → memory sink.

    The file source sees one committed parquet snapshot, so availableNow
    drains it in one pass; update-mode output then holds exactly the
    final aggregate per (key, window) — which must equal the batch
    rollup (and does, because the aggregate expressions are shared with
    operators/rollup.py). Late-data semantics are exercised in
    tests/test_streaming.py; here the watermark is inert by design."""
    # materialize the (ns-normalized) events as a streamable source dir
    src = tempfile.mkdtemp(prefix="tc_stream_src_")
    ckpt = tempfile.mkdtemp(prefix="tc_stream_ckpt_")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    e.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    rolled = streaming_ohlcv(
        stream, ["event_type"], "ts", "value",
        interval="5 minutes", watermark="1 minute",
    )
    name = f"tc_stream_{uuid.uuid4().hex[:10]}"
    q = (
        rolled.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    out = spark.table(name)
    # update-mode can emit a group more than once if the source split
    # into several micro-batches; keep the final (complete) row per key
    final = out.groupBy("event_type", "bucket_ts").agg(
        F.max_by(
            F.struct("open", "high", "low", "close", "trade_count"),
            "trade_count",
        ).alias("r")
    )
    return final.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.col("r.open").alias("open"),
        F.col("r.high").alias("high"),
        F.col("r.low").alias("low"),
        F.col("r.close").alias("close"),
        F.col("r.trade_count").alias("trade_count"),
    )
