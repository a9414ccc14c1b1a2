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


def state_partitions_for(n_keys: int) -> int:
    """State-store partition count for a streaming aggregation over
    ~``n_keys`` distinct groups — sized by STATE VOLUME, not core count
    (r15 verdict Next #5; guide §1.2 step 1).

    Mechanism, measured (tools/ profile, 600 symbols, one availableNow
    cycle, 3 reps each): every HDFSBackedStateStore instance pays a
    fixed per-commit cost (delta file create + fsync) on EVERY
    micro-batch — including the no-data watermark-finalize batch — so
    at low key counts the cycle time is linear in the store count, not
    the data: 32 state partitions = 3.04-3.23 s/cycle (summed
    commitTimeMs 8-23 s), 16 = 1.79-1.91 s, 8 = 1.73-2.06 s,
    4 = 1.23-1.33 s (commitTimeMs 0.16-0.22 s). The r14 scaling block
    saw exactly this shape from the outside: the rollup bench row ran
    FASTER at 8 cores than 32, because the session's core-derived
    ``spark.sql.shuffle.partitions`` created 4x the state stores.

    Sizing rule: ~50k keys per store. The HDFS-backed store holds its
    partition's state map in executor memory — 50k windowed-OHLCV rows
    is a few MB, far under task memory — while per-commit fixed costs
    amortize over real state. 10M keys → 200 partitions; the 2048 cap
    is a sanity bound (beyond it, per-store state is large enough that
    commit cost is data-dominated anyway and more stores stop paying);
    the floor of 4 keeps a minimum of commit parallelism.
    Throughput-bound deployments (few keys, very hot updates) should
    raise partitions toward their core count explicitly — for them the
    shuffle, not the store commit, is the cost.

    The count is consumed via ``spark.sql.shuffle.partitions`` AT THE
    STREAM'S FIRST START and pinned in the checkpoint thereafter
    (Structured Streaming's state layout contract), which is why
    ``streaming_ohlcv`` sets the conf eagerly: it must be in place
    before ``.start()``, and a restarted query keeps its original
    layout regardless of the session's later value."""
    return max(4, min(2048, -(-n_keys // 50_000)))


def streaming_ohlcv(
    stream: DataFrame,
    keys: list[str],
    ts: str,
    price: str,
    interval: str = "5 minutes",
    watermark: str = "1 minute",
    volume: Column | None = None,
    expected_keys: int | None = None,
) -> DataFrame:
    """Windowed OHLCV aggregation over an event stream.

    Same aggregate set as ``operators.rollup.ohlcv_rollup`` (A1); the
    window struct is flattened to ``bucket_ts`` so downstream consumers
    (meta joins, indicator engine) are stream/batch agnostic.

    ``expected_keys``: approximate distinct key count of the stream.
    When given, the SESSION's ``spark.sql.shuffle.partitions`` is set
    to ``state_partitions_for(expected_keys)`` so the state-store
    layout of the query started next tracks stream volume instead of
    the session's core-derived batch setting (see
    ``state_partitions_for`` for the measurements and the pin-at-
    first-start contract). This is a deliberate session-level side
    effect — the conf is the only OSS handle on state partition count;
    callers who interleave batch work should save/restore it around
    the stream start. Results are unaffected either way: the windowed
    aggregates are placement-independent.
    """
    if expected_keys is not None:
        stream.sparkSession.conf.set(
            "spark.sql.shuffle.partitions",
            str(state_partitions_for(expected_keys)),
        )
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
