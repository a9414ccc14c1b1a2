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


@query(
    "streaming_signals_parity",
    survey="§2.10/§2.11 stateful signal engine (applyInPandasWithState "
    "prev/curr baseline, engines/sqlite_engine.py:215-333) — firings "
    "hash-checked against the lag-based SQL form",
    description="Stochastic %K<20 cross-down firings from the STREAMING engine",
    oracle="""
WITH bars AS (
  SELECT
    event_type,
    time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
    MAX(value) AS high, MIN(value) AS low, max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
k AS (
  SELECT
    event_type, bucket_ts,
    ROUND((close - MIN(low) OVER w)
          / NULLIF(MAX(high) OVER w - MIN(low) OVER w, 0) * 100, 6) AS pct_k
  FROM bars
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
),
lagged AS (
  SELECT event_type, bucket_ts, pct_k,
         LAG(pct_k) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS prev_k
  FROM k
)
SELECT
  event_type,
  strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS fired_at,
  'stoch_oversold' AS rule,
  'long' AS direction
FROM lagged WHERE prev_k >= 20 AND pct_k < 20
""",
)
def streaming_signals_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshots (1h stochastic %K per event_type) are precomputed in
    batch, then REPLAYED through the stateful streaming engine
    (applyInPandasWithState holding the prev-snapshot baseline). With no
    cooldown, every prev/curr transition is SQL-expressible, so DuckDB's
    lag() form is the oracle — the keyed-state machinery itself is what
    is being graded."""
    from pyspark.sql import Window

    from tradecat_spark.operators.rollup import ohlcv_rollup
    from tradecat_spark.signals.rules import ConditionType, SignalRule
    from tradecat_spark.streaming.signals import streaming_signals

    e = load_table(spark, sf_dir, "events")
    bars = ohlcv_rollup(e, ["event_type"], "ts", "value", interval_sec=3600)
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-13, 0)
    )
    pct_k = F.round(
        (F.col("close") - F.min("low").over(w))
        / F.nullif(F.max("high").over(w) - F.min("low").over(w), F.lit(0))
        * 100,
        6,
    )
    snaps = bars.select(
        "event_type", F.col("bucket_ts").alias("snap_ts"), pct_k.alias("pct_k")
    )
    src = tempfile.mkdtemp(prefix="tc_sig_src_")
    ckpt = tempfile.mkdtemp(prefix="tc_sig_ckpt_")
    snaps.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    rule = SignalRule(
        "stoch_oversold", "k", ConditionType.THRESHOLD_CROSS_DOWN,
        {"field": "pct_k", "threshold": 20.0}, direction="long",
    )
    fired = streaming_signals(stream, [rule], ["event_type"], "snap_ts")
    name = f"tc_sig_{uuid.uuid4().hex[:10]}"
    q = (
        fired.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    return spark.table(name).select(
        "event_type",
        F.date_format("fired_at", "yyyy-MM-dd HH:mm:ss").alias("fired_at"),
        "rule", "direction",
    )


def _pk_scan(src: str, alpha: float) -> str:
    """O(n) append-scan of pandas' ewm kernel step — the incremental
    engine's exact arithmetic ((1-a)*prev + a*x) / ((1-a) + a), whose
    trailing division is NOT a float no-op (streaming/incremental.py
    _ewm_step)."""
    # string->double casts: a bare decimal literal parses through
    # DECIMAL first, which does NOT round-trip every repr()'d double
    # (e.g. 2/13); CAST('<repr>' AS DOUBLE) is correctly rounded.
    a, ow = f"CAST('{alpha!r}' AS DOUBLE)", f"CAST('{1.0 - alpha!r}' AS DOUBLE)"
    return (
        f"list_reduce(list_transform({src}, v -> [v]), "
        f"(acc, x) -> list_append(acc, "
        f"({ow} * acc[-1] + {a} * x[1])"
        f" / ({ow} + {a})))"
    )


@query(
    "streaming_macd_parity",
    survey="§2.11 keyed-state incremental family (incremental/macd.py "
    "as streaming/incremental.py FoldSpec): per-bar registers from the "
    "REAL applyInPandasWithState stream, hash-checked against the "
    "pandas-kernel fold law",
    description="Per-bar MACD registers from the streaming keyed-state engine",
    oracle=f"""
WITH bars AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
    max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
    list(b ORDER BY b) AS bs,
    list(close ORDER BY b) AS cl
  FROM bars GROUP BY event_type
),
f AS (
  SELECT event_type, bs, cl,
    {_pk_scan("cl", 2.0 / 13.0)} AS efs,
    {_pk_scan("cl", 2.0 / 27.0)} AS ess
  FROM s
),
g AS (
  SELECT *,
    list_transform(range(1, len(cl) + 1), i -> efs[i] - ess[i]) AS mac
  FROM f
),
h AS (SELECT *, {_pk_scan("mac", 2.0 / 10.0)} AS sigs FROM g),
rows_ AS (
  SELECT event_type,
    unnest(bs) AS b, unnest(cl) AS close,
    unnest(efs) AS ema_fast, unnest(ess) AS ema_slow,
    unnest(mac) AS macd, unnest(sigs) AS signal_line
  FROM h
)
SELECT event_type,
  strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  close, ema_fast, ema_slow, macd, signal_line,
  macd - signal_line AS hist
FROM rows_
""",
)
def streaming_macd_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h bars → file stream → applyInPandasWithState MACD fold →
    memory sink. Every bar's registers are emitted exactly once
    (append mode), and the keyed state carries bit-identically across
    however many micro-batches availableNow slices the source into —
    so the streamed series must hash-equal the batch fold law."""
    from tradecat_spark.streaming.incremental import streaming_macd

    src = tempfile.mkdtemp(prefix="tc_macd_src_")
    ckpt = tempfile.mkdtemp(prefix="tc_macd_ckpt_")
    e = load_table(spark, sf_dir, "events")
    bars = (
        e.groupBy(
            "event_type",
            F.timestamp_seconds(
                (F.col("ts").cast("long") / 3600).cast("long") * 3600
            ).alias("bucket_ts"),
        )
        .agg(F.max_by("value", "ts").alias("close"))
    )
    bars.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_macd(
        stream, ["event_type"], "bucket_ts", "close"
    )
    name = f"tc_macd_{uuid.uuid4().hex[:10]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    r = spark.table(name)
    return r.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "close", "ema_fast", "ema_slow", "macd", "signal_line", "hist",
    )


def _atr_alpha() -> float:
    from tradecat_spark.streaming.incremental import _pandas_alpha

    return _pandas_alpha(1.0 / 14.0)


@query(
    "streaming_atr_parity",
    survey="§2.11 keyed-state incremental family (incremental/atr.py as "
    "streaming/incremental.py AtrSpec): per-bar Wilder ATR from the "
    "REAL stream — exercises the pandas alpha round-trip "
    "(com normalization shifts 1/14 by one ulp) and min_periods "
    "masking",
    description="Per-bar streaming ATR(14) registers, mature rows only",
    oracle=f"""
WITH bars AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
    MAX(value) AS high, MIN(value) AS low, max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
    list(b ORDER BY b) AS bs,
    list(high ORDER BY b) AS hi,
    list(low ORDER BY b) AS lo,
    list(close ORDER BY b) AS cl
  FROM bars GROUP BY event_type
),
t AS (
  SELECT event_type, bs,
    list_transform(range(1, len(cl) + 1), k ->
      CASE WHEN k = 1 THEN hi[1] - lo[1]
           ELSE greatest(hi[k] - lo[k], abs(hi[k] - cl[k - 1]),
                         abs(lo[k] - cl[k - 1])) END) AS trs
  FROM s
),
f AS (
  SELECT event_type, bs, trs,
    list_reduce(list_transform(trs, v -> [v]),
      (acc, x) -> list_append(acc,
        (CAST('{1.0 - _atr_alpha()!r}' AS DOUBLE) * acc[-1]
         + CAST('{_atr_alpha()!r}' AS DOUBLE) * x[1])
        / (CAST('{1.0 - _atr_alpha()!r}' AS DOUBLE)
           + CAST('{_atr_alpha()!r}' AS DOUBLE)))) AS atrs
  FROM t
),
rows_ AS (
  SELECT event_type,
    unnest(range(1, len(trs) + 1)) AS rn,
    unnest(bs) AS b, unnest(trs) AS tr, unnest(atrs) AS atr
  FROM f
)
SELECT event_type,
  strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  tr, atr
FROM rows_ WHERE rn >= 14
""",
)
def streaming_atr_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h OHLC bars → file stream → AtrSpec keyed-state fold → memory
    sink, mature rows only (the spec masks ATR with NaN until the
    Wilder period is seeded — the query filters to the mature region so
    the gate compares pure register values)."""
    from tradecat_spark.streaming.incremental import AtrSpec, streaming_fold

    src = tempfile.mkdtemp(prefix="tc_atr_src_")
    ckpt = tempfile.mkdtemp(prefix="tc_atr_ckpt_")
    e = load_table(spark, sf_dir, "events")
    bars = (
        e.groupBy(
            "event_type",
            F.timestamp_seconds(
                (F.col("ts").cast("long") / 3600).cast("long") * 3600
            ).alias("bucket_ts"),
        )
        .agg(
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
        )
    )
    bars.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_fold(stream, ["event_type"], "bucket_ts", AtrSpec())
    name = f"tc_atr_{uuid.uuid4().hex[:10]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    r = spark.table(name)
    # the immature-row mask may arrive as NaN or as NULL depending on
    # the Arrow round-trip; both mean "not yet seeded"
    return r.filter(F.col("atr").isNotNull() & ~F.isnan("atr")).select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "tr", "atr",
    )
