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
    from tradecat_spark.streaming.incremental import MacdSpec

    bars = _hour_bars(spark, sf_dir, close=F.max_by("value", "ts"))
    r = _run_fold(spark, bars, ["event_type"], "bucket_ts", MacdSpec())
    return r.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "close", "ema_fast", "ema_slow", "macd", "signal_line", "hist",
    )


def _atr_alpha() -> float:
    from tradecat_spark.streaming.incremental import _pandas_alpha

    return _pandas_alpha(1.0 / 14.0)


def _run_fold(spark: SparkSession, bars: DataFrame, keys: list[str],
              ts: str, spec) -> DataFrame:
    """Materialize ``bars`` as a file-stream source, fold ``spec``'s
    keyed-state recurrence over it (availableNow → memory sink), and
    return the materialized per-bar registers."""
    from tradecat_spark.streaming.incremental import streaming_fold

    src = tempfile.mkdtemp(prefix="tc_fold_src_")
    ckpt = tempfile.mkdtemp(prefix="tc_fold_ckpt_")
    bars.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_fold(stream, keys, ts, spec)
    name = f"tc_fold_{uuid.uuid4().hex[:10]}"
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
    return spark.table(name)


def _hour_bars(spark: SparkSession, sf_dir: str, **aggs) -> DataFrame:
    """events → 1h bars keyed by event_type (shared source for the
    streaming fold parity family)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "event_type",
        F.timestamp_seconds(
            (F.col("ts").cast("long") / 3600).cast("long") * 3600
        ).alias("bucket_ts"),
    ).agg(*(expr.alias(n) for n, expr in aggs.items()))


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
    from tradecat_spark.streaming.incremental import AtrSpec

    bars = _hour_bars(
        spark, sf_dir,
        high=F.max("value"), low=F.min("value"),
        close=F.max_by("value", "ts"),
    )
    r = _run_fold(spark, bars, ["event_type"], "bucket_ts", AtrSpec())
    # the immature-row mask may arrive as NaN or as NULL depending on
    # the Arrow round-trip; both mean "not yet seeded"
    return r.filter(F.col("atr").isNotNull() & ~F.isnan("atr")).select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "tr", "atr",
    )


@query(
    "streaming_emagc_parity",
    survey="§2.11 keyed-state incremental family (incremental/ema_gc.py"
    ":9-59 as streaming/incremental.py EmaGcSpec): per-bar EMA7/25/99 "
    "trend registers from the REAL applyInPandasWithState stream, "
    "hash-checked against the pandas-kernel fold law",
    description="Per-bar streaming EMA7/25/99 registers (golden-cross family)",
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
    {_pk_scan("cl", 2.0 / 8.0)} AS e7,
    {_pk_scan("cl", 2.0 / 26.0)} AS e25,
    {_pk_scan("cl", 2.0 / 100.0)} AS e99
  FROM s
),
rows_ AS (
  SELECT event_type,
    unnest(bs) AS b, unnest(cl) AS close,
    unnest(e7) AS ema7, unnest(e25) AS ema25, unnest(e99) AS ema99
  FROM f
)
SELECT event_type,
  strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  close, ema7, ema25, ema99
FROM rows_
""",
)
def streaming_emagc_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h close bars → file stream → EmaGcSpec keyed-state fold →
    memory sink. Span-derived alphas (2/(n+1)) round-trip pandas' com
    normalization exactly, so no alpha correction is needed — the
    streamed registers must hash-equal the batch ewm(adjust=False)
    fold bit-for-bit."""
    from tradecat_spark.streaming.incremental import EmaGcSpec

    bars = _hour_bars(spark, sf_dir, close=F.max_by("value", "ts"))
    r = _run_fold(spark, bars, ["event_type"], "bucket_ts", EmaGcSpec())
    return r.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "close", "ema7", "ema25", "ema99",
    )


def _kdj_alpha() -> float:
    from tradecat_spark.streaming.incremental import _pandas_alpha

    return _pandas_alpha(1.0 / 3.0)


@query(
    "streaming_kdj_parity",
    survey="§2.11 keyed-state incremental family (incremental/kdj.py"
    ":6-14 as streaming/incremental.py KdjSpec): 9-bar RSV ring buffer "
    "+ double 1/3-EWM with pandas min_periods masking, from the REAL "
    "stream — the D line folds the MASKED K series, so the oracle "
    "folds the emitted-k sublist",
    description="Per-bar streaming KDJ registers, mature rows only",
    oracle=f"""
WITH bars AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
    MAX(value) AS high, MIN(value) AS low, max_by(value, ts) AS close
  FROM events GROUP BY 1, 2
),
rsvd AS (
  SELECT event_type, b,
    CASE WHEN ROW_NUMBER() OVER wseq >= 9
          AND MAX(high) OVER w9 - MIN(low) OVER w9 <> 0
      THEN (close - MIN(low) OVER w9)
           / (MAX(high) OVER w9 - MIN(low) OVER w9) * 100
      ELSE NULL END AS rsv
  FROM bars
  WINDOW wseq AS (PARTITION BY event_type ORDER BY b),
         w9 AS (PARTITION BY event_type ORDER BY b
                ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT event_type,
    list(b ORDER BY b) FILTER (rsv IS NOT NULL) AS bs,
    list(rsv ORDER BY b) FILTER (rsv IS NOT NULL) AS rs
  FROM rsvd GROUP BY event_type
),
-- guards: list_reduce crashes on an empty list. A key with < 9 bars
-- has NO non-NULL RSVs (empty rs); one with < 3 non-NULL RSVs has an
-- empty ks[3:]. Such keys emit no rows on either engine (the i >= 5
-- filter), so empty scan arrays are the correct stand-in.
k AS (SELECT event_type, bs, rs, CASE WHEN len(rs) >= 1
        THEN {_pk_scan("rs", _kdj_alpha())}
        ELSE CAST([] AS DOUBLE[]) END AS ks FROM s),
d AS (SELECT *, CASE WHEN len(ks) >= 3
        THEN {_pk_scan("ks[3:]", _kdj_alpha())}
        ELSE CAST([] AS DOUBLE[]) END AS ds FROM k),
rows_ AS (
  SELECT event_type, ds,
    unnest(range(1, len(rs) + 1)) AS i,
    unnest(bs) AS b, unnest(rs) AS rsv, unnest(ks) AS kk
  FROM d
)
SELECT event_type,
  strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  rsv, kk AS kdj_k, ds[i - 2] AS kdj_d,
  3.0 * kk - 2.0 * ds[i - 2] AS kdj_j
FROM rows_ WHERE i >= 5
""",
)
def streaming_kdj_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h OHLC bars → file stream → KdjSpec keyed-state fold → memory
    sink, mature rows only. The masking law is the subtle part: K is
    emitted from the 3rd non-NaN RSV on, D folds ONLY the emitted K
    values and is itself masked for 3 more — the oracle mirrors this by
    filtering NULL RSVs out, scanning, then scanning the ks[3:]
    sublist, so row i's D register is ds[i-2] (valid from i=5)."""
    from tradecat_spark.streaming.incremental import KdjSpec

    bars = _hour_bars(
        spark, sf_dir,
        high=F.max("value"), low=F.min("value"),
        close=F.max_by("value", "ts"),
    )
    r = _run_fold(spark, bars, ["event_type"], "bucket_ts", KdjSpec())
    return r.filter(
        F.col("kdj_d").isNotNull() & ~F.isnan("kdj_d")
    ).select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "rsv", "kdj_k", "kdj_d", "kdj_j",
    )


@query(
    "streaming_obv_parity",
    survey="§2.11 keyed-state incremental family (incremental/obv.py"
    ":9-22 as streaming/incremental.py ObvSpec): signed-volume cumsum "
    "register from the REAL stream; volume is the DECIMAL-summed "
    "abs(value) proxy so bar construction is order-independent on "
    "both engines",
    description="Per-bar streaming OBV register (signed-volume cumsum)",
    oracle="""
WITH bars AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
    max_by(value, ts) AS close,
    CAST(SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS DOUBLE) AS volume
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
    list(b ORDER BY b) AS bs,
    list(close ORDER BY b) AS cl,
    list(volume ORDER BY b) AS vl
  FROM bars GROUP BY event_type
),
dl AS (
  SELECT event_type, bs,
    list_transform(range(1, len(cl) + 1), i ->
      CASE WHEN i = 1 THEN 0.0
           WHEN cl[i] > cl[i - 1] THEN vl[i]
           WHEN cl[i] < cl[i - 1] THEN -vl[i]
           ELSE 0.0 END) AS deltas
  FROM s
),
f AS (
  SELECT event_type, bs,
    list_reduce(list_transform(deltas, v -> [v]),
      (acc, x) -> list_append(acc, acc[-1] + x[1])) AS obvs
  FROM dl
),
rows_ AS (
  SELECT event_type, unnest(bs) AS b, unnest(obvs) AS obv FROM f
)
SELECT event_type,
  strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  obv
FROM rows_
""",
)
def streaming_obv_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h (close, volume) bars → file stream → ObvSpec keyed-state
    cumsum → memory sink. The prefix sum is a strictly sequential
    left fold on both engines (list scan in DuckDB, per-key state in
    the stream), so float association never differs."""
    from tradecat_spark.streaming.incremental import ObvSpec

    bars = _hour_bars(
        spark, sf_dir,
        close=F.max_by("value", "ts"),
        volume=F.sum(F.abs(F.col("value")).cast("decimal(18,8)"))
        .cast("double"),
    )
    r = _run_fold(spark, bars, ["event_type"], "bucket_ts", ObvSpec())
    return r.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "obv",
    )


@query(
    "streaming_cvd_parity",
    survey="§2.11 keyed-state incremental family (incremental/cvd.py"
    ":6-24 as streaming/incremental.py CvdSpec): taker-delta cumsum "
    "register from the REAL stream; taker buy volume uses the bar-shape "
    "proxy (close>=open ⇒ all-buy) shared with the chart CVD template",
    description="Per-bar streaming CVD register (taker-delta cumsum)",
    oracle="""
WITH bars AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
    min_by(value, ts) AS open,
    max_by(value, ts) AS close,
    CAST(SUM(CAST(ABS(value) AS DECIMAL(18,8))) AS DOUBLE) AS volume
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
    list(b ORDER BY b) AS bs,
    list(CASE WHEN close >= open THEN volume ELSE -volume END
         ORDER BY b) AS deltas
  FROM bars GROUP BY event_type
),
f AS (
  SELECT event_type, bs, deltas,
    list_reduce(list_transform(deltas, v -> [v]),
      (acc, x) -> list_append(acc, acc[-1] + x[1])) AS cvds
  FROM s
),
rows_ AS (
  SELECT event_type,
    unnest(bs) AS b, unnest(deltas) AS delta, unnest(cvds) AS cvd
  FROM f
)
SELECT event_type,
  strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
  delta, cvd
FROM rows_
""",
)
def streaming_cvd_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h bars with the bar-shape taker proxy → file stream → CvdSpec
    keyed-state cumsum → memory sink. An up bar's volume is all taker
    buy (delta = +vol, bitwise: vol - max(vol-vol, 0) = vol - 0.0),
    a down bar's all taker sell (delta = 0.0 - vol = -vol), so the
    spec's buy/sell arithmetic reproduces the oracle's signed volume
    exactly."""
    from tradecat_spark.streaming.incremental import CvdSpec

    bars = _hour_bars(
        spark, sf_dir,
        open=F.min_by("value", "ts"),
        close=F.max_by("value", "ts"),
        volume=F.sum(F.abs(F.col("value")).cast("decimal(18,8)"))
        .cast("double"),
    )
    bars = bars.withColumn(
        "taker_buy_volume",
        F.when(F.col("close") >= F.col("open"), F.col("volume"))
        .otherwise(F.lit(0.0)),
    ).drop("open", "close")
    r = _run_fold(spark, bars, ["event_type"], "bucket_ts", CvdSpec())
    return r.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        "delta", "cvd",
    )


@query(
    "streaming_dedup_ingest",
    survey="§2.11-adjacent: at-least-once ingest deduplication — "
    "dropDuplicatesWithinWatermark over a doubled source (every event "
    "delivered twice), hash-checked against the batch distinct law",
    description="Exactly-once event counts from a duplicated stream",
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
""",
)
def streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The source directory holds the events TWICE (two parquet files —
    an at-least-once replay); dropDuplicatesWithinWatermark(event_id)
    keeps exactly one copy of each id while the watermark bounds how
    long an id's fingerprint stays in state (the property that makes
    streaming dedup viable at all — plain dropDuplicates would hold
    every id forever). The kept-row counts per type must equal the
    batch distinct law.

    Contract boundary (pinned by
    test_streaming_dedup_never_duplicates_across_batches): the
    NO-DUPLICATES invariant holds under ANY micro-batch slicing — a
    replayed copy is either deduped by state or dropped as late.
    COMPLETENESS additionally needs first deliveries to arrive within
    the watermark delay of stream progress; a first copy surfacing
    after the watermark passed its event time is dropped as late, the
    standard streaming late-data contract. Here availableNow drains
    the whole source in one batch, so both properties hold exactly."""
    src = tempfile.mkdtemp(prefix="tc_dedup_src_")
    ckpt = tempfile.mkdtemp(prefix="tc_dedup_ckpt_")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    e.write.mode("append").parquet(src)
    e.write.mode("append").parquet(src)  # the duplicate delivery
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = stream.withWatermark("ts", "10 minutes") \
        .dropDuplicatesWithinWatermark(["event_id"])
    name = f"tc_dedup_{uuid.uuid4().hex[:10]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    return spark.table(name).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@query(
    "streaming_hll_registers",
    survey="§2.11-adjacent: streaming sketch maintenance — per-trigger "
    "max-merge of HLL registers into a persisted store; the store after "
    "draining a doubled multi-batch source must equal the batch "
    "registers (MAX merge is idempotent, so at-least-once is a no-op)",
    description="HLL register store maintained by a 4-trigger stream "
    "over a duplicated events source, vs the direct batch registers",
    oracle=None,  # set below: nests q_sketch's register SQL
)
def streaming_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The source holds the events TWICE across 8 files, drained 2
    files per trigger — so the store is built by several partial
    max-merges with every row delivered at-least-once. The persisted
    registers must still be byte-identical to one batch register pass
    (operators/hll.py: MAX is associative + commutative + idempotent —
    the streaming twin of hll_register_law's shard merge). The
    estimate lane then reads the O(types x 256) store instead of
    scanning history — the posture that keeps 'distinct users ever'
    queryable at 100 TB."""
    src = tempfile.mkdtemp(prefix="tc_hll_src_")
    ckpt = tempfile.mkdtemp(prefix="tc_hll_ckpt_")
    store = tempfile.mkdtemp(prefix="tc_hll_store_") + "/regs"
    from tradecat_spark.streaming.sketch import (
        read_registers,
        start_hll_maintenance,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts"
    )
    e.repartition(4).write.mode("append").parquet(src)
    e.repartition(4).write.mode("append").parquet(src)  # redelivery
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = start_hll_maintenance(stream, store, ckpt, available_now=True)
    q.awaitTermination(300)
    q.stop()
    return read_registers(spark, store)


def _hll_store_oracle() -> str:
    from tradecat_spark.plans.q_sketch import _hll_r_sql

    return f"""
WITH {_hll_r_sql()}
SELECT event_type, bucket, CAST(MAX(rank) AS BIGINT) AS reg
FROM r GROUP BY 1, 2
"""


@query(
    "streaming_cms_counters",
    survey="§2.11-adjacent: streaming ADDITIVE-sketch maintenance — "
    "per-batch partial CMS grids persisted as their own partitions and "
    "summed at read (addition is not idempotent, so the durability "
    "design inverts vs the HLL register store); the drained store must "
    "equal the batch counter grid exactly",
    description="CMS counter grid maintained by a multi-trigger stream "
    "as per-batch partials, vs the one-pass batch grid",
    oracle=None,  # set below: nests q_sketch's grid SQL
)
def streaming_cms_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exactly-once story an additive sketch needs: each
    checkpointed batch owns one store partition holding its partial
    grid — replay overwrites (the partial is a deterministic function
    of the batch), never re-adds — and the merged sketch is the SUM
    over partitions, disjoint deliveries by construction. Per-trigger
    work is one map-side-combinable count over the batch; the store is
    batches x (4 x 512) rows until compaction folds old partials
    (operators/storage.py retention machinery, same as the candle
    store)."""
    src = tempfile.mkdtemp(prefix="tc_cms_src_")
    ckpt = tempfile.mkdtemp(prefix="tc_cms_ckpt_")
    store = tempfile.mkdtemp(prefix="tc_cms_store_") + "/grid"
    from tradecat_spark.streaming.sketch import (
        read_cms,
        start_cms_maintenance,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts"
    )
    e.repartition(6).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = start_cms_maintenance(stream, store, ckpt, available_now=True)
    q.awaitTermination(300)
    q.stop()
    return read_cms(spark, store)


def _cms_store_oracle() -> str:
    from tradecat_spark.plans.q_sketch import _CMS_D, _cms_bucket_sql

    cases = "\n      ".join(
        f"WHEN {d} THEN {_cms_bucket_sql(d, 'user_id')}"
        for d in range(_CMS_D)
    )
    return f"""
WITH items AS (
  SELECT user_id FROM events WHERE user_id IS NOT NULL
),
cms AS (
  SELECT d.d,
    CASE d.d
      {cases}
    END AS bucket,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM items CROSS JOIN (SELECT unnest(range({_CMS_D})) AS d) d
  GROUP BY 1, 2
)
SELECT CAST(d AS INTEGER) AS d, bucket, cnt FROM cms
"""


from tradecat_spark.plans.registry import REGISTRY as _REG  # noqa: E402

_REG["streaming_hll_registers"].oracle = _hll_store_oracle()
_REG["streaming_cms_counters"].oracle = _cms_store_oracle()


# ---------------------------------------------------------------------------
# Composed ingest pipeline (streaming/pipeline.py) under the driver's
# eye (r8 verdict item 6): one document stream drives bronze + dedup
# screen + HLL + CMS; the converged stores are summarized by a
# rows-only query and exactly gated by a checksum twin.
# ---------------------------------------------------------------------------
#: process-lifetime cache: sf_dir -> pipeline_dirs. The pipeline's
#: converged store CONTENTS for the gated components are deterministic
#: (bronze row counts, max-merged registers, additive CMS partials are
#: all independent of micro-batch slicing), so the cache only avoids
#: re-running the stream, it cannot change a gated answer.
_PIPE_ASSETS: dict[str, dict[str, str]] = {}


def _pipeline_assets(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Run the composed pipeline once per (process, sf_dir): the delta
    split of documents (doc_id % 10 = 0) delivered TWICE across
    several triggers — the same at-least-once shape every single-store
    streaming gate uses — through streaming/pipeline.py's one
    foreachBatch body. The stream carries each document's embedding
    (vec_id == doc_id on the driver tables), and the 5th store encodes
    it under the SAME frozen model the ann_ivfadc_search_frozen lane
    builds (memoized per process; trained on the vec_id % 2 = 0 slice
    only) — so the pipeline's code store is gateable against the
    _pqr_sql frozen-split oracle."""
    if sf_dir in _PIPE_ASSETS:
        return _PIPE_ASSETS[sf_dir]
    from tradecat_spark.plans.q_similarity import _frozen_ivfadc_assets
    from tradecat_spark.streaming.pipeline import (
        pipeline_dirs,
        start_ingest_pipeline,
    )

    model_dir, _ = _frozen_ivfadc_assets(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="tc_pipe_")
    src = f"{base}/src"
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    # Domain assumption made EXPLICIT (r10 ADVICE): the Spark side
    # indexes {doc_id%10==0 docs that have embeddings} while the
    # oracle's frozen-split rows are {embeddings with vec_id%10==0};
    # these coincide only because embeddings.vec_id ⊆ documents.doc_id
    # on the driver tables. If a dataset ever carries an embedding
    # without a document row, fail HERE with the assumption named
    # instead of downstream with a confusing checksum-row mismatch.
    orphan_vecs = (
        emb.filter(F.col("doc_id") % 10 == 0)
        .join(
            load_table(spark, sf_dir, "documents")
            .select("doc_id")
            .filter(F.col("doc_id") % 10 == 0),
            "doc_id",
            "left_anti",
        )
        .count()
    )
    if orphan_vecs:
        raise AssertionError(
            f"{orphan_vecs} embeddings with vec_id%10==0 have no "
            "documents row — the pipeline stream (built from documents) "
            "would never index them, but the DuckDB oracle (built from "
            "embeddings) expects them: the vec_id ⊆ doc_id domain "
            "assumption no longer holds for this dataset"
        )
    delta = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .filter(F.col("doc_id") % 10 == 0)
        # LEFT join: at sf0.1 only a subset of docs has embeddings,
        # and an inner join would silently shrink the STREAM — every
        # doc must still reach bronze/dedup/HLL/CMS; the ANN updater
        # encodes only rows that carry a vector (caught by the r10
        # sf0.1 full-sweep: 2835 vs 3572 checksum rows)
        .join(emb, "doc_id", "left")
    )
    delta.repartition(2).write.mode("append").parquet(src)
    delta.repartition(2).write.mode("append").parquet(src)  # redelivery
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = start_ingest_pipeline(
        stream, f"{base}/stores", available_now=True,
        ann_model_dir=model_dir, with_phash=True, with_postings=True,
        with_labels=True,
    )
    drained = q.awaitTermination(300)
    q.stop()
    if not drained:
        # a timed-out drain leaves partially-converged stores; caching
        # them would turn the timeout into downstream hash mismatches
        raise RuntimeError(
            "ingest pipeline did not drain within 300s; stores at "
            f"{base}/stores are partial and were not cached"
        )
    dirs = pipeline_dirs(f"{base}/stores")
    # compact the label store up to its SECOND-newest committed batch
    # before caching: the gated lanes then read a base + a newer
    # partial through the latest-wins fold, so the compactor and the
    # coverage rule sit IN the gated path, not just in pytest (every
    # batch id here is drained-committed, satisfying compact_labels'
    # contract)
    from tradecat_spark.streaming.ingest import batch_partition_vals
    from tradecat_spark.streaming.labels import compact_labels

    bvals = sorted(
        int(v[1:])
        for v in batch_partition_vals(dirs["labels_store"])
        if v.startswith("b")
    )
    if len(bvals) > 1:
        compact_labels(spark, dirs["labels_store"], bvals[-2])
    _PIPE_ASSETS[sf_dir] = dirs
    return _PIPE_ASSETS[sf_dir]


@query(
    "streaming_pipeline_stores",
    survey="§2.11-adjacent: the COMPOSED ingest pipeline — bronze + "
    "dedup screen + HLL + CMS + frozen-model ANN codes + image "
    "perceptual hashes + inverted-index postings + cluster labels "
    "co-running off ONE document stream (streaming/pipeline.py; r7 "
    "verdict item 7, 5th store per r9 item 5, 6th per r11 item 4, "
    "7th in r12, 8th in r13) — summarized per store after draining a "
    "doubled multi-trigger source; every row is slicing-independent "
    "(bronze/verdicts count delivered rows, sigs/screen/ANN/phash/"
    "postings count distinct docs, sketch stores are idempotent or "
    "additive, codes/hashes/postings are deterministic, converged "
    "labels are a pure function of the final pair graph), so the "
    "summary is deterministic under any micro-batch slicing. Exact "
    "store contents are gated by the streaming_pipeline_checksum, "
    "streaming_pipeline_phash, streaming_pipeline_bm25 and "
    "streaming_pipeline_labels twins",
    description="Per-store row/key counts of the converged 8-store "
    "pipeline (plus its emitted near-dup pair sink) over a "
    "twice-delivered delta stream",
    oracle=None,  # rows-only by design: ten heterogeneous store/sink
    # summaries; the SQL-expressible contents are exactly gated by the
    # checksum/phash/bm25/labels twins
)
def streaming_pipeline_stores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One row per store: total rows and distinct primary keys. The
    verdict CONTENT of a redelivered doc depends on which other docs
    reached the sig store first (slicing-dependent), so verdicts are
    summarized by counts only — their laws are pinned by the e2e and
    crash-seam tests (tests/test_streaming.py)."""
    from tradecat_spark.streaming.ann import read_index
    from tradecat_spark.streaming.dedup import read_store as _read_sigs
    from tradecat_spark.streaming.sketch import read_cms, read_registers

    dirs = _pipeline_assets(spark, sf_dir)

    def _row(store: str, n_rows, n_keys) -> DataFrame:
        return spark.range(1).select(
            F.lit(store).alias("store"),
            n_rows.cast("bigint").alias("n_rows"),
            n_keys.cast("bigint").alias("n_keys"),
        )

    from tradecat_spark.streaming.phash import read_hashes, read_pairs

    bronze = spark.read.parquet(dirs["bronze"])
    sigs = _read_sigs(spark, dirs["sig_store"])
    verdicts = spark.read.parquet(dirs["verdicts"])
    hll = read_registers(spark, dirs["hll_store"])
    cms = read_cms(spark, dirs["cms_store"])
    ann = read_index(spark, dirs["ann_store"])
    ph = read_hashes(spark, dirs["phash_store"])
    php = read_pairs(spark, dirs["phash_pairs"])
    from tradecat_spark.streaming.postings import read_postings

    post = read_postings(spark, dirs["postings_store"])
    from tradecat_spark.streaming.labels import read_labels

    lbl = read_labels(spark, dirs["labels_store"])
    rows = [
        _row("bronze", F.lit(bronze.count()),
             F.lit(bronze.select("doc_id").distinct().count())),
        _row("sigs", F.lit(sigs.count()),
             F.lit(sigs.select("doc_id").distinct().count())),
        _row("verdicts", F.lit(verdicts.count()),
             F.lit(verdicts.select("doc_id").distinct().count())),
        _row("hll", F.lit(hll.count()),
             F.lit(hll.select("event_type").distinct().count())),
        _row("cms", F.lit(cms.count()),
             F.lit(cms.select("d").distinct().count())),
        _row("ann", F.lit(ann.count()),
             F.lit(ann.select("vec_id").distinct().count())),
        _row("phash", F.lit(ph.count()),
             F.lit(ph.select("doc_id").distinct().count())),
        _row("phash_pairs", F.lit(php.count()),
             F.lit(php.select("doc_a").distinct().count())),
        _row("postings", F.lit(post.count()),
             F.lit(post.select("doc_id").distinct().count())),
        _row("labels", F.lit(lbl.count()),
             F.lit(lbl.select("cluster_id").distinct().count())),
    ]
    res = rows[0]
    for r in rows[1:]:
        res = res.unionByName(r)
    return res


@query(
    "streaming_pipeline_checksum",
    survey="§2.11-adjacent: the pipeline twin — EXACT contents of the "
    "composed pipeline's slicing-independent stores (bronze per-source "
    "delivered counts, the max-merged HLL register store, the additive "
    "CMS grid summed over per-batch partials, and the frozen-model ANN "
    "code store: per-subspace residual codes + cell assignment + exact "
    "int64 reconstruction norm per delta doc) vs a DuckDB replay of "
    "the same delta-doubled delivery (the code expectation is the "
    "_pqr_sql frozen-split chain — the ann_ivfadc_search_frozen "
    "oracle's own algebra); hash-green means the co-running "
    "composition converged every gated store to its batch law",
    description="(component, k1, k2, val) rows: bronze counts, HLL "
    "registers, CMS grid, ANN codes/cells/norms of the converged "
    "pipeline stores",
    oracle=None,  # set below (needs q_sketch's SQL fragments)
)
def streaming_pipeline_checksum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reads the stores the pipeline run left behind (shared memoized
    assets — same run the rows-only summary reads) and renders them on
    the twin's uniform (component, k1, k2, val) schema."""
    from tradecat_spark.streaming.sketch import read_cms, read_registers

    dirs = _pipeline_assets(spark, sf_dir)
    hll = read_registers(spark, dirs["hll_store"]).select(
        F.lit("hll").alias("component"),
        F.col("event_type").alias("k1"),
        F.col("bucket").cast("bigint").alias("k2"),
        F.col("reg").cast("bigint").alias("val"),
    )
    cms = read_cms(spark, dirs["cms_store"]).select(
        F.lit("cms").alias("component"),
        F.col("d").cast("string").alias("k1"),
        F.col("bucket").cast("bigint").alias("k2"),
        F.col("cnt").cast("bigint").alias("val"),
    )
    bronze = (
        spark.read.parquet(dirs["bronze"])
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("val"))
        .select(
            F.lit("bronze").alias("component"),
            F.col("source").alias("k1"),
            F.lit(0).cast("bigint").alias("k2"),
            "val",
        )
    )
    from tradecat_spark.streaming.ann import read_index

    idx = read_index(spark, dirs["ann_store"])
    ann_code = idx.select(
        F.lit("ann_code").alias("component"),
        F.col("vec_id").cast("string").alias("k1"),
        F.posexplode("codes").alias("k2x", "valx"),
    ).select(
        "component", "k1",
        F.col("k2x").cast("bigint").alias("k2"),
        F.col("valx").cast("bigint").alias("val"),
    )
    ann_cell = idx.select(
        F.lit("ann_cell").alias("component"),
        F.col("vec_id").cast("string").alias("k1"),
        F.lit(-1).cast("bigint").alias("k2"),
        F.col("cell_label").cast("bigint").alias("val"),
    )
    ann_xs2 = idx.select(
        F.lit("ann_xs2").alias("component"),
        F.col("vec_id").cast("string").alias("k1"),
        F.lit(-2).cast("bigint").alias("k2"),
        F.col("xs2").cast("bigint").alias("val"),
    )
    return (
        hll.unionByName(cms).unionByName(bronze)
        .unionByName(ann_code).unionByName(ann_cell)
        .unionByName(ann_xs2)
    )


def _pipeline_checksum_oracle() -> str:
    from tradecat_spark.plans.q_sketch import (
        _CMS_D,
        _cms_bucket_sql,
        _hll_r_sql,
    )
    from tradecat_spark.plans.q_similarity import (
        _FROZEN_TRAIN_PRED,
        _ivfadc_adc_sql,
        _pqr_sql,
    )

    cases = "\n      ".join(
        f"WHEN {d} THEN {_cms_bucket_sql(d, 'doc_id')}"
        for d in range(_CMS_D)
    )
    return f"""
WITH {_pqr_sql(_FROZEN_TRAIN_PRED)},
{_ivfadc_adc_sql()},
pdelta AS (
  SELECT doc_id, source FROM documents WHERE doc_id % 10 = 0
),
{_hll_r_sql("pdelta", "source", "doc_id")},
hllrow AS (
  SELECT 'hll' AS component, event_type AS k1, bucket AS k2,
    CAST(MAX(rank) AS BIGINT) AS val
  FROM r GROUP BY 1, 2, 3
),
cmsrow AS (
  -- every delta doc delivered twice; addition counts both
  SELECT 'cms' AS component, CAST(d.d AS VARCHAR) AS k1,
    CASE d.d
      {cases}
    END AS k2,
    CAST(2 * COUNT(*) AS BIGINT) AS val
  FROM pdelta CROSS JOIN (SELECT unnest(range({_CMS_D})) AS d) d
  GROUP BY 1, 2, 3
),
bronzerow AS (
  SELECT 'bronze' AS component, source AS k1, CAST(0 AS BIGINT) AS k2,
    CAST(2 * COUNT(*) AS BIGINT) AS val
  FROM pdelta GROUP BY 1, 2, 3
),
-- ANN code store: per-subspace residual codes, cell assignment, and
-- exact int64 reconstruction norm of every DELTA doc under the model
-- trained on the {_FROZEN_TRAIN_PRED} slice (the frozen-split chain
-- above) — vec_id == doc_id on the driver tables
anncoderow AS (
  SELECT 'ann_code' AS component, CAST(k.vec_id AS VARCHAR) AS k1,
    CAST(k.sub AS BIGINT) AS k2, CAST(k.code AS BIGINT) AS val
  FROM rpqc k WHERE k.vec_id % 10 = 0
),
anncellrow AS (
  SELECT 'ann_cell' AS component, CAST(vec_id AS VARCHAR) AS k1,
    CAST(-1 AS BIGINT) AS k2, CAST(label AS BIGINT) AS val
  FROM xasg WHERE vec_id % 10 = 0
),
annxs2row AS (
  SELECT 'ann_xs2' AS component, CAST(vec_id AS VARCHAR) AS k1,
    CAST(-2 AS BIGINT) AS k2, CAST(xs2 AS BIGINT) AS val
  FROM xs2 WHERE vec_id % 10 = 0
)
SELECT * FROM hllrow
UNION ALL SELECT * FROM cmsrow
UNION ALL SELECT * FROM bronzerow
UNION ALL SELECT * FROM anncoderow
UNION ALL SELECT * FROM anncellrow
UNION ALL SELECT * FROM annxs2row
"""


_REG["streaming_pipeline_checksum"].oracle = _pipeline_checksum_oracle()


@query(
    "streaming_pipeline_phash",
    survey="§2.11-adjacent + beyond-reference multimodal dedup: the "
    "6th pipeline store (r11 verdict item 4) — image perceptual "
    "hashes maintained ON the ingest path: the converged (doc_id, "
    "b0..b3) hash store after the delta-doubled multi-trigger drain "
    "(deterministic hashes + insert-if-absent + re-publish screen, "
    "the ANN code store's discipline), PLUS the near-dup pairs the "
    "stream emits against that store via the star-capped multi-probe "
    "band join (operators/phash.py — the SAME joins the hash-green "
    "batch lanes run); oracle replays both from the delta split of "
    "documents, so hash-green means image dedup on ingest converges "
    "to the batch sweep exactly",
    description="(component, k1, k2, val) rows: every stored aHash "
    "band + every verified near-dup pair of the pipeline's converged "
    "image-hash store",
    oracle=None,  # set below (needs q_multimodal's CTE builders)
)
def streaming_pipeline_phash(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reads the image-hash store the composed pipeline run left
    behind (shared memoized assets — the same run every other pipeline
    lane reads) and renders (a) the full hash table as per-band rows
    and (b) the verified near-dup pairs over the store, on the
    pipeline twins' uniform (component, k1, k2, val) schema. Both are
    slicing-independent: hashes are deterministic per payload and the
    screen keeps exactly one row per doc, so the converged store — and
    therefore the pair set — is a pure function of the delta corpus."""
    from tradecat_spark.streaming.phash import near_dup_pairs, read_hashes

    dirs = _pipeline_assets(spark, sf_dir)
    wide = read_hashes(spark, dirs["phash_store"])
    hashes = wide.select(
        F.col("doc_id").cast("string").alias("k1"),
        F.expr("stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (k2x, valx)"),
    ).select(
        F.lit("hash").alias("component"),
        "k1",
        F.col("k2x").cast("bigint").alias("k2"),
        F.col("valx").cast("bigint").alias("val"),
    )
    pairs = near_dup_pairs(spark, dirs["phash_store"], probe=True).select(
        F.lit("pair").alias("component"),
        F.col("doc_a").cast("string").alias("k1"),
        F.col("doc_b").cast("bigint").alias("k2"),
        F.col("hamming").cast("bigint").alias("val"),
    )
    return hashes.unionByName(pairs)


def _pipeline_phash_oracle() -> str:
    from tradecat_spark.plans.q_multimodal import (
        _PHASH_PROBE_CTES,
        PHASH_HAMMING_MAX,
        phash_ctes_sql,
    )

    return f"""
WITH {phash_ctes_sql("doc_id % 10 = 0")},
{_PHASH_PROBE_CTES},
hashrow AS (
  SELECT 'hash' AS component, CAST(doc_id AS VARCHAR) AS k1,
    CAST(band AS BIGINT) AS k2, CAST(band_val AS BIGINT) AS val
  FROM bands
),
pairrow AS (
  SELECT 'pair' AS component, CAST(c.doc_a AS VARCHAR) AS k1,
    CAST(c.doc_b AS BIGINT) AS k2,
    CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
       + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
      AS BIGINT) AS val
  FROM pcand c
  JOIN wide wa ON wa.doc_id = c.doc_a
  JOIN wide wb ON wb.doc_id = c.doc_b
  WHERE bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
      + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
      <= {PHASH_HAMMING_MAX}
)
SELECT * FROM hashrow UNION ALL SELECT * FROM pairrow
"""


_REG["streaming_pipeline_phash"].oracle = _pipeline_phash_oracle()


@query(
    "streaming_pipeline_phash_delta",
    survey="§2.11-adjacent + beyond-reference multimodal dedup: "
    "INCREMENTAL near-dup pair emission on the ingest path — each "
    "trigger joins only the delta's bucket rows against the hash "
    "store (cap-guarded bucket probe, operators/phash."
    "phash_delta_candidate_pairs) and lands the pairs it INTRODUCES "
    "in the batch's own partition (exactly-once: a pair lands when "
    "its later endpoint ingests, replays overwrite, re-publications "
    "are screened); the UNION of every batch's emissions over the "
    "drained delta-doubled source must equal the full-table near-dup "
    "pair set the oracle computes in one pass — the incremental == "
    "batch law, per-pair hash-gated (the image twin of "
    "dedup_incremental_delta)",
    description="Union of per-batch delta-emitted near-dup image "
    "pairs from the pipeline run: doc_a, doc_b, hamming",
    oracle=None,  # set below: the full-table pair SQL over the delta
)
def streaming_pipeline_phash_delta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reads the per-batch pair partitions the composed pipeline run
    emitted (shared memoized assets). Equality with the one-pass
    full-table oracle holds because (a) every pair is emitted exactly
    once, at its later endpoint's ingest trigger, and (b) no phash
    bucket on the driver delta exceeds the star cap (measured max
    probe-bucket 5 at sf0.01 / 42 at sf0.1 vs cap 64), so the guard's
    pairwise-lossy branch never fires here — when it does fire, the
    contract weakens to component-equality, pinned separately in
    tests/test_streaming.py with a constructed degenerate bucket."""
    from tradecat_spark.streaming.phash import read_pairs

    dirs = _pipeline_assets(spark, sf_dir)
    return read_pairs(spark, dirs["phash_pairs"])


def _pipeline_phash_delta_oracle() -> str:
    from tradecat_spark.plans.q_multimodal import (
        _PHASH_PROBE_CTES,
        PHASH_HAMMING_MAX,
        phash_ctes_sql,
    )

    return f"""
WITH {phash_ctes_sql("doc_id % 10 = 0")},
{_PHASH_PROBE_CTES}
SELECT c.doc_a, c.doc_b,
  CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
     + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
    AS INTEGER) AS hamming
FROM pcand c
JOIN wide wa ON wa.doc_id = c.doc_a
JOIN wide wb ON wb.doc_id = c.doc_b
WHERE bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
    + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
    <= {PHASH_HAMMING_MAX}
"""


_REG["streaming_pipeline_phash_delta"].oracle = (
    _pipeline_phash_delta_oracle()
)


#: query documents for the pipeline BM25 lane: the first 8 delta docs
#: (the delta split is doc_id % 10 = 0, so these are 0, 10, ..., 70)
_PIPE_BM25_QMAX = 80
_PIPE_BM25_K = 10


@query(
    "streaming_pipeline_bm25",
    survey="§2.11-adjacent + beyond-reference retrieval: the 7th "
    "pipeline store (r12) — an inverted-index postings store "
    "maintained ON the ingest path (deterministic per-doc (word, tf) "
    "rows + insert-if-absent + re-publish screen, the image-hash "
    "store's discipline), with BM25 ranking served OFF the store "
    "through the SAME shared operator the batch lane uses "
    "(operators/bm25.py); the lane checksums every stored posting AND "
    "the served top-k micro-scores against a DuckDB replay of the "
    "delta split, so hash-green means lexical retrieval on ingest "
    "equals the batch sweep exactly",
    description="(component, k1, k2, val) rows: every stored posting "
    "+ the BM25 top-k micro-scores served off the pipeline's "
    "converged inverted-index store",
    oracle=None,  # set below (reuses q_retrieval's CTE builder)
)
def streaming_pipeline_bm25(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reads the postings store the composed pipeline run left behind
    (shared memoized assets) and renders (a) the full inverted index
    as (doc, word, tf) rows and (b) the BM25 top-k it serves for the
    first 8 delta docs, on the pipeline twins' uniform (component,
    k1, k2, val) schema. Both are slicing-independent: postings are a
    deterministic function of the payload and the screen keeps
    exactly one row set per doc, so the converged store — and
    therefore the ranking — is a pure function of the delta corpus."""
    from tradecat_spark.streaming.postings import (
        bm25_topk_over_store,
        read_postings,
    )

    dirs = _pipeline_assets(spark, sf_dir)
    postings = read_postings(spark, dirs["postings_store"]).select(
        F.lit("posting").alias("component"),
        F.col("doc_id").cast("string").alias("k1"),
        F.col("word").alias("k2"),
        F.col("tf").cast("bigint").alias("val"),
    )
    topk = bm25_topk_over_store(
        spark, dirs["postings_store"],
        F.col("doc_id") < _PIPE_BM25_QMAX, k=_PIPE_BM25_K,
    ).select(
        F.lit("bm25").alias("component"),
        F.col("query_id").cast("string").alias("k1"),
        F.col("doc_id").cast("string").alias("k2"),
        F.col("micros").cast("bigint").alias("val"),
    )
    return postings.unionByName(topk)


def _pipeline_bm25_oracle() -> str:
    from tradecat_spark.plans.q_retrieval import _bm25_ctes_sql

    ctes = _bm25_ctes_sql(
        doc_where="doc_id % 10 = 0",
        q_pred=f"doc_id < {_PIPE_BM25_QMAX}",
    )
    return f"""
WITH {ctes},
postrow AS (
  SELECT 'posting' AS component, CAST(doc_id AS VARCHAR) AS k1,
    word AS k2, tf AS val
  FROM tf
),
bmrow AS (
  -- SUM(BIGINT) is HUGEINT in DuckDB: cast back for the hash gate
  SELECT 'bm25' AS component, CAST(query_id AS VARCHAR) AS k1,
    CAST(doc_id AS VARCHAR) AS k2, CAST(micros AS BIGINT) AS val
  FROM (
    SELECT query_id, doc_id, micros,
      ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY micros DESC, doc_id ASC) AS rk
    FROM bm
  ) WHERE rk <= {_PIPE_BM25_K}
)
SELECT * FROM postrow UNION ALL SELECT * FROM bmrow
"""


_REG["streaming_pipeline_bm25"].oracle = _pipeline_bm25_oracle()


@query(
    "streaming_pipeline_labels",
    survey="§2.11-adjacent + beyond-reference dedup: the 8th pipeline "
    "store (r13; r12 verdict 'What's missing' #1) — cluster labels "
    "maintained INCREMENTALLY on the ingest path: each trigger "
    "contracts the delta pairs' endpoints to their current labels, "
    "resolves the BOUNDED cluster graph with the shared "
    "pointer-doubling components operator, and rewrites only the "
    "losing label sets via one broadcast join "
    "(streaming/labels.py, union-find-over-stream); the lane reads "
    "the store AFTER a base+partial compaction and checks stream-"
    "maintained labels AND the keep-one cluster sizes against a "
    "DuckDB recursive-closure replay of the full final pair graph — "
    "hash-green means the last batch-only step in the ingest dedup "
    "story (batch min_label_components) is no longer needed for "
    "keep-one decisions",
    description="(component, k1, k2) rows: every stream-maintained "
    "(doc, cluster) label + per-cluster member counts of the "
    "pipeline's converged label store",
    oracle=None,  # set below (reuses q_multimodal's CTE builders)
)
def streaming_pipeline_labels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reads the label store the composed pipeline run left behind
    (shared memoized assets; the asset builder compacts the store to
    a base + one newer partial first, so the latest-wins fold across
    a compaction boundary is what's checksummed). Slicing-independent:
    converged labels are the connected components of the final pair
    graph — contraction preserves components and component minima
    whatever the micro-batch slicing (the induction in
    streaming/labels.py) — and the emitted pair union equals the
    one-pass capped pair set on this delta (no bucket exceeds the
    star cap; the delta lane's measured contract). Every hashed doc
    has a label row (singletons label themselves), so missed merges
    AND spurious merges both flip the hash."""
    from tradecat_spark.streaming.labels import read_labels

    dirs = _pipeline_assets(spark, sf_dir)
    labels = read_labels(spark, dirs["labels_store"]).localCheckpoint()
    lab = labels.select(
        F.lit("label").alias("component"),
        F.col("doc_id").cast("bigint").alias("k1"),
        F.col("cluster_id").cast("bigint").alias("k2"),
    )
    clus = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        F.lit("cluster").alias("component"),
        F.col("cluster_id").cast("bigint").alias("k1"),
        F.col("n").cast("bigint").alias("k2"),
    )
    return lab.unionByName(clus)


def _pipeline_labels_oracle() -> str:
    from tradecat_spark.plans.q_multimodal import (
        _PHASH_CLOSURE_CTES,
        _PHASH_PROBE_CTES,
        phash_ctes_sql,
    )

    return f"""
WITH RECURSIVE {phash_ctes_sql("doc_id % 10 = 0")},
{_PHASH_PROBE_CTES},
{_PHASH_CLOSURE_CTES},
comp AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    CAST(MIN(r) AS BIGINT) AS cluster_id
  FROM reach GROUP BY doc_id
)
SELECT 'label' AS component, doc_id AS k1, cluster_id AS k2 FROM comp
UNION ALL
SELECT 'cluster' AS component, cluster_id AS k1,
  CAST(COUNT(*) AS BIGINT) AS k2
FROM comp GROUP BY cluster_id
"""


_REG["streaming_pipeline_labels"].oracle = _pipeline_labels_oracle()


@query(
    "streaming_canonical_corpus",
    survey="§2.11-adjacent + beyond-reference dedup (r14): canonical-"
    "corpus SERVING off the streamed label store — the keep-one "
    "decision (doc_id == cluster_id, streaming/labels.py read path) "
    "applied directly to the incrementally-maintained labels, joined "
    "back to the corpus: pairs → labels → canonical serving, the "
    "ingest dedup story end-to-end with no batch component pass "
    "anywhere. Exercises the r14 delta-bounded reader (base ANTI-JOIN "
    "broadcast(partial keys) ∪ latest-of-partials) in the gated path "
    "across a compaction boundary, and asserts the served corpus "
    "equals the batch dedup_canonical_corpus shape over the same "
    "slice via a DuckDB recursive-closure replay of the final pair "
    "graph",
    description="Canonical docs served from the streamed label store "
    "with cluster size, dups dropped, and chars kept — the "
    "dedup_canonical_corpus shape off the incremental store",
    oracle=None,  # set below (reuses q_multimodal's CTE builders)
)
def streaming_canonical_corpus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Keep-one applied to the streamed store: a doc is canonical iff
    it labels its own cluster (cluster ids are component-min doc ids,
    so exactly one per cluster). cluster_size rides a cluster-keyed
    count over the label rows; the corpus join is doc_id-equi against
    the pipeline's delta slice. Scale shape: the store read is the
    delta-bounded latest-wins composition (no corpus exchange — the
    r13 weak fix), the size aggregate and corpus join shuffle on the
    keys they group/join by, exactly once each."""
    from tradecat_spark.streaming.labels import read_labels

    dirs = _pipeline_assets(spark, sf_dir)
    labels = read_labels(spark, dirs["labels_store"]).localCheckpoint()
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    canon = labels.filter(
        F.col("doc_id") == F.col("cluster_id")
    ).join(sizes, "cluster_id")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 10 == 0)
    )
    return canon.join(docs, "doc_id").select(
        "doc_id",
        F.col("cluster_size").cast("long").alias("cluster_size"),
        (F.col("cluster_size") - 1).cast("long").alias("n_dups_dropped"),
        F.length("text").cast("long").alias("n_chars"),
    )


def _canonical_corpus_oracle() -> str:
    from tradecat_spark.plans.q_multimodal import (
        _PHASH_CLOSURE_CTES,
        _PHASH_PROBE_CTES,
        phash_ctes_sql,
    )

    return f"""
WITH RECURSIVE {phash_ctes_sql("doc_id % 10 = 0")},
{_PHASH_PROBE_CTES},
{_PHASH_CLOSURE_CTES},
comp AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    CAST(MIN(r) AS BIGINT) AS cluster_id
  FROM reach GROUP BY doc_id
),
csized AS (
  SELECT doc_id, cluster_id,
    CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
      AS cluster_size
  FROM comp
)
SELECT s.doc_id, s.cluster_size,
  CAST(s.cluster_size - 1 AS BIGINT) AS n_dups_dropped,
  CAST(length(dd.text) AS BIGINT) AS n_chars
FROM csized s JOIN documents dd ON s.doc_id = dd.doc_id
WHERE s.doc_id = s.cluster_id
"""


_REG["streaming_canonical_corpus"].oracle = _canonical_corpus_oracle()


# ---------------------------------------------------------------------------
# Shared scaffolding for the stream-stream interval-join family
# ---------------------------------------------------------------------------
_SSJ_INTERVAL = "INTERVAL 1 HOUR"
_SSJ_DELAY = "10 minutes"


def _interval_join_stream(spark: SparkSession, sf_dir: str, how: str):
    """Two watermarked sides (purchases, clicks) of the events stream
    joined on user within the preceding-hour band. Returns
    ``(joined, src_dir)`` — the caller drains and then removes the
    source dir. One definition so the three join queries (inner,
    left-outer, chained) can never diverge on the condition, delay, or
    column aliasing."""
    src = tempfile.mkdtemp(prefix="tc_ssj_src_")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "ts"
    )
    e.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def side(flt, alias_prefix):
        s = (
            spark.readStream.schema(schema).parquet(src)
            .filter(flt)
            .withWatermark("ts", _SSJ_DELAY)
        )
        return s.select(
            *[F.col(c).alias(f"{alias_prefix}_{c}") for c in s.columns]
        )

    p = side(F.col("event_type") == "purchase", "p")
    c = side(F.col("event_type") == "click", "c")
    joined = p.join(
        c,
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(_SSJ_INTERVAL))
        & (F.col("c_ts") <= F.col("p_ts")),
        how,
    )
    return joined, src


def _drain_append(spark: SparkSession, sdf: DataFrame, prefix: str,
                  src: str, output_mode: str = "append") -> DataFrame:
    """availableNow append drain to a memory sink with the stateful
    shuffle width pinned (AQE can't touch stateful shuffles; the
    200-partition default is per-store commit overhead — set INSIDE the
    try so an analysis error can't leak the narrowed width into the
    shared driver session, restored after). The source and checkpoint
    dirs are removed post-drain — the memory sink holds the rows, so
    repeated gate/bench/mimic cycles don't accumulate /tmp copies of
    the events table."""
    import shutil

    ckpt = tempfile.mkdtemp(prefix=f"{prefix}_ckpt_")
    name = f"{prefix}_{uuid.uuid4().hex[:10]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(300)
        q.stop()
        # a timed-out drain would leave a PARTIAL memory table — an
        # inscrutable hash red downstream; fail loudly instead
        assert finished, "streaming drain did not finish within 300s"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(src, ignore_errors=True)
    return spark.table(name)


@query(
    "streaming_stream_join",
    survey="§2.11-adjacent marquee feature: watermarked STREAM-STREAM "
    "interval join (state on both sides, time-range condition bounding "
    "state cleanup) — clicks joined to purchases within the preceding "
    "hour, hash-checked against the batch interval-join law",
    description="Stream-stream join: per-user clicks within 1h before "
    "each purchase, aggregated to pair counts and gap bounds",
    oracle="""
SELECT p.user_id,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(COUNT(DISTINCT p.event_id) AS BIGINT) AS n_purchases,
  MIN(epoch_us(p.ts) - epoch_us(c.ts)) AS min_gap_us,
  MAX(epoch_us(p.ts) - epoch_us(c.ts)) AS max_gap_us
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
  AND c.ts >= p.ts - INTERVAL 1 HOUR
  AND c.ts <= p.ts
GROUP BY p.user_id
""",
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sides are unbounded streams with their own watermarks; the
    time-range join condition (`click in [purchase - 1h, purchase]`)
    is what lets Spark BOUND both state stores — a click older than
    (click watermark + 1h) can never match a future purchase and is
    evicted, the canonical stream-stream join contract. An INNER join
    emits pairs as they match, independent of watermark passage, so an
    availableNow drain yields exactly the batch interval join and the
    result is hash-comparable. (Outer stream-stream joins emit their
    NULL rows only on watermark expiry — the append-sessions query
    covers that emission discipline.)

    Scale: state is per-user rows inside a 1h sliding band, shuffled
    once on user_id for both sides (co-partitioned by the join key);
    eviction keeps each store O(events/hour), not O(history)."""
    joined, src = _interval_join_stream(spark, sf_dir, "inner")
    drained = _drain_append(spark, joined, "tc_ssj", src)
    gap = F.unix_micros("p_ts") - F.unix_micros("c_ts")
    return drained.groupBy(
        F.col("p_user_id").alias("user_id")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("p_event_id").alias("n_purchases"),
        F.min(gap).alias("min_gap_us"),
        F.max(gap).alias("max_gap_us"),
    )


@query(
    "streaming_stream_outer_join",
    survey="§2.11-adjacent: LEFT OUTER stream-stream join — NULL rows "
    "materialize only on watermark expiry (matched rows emit "
    "immediately), the second half of the stream-join emission "
    "discipline streaming_stream_join's inner case can't show",
    description="Left-outer stream-stream join: matched rows plus "
    "unmatched purchases finalized by the two-sided global watermark",
    oracle="""
WITH wm AS (
  SELECT LEAST(
    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'purchase'),
    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'click')
  ) - 600000000 AS wm_us
),
p AS (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
j AS (
  SELECT p.user_id, p.ts AS p_ts, c.ts AS c_ts
  FROM p LEFT JOIN c
    ON c.user_id = p.user_id
    AND c.ts >= p.ts - INTERVAL 1 HOUR
    AND c.ts <= p.ts
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN c_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unmatched,
  COALESCE(MIN(epoch_us(p_ts) - epoch_us(c_ts)), -1) AS min_gap_us,
  COALESCE(MAX(epoch_us(p_ts) - epoch_us(c_ts)), -1) AS max_gap_us
FROM j, wm
WHERE c_ts IS NOT NULL OR epoch_us(p_ts) < wm_us
GROUP BY user_id
""",
)
def streaming_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER adds the delayed half of the emission contract:
    matched pairs emit in the micro-batch that matches them; an
    unmatched left row becomes a NULL-padded output only once the
    watermark proves no future click can land in its window.

    The flush boundary is the query's GLOBAL watermark, which with two
    watermarked sides is the MIN over both nodes of (that side's max
    event time − delay) — NOT the overall max. Derived empirically
    across three parameterizations (what first looked like an
    "interval/2 margin" was exactly the purchase side's own lagging
    max): a NULL row emits iff ``p_ts < min(max_p, max_c) − delay``,
    STRICT (a purchase exactly at the global watermark is held). The
    oracle reproduces that two-sided minimum, so the full outer result
    is hash-gated with no excluded band.

    Scale posture is the inner join's (both stores watermark-bounded);
    the extra cost of outer emission is one eviction scan per batch.
    ``COALESCE(.., -1)`` keeps the gap columns BIGINT on both engines —
    an all-NULL aggregate would dtype-flip to float64 and break the
    representation-sensitive driver hash."""
    joined, src = _interval_join_stream(spark, sf_dir, "left_outer")
    e = load_table(spark, sf_dir, "events").select("event_type", "ts")
    drained = _drain_append(spark, joined, "tc_ssoj", src)
    gap = F.unix_micros("p_ts") - F.unix_micros("c_ts")
    wm = e.agg(
        (
            F.least(
                F.max(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.unix_micros("ts"),
                    )
                ),
                F.max(
                    F.when(
                        F.col("event_type") == "click",
                        F.unix_micros("ts"),
                    )
                ),
            )
            - F.lit(600_000_000)
        ).alias("wm_us")
    )
    finalized = (
        drained
        .crossJoin(F.broadcast(wm))
        .filter(
            F.col("c_ts").isNotNull()
            | (F.unix_micros("p_ts") < F.col("wm_us"))
        )
    )
    return finalized.groupBy(
        F.col("p_user_id").alias("user_id")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("c_ts").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_unmatched"),
        F.coalesce(F.min(gap), F.lit(-1).cast("bigint"))
        .alias("min_gap_us"),
        F.coalesce(F.max(gap), F.lit(-1).cast("bigint"))
        .alias("max_gap_us"),
    )


@query(
    "streaming_chained_stateful",
    survey="§2.11-adjacent: CHAINED stateful operators in one streaming "
    "query (stream-stream join feeding a windowed aggregation — legal "
    "since Spark 3.5/4.x watermark propagation), daily pair counts "
    "emitted on window finalization",
    description="Stream-stream join piped into a tumbling 1-day append "
    "aggregation in a single streaming query",
    oracle="""
WITH wm AS (
  SELECT LEAST(
    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'purchase'),
    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'click')
  ) - 600000000 AS wm_us
),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
pairs AS (
  SELECT p.ts AS p_ts
  FROM p JOIN c
    ON c.user_id = p.user_id
    AND c.ts >= p.ts - INTERVAL 1 HOUR
    AND c.ts <= p.ts
),
w AS (
  SELECT time_bucket(INTERVAL '1 day', p_ts) AS wstart,
    CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY 1
)
SELECT epoch_us(wstart) AS window_start_us,
  epoch_us(wstart + INTERVAL 1 DAY) AS window_end_us,
  n_pairs
FROM w, wm
WHERE epoch_us(wstart + INTERVAL 1 DAY) <= wm_us
""",
)
def streaming_chained_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO stateful operators in ONE streaming query — the interval
    join's two state stores feed a tumbling-window aggregation's store
    downstream, exercising cross-operator watermark propagation (the
    join must forward ``p_ts`` as a valid event-time column for the agg
    to window on). Append mode finalizes a day window once the global
    watermark passes its end (inclusive, like session windows); the
    global watermark follows the two-sided law documented on
    ``streaming_stream_outer_join`` — min over both watermark nodes of
    (side max − delay). One pipeline, three state stores, zero
    intermediate sinks: the batch re-derivation (join → group →
    watermark filter) is the oracle."""
    joined, src = _interval_join_stream(spark, sf_dir, "inner")
    daily = joined.groupBy(F.window("p_ts", "1 day")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    drained = _drain_append(spark, daily, "tc_chain", src)
    return drained.select(
        F.unix_micros("window.start").alias("window_start_us"),
        F.unix_micros("window.end").alias("window_end_us"),
        "n_pairs",
    )


# ---------------------------------------------------------------------------
# Streaming ANN index maintenance (streaming/ann.py) as a graded query
# ---------------------------------------------------------------------------
@query(
    "streaming_ann_index",
    survey="§2.11-adjacent: streaming ANN INDEX maintenance — a frozen "
    "IVFADC model (coarse centroids + residual codebooks trained on "
    "the base split only, persisted as parquet) encodes a redelivered "
    "multi-trigger embedding stream into a per-batch code store; "
    "searching the drained store must equal the batch residual-ADC "
    "search under the same frozen model bit-for-bit (codes are a "
    "deterministic function of vector x frozen model, so "
    "insert-if-absent makes at-least-once redelivery a no-op)",
    description="Top-3 residual-ADC neighbors per query from a code "
    "store built by streaming the delta split TWICE under a frozen "
    "base-trained model",
    oracle=None,  # set below: frozen-split residual chain
)
def streaming_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-on-base / encode-the-stream: the model never sees the
    delta split, the store is seeded with the base encode (batch -1)
    and then maintained by a stream that delivers every delta vector
    TWICE across multiple triggers — so the gate simultaneously
    checks the frozen-model persistence round-trip (parquet doubles
    are bit-exact), the redelivery idempotence of the code upsert,
    and the search math against the oracle's one-shot batch replay
    of the same split. See streaming/ann.py for the store design."""
    from tradecat_spark.plans.q_similarity import N_QUERIES, NPROBE
    from tradecat_spark.streaming import ann

    model_dir = tempfile.mkdtemp(prefix="tc_ann_model_")
    store = tempfile.mkdtemp(prefix="tc_ann_store_") + "/codes"
    src = tempfile.mkdtemp(prefix="tc_ann_src_")
    ckpt = tempfile.mkdtemp(prefix="tc_ann_ckpt_")

    e_raw = load_table(spark, sf_dir, "embeddings")
    base_pred = F.col("vec_id") % 10 != 0
    base = e_raw.filter(base_pred)
    delta = e_raw.filter(~base_pred).select("vec_id", "embedding")

    eb = base.select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    ann.train_ann_model(spark, eb, model_dir)
    model = ann.load_ann_model(spark, model_dir)
    ann.index_batch(
        spark, base.select("vec_id", "embedding"), -1, model, store
    )

    delta.repartition(2).write.mode("append").parquet(src)
    delta.repartition(2).write.mode("append").parquet(src)  # redelivery
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = ann.start_ann_index_maintenance(
        stream, model_dir, store, ckpt, available_now=True
    )
    q.awaitTermination(300)
    q.stop()

    qv = e_raw.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    return ann.search_index(spark, store, model_dir, qv, NPROBE, 3)


def _ann_index_oracle() -> str:
    from tradecat_spark.plans.q_similarity import _ivfadc_adc_sql, _pqr_sql

    return f"""
WITH {_pqr_sql("vec_id % 10 <> 0")},
{_ivfadc_adc_sql()}
SELECT query_id, probe_rank, cell_label, neighbor_id, adc_sim FROM (
  SELECT radc.*, ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY adc_sim DESC, neighbor_id ASC) AS rn
  FROM radc
) WHERE rn <= 3
"""


from tradecat_spark.plans.registry import REGISTRY as _REG_ANN  # noqa: E402

_REG_ANN["streaming_ann_index"].oracle = _ann_index_oracle()
