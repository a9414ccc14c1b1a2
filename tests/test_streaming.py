"""Structured Streaming layer tests (SURVEY.md §2.11 parity laws).

Strategy: drive each streaming op with a file source + availableNow
trigger into a memory sink, and assert it agrees with the equivalent
batch operator over the same rows — the stream/batch parity that makes
backfill reconciliation sound.
"""

from __future__ import annotations

import os
import random
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tradecat_spark.operators.rollup import ohlcv_rollup
from tradecat_spark.signals.engine import evaluate_rules, with_prev
from tradecat_spark.signals.rules import (
    DEFAULT_RULES,
    ConditionType,
    SignalRule,
    compile_condition,
    eval_condition_py,
)
from tradecat_spark.streaming.ingest import upsert_batch
from tradecat_spark.streaming.rollup import streaming_ohlcv
from tradecat_spark.streaming.signals import streaming_signals


@pytest.fixture()
def events_subset(spark, sf_dir, tmp_path):
    """A small slice of the events table written as a streamable dir."""
    src = str(tmp_path / "stream_src")
    df = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", F.expr("timestamp_micros(ts div 1000)").alias("ts")
                if dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)
                .get("ts") == "bigint" else F.col("ts"),
                "event_type", "value")
        .limit(4000)
    )
    df.write.mode("overwrite").parquet(src)
    return src, df


def _run_stream(df, queryname):
    q = (
        df.writeStream.format("memory")
        .queryName(queryname)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_rollup_matches_batch(spark, events_subset, tmp_path):
    src, df = events_subset
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    rolled = streaming_ohlcv(
        stream, ["event_type"], "ts", "value", interval="5 minutes",
        watermark="1 minute",
    )
    name = f"roll_{uuid.uuid4().hex[:8]}"
    _run_stream(rolled, name)
    got = spark.sql(f"SELECT * FROM {name}")
    want = ohlcv_rollup(
        spark.read.parquet(src), ["event_type"], "ts", "value",
        interval_sec=300,
    )
    cols = ["event_type", "bucket_ts", "open", "high", "low", "close",
            "trade_count"]
    g = sorted(map(tuple, got.select(cols).collect()))
    w = sorted(map(tuple, want.select(cols).collect()))
    assert g == w and len(g) > 0


def test_rollup_state_partitions_track_volume(spark, events_subset, tmp_path):
    """r15 verdict Next #5: the rollup's state-store partition count
    derives from stream volume (expected_keys), not the session's
    core-derived shuffle setting — each HDFSBackedStateStore instance
    pays a fixed per-commit cost every micro-batch, so at low key
    counts stores-per-query IS the cycle time (measured 32 stores =
    3.0-3.2 s/cycle vs 4 stores = 1.2-1.3 s for the same 600-symbol
    batch). Pins the policy values and that a started query's state
    operator actually uses the derived count, with results identical
    to the batch rollup."""
    from tradecat_spark.streaming.rollup import state_partitions_for

    # policy: ~50k keys/store, floor 4 (commit parallelism), cap 2048
    assert state_partitions_for(600) == 4
    assert state_partitions_for(50_000) == 4
    assert state_partitions_for(200_001) == 5
    assert state_partitions_for(10_000_000) == 200
    assert state_partitions_for(10**9) == 2048

    src, df = events_subset
    schema = spark.read.parquet(src).schema
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        rolled = streaming_ohlcv(
            spark.readStream.schema(schema).parquet(src),
            ["event_type"], "ts", "value", interval="5 minutes",
            watermark="1 minute", expected_keys=600,
        )
        name = f"rollvol_{uuid.uuid4().hex[:8]}"
        q = _run_stream(rolled, name)
        ops = [
            so
            for p in q.recentProgress
            for so in p.get("stateOperators", [])
        ]
        assert ops, "stream reported no stateful operators"
        assert all(
            so["numShufflePartitions"] == state_partitions_for(600)
            for so in ops
        )
        got = spark.sql(f"SELECT * FROM {name}")
        want = ohlcv_rollup(
            spark.read.parquet(src), ["event_type"], "ts", "value",
            interval_sec=300,
        )
        cols = ["event_type", "bucket_ts", "open", "high", "low",
                "close", "trade_count"]
        g = sorted(map(tuple, got.select(cols).collect()))
        w = sorted(map(tuple, want.select(cols).collect()))
        assert g == w and len(g) > 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_ingest_merge_law(spark, tmp_path):
    """Partial bar then closing bar through the foreachBatch upsert."""
    store = str(tmp_path / "bars")
    keys = ["symbol", "bucket_ts"]
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    partial = spark.createDataFrame(
        pd.DataFrame([
            dict(symbol="BTC", bucket_ts=t0, event_ts=t0, open=100.0,
                 high=105.0, low=99.0, close=104.0, trade_count=10,
                 is_closed=False),
        ])
    )
    closing = spark.createDataFrame(
        pd.DataFrame([
            # same bar arrives again: higher high, lower low, closed
            dict(symbol="BTC", bucket_ts=t0, event_ts=t0, open=101.0,
                 high=107.0, low=98.0, close=106.0, trade_count=25,
                 is_closed=True),
            dict(symbol="ETH", bucket_ts=t0, event_ts=t0, open=10.0,
                 high=11.0, low=9.0, close=10.5, trade_count=5,
                 is_closed=True),
        ])
    )
    upsert_batch(spark, partial, store, keys)
    upsert_batch(spark, closing, store, keys)
    rows = {r["symbol"]: r for r in spark.read.parquet(store).collect()}
    btc = rows["BTC"]
    # open: target bar was NOT closed → incoming open wins
    assert btc["open"] == 101.0
    assert btc["high"] == 107.0 and btc["low"] == 98.0
    assert btc["close"] == 106.0 and btc["is_closed"] is True
    assert btc["trade_count"] == 25
    assert rows["ETH"]["close"] == 10.5

    # replay the closing batch: idempotent (open keeps closed-bar rule)
    upsert_batch(spark, closing, store, keys)
    btc2 = {r["symbol"]: r for r in spark.read.parquet(store).collect()}["BTC"]
    assert (btc2["open"], btc2["high"], btc2["low"], btc2["close"]) == (
        101.0, 107.0, 98.0, 106.0,
    )


def test_ingest_intra_batch_duplicates(spark, tmp_path):
    """One micro-batch carrying several updates of the SAME live bar (the
    normal shape of a 3 s partial-bar buffer) must fold to one store row
    per key, applying the merge law in arrival order."""
    store = str(tmp_path / "bars_dup")
    keys = ["symbol", "bucket_ts"]
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    batch = spark.createDataFrame(
        pd.DataFrame([
            # three partial updates + the close, all for (BTC, t0);
            # event_ts is the arrival order (auto-detected by upsert)
            dict(symbol="BTC", bucket_ts=t0,
                 event_ts=t0 + pd.Timedelta(seconds=1), open=100.0,
                 high=101.0, low=99.5, close=100.5, trade_count=3,
                 is_closed=False),
            dict(symbol="BTC", bucket_ts=t0,
                 event_ts=t0 + pd.Timedelta(seconds=2), open=100.1,
                 high=103.0, low=99.0, close=102.0, trade_count=7,
                 is_closed=False),
            dict(symbol="BTC", bucket_ts=t0,
                 event_ts=t0 + pd.Timedelta(seconds=3), open=100.2,
                 high=104.0, low=98.5, close=103.5, trade_count=12,
                 is_closed=True),
            dict(symbol="ETH", bucket_ts=t0, event_ts=t0, open=10.0,
                 high=11.0, low=9.0, close=10.5, trade_count=5,
                 is_closed=False),
        ])
    )
    upsert_batch(spark, batch, store, keys, order_col=None)
    rows = spark.read.parquet(store).collect()
    assert len(rows) == 2  # one row per key, not four
    btc = {r["symbol"]: r for r in rows}["BTC"]
    # first closed row's open wins; high/low span the batch; last close
    assert btc["open"] == 100.2
    assert btc["high"] == 104.0 and btc["low"] == 98.5
    assert btc["close"] == 103.5 and btc["trade_count"] == 12
    assert btc["is_closed"] is True

    # merging the same folded batch again is a no-op (idempotent replay)
    upsert_batch(spark, batch, store, keys)
    again = {r["symbol"]: r for r in spark.read.parquet(store).collect()}
    assert len(again) == 2
    assert again["BTC"]["high"] == 104.0 and again["BTC"]["open"] == 100.2


def test_ingest_rewrites_only_touched_partitions(spark, tmp_path):
    """The store is date-partitioned and a batch for day D must not
    rewrite day C's files — the O(hot partition) contract that keeps a
    3 s trigger viable when the store is 100× the batch."""
    import glob
    import os

    store = str(tmp_path / "bars_part")
    keys = ["symbol", "bucket_ts"]
    d1 = pd.Timestamp("2025-01-01 00:00:00")
    d2 = pd.Timestamp("2025-01-02 00:00:00")

    def bar(sym, ts, px):
        return dict(symbol=sym, bucket_ts=ts, event_ts=ts, open=px,
                    high=px, low=px, close=px, trade_count=1,
                    is_closed=True)

    upsert_batch(
        spark, spark.createDataFrame(pd.DataFrame([bar("BTC", d1, 1.0)])),
        store, keys,
    )
    day1_files = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{store}/_part=2025-01-01/*.parquet")
    }
    assert day1_files, "expected a date partition directory"

    upsert_batch(
        spark, spark.createDataFrame(pd.DataFrame([bar("BTC", d2, 2.0)])),
        store, keys,
    )
    # day-1 partition files untouched (same paths, same mtimes)
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{store}/_part=2025-01-01/*.parquet")
    }
    assert after == day1_files
    got = {
        (r["symbol"], r["bucket_ts"]): r["close"]
        for r in spark.read.parquet(store).collect()
    }
    assert got == {("BTC", d1): 1.0, ("BTC", d2): 2.0}


def test_merge_presence_flags_null_open(spark):
    """A present row whose open is legitimately NULL must still take the
    merge-law branch (presence is tracked with flags, not payload nulls)."""
    from tradecat_spark.operators.merge import merge_candles

    t0 = pd.Timestamp("2025-01-01 00:00:00")
    target = spark.createDataFrame(
        pd.DataFrame([
            dict(symbol="BTC", bucket_ts=t0, open=None, high=105.0,
                 low=99.0, close=104.0, trade_count=10, is_closed=False),
        ])
    )
    source = spark.createDataFrame(
        pd.DataFrame([
            dict(symbol="BTC", bucket_ts=t0, open=101.0, high=102.0,
                 low=100.0, close=101.5, trade_count=12, is_closed=True),
        ])
    )
    out = merge_candles(target, source, ["symbol", "bucket_ts"]).collect()
    assert len(out) == 1
    r = out[0]
    # merge-law branch taken: greatest(high)=105 (NOT the source-only
    # passthrough that a null-open presence test would have produced)
    assert r["high"] == 105.0 and r["low"] == 99.0
    assert r["open"] == 101.0  # target not closed → source open
    assert r["close"] == 101.5 and r["is_closed"] is True


def test_watermark_late_data_and_checkpoint_restart(spark, tmp_path):
    """Two availableNow runs sharing a checkpoint: the second run restores
    the first run's watermark, so (a) a row later than the watermark is
    DROPPED (the reference repairs such rows via batch backfill, not the
    stream — SURVEY §2.11), and (b) windows already emitted by run 1 are
    not re-emitted by run 2 (exactly-once append across restarts)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t0 = pd.Timestamp("2025-01-01 00:00:00")

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows)).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema("k string, ts timestamp, v double").parquet(src)
        rolled = streaming_ohlcv(
            stream, ["k"], "ts", "v", interval="5 minutes", watermark="1 minute"
        )
        q = (
            rolled.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    m = pd.Timedelta(minutes=1)
    # run 1: max event time 00:12 → watermark 00:11 → windows 00:00 and
    # 00:05 finalize; window 00:10 stays open in state
    write([
        dict(k="a", ts=t0 + 0 * m, v=1.0),
        dict(k="a", ts=t0 + 1 * m, v=2.0),
        dict(k="a", ts=t0 + 6 * m, v=3.0),
        dict(k="a", ts=t0 + 12 * m, v=4.0),
    ])
    run()
    first = {r["bucket_ts"] for r in spark.read.parquet(out).collect()}
    assert first == {t0, t0 + 5 * m}

    # run 2: one LATE row (00:01 < restored watermark 00:11 → dropped) and
    # one fresh row at 00:20 that advances the watermark past window 00:10
    write([
        dict(k="a", ts=t0 + 1 * m, v=999.0),
        dict(k="a", ts=t0 + 20 * m, v=5.0),
    ])
    run()
    rows = spark.read.parquet(out).collect()
    buckets = sorted(r["bucket_ts"] for r in rows)
    # no duplicates of run-1 windows, and exactly one new finalized window
    assert buckets == [t0, t0 + 5 * m, t0 + 10 * m]
    by = {r["bucket_ts"]: r for r in rows}
    assert by[t0]["high"] == 2.0            # late 999.0 never entered state
    assert by[t0 + 10 * m]["close"] == 4.0  # emitted with run-1 contents


RULES = [
    SignalRule(
        "thr_up", "t", ConditionType.THRESHOLD_CROSS_UP,
        {"field": "x", "threshold": 50.0}, direction="long",
    ),
    SignalRule(
        "cross_dn", "t", ConditionType.CROSS_DOWN,
        {"fast": "x", "slow": "y"}, direction="short",
    ),
    SignalRule(
        "state", "t", ConditionType.STATE_CHANGE,
        {"field": "label", "to": "hot"},
    ),
]


def _snapshots(spark):
    random.seed(7)
    rows = []
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    for key in ["a", "b", "c"]:
        for i in range(40):
            rows.append(
                dict(
                    k=key,
                    snap_ts=t0 + pd.Timedelta(minutes=10 * i),
                    x=float(random.randint(0, 100)),
                    y=float(random.randint(0, 100)),
                    label=random.choice(["hot", "cold", "warm"]),
                )
            )
    return spark.createDataFrame(pd.DataFrame(rows))


def test_streaming_signals_match_batch(spark, tmp_path):
    snaps = _snapshots(spark)
    src = str(tmp_path / "snaps")
    snaps.write.mode("overwrite").parquet(src)

    batch_events = evaluate_rules(
        spark.read.parquet(src), RULES, ["k"], "snap_ts",
        cooldown_sec=3600,
    )
    want = sorted(
        (r["k"], r["fired_at"], r["rule"]) for r in batch_events.collect()
    )

    stream = spark.readStream.schema(snaps.schema).parquet(src)
    sig = streaming_signals(stream, RULES, ["k"], "snap_ts", cooldown_sec=3600)
    name = f"sig_{uuid.uuid4().hex[:8]}"
    q = (
        sig.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["k"], r["fired_at"], r["rule"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    )
    assert len(want) > 0
    assert got == want


def test_py_and_column_rule_eval_agree(spark):
    """The streaming (Python) and batch (Column) evaluators implement the
    same 8-type semantics — fuzz them against each other."""
    snaps = _snapshots(spark)
    rules = RULES + [
        SignalRule("rng_in", "t", ConditionType.RANGE_ENTER,
                   {"field": "x", "low": 40, "high": 60}),
        SignalRule("rng_out", "t", ConditionType.RANGE_EXIT,
                   {"field": "x", "low": 40, "high": 60}),
        SignalRule("contains", "t", ConditionType.CONTAINS,
                   {"field": "label", "values": ["ho", "ld"], "mode": "any"}),
        SignalRule("thr_dn", "t", ConditionType.THRESHOLD_CROSS_DOWN,
                   {"field": "y", "threshold": 25.0}),
        SignalRule("cross_up", "t", ConditionType.CROSS_UP,
                   {"fast": "x", "slow": "y"}),
    ]
    prev = with_prev(snaps, ["k"], "snap_ts").toPandas()
    for rule in rules:
        col_hits = set()
        df = with_prev(snaps, ["k"], "snap_ts").filter(compile_condition(rule))
        for r in df.collect():
            col_hits.add((r["k"], r["snap_ts"]))
        py_hits = set()
        for _, row in prev.iterrows():
            p = {c[len("prev_"):]: row[c] for c in prev.columns
                 if c.startswith("prev_") and pd.notna(row[c])}
            c_ = {c: row[c] for c in ["x", "y", "label"]}
            if eval_condition_py(rule, p, c_):
                py_hits.add((row["k"], row["snap_ts"]))
        assert py_hits == col_hits, rule.name


def test_streaming_macd_matches_pandas_across_restarts(spark, tmp_path):
    """The incremental MACD state must survive a checkpoint restart and
    reproduce the exact ewm(adjust=False) recurrence: two availableNow
    runs over a growing source equal one pandas pass over all bars."""
    from tradecat_spark.streaming.incremental import streaming_macd

    src = str(tmp_path / "macd_src")
    ckpt = str(tmp_path / "macd_ckpt")
    out = str(tmp_path / "macd_out")
    t0 = pd.Timestamp("2025-01-01 00:00:00")

    def write(vals, start):
        rows = [
            dict(k=k, ts=t0 + pd.Timedelta(minutes=start + i), close=v)
            for k in ["a", "b"]
            for i, v in enumerate(vals)
        ]
        spark.createDataFrame(pd.DataFrame(rows)).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(
            "k string, ts timestamp, close double"
        ).parquet(src)
        q = (
            streaming_macd(stream, ["k"], "ts", "close")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    batch1 = [100.0, 101.5, 99.2, 103.7, 102.1]
    batch2 = [104.9, 101.0, 98.5]
    write(batch1, 0)
    run()
    write(batch2, len(batch1))
    run()

    got = (
        spark.read.parquet(out)
        .filter(F.col("k") == "a")
        .orderBy("ts")
        .toPandas()
    )
    s = pd.Series(batch1 + batch2)
    ema12 = s.ewm(span=12, adjust=False).mean()
    ema26 = s.ewm(span=26, adjust=False).mean()
    macd = ema12 - ema26
    sig = macd.ewm(span=9, adjust=False).mean()
    assert len(got) == len(s)
    assert got["ema_fast"].tolist() == ema12.tolist()
    assert got["ema_slow"].tolist() == ema26.tolist()
    assert got["macd"].tolist() == macd.tolist()
    assert got["signal_line"].tolist() == sig.tolist()
    assert got["hist"].tolist() == (macd - sig).tolist()


def test_ingest_crash_before_commit_leaves_store_intact(spark, tmp_path, monkeypatch):
    """A crash after staging but before the partition commit must leave
    the store byte-identical; replaying the same batch afterwards
    converges (exactly-once by idempotence — the checkpoint would not
    have advanced past the failed batch)."""
    from tradecat_spark.streaming import ingest as ing

    store = str(tmp_path / "crash_store")
    keys = ["symbol", "bucket_ts"]
    t0 = pd.Timestamp("2025-01-01 00:00:00")

    def bars(close):
        return spark.createDataFrame(pd.DataFrame([
            dict(symbol="BTC", bucket_ts=t0, event_ts=t0, open=100.0,
                 high=105.0, low=99.0, close=close, trade_count=10,
                 is_closed=False),
        ]))

    ing.upsert_batch(spark, bars(101.0), store, keys)
    before = sorted(
        r.asDict() for r in ing.read_store(spark, store).collect()
    )

    def boom(*a, **k):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(ing, "_commit_staging", boom)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="simulated crash"):
        ing.upsert_batch(spark, bars(102.0), store, keys)
    after_crash = sorted(
        r.asDict() for r in ing.read_store(spark, store).collect()
    )
    assert after_crash == before          # store untouched
    assert not os.path.exists(store + ".staging")  # staging cleaned up

    monkeypatch.undo()
    ing.upsert_batch(spark, bars(102.0), store, keys)   # replay
    final = {r["symbol"]: r for r in ing.read_store(spark, store).collect()}
    assert final["BTC"]["close"] == 102.0
    assert final["BTC"]["high"] == 105.0


def test_merge_reference_on_conflict_parity(spark):
    """The exact reference ON CONFLICT branches the r5 advice flagged
    (001_timescaledb.sql:106-119): a closed target keeps its open ONLY
    against a partial update — a re-sent CLOSED bar overwrites it — and
    trade_count is COALESCE(EXCLUDED, target), not GREATEST."""
    from tradecat_spark.operators.merge import merge_candles

    t0 = pd.Timestamp("2025-01-01 00:00:00")
    t1 = t0 + pd.Timedelta(minutes=1)
    t2 = t0 + pd.Timedelta(minutes=2)
    target = spark.createDataFrame(
        pd.DataFrame([
            # closed bar, partial update incoming → open frozen
            dict(symbol="BTC", bucket_ts=t0, open=100.0, high=105.0,
                 low=99.0, close=104.0, trade_count=50, is_closed=True),
            # closed bar, CLOSED correction incoming → open overwritten
            dict(symbol="BTC", bucket_ts=t1, open=200.0, high=205.0,
                 low=199.0, close=204.0, trade_count=60, is_closed=True),
            # closed bar with NULL stored open, partial incoming →
            # stays NULL (the reference never back-fills a frozen open)
            dict(symbol="BTC", bucket_ts=t2, open=None, high=305.0,
                 low=299.0, close=304.0, trade_count=70, is_closed=True),
        ])
    )
    source = spark.createDataFrame(
        pd.DataFrame([
            dict(symbol="BTC", bucket_ts=t0, open=101.0, high=102.0,
                 low=100.0, close=101.5, trade_count=None,
                 is_closed=False),
            dict(symbol="BTC", bucket_ts=t1, open=201.0, high=202.0,
                 low=200.0, close=201.5, trade_count=61, is_closed=True),
            dict(symbol="BTC", bucket_ts=t2, open=301.0, high=302.0,
                 low=300.0, close=301.5, trade_count=None,
                 is_closed=False),
        ]),
        schema=("symbol string, bucket_ts timestamp, open double, "
                "high double, low double, close double, "
                "trade_count bigint, is_closed boolean"),
    )
    rows = {
        r["bucket_ts"]: r
        for r in merge_candles(
            target, source, ["symbol", "bucket_ts"]
        ).collect()
    }
    r0 = rows[t0]
    assert r0["open"] == 100.0        # closed + partial → frozen
    assert r0["trade_count"] == 50    # COALESCE(NULL, 50)
    assert r0["close"] == 101.5 and r0["is_closed"] is True
    r1 = rows[t1]
    assert r1["open"] == 201.0        # closed + closed → resend wins
    assert r1["trade_count"] == 61    # COALESCE(61, 60)
    r2 = rows[t2]
    assert r2["open"] is None         # frozen NULL stays NULL


def test_fold_batch_open_sequential_law(spark):
    """fold_batch's open must equal the sequential ON CONFLICT fold:
    every row overwrites open until the bar closes; afterwards only
    CLOSED rows overwrite — so the result is the open of the last
    closed row (or of the last row when the bar never closes)."""
    from tradecat_spark.operators.merge import fold_batch

    t0 = pd.Timestamp("2025-01-01 00:00:00")
    rows = [
        # key A: closes at seq=3 → open freezes at the closed row's
        # open; the later partial 55 must NOT override
        dict(symbol="A", bucket_ts=t0, seq=1, open=99.0, high=1.0,
             low=1.0, close=1.0, trade_count=1, is_closed=False),
        dict(symbol="A", bucket_ts=t0, seq=2, open=101.0, high=2.0,
             low=0.5, close=2.0, trade_count=2, is_closed=False),
        dict(symbol="A", bucket_ts=t0, seq=3, open=102.0, high=3.0,
             low=0.4, close=3.0, trade_count=3, is_closed=True),
        dict(symbol="A", bucket_ts=t0, seq=4, open=55.0, high=4.0,
             low=0.3, close=4.0, trade_count=4, is_closed=False),
        # key B: closes twice — the LATER closed row's open wins (a
        # closed resend overwrites, exactly the ON CONFLICT branch)
        dict(symbol="B", bucket_ts=t0, seq=1, open=70.0, high=1.0,
             low=1.0, close=1.0, trade_count=1, is_closed=True),
        dict(symbol="B", bucket_ts=t0, seq=2, open=77.0, high=2.0,
             low=0.5, close=2.0, trade_count=2, is_closed=True),
        dict(symbol="B", bucket_ts=t0, seq=3, open=88.0, high=3.0,
             low=0.5, close=3.0, trade_count=None, is_closed=False),
        # key C: never closes → last row's open wins, even NULL
        dict(symbol="C", bucket_ts=t0, seq=1, open=10.0, high=1.0,
             low=1.0, close=1.0, trade_count=1, is_closed=False),
        dict(symbol="C", bucket_ts=t0, seq=2, open=20.0, high=2.0,
             low=0.5, close=2.0, trade_count=2, is_closed=False),
        dict(symbol="C", bucket_ts=t0, seq=3, open=None, high=3.0,
             low=0.4, close=3.0, trade_count=3, is_closed=False),
    ]
    batch = spark.createDataFrame(
        pd.DataFrame(rows),
        schema=("symbol string, bucket_ts timestamp, seq bigint, "
                "open double, high double, low double, close double, "
                "trade_count bigint, is_closed boolean"),
    ).repartition(4)
    out = {
        r["symbol"]: r
        for r in fold_batch(
            batch, ["symbol", "bucket_ts"], order_col="seq"
        ).collect()
    }
    assert out["A"]["open"] == 102.0
    assert out["A"]["close"] == 4.0 and out["A"]["is_closed"] is True
    assert out["B"]["open"] == 77.0 and out["B"]["is_closed"] is True
    # trade_count: last NON-NULL (sequential COALESCE), not max
    assert out["B"]["trade_count"] == 2
    assert out["C"]["open"] is None and out["C"]["is_closed"] is False


def test_streaming_macd_multi_chunk_groups(spark, tmp_path):
    """Arrow delivers a key's micro-batch as multiple chunks once it
    exceeds maxRecordsPerBatch; the fold must still run in global
    event-time order (regression: chunk-local sorting broke parity)."""
    from tradecat_spark.streaming.incremental import streaming_macd

    src = str(tmp_path / "mc_src")
    ckpt = str(tmp_path / "mc_ckpt")
    out = str(tmp_path / "mc_out")
    t0 = pd.Timestamp("2025-01-01 00:00:00")

    rng = random.Random(7)
    vals = [100.0 + rng.uniform(-5, 5) for _ in range(37)]
    rows = [
        dict(k="a", ts=t0 + pd.Timedelta(minutes=i), close=v)
        for i, v in enumerate(vals)
    ]
    rng.shuffle(rows)  # arrival order != event-time order
    spark.createDataFrame(pd.DataFrame(rows)).repartition(1).write.parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        stream = spark.readStream.schema(
            "k string, ts timestamp, close double"
        ).parquet(src)
        q = (
            streaming_macd(stream, ["k"], "ts", "close")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = spark.read.parquet(out).orderBy("ts").toPandas()
    s = pd.Series(vals)
    ema12 = s.ewm(span=12, adjust=False).mean()
    ema26 = s.ewm(span=26, adjust=False).mean()
    assert len(got) == len(s)
    assert got["ema_fast"].tolist() == ema12.tolist()
    assert got["ema_slow"].tolist() == ema26.tolist()


def _run_fold_stream(spark, spec, src, ckpt, out, schema):
    from tradecat_spark.streaming.incremental import streaming_fold

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_fold(stream, ["k"], "ts", spec)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()


def _bars_for_fold(n, seed=3):
    rng = random.Random(seed)
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    px = 100.0
    rows = []
    for i in range(n):
        px += rng.uniform(-2, 2)
        hi = px + rng.uniform(0, 1.5)
        lo = px - rng.uniform(0, 1.5)
        vol = rng.uniform(10, 500)
        rows.append(dict(
            k="a", ts=t0 + pd.Timedelta(minutes=i),
            high=hi, low=lo, close=px, volume=vol,
            taker_buy_volume=vol * rng.uniform(0.2, 0.8),
        ))
    return rows


def _fold_parity_case(spark, tmp_path, spec, schema, expected_fn, tag):
    """Two availableNow runs over a growing source == one pandas pass
    (checkpoint restart keeps the registers bit-identical)."""
    src = str(tmp_path / f"{tag}_src")
    ckpt = str(tmp_path / f"{tag}_ckpt")
    out = str(tmp_path / f"{tag}_out")
    rows = _bars_for_fold(40)
    cut = 25
    spark.createDataFrame(pd.DataFrame(rows[:cut])).write.mode(
        "append").parquet(src)
    _run_fold_stream(spark, spec, src, ckpt, out, schema)
    spark.createDataFrame(pd.DataFrame(rows[cut:])).write.mode(
        "append").parquet(src)
    _run_fold_stream(spark, spec, src, ckpt, out, schema)

    got = spark.read.parquet(out).orderBy("ts").toPandas()
    assert len(got) == len(rows)
    pdf = pd.DataFrame(rows)
    for col, exp in expected_fn(pdf).items():
        g = got[col].tolist()
        e = exp.tolist()
        assert all(
            (pd.isna(a) and pd.isna(b)) or a == b for a, b in zip(g, e)
        ), col
        assert len(g) == len(e)


def test_streaming_ema_gc_matches_pandas(spark, tmp_path):
    from tradecat_spark.streaming.incremental import EmaGcSpec

    def expected(pdf):
        c = pdf["close"]
        return {
            f"ema{n}": c.ewm(span=n, adjust=False, min_periods=1).mean()
            for n in (7, 25, 99)
        }

    _fold_parity_case(
        spark, tmp_path, EmaGcSpec(),
        "k string, ts timestamp, close double", expected, "emagc",
    )


def test_streaming_atr_matches_pandas(spark, tmp_path):
    from tradecat_spark.streaming.incremental import AtrSpec

    def expected(pdf):
        prev = pdf["close"].shift(1)
        tr = pd.concat([
            (pdf["high"] - pdf["low"]).abs(),
            (pdf["high"] - prev).abs(),
            (pdf["low"] - prev).abs(),
        ], axis=1).max(axis=1)
        return {"atr": tr.ewm(
            alpha=1 / 14, adjust=False, min_periods=14).mean()}

    _fold_parity_case(
        spark, tmp_path, AtrSpec(),
        "k string, ts timestamp, high double, low double, close double",
        expected, "atr",
    )


def test_streaming_kdj_matches_pandas(spark, tmp_path):
    from tradecat_spark.streaming.incremental import KdjSpec

    def expected(pdf):
        low_n = pdf["low"].rolling(9, min_periods=9).min()
        high_n = pdf["high"].rolling(9, min_periods=9).max()
        rsv = (pdf["close"] - low_n) / (high_n - low_n) * 100
        k = rsv.ewm(alpha=1 / 3, adjust=False, min_periods=3).mean()
        d = k.ewm(alpha=1 / 3, adjust=False, min_periods=3).mean()
        return {"kdj_k": k, "kdj_d": d, "kdj_j": 3 * k - 2 * d}

    _fold_parity_case(
        spark, tmp_path, KdjSpec(),
        "k string, ts timestamp, high double, low double, close double",
        expected, "kdj",
    )


def test_streaming_obv_cvd_match_pandas(spark, tmp_path):
    import numpy as np

    from tradecat_spark.streaming.incremental import CvdSpec, ObvSpec

    def expected_obv(pdf):
        direction = np.sign(pdf["close"].diff()).fillna(0)
        return {"obv": (direction * pdf["volume"]).cumsum()}

    _fold_parity_case(
        spark, tmp_path, ObvSpec(),
        "k string, ts timestamp, close double, volume double",
        expected_obv, "obv",
    )

    def expected_cvd(pdf):
        buy = pdf["taker_buy_volume"]
        sell = (pdf["volume"] - buy).clip(lower=0.0)
        return {"cvd": (buy - sell).cumsum()}

    _fold_parity_case(
        spark, tmp_path, CvdSpec(),
        "k string, ts timestamp, volume double, taker_buy_volume double",
        expected_cvd, "cvd",
    )


def test_delta_merge_set_equals_merge_law(spark):
    """DELTA_MERGE_SET (the Delta whenMatchedUpdate rendering of the ON
    CONFLICT law) must agree with merge_candles on matched keys — one
    law, two renderings."""
    from tradecat_spark.operators.merge import (
        DELTA_MERGE_SET,
        MERGE_COLS,
        merge_candles,
    )

    t0 = pd.Timestamp("2025-01-01 00:00:00")
    cases = [
        # (target, source) covering: closed target w/ and w/o open,
        # live target, NULL opens on either side
        (dict(open=100.0, high=105.0, low=99.0, close=104.0,
              trade_count=10, is_closed=True),
         dict(open=101.0, high=106.0, low=98.0, close=101.5,
              trade_count=12, is_closed=False)),
        (dict(open=None, high=105.0, low=99.0, close=104.0,
              trade_count=10, is_closed=True),
         dict(open=101.0, high=102.0, low=100.0, close=101.5,
              trade_count=2, is_closed=False)),
        (dict(open=100.0, high=101.0, low=99.5, close=100.2,
              trade_count=3, is_closed=False),
         dict(open=None, high=100.8, low=99.0, close=100.9,
              trade_count=5, is_closed=True)),
    ]
    rows_t, rows_s = [], []
    for i, (t, s) in enumerate(cases):
        key = dict(symbol=f"S{i}", bucket_ts=t0)
        rows_t.append({**key, **t})
        rows_s.append({**key, **s})
    target = spark.createDataFrame(pd.DataFrame(rows_t))
    source = spark.createDataFrame(pd.DataFrame(rows_s))
    keys = ["symbol", "bucket_ts"]

    via_law = {
        r["symbol"]: r.asDict()
        for r in merge_candles(target, source, keys).collect()
    }
    joined = target.alias("t").join(source.alias("s"), keys, "inner")
    via_delta = {
        r["symbol"]: r.asDict()
        for r in joined.selectExpr(
            "symbol", *[f"{sql} AS {c}" for c, sql in DELTA_MERGE_SET.items()]
        ).collect()
    }
    for sym, want in via_delta.items():
        got = {c: via_law[sym][c] for c in ("symbol", *MERGE_COLS)}
        assert got == want, sym


def test_trim_to_retention_matches_policy_audit(spark, sf_dir):
    """trim_to_retention over the multi-interval bars must keep exactly
    the rows the retention_policy_plan audit counts as kept — one law,
    two renderings (the audit is the hash-checked one)."""
    from tradecat_spark.operators.retention import trim_to_retention
    from tradecat_spark.plans.registry import load_all

    specs = load_all()
    audit = {
        (r["event_type"], r["interval"]): r
        for r in specs["retention_policy_plan"].fn(spark, sf_dir).collect()
    }

    from tradecat_spark.catalog import load_table
    from tradecat_spark.plans.q_serving import RETENTION_POLICY
    from tradecat_spark.operators.rollup import bucket_ts

    e = load_table(spark, sf_dir, "events")
    pairs = F.array(*[
        F.struct(
            F.lit(lbl).alias("interval"),
            F.lit(cap).alias("cap"),
            bucket_ts("ts", sec).alias("bucket_ts"),
        )
        for lbl, (sec, cap) in RETENTION_POLICY.items()
    ])
    bars = (
        e.select("event_type", F.explode(pairs).alias("iv"))
        .groupBy("event_type", F.col("iv.interval").alias("interval"),
                 F.col("iv.cap").alias("cap"),
                 F.col("iv.bucket_ts").alias("bucket_ts"))
        .agg(F.count(F.lit(1)).alias("trade_count"))
    )
    kept = trim_to_retention(
        bars, ["event_type", "interval"], "bucket_ts", F.col("cap")
    )
    got = {
        (r["event_type"], r["interval"]): r
        for r in kept.groupBy("event_type", "interval").agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("trade_count").cast("long").alias("rows_kept"),
            F.date_format(F.min("bucket_ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("oldest_kept_ts"),
        ).collect()
    }
    assert set(got) == set(audit)
    for key, g in got.items():
        a = audit[key]
        assert g["n_kept"] == a["n_bars"] - a["n_trim"], key
        assert g["rows_kept"] == a["rows_kept"], key
        assert g["oldest_kept_ts"] == a["oldest_kept_ts"], key


def test_drop_expired_partitions_is_metadata_only(spark, tmp_path):
    """The horizon drop must remove exactly the expired date partitions
    and leave every kept partition's files byte-untouched."""
    import glob

    from tradecat_spark.operators.retention import (
        drop_expired_partitions,
        expired_partition_values,
    )
    from tradecat_spark.streaming.ingest import read_store, upsert_batch

    store = str(tmp_path / "ret_store")
    keys = ["symbol", "bucket_ts"]
    days = [f"2025-01-{d:02d}" for d in (1, 2, 3, 4)]
    rows = [
        dict(symbol="BTC", bucket_ts=pd.Timestamp(f"{d} 00:00:00"),
             event_ts=pd.Timestamp(f"{d} 00:00:00"),
             open=100.0, high=105.0, low=99.0, close=101.0 + i,
             trade_count=10, is_closed=True)
        for i, d in enumerate(days)
    ]
    upsert_batch(spark, spark.createDataFrame(pd.DataFrame(rows)), store, keys)

    kept_files = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{store}/_part=2025-01-03/*.parquet")
        + glob.glob(f"{store}/_part=2025-01-04/*.parquet")
    }
    assert kept_files

    assert expired_partition_values(spark, store, "2025-01-03") == [
        "2025-01-01", "2025-01-02",
    ]
    dropped = drop_expired_partitions(spark, store, "2025-01-03")
    assert dropped == ["2025-01-01", "2025-01-02"]
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{store}/_part=2025-01-03/*.parquet")
        + glob.glob(f"{store}/_part=2025-01-04/*.parquet")
    }
    assert after == kept_files
    got = sorted(r["bucket_ts"] for r in read_store(spark, store).collect())
    assert got == [pd.Timestamp(f"{d} 00:00:00") for d in days[2:]]
    # idempotent: nothing left to drop
    assert drop_expired_partitions(spark, store, "2025-01-03") == []


def test_streaming_kdj_parity_short_history_key(spark, tmp_path):
    """A key with too few bars for even one RSV (< 9) or too few
    non-NaN RSVs for a mature D (< 5) must emit nothing — and the
    DuckDB oracle must survive the empty scan lists instead of
    crashing list_reduce (regression: ks[3:] on a short key)."""
    import duckdb

    import __spark_entry__ as E
    from tests.oracle_utils import assert_frames_match

    rows = []
    eid = 0
    for key, n_hours in (("tiny", 6), ("short", 10), ("full", 40)):
        for h in range(n_hours):
            eid += 1
            rows.append({
                "event_id": eid,
                "ts": pd.Timestamp("2025-03-01") + pd.Timedelta(hours=h),
                "user_id": 1,
                "event_type": key,
                "value": 100.0 + ((h * 37) % 11) + h * 0.01,
                "props": "{}",
            })
    pd.DataFrame(rows).to_parquet(str(tmp_path / "events.parquet"))

    spdf = E.queries()["streaming_kdj_parity"](
        spark, str(tmp_path)
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    odf = con.execute(E.oracle_sql()["streaming_kdj_parity"]).df()
    # tiny (6 bars: no RSV at all) and short (10 bars: 2 RSVs, D never
    # matures) contribute nothing; full matures normally
    assert set(spdf["event_type"]) == {"full"}
    assert_frames_match(spdf, odf, "streaming_kdj_parity_short")


def test_streaming_dedup_never_duplicates_across_batches(spark, tmp_path):
    """Dedup contract under adversarial batch slicing
    (maxFilesPerTrigger=1, files interleaving event time): a replayed
    row is either deduped by state or dropped as late — so NO id ever
    emits twice, under any slicing. Completeness is NOT promised here:
    a first copy surfacing after the watermark passed its event time
    is dropped as late (the standard streaming contract) — which is
    why the gate query drains its source in a single batch."""
    import uuid

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows = pd.DataFrame({
        "event_id": range(200),
        "ts": [pd.Timestamp("2025-05-01") + pd.Timedelta(minutes=i)
               for i in range(200)],
    })
    df = spark.createDataFrame(rows)
    df.write.mode("append").parquet(src)
    df.write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    dd = stream.withWatermark("ts", "10 minutes") \
        .dropDuplicatesWithinWatermark(["event_id"])
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        dd.writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.table(name)
    n, nd = got.count(), got.select("event_id").distinct().count()
    assert n == nd  # the invariant: never a duplicate emission
    assert nd <= 200


def test_session_append_exactly_once_and_finished_subset(spark, sf_dir):
    """Append-mode sessions must be (a) emitted exactly once, and
    (b) precisely the complete-mode sessions whose window end has
    passed the watermark (max event time - 1 min, inclusive)."""
    from pyspark.sql import functions as F

    from tradecat_spark.catalog import load_table
    from tradecat_spark.plans.registry import load_all

    specs = load_all()
    ap = specs["streaming_session_append"].fn(spark, sf_dir).toPandas()
    comp = (
        specs["streaming_session_windows"].fn(spark, sf_dir).toPandas()
    )
    assert not ap.duplicated(["user_id", "session_start_us"]).any()

    mx_us = (
        load_table(spark, sf_dir, "events")
        .agg(F.max(F.unix_micros("ts")))
        .collect()[0][0]
    )
    finished = comp[comp["window_end_us"] <= mx_us - 60_000_000]
    key = ["user_id", "session_start_us", "window_end_us", "n_events"]
    a = ap[key].sort_values(key).reset_index(drop=True)
    b = finished[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b), (
        f"append rows != watermark-finished complete rows "
        f"({len(a)} vs {len(b)})"
    )
    assert 0 < len(a) < len(comp)  # some finished, some still open


def test_stream_join_state_survives_checkpoint_restart(spark, tmp_path):
    """An interval-join match that STRADDLES a restart (click stored in
    run 1's state, purchase arriving in run 2) must still emit — the
    join state stores live in the checkpoint, not the process."""
    src = str(tmp_path / "ssj_src")
    ckpt = str(tmp_path / "ssj_ckpt")
    out = str(tmp_path / "ssj_out")
    t0 = pd.Timestamp("2025-01-01 00:00:00")

    def write(rows):
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["event_type", "user_id", "ts"])
        ).write.mode("append").parquet(src)

    def run():
        schema = "event_type string, user_id long, ts timestamp"

        def side(t, p):
            s = (
                spark.readStream.schema(schema).parquet(src)
                .filter(F.col("event_type") == t)
                .withWatermark("ts", "10 minutes")
            )
            return s.select(
                *[F.col(c).alias(f"{p}_{c}") for c in s.columns]
            )

        j = side("purchase", "p").join(
            side("click", "c"),
            (F.col("c_user_id") == F.col("p_user_id"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
            "inner",
        )
        q = (
            j.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    m = pd.Timedelta  # minutes helper
    # run 1: a click that will match a FUTURE purchase, plus one
    # same-batch pair for user 2
    write([
        ("click", 1, t0 + m("60m")),
        ("click", 2, t0 + m("90m")),
        ("purchase", 2, t0 + m("100m")),
    ])
    run()
    # run 2 (same checkpoint): purchase 50 min after user 1's stored
    # click — cross-restart match; in-order arrival (>= run-1 max)
    write([
        ("purchase", 1, t0 + m("110m")),
        ("click", 3, t0 + m("115m")),
        ("purchase", 3, t0 + m("120m")),
    ])
    run()

    got = sorted(
        (r.p_user_id, r.p_ts, r.c_ts)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted([
        (1, t0 + m("110m"), t0 + m("60m")),   # straddles the restart
        (2, t0 + m("100m"), t0 + m("90m")),
        (3, t0 + m("120m"), t0 + m("115m")),
    ])
    assert got == want, got


def test_fold_batch_straddling_partitions_latest_event_time_wins(spark, tmp_path):
    """One key's updates spread across MANY input partitions must still
    resolve latest-write-wins by EVENT TIME, not by partition order
    (r4 verdict item 3). The rows are deliberately laid out so the
    highest event_ts sits in the FIRST partition — a partition-index
    proxy would pick the wrong close."""
    from tradecat_spark.streaming.ingest import read_store, upsert_batch

    store = str(tmp_path / "straddle_store")
    keys = ["symbol", "bucket_ts"]
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    # arrival order 3, 1, 2 by layout; event_ts says the close=300 row
    # (first in layout) is the NEWEST
    rows = [
        dict(symbol="BTC", bucket_ts=t0,
             event_ts=t0 + pd.Timedelta(seconds=3), open=100.3,
             high=104.0, low=98.0, close=300.0, trade_count=30,
             is_closed=True),
        dict(symbol="BTC", bucket_ts=t0,
             event_ts=t0 + pd.Timedelta(seconds=1), open=100.1,
             high=102.0, low=99.0, close=100.0, trade_count=10,
             is_closed=False),
        dict(symbol="BTC", bucket_ts=t0,
             event_ts=t0 + pd.Timedelta(seconds=2), open=100.2,
             high=103.0, low=98.5, close=200.0, trade_count=20,
             is_closed=False),
    ]
    batch = spark.createDataFrame(
        pd.DataFrame(rows)
    ).repartition(3)  # straddle: each update in its own partition
    upsert_batch(spark, batch, store, keys)  # event_ts auto-detected
    got = read_store(spark, store).collect()
    assert len(got) == 1
    r = got[0]
    # latest-by-event-time wins for close; open follows the sequential
    # law (newer non-NULL opens win until the bar closes → 100.3, the
    # open of the event-time-latest row, which also closed the bar);
    # spans for high/low
    assert r["close"] == 300.0
    assert r["open"] == 100.3
    assert r["high"] == 104.0 and r["low"] == 98.0
    assert r["trade_count"] == 30 and r["is_closed"] is True


def test_fold_batch_multi_partition_without_order_is_an_error(spark):
    """No order_col + no event_ts + multi-partition batch must raise —
    the monotonically_increasing_id proxy cannot represent arrival
    order across partitions, and silently guessing corrupts the
    latest-write-wins law."""
    from tradecat_spark.operators.merge import fold_batch

    t0 = pd.Timestamp("2025-01-01 00:00:00")
    batch = spark.createDataFrame(pd.DataFrame([
        dict(symbol="BTC", bucket_ts=t0, open=1.0, high=1.0, low=1.0,
             close=1.0, trade_count=1, is_closed=False),
        dict(symbol="BTC", bucket_ts=t0, open=2.0, high=2.0, low=2.0,
             close=2.0, trade_count=2, is_closed=False),
    ])).repartition(2)
    with pytest.raises(ValueError, match="order_col"):
        fold_batch(batch, ["symbol", "bucket_ts"])


def test_commit_concurrent_reader_sees_old_or_new_never_mixed(spark, tmp_path):
    """Atomicity chaos test (r4 verdict item 8): a reader during the
    commit must observe the OLD partition content or the NEW one —
    never a missing partition, a partial directory, or a mix. The
    commit is frozen at the pre-swap seam (_COMMIT_PAUSE) while a
    reader thread hammers the store; every observed snapshot must be
    one of the two legal states."""
    import threading

    from tradecat_spark.streaming import ingest as ing

    store = str(tmp_path / "atomic_store")
    keys = ["symbol", "bucket_ts"]
    t0 = pd.Timestamp("2025-01-01 00:00:00")

    def bar(close, tc):
        return spark.createDataFrame(pd.DataFrame([
            dict(symbol="BTC", bucket_ts=t0, event_ts=t0, open=100.0,
                 high=105.0, low=99.0, close=close, trade_count=tc,
                 is_closed=False),
        ]))

    ing.upsert_batch(spark, bar(101.0, 10), store, keys)
    old_state = {(101.0, 10)}
    new_state = {(102.0, 20)}

    paused = threading.Event()
    release = threading.Event()
    observed: list[frozenset] = []
    errors: list[Exception] = []

    def pause(_entry):
        paused.set()
        assert release.wait(60)

    def snapshot_files():
        # the read_store contract for external readers: resolve each
        # partition symlink to its versioned dir AT LIST TIME, then
        # glob inside the resolved (stable) path
        import glob as g
        out = []
        for entry in sorted(os.listdir(store)):
            if entry.startswith("_part="):
                real = os.path.realpath(os.path.join(store, entry))
                out.extend(g.glob(f"{real}/*.parquet"))
        return out

    def read_loop():
        # duckdb reader: independent of the Spark session (a real
        # concurrent consumer)
        import duckdb
        while not release.is_set():
            files = snapshot_files()
            if not files:
                errors.append(AssertionError("partition vanished"))
                continue
            try:
                rows = duckdb.sql(
                    f"SELECT close, trade_count FROM read_parquet({files!r})"
                ).fetchall()
                observed.append(frozenset((r[0], r[1]) for r in rows))
            except Exception as e:  # torn read (file disappeared mid-read)
                errors.append(e)
        # (the post-commit state is asserted by the MAIN thread after
        # writer.join() — reading it here would race the commit, which
        # resumes only when release fires)

    monkey_prev = ing._COMMIT_PAUSE
    ing._COMMIT_PAUSE = pause
    reader = threading.Thread(target=read_loop)
    writer_err: list[Exception] = []

    def write():
        try:
            ing.upsert_batch(spark, bar(102.0, 20), store, keys)
        except Exception as e:
            writer_err.append(e)

    writer = threading.Thread(target=write)
    try:
        reader.start()
        writer.start()
        assert paused.wait(60), "commit never reached the swap seam"
        # let the reader observe the paused state for a while
        import time as _time
        _time.sleep(0.5)
        release.set()
        writer.join(60)
        reader.join(60)
    finally:
        ing._COMMIT_PAUSE = monkey_prev
        release.set()
    assert not writer_err, writer_err
    assert not errors, f"torn/missing reads during commit: {errors[:3]}"
    legal = {frozenset(old_state), frozenset(new_state)}
    assert observed and set(observed) <= legal, (
        f"illegal snapshots observed: {set(observed) - legal}"
    )
    # post-commit state, read AFTER the writer finished
    import duckdb as _d
    final = _d.sql(
        f"SELECT close, trade_count FROM read_parquet({snapshot_files()!r})"
    ).fetchall()
    assert frozenset((r[0], r[1]) for r in final) == frozenset(new_state)


def test_legacy_real_dir_store_reads_and_upgrades(spark, tmp_path):
    """A store written by the pre-symlink layout (real partition
    directories) must read through read_store unchanged, and the first
    upsert against it must upgrade the touched partition to the
    symlink-swap layout while preserving the merge law."""
    from tradecat_spark.streaming import ingest as ing

    store = str(tmp_path / "legacy_store")
    keys = ["symbol", "bucket_ts"]
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    legacy = spark.createDataFrame(pd.DataFrame([
        dict(symbol="BTC", bucket_ts=t0, open=100.0, high=105.0,
             low=99.0, close=101.0, trade_count=10, is_closed=False),
    ])).withColumn("_part", F.date_format("bucket_ts", "yyyy-MM-dd"))
    # the old bootstrap wrote real partition dirs straight to the store
    legacy.write.mode("overwrite").partitionBy("_part").parquet(store)
    assert not os.path.islink(os.path.join(store, "_part=2025-01-01"))

    got = ing.read_store(spark, store).collect()
    assert len(got) == 1 and got[0]["close"] == 101.0

    update = spark.createDataFrame(pd.DataFrame([
        dict(symbol="BTC", bucket_ts=t0, event_ts=t0, open=100.5,
             high=107.0, low=98.0, close=106.0, trade_count=25,
             is_closed=True),
    ]))
    ing.upsert_batch(spark, update, store, keys)
    assert os.path.islink(os.path.join(store, "_part=2025-01-01"))
    row = ing.read_store(spark, store).collect()[0]
    # merge law across the upgrade: target bar was open → source open
    # wins; high/low span; close from source; closed OR'd
    assert (row["open"], row["high"], row["low"], row["close"]) == (
        100.5, 107.0, 98.0, 106.0,
    )
    assert row["is_closed"] is True and row["trade_count"] == 25


def test_crash_mid_legacy_upgrade_replay_keeps_history(spark, tmp_path, monkeypatch):
    """Review finding: a crash between parking a legacy real-dir
    partition and publishing its symlink left the partition invisible,
    and the replay's merge saw nothing — silently dropping history.
    With per-partition crash recovery (_partition_data_dir), the replay
    must re-read the displaced data and converge to history + update."""
    from tradecat_spark.streaming import ingest as ing

    store = str(tmp_path / "legacy_crash")
    keys = ["symbol", "bucket_ts"]
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    legacy = spark.createDataFrame(pd.DataFrame([
        # historical row the crash must NOT lose
        dict(symbol="ETH", bucket_ts=t0, open=10.0, high=11.0, low=9.0,
             close=10.5, trade_count=5, is_closed=True),
        dict(symbol="BTC", bucket_ts=t0, open=100.0, high=105.0,
             low=99.0, close=101.0, trade_count=10, is_closed=False),
    ])).withColumn("_part", F.date_format("bucket_ts", "yyyy-MM-dd"))
    legacy.write.mode("overwrite").partitionBy("_part").parquet(store)

    update = spark.createDataFrame(pd.DataFrame([
        dict(symbol="BTC", bucket_ts=t0, event_ts=t0, open=100.5,
             high=107.0, low=98.0, close=106.0, trade_count=25,
             is_closed=True),
    ]))

    real_rename = os.rename

    def crash_on_publish(src, dst):
        if ".link-" in os.path.basename(src):
            raise RuntimeError("simulated crash between park and publish")
        return real_rename(src, dst)

    monkeypatch.setattr(ing.os, "rename", crash_on_publish)
    with pytest.raises(RuntimeError, match="park and publish"):
        ing.upsert_batch(spark, update, store, keys)
    monkeypatch.undo()
    # partition entry is gone, displaced data survives dot-prefixed
    assert not os.path.exists(os.path.join(store, "_part=2025-01-01"))

    ing.upsert_batch(spark, update, store, keys)  # checkpoint replay
    rows = {r["symbol"]: r for r in ing.read_store(spark, store).collect()}
    assert rows["ETH"]["close"] == 10.5          # history preserved
    assert rows["BTC"]["close"] == 106.0         # update applied
    assert rows["BTC"]["high"] == 107.0 and rows["BTC"]["low"] == 98.0


def test_bootstrap_crash_replay_recovers(spark, tmp_path, monkeypatch):
    """Review finding: a first-batch crash after the store directory
    appeared but before any partition published used to wedge every
    replay (the merge path read an empty store and threw). The single
    merge-path with per-partition recovery must replay cleanly."""
    from tradecat_spark.streaming import ingest as ing

    store = str(tmp_path / "boot_crash")
    keys = ["symbol", "bucket_ts"]
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    batch = spark.createDataFrame(pd.DataFrame([
        dict(symbol="BTC", bucket_ts=t0, event_ts=t0, open=100.0,
             high=105.0, low=99.0, close=101.0, trade_count=10,
             is_closed=False),
    ]))

    def crash(_entry):
        raise RuntimeError("simulated bootstrap crash before publish")

    monkeypatch.setattr(ing, "_COMMIT_PAUSE", crash)
    with pytest.raises(RuntimeError, match="bootstrap crash"):
        ing.upsert_batch(spark, batch, store, keys)
    monkeypatch.setattr(ing, "_COMMIT_PAUSE", None)
    assert os.path.isdir(store)  # the wedge precondition
    assert not any(e.startswith("_part=") for e in os.listdir(store))

    ing.upsert_batch(spark, batch, store, keys)  # replay must succeed
    rows = ing.read_store(spark, store).collect()
    assert len(rows) == 1 and rows[0]["close"] == 101.0


def test_fold_batch_tied_event_times_fold_deterministically(spark):
    """Review finding: an event-time order column is not a TOTAL order —
    several updates can share one timestamp. The fold must produce the
    same result regardless of physical layout; rerunning the same tied
    batch under different partitionings must agree on every column."""
    from tradecat_spark.operators.merge import fold_batch

    t0 = pd.Timestamp("2025-01-01 00:00:00")
    rows = [
        # three updates of one bar, ALL with the same event_ts
        dict(symbol="BTC", bucket_ts=t0, event_ts=t0, open=100.0,
             high=101.0, low=99.5, close=100.5, trade_count=3,
             is_closed=False),
        dict(symbol="BTC", bucket_ts=t0, event_ts=t0, open=100.1,
             high=103.0, low=99.0, close=102.0, trade_count=7,
             is_closed=False),
        dict(symbol="BTC", bucket_ts=t0, event_ts=t0, open=100.2,
             high=104.0, low=98.5, close=103.5, trade_count=12,
             is_closed=True),
    ]
    outs = []
    for nparts in (1, 2, 3):
        df = spark.createDataFrame(pd.DataFrame(rows)).repartition(nparts)
        out = fold_batch(
            df.select("symbol", "bucket_ts", "open", "high", "low",
                      "close", "trade_count", "is_closed", "event_ts"),
            ["symbol", "bucket_ts"], order_col="event_ts",
        ).collect()
        assert len(out) == 1
        outs.append(out[0].asDict())
    assert outs[0] == outs[1] == outs[2], outs
    # the deterministic tie rule: max close among tied seq
    assert outs[0]["close"] == 103.5
    assert outs[0]["high"] == 104.0 and outs[0]["low"] == 98.5
    assert outs[0]["is_closed"] is True and outs[0]["trade_count"] == 12


def test_delta_merge_branch_law_parity(tmp_path):
    """r5 verdict item 6: when delta-spark is importable, upsert_batch's
    Delta MERGE branch must resolve the same batch sequence to the same
    store rows as the rename-commit branch (DELTA_MERGE_SET and
    merge_candles are two renderings of one ON CONFLICT law, and the
    fold in front of both is shared).

    This container ships no delta-spark (documented in _delta_table's
    docstring), so the test skips with that reason; in a lakehouse
    deployment it runs for real — it builds its own Delta-enabled
    session because the shared fixture's session has no Delta
    extensions.
    """
    delta = pytest.importorskip(
        "delta", reason="delta-spark not installed in this container"
    )
    from pyspark.sql import SparkSession

    from tradecat_spark.streaming.ingest import read_store, upsert_batch

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-merge-parity")
        .config("spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension")
        .config("spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaSparkCatalog")
        .config("spark.ui.enabled", "false")
    )
    spark = delta.configure_spark_with_delta_pip(builder).getOrCreate()
    try:
        keys = ["symbol", "bucket_ts"]
        t0 = pd.Timestamp("2025-01-01 00:00:00")
        batches = [
            pd.DataFrame([
                dict(symbol="BTC", bucket_ts=t0, event_ts=t0, open=100.0,
                     high=105.0, low=99.0, close=104.0, trade_count=10,
                     is_closed=False),
            ]),
            pd.DataFrame([
                dict(symbol="BTC", bucket_ts=t0,
                     event_ts=t0 + pd.Timedelta(seconds=1), open=101.0,
                     high=107.0, low=98.0, close=106.0, trade_count=25,
                     is_closed=True),
                dict(symbol="ETH", bucket_ts=t0, event_ts=t0, open=10.0,
                     high=11.0, low=9.0, close=10.5, trade_count=5,
                     is_closed=True),
            ]),
        ]
        parquet_store = str(tmp_path / "parquet_store")
        delta_store = str(tmp_path / "delta_store")
        # seed the Delta store as a Delta table so _delta_table picks it
        spark.createDataFrame(batches[0]).limit(0).drop("event_ts").write \
            .format("delta").save(delta_store)
        for b in batches:
            upsert_batch(spark, spark.createDataFrame(b), parquet_store, keys)
            upsert_batch(spark, spark.createDataFrame(b), delta_store, keys)
        cols = ["symbol", "bucket_ts", "open", "high", "low", "close",
                "trade_count", "is_closed"]
        via_rename = sorted(
            map(tuple, read_store(spark, parquet_store).select(cols).collect())
        )
        via_delta = sorted(
            map(tuple,
                spark.read.format("delta").load(delta_store)
                .select(cols).collect())
        )
        assert via_rename == via_delta and len(via_rename) == 2
    finally:
        spark.stop()


def test_read_store_recovers_pre_first_publish_crash(spark, tmp_path):
    """r5 advice: a store dir left by a crash BEFORE any partition was
    ever published (versioned .v*-_part= dirs exist, no _part= entries)
    must be readable — the legacy branch's schema inference dies on a
    dot-only directory and serving readers would error until a replay."""
    import tradecat_spark.streaming.ingest as ing

    t0 = pd.Timestamp("2025-01-01 00:00:00")
    store = str(tmp_path / "store")
    os.makedirs(store)
    # simulate the crash point: data renamed in, symlink never swapped
    debris = os.path.join(store, ".vdeadbeef0001-_part=2025-01-01")
    spark.createDataFrame(
        pd.DataFrame([
            dict(symbol="BTC", bucket_ts=t0, open=1.0, high=2.0, low=0.5,
                 close=1.5, trade_count=3, is_closed=True),
        ])
    ).write.parquet(debris)
    got = ing.read_store(spark, store).collect()
    assert len(got) == 1 and got[0]["symbol"] == "BTC"


def test_commit_grace_survives_noncanonical_symlink_target(spark, tmp_path):
    """r5 advice: when external tooling rewrote a partition symlink with
    an ABSOLUTE target, the next commit must still give the displaced
    version its one-commit grace (the keep set compares bare names, so
    an unnormalized readlink would rmtree it immediately)."""
    import tradecat_spark.streaming.ingest as ing

    t0 = pd.Timestamp("2025-01-01 00:00:00")
    store = str(tmp_path / "store")
    keys = ["symbol", "bucket_ts"]

    def bar(close):
        return spark.createDataFrame(
            pd.DataFrame([
                dict(symbol="BTC", bucket_ts=t0, event_ts=t0, open=1.0,
                     high=2.0, low=0.5, close=close, trade_count=3,
                     is_closed=False),
            ])
        )

    ing.upsert_batch(spark, bar(1.5), store, keys)
    entry = "_part=2025-01-01"
    dst = os.path.join(store, entry)
    assert os.path.islink(dst)
    displaced_version = os.path.basename(os.path.realpath(dst))
    # external repair: same target, but written as an absolute path
    os.unlink(dst)
    os.symlink(os.path.join(store, displaced_version), dst)
    ing.upsert_batch(spark, bar(2.5), store, keys)
    # the displaced version survives this commit (grace), despite the
    # absolute target
    assert displaced_version in os.listdir(store)
    # and is retired on the NEXT commit of the partition
    ing.upsert_batch(spark, bar(3.5), store, keys)
    assert displaced_version not in os.listdir(store)
    assert ing.read_store(spark, store).collect()[0]["close"] == 3.5


# ---------------------------------------------------------------------------
# Streaming incremental dedup (silver sig store + micro-batch screen)
# ---------------------------------------------------------------------------
def _dedup_fixtures(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    is_delta = F.col("doc_id") % 10 == 0
    return docs.filter(~is_delta), docs.filter(is_delta)


def _seed_base_store(spark, base, sig_store):
    from tradecat_spark.operators.minhash import doc_sigs
    from tradecat_spark.streaming.dedup import upsert_sigs

    upsert_sigs(
        spark,
        doc_sigs(base).withColumn("batch_id", F.lit(-1).cast("long")),
        sig_store,
    )


def _verdict_pdf(spark, verdict_path):
    return (
        spark.read.parquet(verdict_path)
        .drop("batch_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_streaming_incremental_dedup_matches_batch_query(
    spark, sf_dir, tmp_path
):
    """Batch-parity law: streaming the delta docs through the sig-store
    screen must reproduce dedup_incremental_delta (same split, same
    signature algebra, base persisted instead of recomputed)."""
    from tradecat_spark.plans.registry import REGISTRY, load_all
    from tradecat_spark.streaming.dedup import start_dedup_screen

    load_all()
    base, delta = _dedup_fixtures(spark, sf_dir)
    sig_store = str(tmp_path / "sigs")
    verdicts = str(tmp_path / "verdicts")
    src = str(tmp_path / "src")
    _seed_base_store(spark, base, sig_store)
    delta.write.mode("overwrite").parquet(src)
    q = start_dedup_screen(
        spark.readStream.schema(delta.schema).parquet(src),
        sig_store,
        verdicts,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    q.stop()
    got = _verdict_pdf(spark, verdicts)
    want = (
        REGISTRY["dedup_incremental_delta"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=True
    )


def test_dedup_screen_crash_seam_and_replay_idempotence(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash between the verdict write and the sig commit, then replay:
    verdicts must be byte-stable across the crash replay AND across a
    post-commit replay (at-least-once redelivery), and the store must
    hold the batch's signatures exactly once."""
    from tradecat_spark.operators.minhash import doc_sigs
    from tradecat_spark.streaming import dedup as sd
    from tradecat_spark.streaming.ingest import read_store

    base, delta = _dedup_fixtures(spark, sf_dir)
    sig_store = str(tmp_path / "sigs")
    verdicts = str(tmp_path / "verdicts")
    _seed_base_store(spark, base, sig_store)
    n_base_rows = read_store(spark, sig_store).count()

    real = sd.upsert_sigs
    monkeypatch.setattr(
        sd, "upsert_sigs",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        sd.screen_and_persist(spark, delta, 7, sig_store, verdicts)
    v_crash = _verdict_pdf(spark, verdicts)
    assert len(v_crash) == delta.count()
    # store untouched by the crashed attempt
    assert read_store(spark, sig_store).count() == n_base_rows

    monkeypatch.setattr(sd, "upsert_sigs", real)
    sd.screen_and_persist(spark, delta, 7, sig_store, verdicts)
    v_replay = _verdict_pdf(spark, verdicts)
    pd.testing.assert_frame_equal(v_crash, v_replay)
    store = read_store(spark, sig_store)
    n_delta_rows = doc_sigs(delta).count()
    assert store.count() == n_base_rows + n_delta_rows

    # at-least-once redelivery AFTER a full commit: the batch's own
    # signatures are now in the store, but self-exclusion keeps the
    # screened base identical, so verdicts and store are unchanged
    sd.screen_and_persist(spark, delta, 7, sig_store, verdicts)
    pd.testing.assert_frame_equal(v_crash, _verdict_pdf(spark, verdicts))
    assert read_store(spark, sig_store).count() == n_base_rows + n_delta_rows


def test_dedup_screen_sequential_batches_accumulate_base(
    spark, sf_dir, tmp_path
):
    """Second batch screens against base + first batch: a doc
    duplicating a batch-1 text must now screen as an exact dup."""
    from tradecat_spark.streaming import dedup as sd
    from tradecat_spark.streaming.ingest import read_store

    base, delta = _dedup_fixtures(spark, sf_dir)
    sig_store = str(tmp_path / "sigs")
    verdicts = str(tmp_path / "verdicts")
    _seed_base_store(spark, base, sig_store)

    b1 = delta.limit(20)
    sd.screen_and_persist(spark, b1, 0, sig_store, verdicts)
    # batch 2: fresh ids carrying batch-1 texts
    b2 = b1.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    sd.screen_and_persist(spark, b2, 1, sig_store, verdicts)
    v2 = (
        spark.read.parquet(f"{verdicts}/batch_id=1")
        .toPandas()
    )
    assert (v2["verdict"] == "exact").all()
    # and their first_match points at the batch-1 doc (or an older
    # base doc with the same text), never at themselves
    assert (v2["first_match"] < 1_000_000).all()
    assert read_store(spark, sig_store).count() > 0


def test_hll_register_store_crash_replay_and_idempotence(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Streaming HLL maintenance laws: a crashed commit leaves no store
    (replay converges), redelivering the same batch is a no-op (MAX is
    idempotent), and after all batches the store equals the one-pass
    batch registers (MAX is associative/commutative)."""
    from tradecat_spark.catalog import load_table
    from tradecat_spark.operators.hll import registers
    from tradecat_spark.streaming import sketch as sk

    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    half1 = e.filter(F.col("user_id") % 2 == 0)
    half2 = e.filter(F.col("user_id") % 2 == 1)
    store = str(tmp_path / "regs")

    real = sk.upsert_registers
    monkeypatch.setattr(
        sk, "upsert_registers",
        lambda *a: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        sk.update_registers(spark, half1, store)
    assert not sk.store_exists(store)

    monkeypatch.setattr(sk, "upsert_registers", real)
    sk.update_registers(spark, half1, store)
    once = sorted(map(tuple, sk.read_registers(spark, store).collect()))
    assert len(once) > 0
    # at-least-once redelivery of an already-committed batch: no-op
    sk.update_registers(spark, half1, store)
    again = sorted(map(tuple, sk.read_registers(spark, store).collect()))
    assert again == once

    sk.update_registers(spark, half2, store)
    got = sorted(map(tuple, sk.read_registers(spark, store).collect()))
    want = sorted(map(tuple, registers(e).collect()))
    assert got == want

    # the estimator read off the STORE equals the batch hll_estimate
    # query over the same events — the consumer path of the sketch
    from tradecat_spark.operators.hll import estimate_from_registers
    from tradecat_spark.plans.registry import load_all

    est_store = sorted(map(tuple, estimate_from_registers(
        sk.read_registers(spark, store)).collect()))
    est_batch = sorted(map(tuple, load_all()["hll_estimate"]
                           .fn(spark, sf_dir).collect()))
    assert est_store == est_batch


def test_cms_counter_store_replay_never_double_counts(
    spark, sf_dir, tmp_path
):
    """Additive-sketch durability laws: replaying a batch id overwrites
    its own partial partition (counts unchanged — the hazard an
    additive merge must dodge), and after disjoint batches the summed
    store equals the one-pass batch grid."""
    from tradecat_spark.catalog import load_table
    from tradecat_spark.operators.cms import cms_counts
    from tradecat_spark.streaming import sketch as sk

    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    half1 = e.filter(F.col("user_id") % 2 == 0)
    half2 = e.filter(F.col("user_id") % 2 == 1)
    store = str(tmp_path / "grid")

    sk.update_cms(spark, half1, 0, store)
    once = sorted(map(tuple, sk.read_cms(spark, store).collect()))
    assert len(once) > 0
    sk.update_cms(spark, half1, 0, store)  # at-least-once replay
    assert sorted(map(tuple, sk.read_cms(spark, store).collect())) == once

    sk.update_cms(spark, half2, 1, store)
    got = sorted(map(tuple, sk.read_cms(spark, store).collect()))
    want = sorted(map(tuple, cms_counts(e).collect()))
    assert got == want


def test_cms_compaction_coverage_and_crash_safety(
    spark, sf_dir, tmp_path, monkeypatch
):
    """compact_cms folds covered partials into one base without ever
    changing what read_cms returns — including at the crash seam
    between base publish and debris deletion, on re-run, and when a
    covered batch id is replayed afterwards (checkpoint rollback)."""
    from tradecat_spark.catalog import load_table
    from tradecat_spark.operators.cms import cms_counts
    from tradecat_spark.streaming import sketch as sk

    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    thirds = [e.filter(F.col("user_id") % 3 == i) for i in range(3)]
    store = str(tmp_path / "grid")
    for i, t in enumerate(thirds):
        sk.update_cms(spark, t, i, store)
    want = sorted(map(tuple, cms_counts(e).collect()))
    assert sorted(map(tuple, sk.read_cms(spark, store).collect())) == want

    # crash AFTER the base publishes, BEFORE any delete runs
    real_drop = sk._drop_cms_partition
    monkeypatch.setattr(
        sk, "_drop_cms_partition",
        lambda *a: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        sk.compact_cms(spark, store, 1)
    vals = set(sk._cms_partition_vals(store))
    assert {"c1", "b0", "b1", "b2"} <= vals  # debris still on disk
    # the coverage rule already serves the exact grid
    assert sorted(map(tuple, sk.read_cms(spark, store).collect())) == want

    # re-run completes: identical base, debris gone
    monkeypatch.setattr(sk, "_drop_cms_partition", real_drop)
    sk.compact_cms(spark, store, 1)
    vals = set(sk._cms_partition_vals(store))
    assert "c1" in vals and "b2" in vals
    assert not vals & {"b0", "b1"}
    assert sorted(map(tuple, sk.read_cms(spark, store).collect())) == want

    # a covered batch replayed after compaction is ignored by coverage
    sk.update_cms(spark, thirds[0], 0, store)
    assert sorted(map(tuple, sk.read_cms(spark, store).collect())) == want


def test_read_cms_empty_store_yields_empty_grid(spark, tmp_path):
    """A never-written store (missing OR empty dir) reads as an empty
    (d, bucket, cnt) grid — the same contract the HLL/dedup readers
    get from store_has_data — not a zero-path parquet error."""
    from tradecat_spark.streaming import sketch as sk

    missing = str(tmp_path / "never_written")
    got = sk.read_cms(spark, missing)
    assert [f.name for f in got.schema.fields] == ["d", "bucket", "cnt"]
    assert got.count() == 0

    empty = tmp_path / "empty_dir"
    empty.mkdir()
    assert sk.read_cms(spark, str(empty)).count() == 0


def test_partition_data_dir_legacy_name_loses_mtime_tie(tmp_path):
    """Crash-recovery version probe: at equal mtime a time_ns-prefixed
    version must beat a pre-upgrade uuid-only version even when the
    hex name sorts lexicographically after the digits (r7 advice)."""
    import os

    from tradecat_spark.streaming.ingest import _partition_data_dir

    store = tmp_path / "store"
    store.mkdir()
    legacy = store / ".vfeedface-_part=x"  # hex > digits lexically
    timed = store / f".v{'1' * 20}abc123-_part=x"
    legacy.mkdir()
    timed.mkdir()
    t = 1_700_000_000
    os.utime(legacy, (t, t))
    os.utime(timed, (t, t))
    got = _partition_data_dir(str(store), "_part=x")
    assert got is not None and os.path.basename(got).startswith(".v1")


def test_read_store_recovery_uses_same_rank_as_partition_probe(
    spark, tmp_path
):
    """read_store's pre-first-publish branch must resolve version ties
    with the SAME rank key as _partition_data_dir (shared
    _version_rank, r8 advice): a crashed store holding only dot-
    prefixed debris — a stale legacy uuid-only version next to an
    equal-mtime time_ns-prefixed one — must read the TIMED version's
    data, not the legacy row the plain (mtime, name) tuple would pick
    (hex sorts after digits)."""
    import os

    from tradecat_spark.streaming.ingest import read_store

    store = tmp_path / "store"
    store.mkdir()
    legacy = store / ".vfeedface-_part=x"
    timed = store / f".v{'1' * 20}abc123-_part=x"
    spark.range(1).selectExpr("'legacy' AS who").write.parquet(str(legacy))
    spark.range(1).selectExpr("'timed' AS who").write.parquet(str(timed))
    t = 1_700_000_000
    os.utime(legacy, (t, t))
    os.utime(timed, (t, t))
    rows = read_store(spark, str(store)).collect()
    assert [r.who for r in rows] == ["timed"]


def _pipeline_delta(spark, sf_dir, with_embedding=False):
    """Delta docs WITH their source column — the pipeline's stream
    shape (doc_id, text, source [, embedding])."""
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "source")
        .filter(F.col("doc_id") % 10 == 0)
    )
    if with_embedding:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        # LEFT: the stream may be wider than its embedding coverage
        # (true at sf0.1) — the pipeline indexes only vector-carrying
        # rows and every doc still reaches the other four stores
        d = d.join(emb, "doc_id", "left")
    return d


def _pipeline_model(spark, sf_dir, tmp_path) -> str:
    """Frozen ANN model for the pipeline's 5th store, trained on the
    vec_id % 2 = 0 slice (the frozen-split discipline)."""
    from tradecat_spark.streaming import ann

    model_dir = str(tmp_path / "pipe_model")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") % 2 == 0
    ).select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    ann.train_ann_model(spark, e, model_dir)
    return model_dir


def test_ingest_pipeline_five_stores_off_one_stream(
    spark, sf_dir, tmp_path
):
    """r7 verdict item 7 e2e (5-store form since r10): ONE document
    stream (two micro-batches via maxFilesPerTrigger=1) drives bronze
    + dedup screen + HLL + CMS + frozen-model ANN codes; afterwards
    every store must satisfy its batch law over the full delivered
    set — bronze holds exactly the input rows, every doc has exactly
    one verdict, the register store equals the batch HLL fold of all
    events, the summed CMS grid equals the batch counter grid, and
    the code store equals the one-shot batch encode of every delta
    embedding under the frozen model."""
    from tradecat_spark.operators.cms import cms_counts
    from tradecat_spark.operators.hll import registers
    from tradecat_spark.streaming import ann
    from tradecat_spark.streaming import pipeline as pl
    from tradecat_spark.streaming import sketch as sk

    base, _ = _dedup_fixtures(spark, sf_dir)
    delta = _pipeline_delta(spark, sf_dir, with_embedding=True)
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    _seed_base_store(spark, base, dirs["sig_store"])
    model_dir = _pipeline_model(spark, sf_dir, tmp_path)

    src = tmp_path / "src"
    src.mkdir()
    half = F.col("doc_id") % 20 == 0
    for i, part in enumerate((delta.filter(half), delta.filter(~half))):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        pf = next(stage.glob("part-*.parquet"))
        pf.rename(src / f"f{i}.parquet")
    src = str(src)
    q = pl.start_ingest_pipeline(
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        root,
        available_now=True,
        ann_model_dir=model_dir,
    )
    q.awaitTermination(180)
    q.stop()

    model = ann.load_ann_model(spark, model_dir)
    want_codes = sorted(
        (r["vec_id"], r["cell_label"], tuple(r["codes"]), r["xs2"])
        for r in ann.encode_vectors(
            delta.filter(F.col("embedding").isNotNull())
            .select(F.col("doc_id").alias("vec_id"), "embedding"),
            *model,
        ).collect()
    )
    got_codes = sorted(
        (r["vec_id"], r["cell_label"], tuple(r["codes"]), r["xs2"])
        for r in ann.read_index(spark, dirs["ann_store"]).collect()
    )
    assert got_codes == want_codes

    dpdf = delta.toPandas().sort_values("doc_id").reset_index(drop=True)
    bronze = (
        spark.read.parquet(dirs["bronze"]).drop("batch_id")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert bronze[dpdf.columns.tolist()].equals(dpdf)

    v = _verdict_pdf(spark, dirs["verdicts"])
    assert sorted(v.doc_id) == sorted(dpdf.doc_id)

    ev = pl.events_view(delta)
    want_regs = sorted(map(tuple, registers(ev).collect()))
    got_regs = sorted(map(tuple, sk.read_registers(
        spark, dirs["hll_store"]).collect()))
    assert got_regs == want_regs

    want_cms = sorted(map(tuple, cms_counts(ev).collect()))
    got_cms = sorted(map(tuple, sk.read_cms(
        spark, dirs["cms_store"]).collect()))
    assert got_cms == want_cms


def test_ingest_pipeline_crash_seam_between_sketch_updates(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash AFTER the dedup commit but BEFORE the CMS update, then
    replay the whole batch body (at-least-once): every store must
    converge to the single-delivery state — verdicts byte-stable,
    signature store exactly-once, registers unchanged by the double
    max-merge, CMS grid correct because the replay overwrites the
    batch's own partial."""
    from tradecat_spark.operators.cms import cms_counts
    from tradecat_spark.operators.hll import registers
    from tradecat_spark.operators.minhash import doc_sigs
    from tradecat_spark.streaming import pipeline as pl
    from tradecat_spark.streaming import sketch as sk
    from tradecat_spark.streaming.ingest import read_store

    base, _ = _dedup_fixtures(spark, sf_dir)
    delta = _pipeline_delta(spark, sf_dir)
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    _seed_base_store(spark, base, dirs["sig_store"])
    n_base = read_store(spark, dirs["sig_store"]).count()

    real = pl.update_cms
    monkeypatch.setattr(
        pl, "update_cms",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        pl.pipeline_batch(spark, delta, 3, dirs)
    v_crash = _verdict_pdf(spark, dirs["verdicts"])
    regs_crash = sorted(map(tuple, sk.read_registers(
        spark, dirs["hll_store"]).collect()))
    # CMS never ran — empty grid, not an error (r7 advice guard)
    assert sk.read_cms(spark, dirs["cms_store"]).count() == 0

    monkeypatch.setattr(pl, "update_cms", real)
    pl.pipeline_batch(spark, delta, 3, dirs)

    assert _verdict_pdf(spark, dirs["verdicts"]).equals(v_crash)
    n_delta = doc_sigs(delta.select("doc_id", "text")).count()
    assert read_store(spark, dirs["sig_store"]).count() == n_base + n_delta
    ev = pl.events_view(delta)
    assert sorted(map(tuple, sk.read_registers(
        spark, dirs["hll_store"]).collect())) == regs_crash
    assert regs_crash == sorted(map(tuple, registers(ev).collect()))
    assert sorted(map(tuple, sk.read_cms(
        spark, dirs["cms_store"]).collect())) == \
        sorted(map(tuple, cms_counts(ev).collect()))


def test_ingest_pipeline_crash_seam_before_ann_update(
    spark, sf_dir, tmp_path, monkeypatch
):
    """5th-store seam (r10): crash AFTER the CMS commit but BEFORE
    the ANN code upsert, then replay the whole batch body — the four
    earlier stores must be byte-stable under the replay (their
    updaters are idempotent) and the code store must converge to
    exactly the one-shot batch encode under the frozen model."""
    from tradecat_spark.streaming import ann
    from tradecat_spark.streaming import pipeline as pl
    from tradecat_spark.streaming import sketch as sk

    base, _ = _dedup_fixtures(spark, sf_dir)
    delta = _pipeline_delta(spark, sf_dir, with_embedding=True)
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    _seed_base_store(spark, base, dirs["sig_store"])
    model_dir = _pipeline_model(spark, sf_dir, tmp_path)
    model = ann.load_ann_model(spark, model_dir)

    real = ann.index_batch
    monkeypatch.setattr(
        ann, "index_batch",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        pl.pipeline_batch(spark, delta, 3, dirs, ann_model=model)
    v_crash = _verdict_pdf(spark, dirs["verdicts"])
    cms_crash = sorted(map(tuple, sk.read_cms(
        spark, dirs["cms_store"]).collect()))
    # the ANN update never ran — empty store, not an error
    assert ann.read_index(spark, dirs["ann_store"]).count() == 0

    monkeypatch.setattr(ann, "index_batch", real)
    pl.pipeline_batch(spark, delta, 3, dirs, ann_model=model)

    assert _verdict_pdf(spark, dirs["verdicts"]).equals(v_crash)
    assert sorted(map(tuple, sk.read_cms(
        spark, dirs["cms_store"]).collect())) == cms_crash
    want = sorted(
        (r["vec_id"], r["cell_label"], tuple(r["codes"]), r["xs2"])
        for r in ann.encode_vectors(
            delta.filter(F.col("embedding").isNotNull())
            .select(F.col("doc_id").alias("vec_id"), "embedding"),
            *model,
        ).collect()
    )
    got = sorted(
        (r["vec_id"], r["cell_label"], tuple(r["codes"]), r["xs2"])
        for r in ann.read_index(spark, dirs["ann_store"]).collect()
    )
    assert got == want


def test_ingest_pipeline_crash_inside_ann_two_step_commit(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r10 verdict item 6: the seam INSIDE the ANN updater's two-step
    body — after the re-publish screen has read the store but before
    the code commit (``upsert_codes``) — driven through the COMPOSED
    pipeline (the dedup store got exactly this treatment in r8). The
    crashed batch RE-PUBLISHES part of an earlier batch's vectors, so
    the screen is live (non-trivially filtering) at the crash point.
    After the crash the code store must be byte-stable at the earlier
    batch's rows while the four upstream stores already carry the
    crashed batch (their commits precede the ANN step); the whole-body
    replay must converge every store to the single-delivery state."""
    from tradecat_spark.operators.cms import cms_counts
    from tradecat_spark.operators.hll import registers
    from tradecat_spark.streaming import ann
    from tradecat_spark.streaming import pipeline as pl
    from tradecat_spark.streaming import sketch as sk

    base, _ = _dedup_fixtures(spark, sf_dir)
    delta = _pipeline_delta(spark, sf_dir, with_embedding=True)
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    _seed_base_store(spark, base, dirs["sig_store"])
    model_dir = _pipeline_model(spark, sf_dir, tmp_path)
    model = ann.load_ann_model(spark, model_dir)

    b1 = delta.filter(F.col("doc_id") % 20 == 0)
    b2 = delta  # includes every b1 doc: a recrawl re-publication
    pl.pipeline_batch(spark, b1, 3, dirs, ann_model=model)
    codes_b1 = sorted(
        (r["vec_id"], r["cell_label"], tuple(r["codes"]), r["xs2"])
        for r in ann.read_index(spark, dirs["ann_store"]).collect()
    )
    assert codes_b1  # the screen below must have rows to filter on

    real = ann.upsert_codes
    monkeypatch.setattr(
        ann, "upsert_codes",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        pl.pipeline_batch(spark, b2, 4, dirs, ann_model=model)
    # code store untouched: screen ran, commit never did
    got_crash = sorted(
        (r["vec_id"], r["cell_label"], tuple(r["codes"]), r["xs2"])
        for r in ann.read_index(spark, dirs["ann_store"]).collect()
    )
    assert got_crash == codes_b1
    # the four upstream stores already committed the crashed batch;
    # verdicts are a PER-BATCH sink, so re-published b1 docs correctly
    # hold a verdict under batch 3 AND batch 4 (a recrawl re-screens)
    v_crash = _verdict_pdf(spark, dirs["verdicts"])
    assert sorted(v_crash.doc_id) == sorted(
        [r["doc_id"] for r in b1.select("doc_id").collect()]
        + [r["doc_id"] for r in b2.select("doc_id").collect()]
    )
    regs_crash = sorted(map(tuple, sk.read_registers(
        spark, dirs["hll_store"]).collect()))

    monkeypatch.setattr(ann, "upsert_codes", real)
    pl.pipeline_batch(spark, b2, 4, dirs, ann_model=model)

    # earlier stores byte-stable across the replay
    assert _verdict_pdf(spark, dirs["verdicts"]).equals(v_crash)
    assert sorted(map(tuple, sk.read_registers(
        spark, dirs["hll_store"]).collect())) == regs_crash
    assert regs_crash == sorted(
        map(tuple, registers(pl.events_view(delta)).collect())
    )
    # CMS: each batch's partial overwrote itself on replay — the grid
    # equals the batch fold over b1-then-b2 delivery (re-delivery of
    # b1 docs under batch 4 is real frequency signal, by design)
    ev_both = pl.events_view(b1).unionByName(pl.events_view(b2))
    assert sorted(map(tuple, sk.read_cms(
        spark, dirs["cms_store"]).collect())) == \
        sorted(map(tuple, cms_counts(ev_both).collect()))
    # code store converges to exactly-once: one row per distinct
    # vector, equal to the one-shot batch encode — the re-published
    # b1 vectors kept their first-commit rows (deterministic codes)
    want = sorted(
        (r["vec_id"], r["cell_label"], tuple(r["codes"]), r["xs2"])
        for r in ann.encode_vectors(
            delta.filter(F.col("embedding").isNotNull())
            .select(F.col("doc_id").alias("vec_id"), "embedding"),
            *model,
        ).collect()
    )
    got = sorted(
        (r["vec_id"], r["cell_label"], tuple(r["codes"]), r["xs2"])
        for r in ann.read_index(spark, dirs["ann_store"]).collect()
    )
    assert got == want


def test_pipeline_ann_model_without_embedding_column_raises(
    spark, sf_dir, tmp_path
):
    """r10 ADVICE: supplying a frozen model is an explicit request for
    the ANN store — a stream that lacks the 'embedding' column (e.g. a
    mis-named caller column) must fail loudly, in pipeline_batch AND at
    start_ingest_pipeline start-up, not silently skip the 5th store."""
    from tradecat_spark.streaming import ann
    from tradecat_spark.streaming import pipeline as pl

    delta = _pipeline_delta(spark, sf_dir)  # no embedding column
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    model_dir = _pipeline_model(spark, sf_dir, tmp_path)
    model = ann.load_ann_model(spark, model_dir)
    with pytest.raises(ValueError, match="no 'embedding' column"):
        pl.pipeline_batch(spark, delta, 0, dirs, ann_model=model)

    src = str(tmp_path / "src")
    delta.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(delta.schema).parquet(src)
    with pytest.raises(ValueError, match="no 'embedding' column"):
        pl.start_ingest_pipeline(
            stream, root, available_now=True, ann_model_dir=model_dir
        )


def _ann_fixture(spark, sf_dir, tmp_path):
    from tradecat_spark.streaming import ann

    e_raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = e_raw.filter(F.col("vec_id") % 10 != 0)
    delta = e_raw.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id", "embedding"
    )
    model_dir = str(tmp_path / "model")
    store = str(tmp_path / "codes")
    eb = base.select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    ann.train_ann_model(spark, eb, model_dir)
    model = ann.load_ann_model(spark, model_dir)
    return ann, model, model_dir, store, base, delta


def test_ann_index_replay_and_republication_exactly_once(
    spark, sf_dir, tmp_path
):
    """The code store must converge to one row per vector under BOTH
    duplication shapes: replaying the SAME batch id (at-least-once)
    and re-publishing the same vectors under a LATER batch id (a
    recrawl) — and the store rows must equal a direct batch encode
    under the frozen model."""
    ann, model, model_dir, store, base, delta = _ann_fixture(
        spark, sf_dir, tmp_path
    )
    ann.index_batch(spark, base.select("vec_id", "embedding"), -1,
                    model, store)
    n_base = ann.read_index(spark, store).count()
    assert n_base == base.count()

    ann.index_batch(spark, delta, 0, model, store)
    n_all = ann.read_index(spark, store).count()
    assert n_all == n_base + delta.count()

    ann.index_batch(spark, delta, 0, model, store)   # same-batch replay
    assert ann.read_index(spark, store).count() == n_all
    ann.index_batch(spark, delta, 7, model, store)   # recrawl, new batch
    assert ann.read_index(spark, store).count() == n_all

    want = (
        ann.encode_vectors(delta, *model)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    got = (
        ann.read_index(spark, store)
        .join(delta.select("vec_id"), "vec_id")
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert (got.vec_id == want.vec_id).all()
    assert (got.xs2 == want.xs2).all()
    assert got.codes.apply(list).equals(want.codes.apply(list))


def test_ann_index_crash_between_encode_and_commit(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash before the commit leaves the store byte-identical; the
    replay converges, and a search over the recovered store equals a
    search over a store built with no crash at all."""
    from tradecat_spark.streaming import ann as ann_mod

    ann, model, model_dir, store, base, delta = _ann_fixture(
        spark, sf_dir, tmp_path
    )
    ann.index_batch(spark, base.select("vec_id", "embedding"), -1,
                    model, store)
    n_base = ann.read_index(spark, store).count()

    real = ann_mod.upsert_codes
    monkeypatch.setattr(
        ann_mod, "upsert_codes",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        ann_mod.index_batch(spark, delta, 3, model, store)
    assert ann.read_index(spark, store).count() == n_base

    monkeypatch.setattr(ann_mod, "upsert_codes", real)
    ann_mod.index_batch(spark, delta, 3, model, store)
    assert ann.read_index(spark, store).count() == n_base + delta.count()

    q = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )
    got = sorted(map(tuple, ann.search_index(
        spark, store, model_dir, q, 2, 3).collect()))

    clean_store = str(tmp_path / "codes_clean")
    ann.index_batch(spark, base.select("vec_id", "embedding"), -1,
                    model, clean_store)
    ann.index_batch(spark, delta, 3, model, clean_store)
    want = sorted(map(tuple, ann.search_index(
        spark, clean_store, model_dir, q, 2, 3).collect()))
    assert got == want


def test_ann_index_compaction_coverage_and_crash(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Code-store compaction laws, mirroring the CMS protocol: the
    compacted base serves the identical index, a crash between the
    base publish and the debris deletes changes nothing the reader
    sees, re-running completes, and a covered batch replayed after
    compaction is ignored by coverage."""
    from tradecat_spark.streaming import ann as ann_mod

    ann, model, model_dir, store, base, delta = _ann_fixture(
        spark, sf_dir, tmp_path
    )
    thirds = [
        delta.filter(F.col("vec_id") % 3 == i) for i in range(3)
    ]
    for i, part in enumerate(thirds):
        ann.index_batch(spark, part, i, model, store)
    want = sorted(
        (r["vec_id"], tuple(r["codes"]), r["xs2"])
        for r in ann.read_index(spark, store).collect()
    )

    real_drop = ann_mod.drop_batch_partition
    monkeypatch.setattr(
        ann_mod, "drop_batch_partition",
        lambda *a: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        ann_mod.compact_codes(spark, store, 1)
    from tradecat_spark.streaming.ingest import batch_partition_vals
    vals = set(batch_partition_vals(store))
    assert {"c1", "b0", "b1", "b2"} <= vals  # debris still on disk
    got = sorted(
        (r["vec_id"], tuple(r["codes"]), r["xs2"])
        for r in ann.read_index(spark, store).collect()
    )
    assert got == want  # coverage rule already serves the exact index

    monkeypatch.setattr(ann_mod, "drop_batch_partition", real_drop)
    ann_mod.compact_codes(spark, store, 1)
    vals = set(batch_partition_vals(store))
    assert "c1" in vals and "b2" in vals and not vals & {"b0", "b1"}
    got = sorted(
        (r["vec_id"], tuple(r["codes"]), r["xs2"])
        for r in ann.read_index(spark, store).collect()
    )
    assert got == want

    # covered batch replayed after compaction: ignored by coverage
    ann.index_batch(spark, thirds[0], 0, model, store)
    got = sorted(
        (r["vec_id"], tuple(r["codes"]), r["xs2"])
        for r in ann.read_index(spark, store).collect()
    )
    assert got == want


def test_ann_index_intra_batch_duplicate_collapses(
    spark, sf_dir, tmp_path
):
    """A vector redelivered WITHIN one trigger must be stored once —
    neither the store screen (other partitions) nor insert-if-absent
    (existing rows) can catch it, so index_batch dedups the batch
    itself; a duplicate row would otherwise occupy two top-k slots."""
    ann, model, model_dir, store, base, delta = _ann_fixture(
        spark, sf_dir, tmp_path
    )
    doubled = delta.unionByName(delta)  # same vec twice in ONE batch
    ann.index_batch(spark, doubled, 0, model, store)
    idx = ann.read_index(spark, store).toPandas()
    assert len(idx) == delta.count()
    assert idx.vec_id.is_unique


# ---------------------------------------------------------------------------
# 6th store: the streaming perceptual-hash (image dedup) store
# (streaming/phash.py; r11 verdict item 4)
# ---------------------------------------------------------------------------
def _batch_hashes(spark, docs):
    """One-shot batch hash of a (doc_id, text, ...) frame — the
    convergence target every store state is compared against."""
    from tradecat_spark.multimodal import attach_payload, phash_bands

    media = attach_payload(
        docs.select(
            "doc_id", "text", F.lit(None).cast("string").alias("lang")
        )
    ).filter(F.octet_length("payload") > 0)
    return sorted(
        (r["doc_id"], r["b0"], r["b1"], r["b2"], r["b3"])
        for r in phash_bands(media).collect()
    )


def _store_hashes(spark, store):
    from tradecat_spark.streaming import phash as sp

    return sorted(
        (r["doc_id"], r["b0"], r["b1"], r["b2"], r["b3"])
        for r in sp.read_hashes(spark, store).collect()
    )


def test_phash_store_replay_republish_and_compaction(
    spark, sf_dir, tmp_path
):
    """The hash store must converge to one row per doc under BOTH
    duplication shapes — replaying the SAME batch id (at-least-once)
    and re-publishing the same docs under a LATER batch id (a
    recrawl) — match the one-shot batch hash exactly, and survive
    coverage-rule compaction byte-identically."""
    from tradecat_spark.streaming import phash as sp

    delta = _pipeline_delta(spark, sf_dir)
    b1 = delta.filter(F.col("doc_id") % 20 == 0)
    store = str(tmp_path / "hashes")

    sp.hash_batch(spark, b1, 1, store)
    n1 = sp.read_hashes(spark, store).count()
    assert n1 == b1.count()
    sp.hash_batch(spark, b1, 1, store)              # same-batch replay
    assert sp.read_hashes(spark, store).count() == n1
    sp.hash_batch(spark, delta, 2, store)           # recrawl superset
    assert sp.read_hashes(spark, store).count() == delta.count()
    assert _store_hashes(spark, store) == _batch_hashes(spark, delta)

    sp.compact_hashes(spark, store, 2)
    assert _store_hashes(spark, store) == _batch_hashes(spark, delta)
    # compaction left exactly the base partition
    from tradecat_spark.streaming.ingest import batch_partition_vals

    assert batch_partition_vals(store) == ["c2"]


def test_phash_store_pairs_match_batch_generators(spark, sf_dir, tmp_path):
    """Pairs emitted against the persisted store must equal the batch
    lanes' generator output over the same corpus — the no-drift law
    the shared operators/phash.py home exists to enforce."""
    from tradecat_spark.operators.phash import (
        phash_candidate_pairs,
        phash_verify_pairs,
    )
    from tradecat_spark.streaming import phash as sp

    delta = _pipeline_delta(spark, sf_dir)
    store = str(tmp_path / "hashes")
    sp.hash_batch(spark, delta, 0, store)
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in sp.near_dup_pairs(spark, store).collect()
    )
    wide = sp.read_hashes(spark, store)
    want = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in phash_verify_pairs(
            phash_candidate_pairs(wide, probe=True), wide
        ).collect()
    )
    assert got == want and got  # nonempty: the delta has near-dups


def test_ingest_pipeline_crash_before_phash_store(
    spark, sf_dir, tmp_path, monkeypatch
):
    """6th-store seam: crash AFTER every earlier store committed but
    BEFORE the image-hash update, then replay the whole batch body —
    the earlier stores must be byte-stable under the replay and the
    hash store must converge to the one-shot batch hash."""
    from tradecat_spark.streaming import phash as sp
    from tradecat_spark.streaming import pipeline as pl
    from tradecat_spark.streaming import sketch as sk

    base, _ = _dedup_fixtures(spark, sf_dir)
    delta = _pipeline_delta(spark, sf_dir)
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    _seed_base_store(spark, base, dirs["sig_store"])

    real = sp.hash_batch
    monkeypatch.setattr(
        sp, "hash_batch",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        pl.pipeline_batch(spark, delta, 3, dirs, with_phash=True)
    v_crash = _verdict_pdf(spark, dirs["verdicts"])
    cms_crash = sorted(map(tuple, sk.read_cms(
        spark, dirs["cms_store"]).collect()))
    # the hash update never ran — empty store, not an error
    assert sp.read_hashes(spark, dirs["phash_store"]).count() == 0

    monkeypatch.setattr(sp, "hash_batch", real)
    pl.pipeline_batch(spark, delta, 3, dirs, with_phash=True)

    assert _verdict_pdf(spark, dirs["verdicts"]).equals(v_crash)
    assert sorted(map(tuple, sk.read_cms(
        spark, dirs["cms_store"]).collect())) == cms_crash
    assert _store_hashes(spark, dirs["phash_store"]) == _batch_hashes(
        spark, delta
    )


def test_ingest_pipeline_crash_inside_phash_two_step_commit(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The seam INSIDE the hash updater's two-step body — after the
    re-publish screen has read the store but before the commit
    (``upsert_hashes``) — driven through the COMPOSED pipeline, with
    the crashed batch RE-PUBLISHING part of an earlier batch's docs so
    the screen is live at the crash point (the ANN interior seam's
    shape, r10 item 6, applied to the 6th store)."""
    from tradecat_spark.streaming import phash as sp
    from tradecat_spark.streaming import pipeline as pl

    base, _ = _dedup_fixtures(spark, sf_dir)
    delta = _pipeline_delta(spark, sf_dir)
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    _seed_base_store(spark, base, dirs["sig_store"])

    b1 = delta.filter(F.col("doc_id") % 20 == 0)
    pl.pipeline_batch(spark, b1, 3, dirs, with_phash=True)
    h_b1 = _store_hashes(spark, dirs["phash_store"])
    assert h_b1  # the screen below must have rows to filter on

    real = sp.upsert_hashes
    monkeypatch.setattr(
        sp, "upsert_hashes",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        pl.pipeline_batch(spark, delta, 4, dirs, with_phash=True)
    # hash store untouched: screen ran, commit never did
    assert _store_hashes(spark, dirs["phash_store"]) == h_b1

    monkeypatch.setattr(sp, "upsert_hashes", real)
    pl.pipeline_batch(spark, delta, 4, dirs, with_phash=True)
    # converged: one row per distinct doc, equal to the batch hash;
    # re-published b1 docs kept their first-commit rows
    assert _store_hashes(spark, dirs["phash_store"]) == _batch_hashes(
        spark, delta
    )


def test_pipeline_with_phash_without_text_column_raises(
    spark, sf_dir, tmp_path
):
    """with_phash is an explicit request for the image-hash store — a
    stream lacking the payload-bearing 'text' column must fail loudly,
    in pipeline_batch AND at start_ingest_pipeline start-up, not
    silently leave the store empty (the ANN store's r10 ADVICE rule)."""
    from tradecat_spark.streaming import pipeline as pl

    delta = _pipeline_delta(spark, sf_dir).drop("text")
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    with pytest.raises(ValueError, match="no 'text' column"):
        pl.pipeline_batch(spark, delta, 0, dirs, with_phash=True)

    src = str(tmp_path / "src")
    delta.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(delta.schema).parquet(src)
    with pytest.raises(ValueError, match="no 'text' column"):
        pl.start_ingest_pipeline(
            stream, root, available_now=True, with_phash=True
        )


def test_phash_delta_pairs_union_equals_full(spark, sf_dir, tmp_path):
    """The incremental == batch law for streaming image dedup: hash
    the delta corpus in three sequential batches with pair emission
    on; the union of per-batch emissions must equal the one-pass
    full-store near-dup pair set exactly (no driver bucket exceeds
    the cap), and a same-batch replay must not change it."""
    from tradecat_spark.streaming import phash as sp

    delta = _pipeline_delta(spark, sf_dir)
    store = str(tmp_path / "hashes")
    pairs_dir = str(tmp_path / "pairs")
    parts = [
        delta.filter(F.col("doc_id") % 30 == 0),
        delta.filter((F.col("doc_id") % 30 != 0)
                     & (F.col("doc_id") % 3 == 0)),
        delta.filter(F.col("doc_id") % 3 != 0),
    ]
    for i, p in enumerate(parts):
        sp.hash_batch(spark, p, i, store, pairs_dir=pairs_dir)
    got = sorted(map(tuple, sp.read_pairs(spark, pairs_dir).collect()))
    want = sorted(
        map(tuple, sp.near_dup_pairs(spark, store).collect())
    )
    assert got == want and got  # nonempty at the driver SFs
    # replay of the last batch: identical emissions, set unchanged
    sp.hash_batch(spark, parts[-1], 2, store, pairs_dir=pairs_dir)
    again = sorted(map(tuple, sp.read_pairs(spark, pairs_dir).collect()))
    assert again == got


# ---------------------------------------------------------------------------
# 7th store: inverted-index postings (streaming/postings.py, r12)
# ---------------------------------------------------------------------------
def _store_postings(spark, store):
    from tradecat_spark.streaming import postings as pp

    return sorted(
        (r["doc_id"], r["word"], r["tf"])
        for r in pp.read_postings(spark, store).collect()
    )


def _batch_postings(spark, docs):
    from tradecat_spark.streaming.postings import postings_of

    return sorted(
        (r["doc_id"], r["word"], r["tf"])
        for r in postings_of(docs).collect()
    )


def test_postings_store_replay_republish_and_compaction(
    spark, sf_dir, tmp_path
):
    """The postings store must converge to one row set per doc under
    BOTH duplication shapes — replaying the SAME batch id
    (at-least-once) and re-publishing the same docs under a LATER
    batch id — match the one-shot batch tokenization exactly, and
    survive coverage-rule compaction byte-identically."""
    from tradecat_spark.streaming import postings as pp
    from tradecat_spark.streaming.ingest import batch_partition_vals

    delta = _pipeline_delta(spark, sf_dir)
    b1 = delta.filter(F.col("doc_id") % 20 == 0)
    store = str(tmp_path / "postings")

    pp.index_text_batch(spark, b1, 1, store)
    got1 = _store_postings(spark, store)
    assert got1 == _batch_postings(spark, b1)
    pp.index_text_batch(spark, b1, 1, store)        # same-batch replay
    assert _store_postings(spark, store) == got1
    pp.index_text_batch(spark, delta, 2, store)     # recrawl superset
    assert _store_postings(spark, store) == _batch_postings(spark, delta)

    pp.compact_postings(spark, store, 2)
    assert _store_postings(spark, store) == _batch_postings(spark, delta)
    assert batch_partition_vals(store) == ["c2"]


def test_postings_store_bm25_matches_batch_scorer(spark, sf_dir, tmp_path):
    """Rankings served off the persisted store must equal the shared
    operator's output over the same corpus postings — the no-drift law
    operators/bm25.py exists to enforce (the retrieval twin of the
    phash pairs-match-generators law)."""
    from pyspark.sql import Window

    from tradecat_spark.operators.bm25 import bm25_micro_scores
    from tradecat_spark.streaming import postings as pp

    delta = _pipeline_delta(spark, sf_dir)
    store = str(tmp_path / "postings")
    pp.index_text_batch(spark, delta, 0, store)
    got = sorted(
        (r["query_id"], r["doc_id"], r["micros"], r["rk"])
        for r in pp.bm25_topk_over_store(
            spark, store, F.col("doc_id") < 80, k=10
        ).collect()
    )
    tf = pp.postings_of(delta)
    qt = (
        tf.filter(F.col("doc_id") < 80)
        .select(F.col("doc_id").alias("query_id"), "word")
        .distinct()
    )
    bm = bm25_micro_scores(tf, qt)
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("micros"), F.asc("doc_id")
    )
    want = sorted(
        (r["query_id"], r["doc_id"], r["micros"], r["rk"])
        for r in bm.withColumn(
            "rk", F.row_number().over(wk).cast("long")
        ).filter(F.col("rk") <= 10).collect()
    )
    assert got == want and got  # nonempty: delta has docs < 80


def test_bucketed_postings_scoring(spark, sf_dir, tmp_path):
    """The 100 TB serving layout (r14 verdict Next #4): publishing the
    store as a doc_id-bucketed catalog table must (a) keep rankings
    value-identical to the row-store scorer, and (b) remove every
    corpus-keyed shuffle from the scoring plan — no exchange anywhere
    carries doc_id (the dl aggregate, the dl↔term join, and the
    (query_id, doc_id) score sum all reuse the scan's bucket
    partitioning). The remaining exchanges are query-bounded or
    scalar by construction."""
    from tradecat_spark.streaming import postings as pp

    delta = _pipeline_delta(spark, sf_dir)
    store = str(tmp_path / "postings")
    pp.index_text_batch(spark, delta, 0, store)
    table = "bucketed_postings_pin"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        pp.publish_bucketed_postings(spark, store, table, buckets=8)
        df = pp.bm25_topk_over_bucketed(
            spark, table, F.col("doc_id") < 80, k=10
        )
        got = sorted(
            (r["query_id"], r["doc_id"], r["micros"], r["rk"])
            for r in df.collect()
        )
        want = sorted(
            (r["query_id"], r["doc_id"], r["micros"], r["rk"])
            for r in pp.bm25_topk_over_store(
                spark, store, F.col("doc_id") < 80, k=10
            ).collect()
        )
        assert got == want and got
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the scan must actually be bucketed, and no exchange may be
        # keyed by the doc id on either join side
        assert "Bucketed: true" in plan
        assert "hashpartitioning(doc_id" not in plan
        assert "hashpartitioning(cd" not in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_ingest_pipeline_crash_before_postings_store(
    spark, sf_dir, tmp_path, monkeypatch
):
    """7th-store seam: crash AFTER every earlier store committed but
    BEFORE the postings update, then replay the whole batch body — the
    earlier stores must be byte-stable under the replay and the
    postings store must converge to the one-shot batch tokenization."""
    from tradecat_spark.streaming import pipeline as pl
    from tradecat_spark.streaming import postings as pp
    from tradecat_spark.streaming import sketch as sk

    base, _ = _dedup_fixtures(spark, sf_dir)
    delta = _pipeline_delta(spark, sf_dir)
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    _seed_base_store(spark, base, dirs["sig_store"])

    real = pp.index_text_batch
    monkeypatch.setattr(
        pp, "index_text_batch",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        pl.pipeline_batch(spark, delta, 3, dirs, with_postings=True)
    v_crash = _verdict_pdf(spark, dirs["verdicts"])
    cms_crash = sorted(map(tuple, sk.read_cms(
        spark, dirs["cms_store"]).collect()))
    # the postings update never ran — empty store, not an error
    assert pp.read_postings(spark, dirs["postings_store"]).count() == 0

    monkeypatch.setattr(pp, "index_text_batch", real)
    pl.pipeline_batch(spark, delta, 3, dirs, with_postings=True)

    assert _verdict_pdf(spark, dirs["verdicts"]).equals(v_crash)
    assert sorted(map(tuple, sk.read_cms(
        spark, dirs["cms_store"]).collect())) == cms_crash
    assert _store_postings(spark, dirs["postings_store"]) == \
        _batch_postings(spark, delta)


def test_ingest_pipeline_crash_inside_postings_two_step_commit(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The seam INSIDE the postings updater's two-step body — after
    the re-publish screen has read the store but before the commit
    (``upsert_postings``) — driven through the COMPOSED pipeline, with
    the crashed batch RE-PUBLISHING part of an earlier batch's docs so
    the screen is live at the crash point (the ANN/phash interior
    seam's shape, applied to the 7th store)."""
    from tradecat_spark.streaming import pipeline as pl
    from tradecat_spark.streaming import postings as pp

    base, _ = _dedup_fixtures(spark, sf_dir)
    delta = _pipeline_delta(spark, sf_dir)
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    _seed_base_store(spark, base, dirs["sig_store"])

    b1 = delta.filter(F.col("doc_id") % 20 == 0)
    pl.pipeline_batch(spark, b1, 3, dirs, with_postings=True)
    p_b1 = _store_postings(spark, dirs["postings_store"])
    assert p_b1  # the screen below must have rows to filter on

    real = pp.upsert_postings
    monkeypatch.setattr(
        pp, "upsert_postings",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        pl.pipeline_batch(spark, delta, 4, dirs, with_postings=True)
    # postings store untouched: screen ran, commit never did
    assert _store_postings(spark, dirs["postings_store"]) == p_b1

    monkeypatch.setattr(pp, "upsert_postings", real)
    pl.pipeline_batch(spark, delta, 4, dirs, with_postings=True)
    # converged: one row set per distinct doc, equal to the batch
    # tokenization; re-published b1 docs kept their first-commit rows
    assert _store_postings(spark, dirs["postings_store"]) == \
        _batch_postings(spark, delta)


def test_pipeline_with_postings_without_text_column_raises(
    spark, sf_dir, tmp_path
):
    """with_postings is an explicit request for the inverted-index
    store — a stream lacking the 'text' column must fail loudly, in
    pipeline_batch AND at start_ingest_pipeline start-up, not silently
    leave the store empty (the family-wide loud-contract rule)."""
    from tradecat_spark.streaming import pipeline as pl

    delta = _pipeline_delta(spark, sf_dir).drop("text")
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    with pytest.raises(ValueError, match="no 'text' column"):
        pl.pipeline_batch(spark, delta, 0, dirs, with_postings=True)

    src = str(tmp_path / "src")
    delta.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(delta.schema).parquet(src)
    with pytest.raises(ValueError, match="no 'text' column"):
        pl.start_ingest_pipeline(
            stream, root, available_now=True, with_postings=True
        )


# ---------------------------------------------------------------------------
# 8th store: incremental cluster labels (streaming/labels.py, r13)
# ---------------------------------------------------------------------------
def _store_labels(spark, store):
    from tradecat_spark.streaming import labels as sl

    return sorted(
        (r["doc_id"], r["cluster_id"])
        for r in sl.read_labels(spark, store).collect()
    )


def _batch_labels(spark, hash_store, pairs_dir):
    """The batch truth the stream must converge to: components over
    (every hashed doc, the union of every emitted delta pair)."""
    from tradecat_spark.operators.components import min_label_components
    from tradecat_spark.streaming import phash as sp

    nodes = sp.read_hashes(spark, hash_store).select("doc_id")
    pairs = sp.read_pairs(spark, pairs_dir).select("doc_a", "doc_b")
    return sorted(
        (r["doc_id"], r["cluster_id"])
        for r in min_label_components(nodes, pairs).collect()
    )


def test_labels_store_streamed_equals_batch_components(
    spark, sf_dir, tmp_path
):
    """The core incremental-labels law: fold the delta corpus through
    three sequential (hash_batch -> update_labels) triggers — the
    composed pipeline's per-trigger body — and the converged label
    store must equal the one-pass batch min_label_components over the
    full hash store + emitted pair union. Then a replay of the last
    trigger must change nothing."""
    from tradecat_spark.streaming import labels as sl
    from tradecat_spark.streaming import phash as sp

    delta = _pipeline_delta(spark, sf_dir)
    store = str(tmp_path / "hashes")
    pairs_dir = str(tmp_path / "pairs")
    lbl_store = str(tmp_path / "labels")
    parts = [
        delta.filter(F.col("doc_id") % 30 == 0),
        delta.filter((F.col("doc_id") % 30 != 0)
                     & (F.col("doc_id") % 3 == 0)),
        delta.filter(F.col("doc_id") % 3 != 0),
    ]

    def _trigger(p, i):
        ret = sp.hash_batch(spark, p, i, store, pairs_dir=pairs_dir)
        if ret is not None:
            new_wide, prs = ret
            sl.update_labels(
                spark, lbl_store, i, new_wide.select("doc_id"),
                prs.select("doc_a", "doc_b"),
            )

    for i, p in enumerate(parts):
        _trigger(p, i)
    got = _store_labels(spark, lbl_store)
    want = _batch_labels(spark, store, pairs_dir)
    assert got == want and got
    # every hashed doc is labeled; merges exist at the driver SFs
    assert len(got) == sp.read_hashes(spark, store).count()
    assert any(d != c for d, c in got)
    # at-least-once: replay the last trigger with the same batch id
    _trigger(parts[-1], 2)
    assert _store_labels(spark, lbl_store) == got


def test_labels_cross_trigger_merge_rewrites_only_losing_sets(spark):
    """Two clusters stored by earlier triggers, merged by a later doc
    that pairs into both (the union-find hard path), driven at the
    updater's own contract level so the scenario is deterministic:
    the winning cluster's rows must NOT be rewritten (their stored
    batch_id is unchanged), the losing set and the new doc must be."""
    import pandas as pd
    import tempfile
    from tradecat_spark.streaming import labels as sl

    store = tempfile.mkdtemp(prefix="tc_lblmerge_") + "/labels"

    def df(pdf):
        return spark.createDataFrame(pdf)

    sl.update_labels(
        spark, store, 0, df(pd.DataFrame({"doc_id": [10, 11]})),
        df(pd.DataFrame({"doc_a": [10], "doc_b": [11]})),
    )
    sl.update_labels(
        spark, store, 1, df(pd.DataFrame({"doc_id": [30, 31]})),
        df(pd.DataFrame({"doc_a": [30], "doc_b": [31]})),
    )
    sl.update_labels(
        spark, store, 2, df(pd.DataFrame({"doc_id": [20]})),
        df(pd.DataFrame({"doc_a": [10, 20], "doc_b": [20, 30]})),
    )
    assert _store_labels(spark, store) == [
        (10, 10), (11, 10), (20, 10), (30, 10), (31, 10),
    ]
    raw = {
        r["doc_id"]: r["batch_id"]
        for r in sl._read_live(spark, store)
        .groupBy("doc_id").agg(F.max("batch_id").alias("batch_id"))
        .collect()
    }
    # winners untouched (still their batch-0 rows); losers + the
    # bridging doc rewritten by the merging trigger
    assert raw[10] == 0 and raw[11] == 0
    assert raw[20] == 2 and raw[30] == 2 and raw[31] == 2


def test_labels_compaction_coverage_and_post_base_merge(spark):
    """Latest-wins fold across a compaction boundary: compact the
    first triggers into a base, read_labels must be unchanged; then a
    later merge must rewrite rows WHOSE WINNERS SIT IN THE BASE and
    the reader must prefer the newer partial rows."""
    import pandas as pd
    import tempfile
    from tradecat_spark.streaming import labels as sl

    store = tempfile.mkdtemp(prefix="tc_lblcomp_") + "/labels"

    def df(pdf):
        return spark.createDataFrame(pdf)

    sl.update_labels(
        spark, store, 0, df(pd.DataFrame({"doc_id": [10, 11, 40]})),
        df(pd.DataFrame({"doc_a": [10], "doc_b": [11]})),
    )
    sl.update_labels(
        spark, store, 1, df(pd.DataFrame({"doc_id": [5]})),
        df(pd.DataFrame({"doc_a": [5], "doc_b": [10]})),
    )
    before = _store_labels(spark, store)
    sl.compact_labels(spark, store, 1)
    assert _store_labels(spark, store) == before
    # re-compaction (idempotent replace)
    sl.compact_labels(spark, store, 1)
    assert _store_labels(spark, store) == before
    # merge into the compacted base: doc 3 bridges {5,10,11} and {40}
    sl.update_labels(
        spark, store, 2, df(pd.DataFrame({"doc_id": [3]})),
        df(pd.DataFrame({"doc_a": [3, 3], "doc_b": [10, 40]})),
    )
    assert _store_labels(spark, store) == [
        (3, 3), (5, 3), (10, 3), (11, 3), (40, 3),
    ]


def test_labels_unlabeled_pair_endpoint_raises(spark):
    """A delta pair whose endpoint is neither stored nor in the delta
    means the pair producer and the label store diverged — must fail
    loudly, not drop the edge and ship a missed merge."""
    import pandas as pd
    import tempfile
    from tradecat_spark.streaming import labels as sl

    store = tempfile.mkdtemp(prefix="tc_lblbad_") + "/labels"

    def df(pdf):
        return spark.createDataFrame(pdf)

    with pytest.raises(AssertionError, match="no label"):
        sl.update_labels(
            spark, store, 0, df(pd.DataFrame({"doc_id": [1]})),
            df(pd.DataFrame({"doc_a": [1], "doc_b": [999]})),
        )


def test_ingest_pipeline_crash_before_labels_store(
    spark, sf_dir, tmp_path, monkeypatch
):
    """8th-store seam: crash AFTER the hash store committed (and its
    pairs were emitted) but BEFORE the label update, then replay the
    whole batch body — earlier stores byte-stable, and the label
    store must converge to the batch components truth."""
    from tradecat_spark.streaming import labels as sl
    from tradecat_spark.streaming import pipeline as pl

    base, _ = _dedup_fixtures(spark, sf_dir)
    delta = _pipeline_delta(spark, sf_dir)
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    _seed_base_store(spark, base, dirs["sig_store"])

    real = sl.update_labels
    monkeypatch.setattr(
        sl, "update_labels",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        pl.pipeline_batch(
            spark, delta, 3, dirs, with_phash=True, with_labels=True
        )
    v_crash = _verdict_pdf(spark, dirs["verdicts"])
    h_crash = _store_hashes(spark, dirs["phash_store"])
    assert h_crash  # the hash store DID commit before the seam
    assert sl.read_labels(spark, dirs["labels_store"]).count() == 0

    monkeypatch.setattr(sl, "update_labels", real)
    pl.pipeline_batch(
        spark, delta, 3, dirs, with_phash=True, with_labels=True
    )
    assert _verdict_pdf(spark, dirs["verdicts"]).equals(v_crash)
    assert _store_hashes(spark, dirs["phash_store"]) == h_crash
    assert _store_labels(spark, dirs["labels_store"]) == _batch_labels(
        spark, dirs["phash_store"], dirs["phash_pairs"]
    )


def test_ingest_pipeline_crash_inside_labels_commit(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The seam INSIDE the label updater — after the bounded cluster
    graph resolved but before the partition commit — driven through
    the composed pipeline across TWO triggers so the crashed trigger
    must relabel rows the first trigger stored."""
    from tradecat_spark.streaming import labels as sl
    from tradecat_spark.streaming import pipeline as pl

    base, _ = _dedup_fixtures(spark, sf_dir)
    delta = _pipeline_delta(spark, sf_dir)
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    _seed_base_store(spark, base, dirs["sig_store"])

    b1 = delta.filter(F.col("doc_id") % 20 == 0)
    pl.pipeline_batch(
        spark, b1, 3, dirs, with_phash=True, with_labels=True
    )
    l_b1 = _store_labels(spark, dirs["labels_store"])
    assert l_b1

    real = sl.upsert_partitions
    monkeypatch.setattr(
        sl, "upsert_partitions",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        pl.pipeline_batch(
            spark, delta, 4, dirs, with_phash=True, with_labels=True
        )
    # label store untouched: the resolve ran, the commit never did
    assert _store_labels(spark, dirs["labels_store"]) == l_b1

    monkeypatch.setattr(sl, "upsert_partitions", real)
    pl.pipeline_batch(
        spark, delta, 4, dirs, with_phash=True, with_labels=True
    )
    assert _store_labels(spark, dirs["labels_store"]) == _batch_labels(
        spark, dirs["phash_store"], dirs["phash_pairs"]
    )


def test_pipeline_with_labels_without_phash_raises(
    spark, sf_dir, tmp_path
):
    """with_labels consumes the hash store's delta pairs — requesting
    it without with_phash must fail loudly in pipeline_batch AND at
    start_ingest_pipeline start-up, not leave the store empty."""
    from tradecat_spark.streaming import pipeline as pl

    delta = _pipeline_delta(spark, sf_dir)
    root = str(tmp_path / "pipe")
    dirs = pl.pipeline_dirs(root)
    with pytest.raises(ValueError, match="requires with_phash"):
        pl.pipeline_batch(spark, delta, 0, dirs, with_labels=True)

    src = str(tmp_path / "src")
    delta.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(delta.schema).parquet(src)
    with pytest.raises(ValueError, match="requires with_phash"):
        pl.start_ingest_pipeline(
            stream, root, available_now=True, with_labels=True
        )
