"""Rule-compiler and cooldown semantics (reference rules/base.py:47-160,
engines/sqlite_engine.py cooldown behavior)."""

from __future__ import annotations

import datetime as dt

import pytest

from tradecat_spark.signals.engine import evaluate_rules
from tradecat_spark.signals.rules import ConditionType, SignalRule


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


@pytest.fixture(scope="module")
def snapshots(spark):
    rows = [
        # sym, ts, rsi14, fast, slow, state
        ("A", _ts(0), 45.0, 1.0, 2.0, "tangled"),
        ("A", _ts(1), 29.0, 1.5, 1.4, "tangled"),    # rsi cross-down 30; fast cross-up
        ("A", _ts(2), 31.0, 1.3, 1.5, "bull_stack"), # state-change; fast cross-down
        ("A", _ts(3), 28.0, 1.2, 1.6, "bull_stack"), # rsi cross-down again (cooldown window)
        ("B", _ts(0), 50.0, 2.0, 1.0, "tangled"),
        ("B", _ts(1), 50.0, 2.0, 1.0, "tangled"),    # nothing fires
    ]
    return spark.createDataFrame(
        rows, "sym string, snap_ts timestamp, rsi14 double, fast double, "
        "slow double, regime string"
    )


RULES = [
    SignalRule("rsi_dip", "t", ConditionType.THRESHOLD_CROSS_DOWN,
               {"field": "rsi14", "threshold": 30.0}),
    SignalRule("gold", "t", ConditionType.CROSS_UP, {"fast": "fast", "slow": "slow"}),
    SignalRule("death", "t", ConditionType.CROSS_DOWN, {"fast": "fast", "slow": "slow"}),
    SignalRule("turns_bull", "t", ConditionType.STATE_CHANGE,
               {"field": "regime", "to": "bull_stack"}),
]


def test_rules_fire_correctly(spark, snapshots):
    events = evaluate_rules(snapshots, RULES, ["sym"], "snap_ts")
    got = {(r["rule"], r["sym"], r["fired_at"].hour) for r in events.collect()}
    assert got == {
        ("rsi_dip", "A", 1),
        ("gold", "A", 1),
        ("death", "A", 2),
        ("turns_bull", "A", 2),
        ("rsi_dip", "A", 3),
    }


def test_cooldown_suppresses_refire(spark, snapshots):
    events = evaluate_rules(
        snapshots, RULES, ["sym"], "snap_ts", cooldown_sec=3 * 3600
    )
    rsi_hits = sorted(
        r["fired_at"].hour for r in events.collect() if r["rule"] == "rsi_dip"
    )
    # hour-3 refire is within the 3h cooldown anchored at hour 1 → dropped
    assert rsi_hits == [1]


def test_range_and_contains(spark):
    rows = [
        ("A", _ts(0), 25.0, "trend:flat"),
        ("A", _ts(1), 15.0, "trend:bull strong"),  # enters [0,20]; contains bull
        ("A", _ts(2), 18.0, "trend:bull"),          # stays → no enter event
        ("A", _ts(3), 25.0, "trend:bear"),          # exits
    ]
    df = spark.createDataFrame(rows, "sym string, snap_ts timestamp, k double, label string")
    rules = [
        SignalRule("enter", "t", ConditionType.RANGE_ENTER,
                   {"field": "k", "low": 0.0, "high": 20.0}),
        SignalRule("exit", "t", ConditionType.RANGE_EXIT,
                   {"field": "k", "low": 0.0, "high": 20.0}),
        SignalRule("bull_label", "t", ConditionType.CONTAINS,
                   {"field": "label", "values": ["bull"]}),
    ]
    events = evaluate_rules(df, rules, ["sym"], "snap_ts")
    got = sorted((r["rule"], r["fired_at"].hour) for r in events.collect())
    assert got == [
        ("bull_label", 1), ("bull_label", 2), ("enter", 1), ("exit", 3),
    ]
