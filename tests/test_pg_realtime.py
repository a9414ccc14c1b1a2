"""Intent checks for the 11 PG realtime checks (plans/q_pg_realtime.py)
against hand-computed expectations (reference pg_engine.py:148-404)."""

from __future__ import annotations

import pandas as pd
import pytest

import tradecat_spark.plans.q_pg_realtime as Q


@pytest.fixture()
def fired(spark, monkeypatch):
    """Two symbols, three hours of 5m bars with engineered hourly stats.

    SURGE: hour0 close 100 → hour1 close 104 (+4%) → strength
    min(90, floor(50+40)) = 90; hour1 → hour2 close 107.64 ("+3.5%",
    actually 3.4999999999999996 in float64) → int(50+34.999…) = 84,
    exactly what the reference's int() truncation computes.
    FLAT: all-up bars every hour (sell volume 0 ⇒ taker_ls division
    by zero ⇒ reference swallows ⇒ no flip signals ever), buy_ratio
    1.0 ⇒ taker_buy_dominance floor(60+30) = 90 each hour.
    """
    rows = []
    eid = 0

    def hour(sym, h, close, n_per_bar=2):
        nonlocal eid
        t0 = pd.Timestamp("2025-06-01") + pd.Timedelta(hours=h)
        for b in range(12):
            base = t0 + pd.Timedelta(minutes=5 * b)
            # strictly-up 5m bar ending at `close` for the hour's last bar
            px = close if b == 11 else close * 0.999
            rows.append(dict(event_id=eid, ts=base, user_id=1,
                             event_type=sym, value=px * 0.998, props=""))
            eid += 1
            rows.append(dict(event_id=eid, ts=base + pd.Timedelta(minutes=4),
                             user_id=1, event_type=sym, value=px, props=""))
            eid += 1

    hour("SURGE", 0, 100.0)
    hour("SURGE", 1, 104.0)
    hour("SURGE", 2, 104.0 * 1.035)
    for h in range(3):
        hour("FLAT", h, 50.0)

    df = spark.createDataFrame(pd.DataFrame(rows))
    monkeypatch.setattr(Q, "load_table", lambda s, d, n: df)
    out = Q.pg_realtime_checks(spark, "unused").toPandas()
    return out


def test_price_surge_strengths(fired):
    surge = fired[(fired["symbol"] == "SURGE")
                  & (fired["signal_type"] == "price_surge")]
    by_hour = dict(zip(surge["bucket_ts"], surge["strength"]))
    assert by_hour["2025-06-01 01:00:00"] == 90  # +4% capped at 90
    assert by_hour["2025-06-01 02:00:00"] == 84  # float64 3.4999… → 84


def test_zero_division_means_no_signal(fired):
    """All-up hours have zero sell volume: the reference's
    ZeroDivisionError swallow = our NULLIF ⇒ flips never fire."""
    assert not (
        fired["signal_type"].isin(["taker_ratio_flip_long",
                                   "taker_ratio_flip_short"])
    ).any()


def test_buy_dominance_uncapped_formula(fired):
    dom = fired[(fired["symbol"] == "FLAT")
                & (fired["signal_type"] == "taker_buy_dominance")]
    # buy_ratio == 1.0 every hour → int(60 + 30) = 90 (no min() cap
    # in the reference for this check)
    assert len(dom) == 3 and (dom["strength"] == 90).all()
    assert (dom["metric"] == 1.0).all()


def test_no_price_signals_without_prev(fired):
    h0 = fired[(fired["bucket_ts"] == "2025-06-01 00:00:00")
               & fired["signal_type"].isin(
                   ["price_surge", "price_dump", "oi_surge", "oi_dump",
                    "volume_spike"])]
    assert h0.empty
