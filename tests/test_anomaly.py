"""Laws for the structural monitoring family (q_anomaly).

The sf0.001 oracle parity sweep covers value equality with DuckDB;
these pin the algorithmic laws: the closed-form CUSUM equals the
textbook recursion, the AMOC argmax equals a brute-force scan, the
seasonal counts are internally consistent, and the family's
non-negative-value assumption (which makes its integer divisions
engine-identical) actually holds on every driver SF.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tradecat_spark.plans.q_anomaly import (
    H_MULT,
    K_DIV,
    SEASONAL_MULT,
    _bars_micro,
)
from tradecat_spark.plans.registry import load_all

SPECS = load_all()


def _bars_pdf(spark, sf_dir):
    return (
        _bars_micro(spark, sf_dir)
        .toPandas()
        .sort_values(["event_type", "b5"])
        .reset_index(drop=True)
    )


def test_cusum_closed_form_equals_recursion(spark, sf_dir):
    """S_t = cum_t - min(0, min_{j<=t} cum_j) must equal the textbook
    per-row recursion S_t = max(0, S_{t-1} + x_t) — recomputed here in
    plain Python over the same integer deltas, both directions."""
    pdf = _bars_pdf(spark, sf_dir)
    out = SPECS["ts_cusum_drift"].fn(spark, sf_dir).toPandas()
    peaks = out[out["kind"] == "max"]
    for sym, g in pdf.groupby("event_type"):
        deltas = g["cm"].diff().dropna().astype("int64").tolist()
        if not deltas:
            continue
        mad = sum(abs(d) for d in deltas) // len(deltas)
        k = mad // K_DIV
        for direction, sign in (("up", 1), ("down", -1)):
            s, smax = 0, 0
            for d in deltas:
                s = max(0, s + sign * d - k)
                smax = max(smax, s)
            row = peaks[
                (peaks["symbol"] == sym)
                & (peaks["direction"] == direction)
            ]
            assert len(row) == 1, (sym, direction)
            assert round(row["stat6"].iloc[0] * 1e6) == smax
            assert round(row["thresh6"].iloc[0] * 1e6) == H_MULT * mad


def test_cusum_alarm_rows_cross_their_threshold(spark, sf_dir):
    out = SPECS["ts_cusum_drift"].fn(spark, sf_dir).toPandas()
    alarms = out[out["kind"] == "alarm"]
    assert (alarms["stat6"] > alarms["thresh6"]).all()
    # and every alarm's statistic is bounded by its symbol's peak
    peaks = out[out["kind"] == "max"].set_index(["symbol", "direction"])
    for _, a in alarms.iterrows():
        assert (
            a["stat6"]
            <= peaks.loc[(a["symbol"], a["direction"]), "stat6"]
        )


def test_level_shift_matches_bruteforce_argmax(spark, sf_dir):
    """The ranked-window AMOC pick must equal a brute-force scan over
    every interior split: argmax |n*prefix_t - t*total|, earliest t on
    ties, with exact integer means."""
    pdf = _bars_pdf(spark, sf_dir)
    got = (
        SPECS["ts_level_shift"].fn(spark, sf_dir)
        .toPandas()
        .set_index("symbol")
    )
    for sym, g in pdf.groupby("event_type"):
        cms = g["cm"].astype("int64").tolist()
        n, total = len(cms), sum(cms)
        if n < 2:
            assert sym not in got.index
            continue
        best_t, best_c = None, -1
        pre = 0
        for t, cm in enumerate(cms[:-1], start=1):
            pre += cm
            c = abs(n * pre - t * total)
            if c > best_c:
                best_t, best_c, best_pre = t, c, pre
        row = got.loc[sym]
        assert int(row["cp_index"]) == best_t, sym
        # exact 6dp means (round-half-away in micro-units)
        bm = ((abs(best_pre) * 2_000_000 + best_t) // (2 * best_t)) / 1e6
        assert row["before_mean6"] == bm, sym


def test_seasonal_profile_counts_consistent(spark, sf_dir):
    """Profile invariants: hours partition each symbol's bars,
    anomalies never exceed their hour's bar count, and a recomputed
    pandas baseline/scale reproduces the anomaly counts exactly."""
    pdf = _bars_pdf(spark, sf_dir)
    us = pdf["b5"].astype("datetime64[us]").astype("int64")
    pdf["hod"] = (us // 3_600_000_000) % 24
    out = SPECS["ts_seasonal_hour_profile"].fn(spark, sf_dir).toPandas()
    assert (out["n_anomalies"] <= out["n_bars"]).all()
    for sym, g in pdf.groupby("event_type"):
        o = out[out["symbol"] == sym]
        assert o["n_bars"].sum() == len(g)
        base = {
            h: int(hg["cm"].sum()) // len(hg)
            for h, hg in g.groupby("hod")
        }
        ares = g.apply(
            lambda r: abs(int(r["cm"]) - base[r["hod"]]), axis=1
        )
        scale = int(ares.sum()) // len(g)
        for h, hg in g.groupby("hod"):
            want = int(
                (
                    hg.apply(
                        lambda r: abs(int(r["cm"]) - base[r["hod"]]),
                        axis=1,
                    )
                    > SEASONAL_MULT * scale
                ).sum()
            )
            assert (
                int(o[o["hod"] == h]["n_anomalies"].iloc[0]) == want
            ), (sym, h)


@pytest.mark.parametrize(
    "sf", ["sf0.001", "sf0.01", "sf0.1"]
)
def test_events_value_is_non_negative(sf):
    """The family's integer divisions are engine-identical only for
    non-negative sums (Spark `div` truncates toward zero, DuckDB `//`
    floors; they differ on negatives) — enforce the non-negative
    `value` assumption on every driver SF present, the ASCII-pin
    precedent applied here (sf0.1 carries a handful of exact-0.0
    values, so the bound is >= 0, not > 0)."""
    import duckdb

    path = f"/root/testdata/{sf}/events.parquet"
    if not os.path.isfile(path):
        pytest.skip(f"{sf} testdata not on this machine")
    lo = duckdb.connect().execute(
        f"SELECT MIN(value) FROM '{path}'"
    ).fetchone()[0]
    assert lo is not None and lo >= 0


def test_anomaly_plans_stay_on_the_symbol_key(spark, sf_dir):
    """Plan laws for the family: the per-symbol stats sides join back
    by BROADCAST (never a sort-merge join — the stats frames are
    symbol-cardinality small by construction), and nothing in any of
    the three lanes goes all-pairs."""
    for name in (
        "ts_cusum_drift", "ts_level_shift", "ts_seasonal_hour_profile"
    ):
        plan = (
            SPECS[name].fn(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
