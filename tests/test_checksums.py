"""Checksum twins for the Python-surface queries (r4 verdict item 2).

Each twin runs the REAL applyInPandas / state-machine pipeline and
reduces it to columns with exact DuckDB oracles; this test mirrors the
driver's hash gate at sf0.001 (the driver re-checks at sf0.01).
Determinism matters here: DuckDB 1.0 lambda folds are evaluated
in-place over shared vectors, and two classes of corruption were found
while building these (struct_pack accumulators; whole-list CASE
pass-through) — the twins use only the safe list-fold forms, and the
oracle runs TWICE to pin determinism.
"""

from __future__ import annotations

import pytest

from oracle_utils import assert_frames_match
from tradecat_spark.plans.registry import load_all

TWINS = (
    "indicator_surface_checksum",
    "indicator_batch_checksum",
    "signal_rule_events_checksum",
    # may be EMPTY at sf0.001 (no subset rule fires on 15-user data);
    # the sf0.01 driver gate carries the non-trivial rows
    "signal_pack_subset_checksum",
)


@pytest.mark.parametrize("name", TWINS)
def test_checksum_twin_matches_oracle(spark, duck, sf_dir, name):
    spec = load_all()[name]
    sp = spec.fn(spark, sf_dir).toPandas()
    if name != "signal_pack_subset_checksum":
        assert len(sp) > 0
    first = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(sp, first, name)
    again = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(sp, again, f"{name} (rerun — fold determinism)")


def test_surface_checksum_covers_many_families():
    """The twin must stay a BROAD value gate: n_bars + ≥40 indicator
    columns spanning selections, counts, and all four fold families."""
    from tradecat_spark.plans.q_checksums import _checksum_cols

    names = [n for n, _, _, _ in _checksum_cols()]
    assert len(names) >= 40
    for family_marker in ("don_high", "macd_cross", "atr14", "rsi_state",
                          "ema99", "up_run", "tenkan", "last_close"):
        assert family_marker in names


def test_fold_lambda_matches_pandas_on_random_series():
    """The checksum twins' premise, pinned mechanically on arbitrary
    OHLC walks (not just the driver tables): the DuckDB list-fold
    reproduces the pandas recurrences to FAR below the twins' 6-dp
    rounding gate — EMA family, MACD signal chain, Wilder ATR with the
    h0-l0 seed, running ATR extremes, RSI gain/loss folds. Not asserted
    bit-exact: DuckDB may contract ``a*k1 + x*k2`` into an FMA, which
    drifts ~1 ulp per step on some series (observed 1.7e-13 over 107
    steps); ROUND(·,6) absorbs that, and the driver hash gate pins the
    rounded values on the actual tables. A DuckDB upgrade that changes
    lambda EVALUATION semantics (the real hazard this guards) would
    miss by whole values, not ulps."""
    TOL = 1e-9  # 1000x under the 6-dp gate, 1000x over FMA drift
    import duckdb
    import numpy as np
    import pandas as pd

    from tradecat_spark.plans.q_checksums import (
        _SLOT,
        _fold_lambda,
        _seed_lambda,
    )

    rng = np.random.default_rng(20260814)
    con = duckdb.connect()
    for trial in range(5):
        n = int(rng.integers(30, 400))
        c = pd.Series(100 + rng.normal(0, 2, n).cumsum())
        h = c + rng.random(n) * 2
        l = c - rng.random(n) * 2
        rows = pd.DataFrame({"i": range(n), "o": c, "h": h, "l": l, "c": c})
        con.register("bars_t", rows)
        # ORDER BY inside list() — exactly as the twin oracles do; an
        # unordered list() is NOT guaranteed to aggregate in scan order
        acc = con.execute(f"""
            SELECT list_reduce(
              list_transform(
                (SELECT list(struct_pack(o := o, h := h, l := l, c := c)
                             ORDER BY i) FROM bars_t),
                {_seed_lambda()}),
              {_fold_lambda()})
        """).fetchone()[0]

        def last(s):
            return float(s.iloc[-1])

        for name, span in (("e5", 5), ("e13", 13), ("e7", 7), ("e25", 25),
                           ("e34", 34), ("e99", 99), ("e12", 12),
                           ("e26", 26)):
            want = last(c.ewm(span=span, adjust=False).mean())
            assert abs(acc[_SLOT[name] - 1] - want) < TOL, (trial, name)
        line = (c.ewm(span=12, adjust=False).mean()
                - c.ewm(span=26, adjust=False).mean())
        sig = line.ewm(span=9, adjust=False).mean()
        assert abs(acc[_SLOT["sig"] - 1] - last(sig)) < TOL, trial
        pc = c.shift(1)
        tr = pd.concat([h - l, (h - pc).abs(), (l - pc).abs()], axis=1).max(
            axis=1
        )  # row 0: NaN-ignoring max == h0 - l0 (numpy fmax semantics)
        atr = tr.ewm(alpha=1 / 14, adjust=False).mean()
        assert abs(acc[_SLOT["atr"] - 1] - last(atr)) < TOL, trial
        assert abs(acc[_SLOT["amx"] - 1] - float(atr.max())) < TOL, trial
        assert abs(acc[_SLOT["amn"] - 1] - float(atr.min())) < TOL, trial
        d = c.diff()
        for p in (7, 14, 21):
            g = d.clip(lower=0).fillna(0).ewm(alpha=1 / p, adjust=False).mean()
            lo = (-d).clip(lower=0).fillna(0).ewm(
                alpha=1 / p, adjust=False).mean()
            assert abs(acc[_SLOT[f"g{p}"] - 1] - last(g)) < TOL, (trial, p)
            assert abs(acc[_SLOT[f"l{p}"] - 1] - last(lo)) < TOL, (trial, p)
        con.unregister("bars_t")
