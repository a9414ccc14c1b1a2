"""Indicator math cross-checks.

The indicator surface is not SQL-expressible, so the driver's DuckDB
gate only row-checks it. These tests pin the math against inline,
independently-written pandas formulas (the same way SURVEY.md §5 says
the oracle strategy must work for §2.9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tradecat_spark.functions import ta
from tradecat_spark.indicators.base import active_indicators
from tradecat_spark.indicators.engine import compute_all


@pytest.fixture(scope="module")
def bars_pdf():
    rng = np.random.default_rng(7)
    n = 400
    close = 100 + np.cumsum(rng.normal(0, 1, n))
    high = close + rng.uniform(0, 2, n)
    low = close - rng.uniform(0, 2, n)
    open_ = close + rng.normal(0, 0.5, n)
    vol = rng.uniform(10, 1000, n)
    return pd.DataFrame(
        {
            "open": open_, "high": high, "low": low, "close": close,
            "volume": vol,
            "bucket_ts": pd.date_range("2024-01-01", periods=n, freq="h"),
            "sym": "X",
        }
    )


def test_rsi_matches_inline_wilder(bars_pdf):
    c = bars_pdf.close
    d = c.diff()
    up = d.clip(lower=0).fillna(0).ewm(alpha=1 / 14, adjust=False).mean()
    dn = (-d).clip(lower=0).fillna(0).ewm(alpha=1 / 14, adjust=False).mean()
    expected = 100 - 100 / (1 + up / dn)
    got = ta.rsi(c, 14)
    assert np.allclose(got.iloc[20:], expected.iloc[20:], atol=1e-9)


def test_macd_matches_inline(bars_pdf):
    c = bars_pdf.close
    line, sig, hist = ta.macd(c)
    exp_line = c.ewm(span=12, adjust=False).mean() - c.ewm(span=26, adjust=False).mean()
    exp_sig = exp_line.ewm(span=9, adjust=False).mean()
    assert np.allclose(line, exp_line, atol=1e-9)
    assert np.allclose(sig, exp_sig, atol=1e-9)
    assert np.allclose(hist, exp_line - exp_sig, atol=1e-9)


def test_atr_is_wilder_rma_of_tr(bars_pdf):
    h, l, c = bars_pdf.high, bars_pdf.low, bars_pdf.close
    pc = c.shift(1)
    tr = pd.concat([h - l, (h - pc).abs(), (l - pc).abs()], axis=1).max(axis=1)
    expected = tr.ewm(alpha=1 / 14, adjust=False).mean()
    assert np.allclose(ta.atr(h, l, c, 14).iloc[5:], expected.iloc[5:], atol=1e-9)


def test_supertrend_direction_on_trend():
    n = 120
    up = pd.Series(np.linspace(100, 200, n))
    h, l = up + 1, up - 1
    _, direction = ta.supertrend(h, l, up, 10, 3.0)
    assert direction.iloc[-1] == 1
    down = pd.Series(np.linspace(200, 100, n))
    _, direction = ta.supertrend(down + 1, down - 1, down, 10, 3.0)
    assert direction.iloc[-1] == -1


def test_kdj_bounds(bars_pdf):
    k, d, j = ta.kdj(bars_pdf.high, bars_pdf.low, bars_pdf.close)
    assert k.between(-5, 105).all() and d.between(-5, 105).all()


def test_volume_profile_covers_value_area(bars_pdf):
    poc, lo, hi = ta.volume_profile(bars_pdf.close, bars_pdf.volume, 48)
    assert lo <= poc <= hi
    assert lo >= bars_pdf.close.min() - 1e-9
    assert hi <= bars_pdf.close.max() + 1e-9


def test_compute_all_full_surface(spark, bars_pdf):
    """End-to-end: every registered indicator emits its declared columns
    for a real group, and placeholders appear for a thin group."""
    thin = bars_pdf.head(3).assign(sym="THIN")
    sdf = spark.createDataFrame(pd.concat([bars_pdf, thin]))
    out = compute_all(sdf, ["sym"], ts="bucket_ts", tail=500)
    rows = {r["sym"]: r for r in out.collect()}
    metas = active_indicators()
    assert len(metas) >= 28, "indicator surface regressed"
    full = rows["X"].asDict()
    assert full["n_bars"] == 400
    for meta in metas.values():
        for col, typ in meta.outputs:
            assert col in full, f"{meta.name} missing {col}"
            if typ == "double" and meta.min_data <= 400:
                assert full[col] is not None, f"{meta.name}.{col} is NULL"
    # thin group: placeholder row with NULLs for big-lookback indicators
    thin_row = rows["THIN"].asDict()
    assert thin_row["n_bars"] == 3
    assert thin_row["rsi14"] is None


def test_compute_all_groups_never_split_across_partitions(spark):
    """The r14 ADVICE contract pin: compute_all's mapInPandas stage is
    only correct because its explicit hash(keys) repartition lands every
    group's rows WHOLE in one partition (topn_per_group preserves that
    clustering — see its docstring). If a future edit broke the
    clustering (round-robin repartition, differently-keyed exchange),
    groups would split across partitions and each fragment would emit
    its own row — duplicate keys with partial tails instead of an
    error. Shape chosen to expose exactly that: far more partitions
    (2*parallelism+1) than groups, many input slices per group."""
    rng = np.random.default_rng(11)
    n, keys = 120, [f"S{i}" for i in range(7)]
    pdf = pd.concat(
        [
            pd.DataFrame({
                "open": 1.0, "high": 2.0, "low": 0.5,
                "close": 100 + np.cumsum(rng.normal(0, 1, n)),
                "volume": rng.uniform(1, 10, n),
                "bucket_ts": pd.date_range("2024-01-01", periods=n, freq="h"),
                "sym": k,
            })
            for k in keys
        ]
    )
    # scatter the input so every group starts spread over many partitions
    sdf = spark.createDataFrame(pdf).repartition(16)
    out = compute_all(sdf, ["sym"], ts="bucket_ts", tail=500).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["sym"], []).append(r)
    assert sorted(by_key) == sorted(keys)
    for k, rows in by_key.items():
        assert len(rows) == 1, f"group {k} split across partitions"
        assert rows[0]["n_bars"] == n


def test_madrid_ribbon_matches_pandas_ewm(bars_pdf):
    """i_ribbon's vectorized 18-EMA loop vs the reference formula
    (batch/tv_volume_signal.py:9-39) written with per-period ewm."""
    from tradecat_spark.indicators.library import MADRID_PERIODS, i_ribbon

    close = bars_pdf["close"]
    lines = {
        int(p): close.ewm(span=int(p), adjust=False).mean()
        for p in MADRID_PERIODS
    }
    ma100 = lines[100].iloc[-1]
    bull = sum(
        1 for p in lines
        if lines[p].iloc[-1] > ma100 and lines[p].diff().iloc[-1] > 0
    ) / len(lines)
    bear = sum(
        1 for p in lines
        if lines[p].iloc[-1] < ma100 and lines[p].diff().iloc[-1] < 0
    ) / len(lines)
    out = i_ribbon(bars_pdf)
    assert out["bull_ratio"] == round(bull, 2)
    assert out["bear_ratio"] == round(bear, 2)
    assert out["ma100"] == pytest.approx(ma100, abs=1e-6)
    if bull >= 0.7:
        assert out["ribbon_signal"] == "buy" and out["ribbon_state"] == "bull"
        assert out["ribbon_strength"] == round(bull * 10, 3)
    elif bear >= 0.7:
        assert out["ribbon_signal"] == "sell" and out["ribbon_state"] == "bear"
    else:
        assert out["ribbon_signal"] == "watch"
        expect = abs((close.iloc[-1] - ma100) / ma100) * 5
        assert out["ribbon_strength"] == pytest.approx(round(expect, 3), abs=1e-3)


def test_madrid_ribbon_insufficient_data():
    from tradecat_spark.indicators.library import i_ribbon

    short = pd.DataFrame({"close": np.linspace(100, 110, 50)})
    out = i_ribbon(short)
    assert out["ribbon_signal"] == "watch" and out["ribbon_state"] == "mixed"
    assert out["ribbon_strength"] == 0.0 and np.isnan(out["ma100"])


def _pine_trend_model(df, prd=20, keep=3):
    """Independent loop-form model of Pine Trend Lines v2 (the library
    version is vectorized): pivot scan, first-valid line per pivot pair
    with the close-violation walk, resistance priority, distance%."""
    hi = df["high"].to_numpy(dtype=float)
    lo = df["low"].to_numpy(dtype=float)
    cl = df["close"].to_numpy(dtype=float)
    last = len(cl) - 1
    tv, tp, bv, bp = [], [], [], []
    for i in range(2 * prd, len(cl)):
        w_h, w_l = hi[i - 2 * prd : i + 1], lo[i - 2 * prd : i + 1]
        if hi[i - prd] == w_h.max():
            tv.insert(0, hi[i - prd]); tp.insert(0, i)
        if lo[i - prd] == w_l.min():
            bv.insert(0, lo[i - prd]); bp.insert(0, i)
    tv, tp, bv, bp = tv[:keep], tp[:keep], bv[:keep], bp[:keep]

    def line(vals, poss, support):
        for p1 in range(len(vals) - 1):
            for p2 in range(len(vals) - 1, p1, -1):
                v1, v2, q1, q2 = vals[p1], vals[p2], poss[p1], poss[p2]
                if (v1 > v2) != support or v1 == v2:
                    continue
                d = (v1 - v2) / (q1 - q2) if support else (v2 - v1) / (q1 - q2)
                h = v2 + d if support else v2 - d
                ok = True
                for x in range(q2 + 1 - prd, last + 1):
                    c = cl[last - x]
                    if (c < h) if support else (c > h):
                        ok = False
                        break
                    h = h + d if support else h - d
                if ok:
                    return (q2 - prd, v2, last, h - d if support else h + d)
        return None

    res, sup = line(tv, tp, False), line(bv, bp, True)
    ln = res if res is not None else sup
    direction = "short" if res else ("long" if sup else "range")
    dist = 0.0
    if ln and ln[2] != ln[0]:
        k = (ln[3] - ln[1]) / (ln[2] - ln[0])
        y = ln[1] + k * (last - ln[0])
        if y != 0:
            dist = (cl[-1] - y) / y * 100.0
    return direction, round(dist, 4)


def test_trend_line_matches_pine_model():
    from tradecat_spark.indicators.library import i_trend_line

    rng = np.random.default_rng(11)
    for seed in range(6):
        r = np.random.default_rng(seed)
        n = 160
        base = 100 + np.cumsum(r.normal(0, 0.6, n)) + 3 * np.sin(np.arange(n) / 7)
        df = pd.DataFrame({
            "open": base, "high": base + r.uniform(0.1, 1.5, n),
            "low": base - r.uniform(0.1, 1.5, n), "close": base,
            "volume": np.ones(n),
        })
        want_dir, want_dist = _pine_trend_model(df)
        out = i_trend_line(df)
        assert out["tl_direction"] == want_dir, seed
        assert out["tl_dist_pct"] == pytest.approx(want_dist, abs=1e-9), seed


def test_adx_fold_query_matches_pandas(spark, duck, sf_dir):
    """The ind_adx_di struct fold must reproduce functions/ta.adx
    (the applyInPandas surface's ADX) at 6dp on the same 1h bar tails."""
    import tradecat_spark.functions.ta as ta
    from tradecat_spark.plans.registry import load_all

    q = (
        load_all()["ind_adx_di"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    bars = duck.execute("""
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
        max(value) AS high, min(value) AS low, max_by(value, ts) AS close
      FROM events GROUP BY 1,2 ORDER BY 1,2
    """).df()
    for et, g in bars.groupby("event_type"):
        tail = g.sort_values("b").tail(500)
        a, p, m = ta.adx(tail["high"], tail["low"], tail["close"], 14)
        assert q.loc[et, "adx"] == round(a.iloc[-1], 6), et
        assert q.loc[et, "plus_di"] == round(p.iloc[-1], 6), et
        assert q.loc[et, "minus_di"] == round(m.iloc[-1], 6), et


def test_supertrend_fold_query_matches_pandas(spark, duck, sf_dir):
    """ind_supertrend_fold must reproduce functions/ta.supertrend on
    the same 1h bar tails (line at 6dp, direction exactly)."""
    import tradecat_spark.functions.ta as ta
    from tradecat_spark.plans.registry import load_all

    q = (
        load_all()["ind_supertrend_fold"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    bars = duck.execute("""
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
        max(value) AS high, min(value) AS low, max_by(value, ts) AS close
      FROM events GROUP BY 1,2 ORDER BY 1,2
    """).df()
    for et, g in bars.groupby("event_type"):
        tail = g.sort_values("b").tail(500)
        line, direction = ta.supertrend(
            tail["high"], tail["low"], tail["close"], 10, 3.0
        )
        assert q.loc[et, "st_line"] == round(line.iloc[-1], 6), et
        assert q.loc[et, "st_dir"] == direction.iloc[-1], et


def test_heikin_fold_query_matches_pandas(spark, duck, sf_dir):
    """ind_heikin_long_short must reproduce functions/ta.heikin_ashi
    on the same 1h OHLC tails."""
    import tradecat_spark.functions.ta as ta
    from tradecat_spark.plans.registry import load_all

    q = (
        load_all()["ind_heikin_long_short"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    bars = duck.execute("""
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
        min_by(value, ts) AS open, max(value) AS high,
        min(value) AS low, max_by(value, ts) AS close
      FROM events GROUP BY 1,2 ORDER BY 1,2
    """).df()
    for et, g in bars.groupby("event_type"):
        tail = g.sort_values("b").tail(500)
        ho, hc = ta.heikin_ashi(
            tail["open"], tail["high"], tail["low"], tail["close"], 10, 10
        )
        assert q.loc[et, "ha_open"] == round(ho.iloc[-1], 6), et
        assert q.loc[et, "ha_close"] == round(hc.iloc[-1], 6), et


def test_trend_line_query_matches_library(spark, duck, sf_dir):
    """ind_trend_line must reproduce indicators/library.i_trend_line
    on the same 1h bar tails (slope compared with a 1-ulp-scale
    tolerance: the library's numpy sums are pairwise, the query's are
    sequential)."""
    import numpy as np
    from tradecat_spark.indicators.library import i_trend_line
    from tradecat_spark.plans.registry import load_all

    q = (
        load_all()["ind_trend_line"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    bars = duck.execute("""
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
        max(value) AS high, min(value) AS low, max_by(value, ts) AS close
      FROM events GROUP BY 1,2 ORDER BY 1,2
    """).df()
    for et, g in bars.groupby("event_type"):
        tail = g.sort_values("b").tail(500).reset_index()
        r = i_trend_line(tail)
        row = q.loc[et]
        assert r["tl_direction"] == row["tl_direction"], et
        assert r["tl_state"] == row["tl_state"], et
        assert abs(r["tl_dist_pct"] - row["tl_dist_pct"]) <= 2e-4, et
        assert abs(round(r["trend_slope"], 6) - row["trend_slope"]) <= 1e-6, et
        for k in ("piv_high", "piv_low"):
            if np.isnan(r[k]):
                assert row[k] is None or np.isnan(row[k]), (et, k)
            else:
                assert round(r[k], 6) == row[k], (et, k)


def test_smart_rsi_query_matches_library(spark, duck, sf_dir):
    """ind_smart_rsi must reproduce indicators/library.i_smart_rsi —
    checked on the real sf tails AND on crafted trending frames whose
    seeds are pinned to fire the divergence branch both ways."""
    import numpy as np
    import pandas as pd

    import tradecat_spark.plans.q_indicators as QI
    from tradecat_spark.indicators.library import i_smart_rsi
    from tradecat_spark.plans.registry import load_all

    def compare(q_row, r):
        for k in ("rsi7", "rsi14", "rsi21", "rsi_avg", "rsi_strength",
                  "ob_threshold", "os_threshold"):
            assert round(r[k], 6) == q_row[k], k
        for k in ("rsi_state", "rsi_divergence", "rsi_signal", "rsi_trend"):
            assert r[k] == q_row[k], k

    # real tails
    q = (
        load_all()["ind_smart_rsi"].fn(spark, sf_dir)
        .toPandas().set_index("event_type")
    )
    bars = duck.execute("""
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS b,
        max(value) AS high, min(value) AS low, max_by(value, ts) AS close
      FROM events GROUP BY 1,2 ORDER BY 1,2
    """).df()
    for et, g in bars.groupby("event_type"):
        tail = g.sort_values("b").tail(500).reset_index()
        compare(q.loc[et], i_smart_rsi(tail))

    # crafted divergence frames (seeds 47=bearish, 41=bullish)
    for seed in (47, 41):
        rng = np.random.default_rng(seed)
        n = 120
        close = 100 + np.cumsum(rng.normal(0.3, 2.0, n)) + 5 * np.sin(np.arange(n) / 5)
        high = close + np.abs(rng.normal(0, 1, n))
        low = close - np.abs(rng.normal(0, 1, n))
        pdf = pd.DataFrame({
            "event_type": "X",
            "bucket_ts": pd.date_range("2025-01-01", periods=n, freq="1h"),
            "open": close, "high": high, "low": low, "close": close,
            "trade_count": 1,
        })
        bars_df = spark.createDataFrame(pdf)
        orig = QI._bars_1h_tail
        try:
            QI._bars_1h_tail = lambda s, d: bars_df
            out = QI.ind_smart_rsi(spark, "unused").toPandas().iloc[0]
        finally:
            QI._bars_1h_tail = orig
        r = i_smart_rsi(pdf)
        assert r["rsi_divergence"] != "none"
        compare(out, r)


def test_recompute_dirty_equals_full_recompute(spark, sf_dir):
    """Incremental maintenance law: recomputing ONLY the keys whose
    bars changed, unioned with the cached rows for clean keys, must
    equal a full recompute over the current bars — bit-for-bit (same
    kernels, same tails)."""
    import pandas.testing as pdt
    from pyspark.sql import functions as F

    from tradecat_spark.catalog import load_table
    from tradecat_spark.indicators.engine import (
        bars_from_events,
        compute_all,
        recompute_dirty,
    )

    e = load_table(spark, sf_dir, "events")
    cutoff = e.agg(
        (F.max("ts") - F.expr("INTERVAL 2 DAYS")).alias("c")
    ).collect()[0]["c"]
    bars_old = bars_from_events(
        e.filter(F.col("ts") < F.lit(cutoff)), "event_type", 3600
    )
    bars_new = bars_from_events(e, "event_type", 3600)
    # dirty = keys whose bar set changed between the two states
    dirty = (
        bars_new.select("event_type", "bucket_ts")
        .exceptAll(bars_old.select("event_type", "bucket_ts"))
        .select("event_type")
        .distinct()
    )
    assert 0 < dirty.count() <= bars_new.select("event_type").distinct().count()

    cached = compute_all(bars_old, ["event_type"])
    got = (
        recompute_dirty(bars_new, cached, dirty, ["event_type"])
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = (
        compute_all(bars_new, ["event_type"])
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pdt.assert_frame_equal(got, want, check_exact=True)
