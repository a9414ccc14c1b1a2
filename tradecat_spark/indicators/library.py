"""The registered indicator surface — re-derivations of the
reference's 38 indicator classes (SURVEY.md §2.9).

Each ``@register`` mirrors one reference class (citation in the meta);
the series math lives in :mod:`tradecat_spark.functions.ta` (pandas
forms, still the cross-check target of tests/test_indicators.py) and
:mod:`tradecat_spark.functions.ta_np` (the same compiled pandas window
kernels invoked directly on ndarrays). All compute functions return
the latest-bar snapshot, matching the reference's
1-row-per-(symbol, interval) output contract (indicators/base.py:64-75).

Differences from the reference are deliberate Spark-first choices:
- compute functions are pure pandas-in/dict-out (no DB handles), so one
  Arrow batch can evaluate the whole surface per group;
- every indicator declares its output schema up front (the reference
  infers SQLite columns from the first written DataFrame,
  db/reader.py:262-279 — implicit schemas don't survive a cluster).

r15 vectorization (guide §4.1/§4.2 — less per-row Python at the same
Arrow boundary): the class bodies run on raw ndarrays pulled once per
group; rolling/ewm math goes through ``ta_np``'s direct kernel calls
(bit-identical to the Series forms by construction — same compiled
code); shared primitives (true range, ATR(n), ±2-bar pivots) are
computed once per group in a frame-local cache. Every output value is
pinned bit-identical to the pre-rewrite implementation by
tools/indicator_equivalence.py across all three test SFs plus
randomized frames, and the four checksum twins re-enter the r15
driver gate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tradecat_spark.functions import ta, ta_np
from tradecat_spark.indicators.base import register

D = "double"
S = "string"

NAN = float("nan")


def _last(s: pd.Series) -> float:
    v = s.iloc[-1]
    return float(v) if pd.notna(v) else float("nan")


# ---------------------------------------------------------------------------
# per-group shared primitives (cached on the frame the engine passes to
# every indicator of one group; DataFrame.attrs is per-object, so direct
# test calls on fresh frames get fresh caches)
# ---------------------------------------------------------------------------
def _ctx(b: pd.DataFrame) -> dict:
    ctx = b.attrs.get("_ta_ctx")
    if ctx is None:
        ctx = {}
        b.attrs["_ta_ctx"] = ctx
    return ctx


def _ohlcv(b: pd.DataFrame):
    """(open, high, low, close, volume) as float64 ndarrays, once.

    A column the frame lacks comes back None — the engine always passes
    all five (BAR_COLS), but tests call single indicators on partial
    frames, and the pre-rewrite code only raised when it actually
    touched a missing column."""
    ctx = _ctx(b)
    a = ctx.get("ohlcv")
    if a is None:
        cols = set(b.columns)
        a = tuple(
            b[c].to_numpy(dtype=np.float64) if c in cols else None
            for c in ("open", "high", "low", "close", "volume")
        )
        ctx["ohlcv"] = a
    return a


def _tr(b: pd.DataFrame) -> np.ndarray:
    """True range (ta.true_range), once per group."""
    ctx = _ctx(b)
    tr = ctx.get("tr")
    if tr is None:
        _, h, l, c, _ = _ohlcv(b)
        pc = np.roll(c, 1)
        pc[0] = np.nan
        tr = np.fmax(h - l, np.fmax(np.abs(h - pc), np.abs(l - pc)))
        ctx["tr"] = tr
    return tr


def _atr(b: pd.DataFrame, n: int) -> np.ndarray:
    """Wilder ATR(n) = rma(TR) — shared by adx/smart_rsi/atr_scan (14),
    supertrend/keltner (10), zero_lag/precision_trend (70)."""
    ctx = _ctx(b)
    key = ("atr", n)
    a = ctx.get(key)
    if a is None:
        a = ta_np.ewm_mean(_tr(b), alpha=1.0 / n)
        ctx[key] = a
    return a


def _pivots2(b: pd.DataFrame):
    """Strict ±2-bar pivot highs/lows (value arrays, time order) —
    shared by support_resistance and smc."""
    ctx = _ctx(b)
    p = ctx.get("piv2")
    if p is None:
        _, h, l, _, _ = _ohlcv(b)
        n = len(h)
        if n >= 5:
            ch = h[2 : n - 2]
            mh = (
                (h[: n - 4] < ch) & (h[1 : n - 3] < ch)
                & (h[3 : n - 1] < ch) & (h[4:] < ch)
            )
            cl = l[2 : n - 2]
            ml = (
                (l[: n - 4] > cl) & (l[1 : n - 3] > cl)
                & (l[3 : n - 1] > cl) & (l[4:] > cl)
            )
            p = (ch[mh], cl[ml])
        else:
            p = (h[:0], l[:0])
        ctx["piv2"] = p
    return p


def _zl_band(b: pd.DataFrame):
    """(zlema70, 1.2 * 210-bar rolling max of ATR(70)) — shared by
    zero_lag_trend and precision_trend."""
    ctx = _ctx(b)
    zb = ctx.get("zl_band")
    if zb is None:
        _, _, _, c, _ = _ohlcv(b)
        n = len(c)
        lag = (70 - 1) // 2
        dl = np.full(n, np.nan)
        if n > lag:
            dl[lag:] = 2 * c[lag:] - c[:-lag]
        z = ta_np.ewm_mean(dl, span=70)
        band = ta_np.roll_max(_atr(b, 70), 210) * 1.2
        zb = (z, band)
        ctx["zl_band"] = zb
    return zb


def _rsi_arr(b: pd.DataFrame, n: int) -> np.ndarray:
    """Wilder RSI over the close array — exact ta.rsi op sequence."""
    ctx = _ctx(b)
    key = ("rsi", n)
    r = ctx.get(key)
    if r is None:
        _, _, _, c, _ = _ohlcv(b)
        d = np.diff(c, prepend=np.nan)
        gain = np.where(d > 0, d, 0.0)
        loss = np.where(d < 0, -d, 0.0)
        gain[np.isnan(d)] = 0.0
        loss[np.isnan(d)] = 0.0
        g = ta_np.ewm_mean(gain, alpha=1.0 / n)
        lo = ta_np.ewm_mean(loss, alpha=1.0 / n)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = 100.0 - 100.0 / (1.0 + g / np.where(lo == 0, np.nan, lo))
        out = np.where(lo == 0, 100.0, out)
        out = np.where(g + lo == 0, 50.0, out)
        ctx[key] = r = out
    return r


def _repl0(x):
    """Series.replace(0, nan) on an array (also matches -0.0)."""
    return np.where(x == 0, np.nan, x)


# ---------------------------------------------------------------------------
# trend / channel family
# ---------------------------------------------------------------------------
@register(
    "supertrend", [("st_line", D), ("st_dir", D), ("st_state", S)],
    citation="batch/lean_indicators.py:29-84 (方向 label consumed by "
    "rules/trend/__init__.py:7-34)",
)
def i_supertrend(b: pd.DataFrame):
    _, h, l, c, _ = _ohlcv(b)
    a = _atr(b, 10)
    mid = (h + l) / 2
    upper = (mid + 3.0 * a).tolist()
    lower = (mid - 3.0 * a).tolist()
    cv = c.tolist()
    n_rows = len(cv)
    fu = list(upper)
    fl = list(lower)
    d = 1.0
    line = NAN
    for i in range(1, n_rows):
        fu[i] = upper[i] if upper[i] < fu[i - 1] or cv[i - 1] > fu[i - 1] else fu[i - 1]
        fl[i] = lower[i] if lower[i] > fl[i - 1] or cv[i - 1] < fl[i - 1] else fl[i - 1]
        if cv[i] > fu[i]:
            d = 1.0
        elif cv[i] < fl[i]:
            d = -1.0
        line = fl[i] if d == 1.0 else fu[i]
    return {"st_line": line, "st_dir": d,
            "st_state": "up" if d > 0 else "down"}


@register(
    "adx", [("adx", D), ("plus_di", D), ("minus_di", D)],
    citation="batch/lean_indicators.py:88-130",
)
def i_adx(b: pd.DataFrame):
    _, h, l, c, _ = _ohlcv(b)
    up = np.diff(h, prepend=np.nan)
    dn = -np.diff(l, prepend=np.nan)
    with np.errstate(invalid="ignore"):
        plus_dm = np.where((up > dn) & (up > 0), up, 0.0)
        minus_dm = np.where((dn > up) & (dn > 0), dn, 0.0)
    a = _atr(b, 14)
    ar = _repl0(a)
    plus_di = 100 * ta_np.ewm_mean(plus_dm, alpha=1.0 / 14) / ar
    minus_di = 100 * ta_np.ewm_mean(minus_dm, alpha=1.0 / 14) / ar
    s = _repl0(plus_di + minus_di)
    with np.errstate(invalid="ignore"):
        dx = 100 * np.abs(plus_di - minus_di) / s
    adx = ta_np.ewm_mean(np.where(np.isnan(dx), 0.0, dx), alpha=1.0 / 14)
    return {"adx": float(adx[-1]), "plus_di": float(plus_di[-1]),
            "minus_di": float(minus_di[-1])}


@register("cci", [("cci", D)], citation="batch/lean_indicators.py:134-159")
def i_cci(b: pd.DataFrame):
    _, h, l, c, _ = _ohlcv(b)
    tp = (h + l + c) / 3
    ma_last = float(ta_np.roll_mean(tp, 20)[-1])
    k = min(20, len(tp))
    mad_last = float(np.abs(tp[-k:] - ma_last).mean()) if k else NAN
    den = 0.015 * (mad_last if mad_last != 0 else NAN)
    return {"cci": float((tp[-1] - ma_last) / den)}


@register("williams_r", [("wr", D)], citation="batch/lean_indicators.py:163-184")
def i_wr(b: pd.DataFrame):
    _, h, l, c, _ = _ohlcv(b)
    k = min(14, len(c))
    hi = float(h[-k:].max())
    lo = float(l[-k:].min())
    d = hi - lo
    return {"wr": float((hi - c[-1]) / (d if d != 0 else NAN) * -100)}


@register(
    "donchian", [("don_high", D), ("don_mid", D), ("don_low", D)],
    citation="batch/lean_indicators.py:188-204",
)
def i_donchian(b: pd.DataFrame):
    _, h, l, _, _ = _ohlcv(b)
    k = min(20, len(h))
    hi = float(h[-k:].max())
    lo = float(l[-k:].min())
    return {"don_high": hi, "don_low": lo, "don_mid": (hi + lo) / 2}


@register(
    "keltner", [("kc_mid", D), ("kc_upper", D), ("kc_lower", D)],
    citation="batch/lean_indicators.py:208-233",
)
def i_keltner(b: pd.DataFrame):
    _, _, _, c, _ = _ohlcv(b)
    mid = float(ta_np.ewm_mean(c, span=20)[-1])
    band = 2 * float(_atr(b, 10)[-1])
    return {"kc_mid": mid, "kc_upper": mid + band, "kc_lower": mid - band}


@register(
    "ichimoku",
    [("tenkan", D), ("kijun", D), ("span_a", D), ("span_b", D),
     ("cloud_signal", S), ("ichi_signal", S)],
    citation="batch/lean_indicators.py:237-281",
)
def i_ichimoku(b: pd.DataFrame):
    _, h, l, c, _ = _ohlcv(b)
    n = len(c)

    def mid(k):
        k = min(k, n)
        return (float(h[-k:].max()) + float(l[-k:].min())) / 2

    tenkan, kijun = mid(9), mid(26)
    span_a = (tenkan + kijun) / 2
    span_b = mid(52)
    cv = float(c[-1])
    hi, lo = max(span_a, span_b), min(span_a, span_b)
    signal = "above_cloud" if cv > hi else ("below_cloud" if cv < lo else "in_cloud")
    # 信号 buy/sell/neutral: cloud side + tenkan/kijun agreement (the
    # composite label rules/trend/__init__.py:78-105 transitions on)
    if cv > hi and tenkan > kijun:
        ichi = "buy"
    elif cv < lo and tenkan < kijun:
        ichi = "sell"
    else:
        ichi = "neutral"
    return {
        "tenkan": tenkan, "kijun": kijun,
        "span_a": span_a, "span_b": span_b,
        "cloud_signal": signal, "ichi_signal": ichi,
    }


def _recent_pivots(ext: np.ndarray, prd: int, keep: int, is_high: bool):
    """Last ``keep`` confirmed ±prd pivots, most recent first, as
    (value, detection_index) — detection lags the pivot by prd bars
    (Pine pivothigh/pivotlow semantics, batch/trend_line.py:8-24)."""
    n = len(ext)
    if n <= 2 * prd:
        return [], []
    win = np.lib.stride_tricks.sliding_window_view(ext, 2 * prd + 1)
    extreme = win.max(axis=1) if is_high else win.min(axis=1)
    cand = ext[prd : n - prd]
    det = np.nonzero(cand == extreme)[0] + 2 * prd  # detection bar index
    det = det[-keep:][::-1]
    return list(ext[det - prd]), list(det.astype(int))


def _fit_trendline(vals, poss, closes, prd, support: bool):
    """First valid un-violated line through two pivots, oldest-anchored
    (batch/trend_line.py:36-112): extend the line bar-by-bar toward the
    latest close; every close must stay on the line's side."""
    bar_index = len(closes) - 1
    n_pp = len(vals)
    for p1 in range(n_pp - 1):
        for p2 in range(n_pp - 1, p1, -1):
            v1, v2, q1, q2 = vals[p1], vals[p2], poss[p1], poss[p2]
            ok_slope = v1 > v2 if support else v1 < v2
            if not ok_slope:
                continue
            step = (v1 - v2) / (q1 - q2) if support else (v2 - v1) / float(q1 - q2)
            level = v2 + step if support else v2 - step
            valid = True
            for x in range(q2 + 1 - prd, bar_index + 1):
                idx = bar_index - x
                if idx < 0:
                    continue
                violated = closes[idx] < level if support else closes[idx] > level
                if violated:
                    valid = False
                    break
                level = level + step if support else level - step
            if valid:
                y_end = level - step if support else level + step
                return (q2 - prd, v2, bar_index, y_end)
    return None


@register(
    "trend_line",
    [("piv_high", D), ("piv_low", D), ("trend_slope", D), ("tl_state", S),
     ("tl_direction", S), ("tl_dist_pct", D)],
    citation="batch/trend_line.py:5-175 (Pine Trend Lines v2: ±20-bar "
    "pivots, 2-point line fit with close-violation scan, resistance "
    "priority, distance-to-line%)",
    min_data=45,
)
def i_trend_line(b: pd.DataFrame):
    """Full 趋势线扫描器 semantics: track the last 3 confirmed ±20-bar
    pivot highs/lows, fit the first close-respecting line through each
    pair (support rising through lows, resistance falling through
    highs), then direction = short if a resistance line holds, long if
    a support line holds, range otherwise; distance% is current close
    vs the line extrapolated to the latest bar."""
    prd, n_keep = 20, 3
    _, highs, lows, closes, _ = _ohlcv(b)
    slope = ta.linreg_slope(closes[-50:])
    tvals, tposs = _recent_pivots(highs, prd, n_keep, is_high=True)
    bvals, bposs = _recent_pivots(lows, prd, n_keep, is_high=False)
    res_line = _fit_trendline(tvals, tposs, closes, prd, support=False)
    sup_line = _fit_trendline(bvals, bposs, closes, prd, support=True)
    line = res_line if res_line is not None else sup_line
    direction = (
        "short" if res_line is not None
        else ("long" if sup_line is not None else "range")
    )
    dist_pct = 0.0
    if line is not None:
        x1, y1, x2, y2 = line
        if x2 != x1:
            k = (y2 - y1) / (x2 - x1)
            y_now = y1 + k * (len(closes) - 1 - x1)
            if y_now != 0:
                dist_pct = (closes[-1] - y_now) / y_now * 100.0
    return {
        "piv_high": float(tvals[0]) if tvals else float("nan"),
        "piv_low": float(bvals[0]) if bvals else float("nan"),
        "trend_slope": slope,
        "tl_state": "up" if slope > 0 else "down",
        "tl_direction": direction,
        "tl_dist_pct": round(float(dist_pct), 4),
    }


@register(
    "zero_lag_trend", [("zlema", D), ("zl_upper", D), ("zl_lower", D), ("zl_state", S)],
    citation="batch/tv_zero_lag.py, batch/super_trend.py:17-107",
    min_data=80,
)
def i_zero_lag(b: pd.DataFrame):
    _, _, _, c, _ = _ohlcv(b)
    z, band = _zl_band(b)
    zl, bl = float(z[-1]), float(band[-1])
    upper, lower = zl + bl, zl - bl
    cv = float(c[-1])
    state = "bull" if cv > upper else ("bear" if cv < lower else "range")
    return {"zlema": zl, "zl_upper": upper, "zl_lower": lower,
            "zl_state": state}


@register(
    "trend_cloud", [("smma200", D), ("cloud_side", S)],
    citation="batch/tv_trend_cloud.py", min_data=50,
)
def i_trend_cloud(b: pd.DataFrame):
    _, _, _, c, _ = _ohlcv(b)
    s = float(ta_np.ewm_mean(c, alpha=1.0 / 200)[-1])
    return {
        "smma200": s,
        "cloud_side": "above" if float(c[-1]) >= s else "below",
    }


#: Madrid ribbon EMA ladder (batch/tv_volume_signal.py:6)
MADRID_PERIODS = np.array(
    [5, 10, 15, 20, 25, 30, 35, 40, 45, 50, 55, 60, 65, 70, 75, 80, 90, 100],
    dtype=np.float64,
)


@register(
    "ma_ribbon",
    [("ribbon_signal", S), ("ribbon_state", S), ("ribbon_strength", D),
     ("bull_ratio", D), ("bear_ratio", D), ("ma100", D)],
    citation="batch/tv_volume_signal.py:9-39 (Madrid ribbon: 18 EMAs "
    "5..100; per-EMA bull = above EMA100 AND rising, bear = below AND "
    "falling; ≥70% agreement → signal, else distance-to-EMA100 strength)",
)
def i_ribbon(b: pd.DataFrame):
    """量能信号扫描器 semantics. All 18 EMA recursions run as ONE
    vectorized time loop (length-18 alpha vector per bar) — only the
    final value and final step's diff are needed, so no per-period
    pandas ewm chains."""
    x = _ohlcv(b)[3]
    if len(x) < int(MADRID_PERIODS[-1]):
        return {"ribbon_signal": "watch", "ribbon_state": "mixed",
                "ribbon_strength": 0.0, "bull_ratio": 0.0,
                "bear_ratio": 0.0, "ma100": float("nan")}
    alphas = 2.0 / (MADRID_PERIODS + 1.0)
    one_m = 1.0 - alphas
    y = np.full(len(alphas), x[0])
    for v in x[1:-1]:
        y = one_m * y + alphas * v
    prev = y
    y = one_m * y + alphas * x[-1]
    ma100 = y[-1]
    current = x[-1]
    d = y - prev
    n = len(MADRID_PERIODS)
    bull_ratio = float(np.count_nonzero((y > ma100) & (d > 0))) / n
    bear_ratio = float(np.count_nonzero((y < ma100) & (d < 0))) / n
    if bull_ratio >= 0.7:
        signal, state = "buy", "bull"
        strength = bull_ratio * 10
    elif bear_ratio >= 0.7:
        signal, state = "sell", "bear"
        strength = bear_ratio * 10
    else:
        signal = "watch"
        state = "bull" if current > ma100 else "bear"
        strength = abs((current - ma100) / ma100) * 5
    return {"ribbon_signal": signal, "ribbon_state": state,
            "ribbon_strength": round(float(strength), 3),
            "bull_ratio": round(bull_ratio, 2),
            "bear_ratio": round(bear_ratio, 2),
            "ma100": round(float(ma100), 6)}


@register(
    "fib_sniper", [("vwma200", D), ("fib_pos", D), ("fib_state", S)],
    citation="batch/tv_fib_sniper.py (VWMA(200) Fibonacci bands ×3.0)",
    min_data=50,
)
def i_fib_sniper(b: pd.DataFrame):
    _, _, _, c, v = _ohlcv(b)
    num = ta_np.roll_sum(c * v, 200)
    den = _repl0(ta_np.roll_sum(v, 200))
    base = num / den
    dev_last = float(ta_np.roll_std(c - base, 200)[-1]) * 3.0
    diff_last = float(c[-1]) - float(base[-1])
    p = diff_last / (dev_last if dev_last != 0 else NAN)
    return {"vwma200": float(base[-1]), "fib_pos": p,
            "fib_state": "up" if p >= 0 else "down"}


# ---------------------------------------------------------------------------
# oscillator / momentum family
# ---------------------------------------------------------------------------
def _rsi_divergence_np(h: np.ndarray, l: np.ndarray, rsi: np.ndarray,
                       lookback: int = 50):
    """Pivot-based divergence scan (batch/tv_rsi.py:28-53): ±5-bar price
    pivots over the last `lookback` bars; bearish = higher price high on
    a lower RSI high, bullish = lower price low on a higher RSI low.
    Returns (label, strength%)."""
    if len(h) < lookback or np.isnan(rsi).sum() > len(rsi) * 0.1:
        return "none", 0.0
    # vectorized centered ±5-bar pivot scan: a bar is a pivot when it
    # equals its 11-bar window extreme (same tie behavior as the
    # per-index scan it replaces; ~10× faster, the batch's hot spot)
    hi = h[-lookback:]
    lo = l[-lookback:]
    rr = rsi[-lookback:]
    win_h = np.lib.stride_tricks.sliding_window_view(hi, 11)
    win_l = np.lib.stride_tricks.sliding_window_view(lo, 11)
    core = slice(5, len(hi) - 5)
    ph_mask = hi[core] == win_h.max(axis=1)
    pl_mask = lo[core] == win_l.min(axis=1)
    p_highs, r_highs = hi[core][ph_mask], rr[core][ph_mask]
    p_lows, r_lows = lo[core][pl_mask], rr[core][pl_mask]
    if len(p_highs) >= 2 and len(p_lows) >= 2:
        if p_highs[-1] > p_highs[-2] and r_highs[-1] < r_highs[-2]:
            s = (r_highs[-2] - r_highs[-1]) / r_highs[-2] * 100
            return "bearish_div", float(min(s, 100.0))
        if p_lows[-1] < p_lows[-2] and r_lows[-1] > r_lows[-2]:
            s = (r_lows[-1] - r_lows[-2]) / r_lows[-2] * 100
            return "bullish_div", float(min(s, 100.0))
    return "none", 0.0


@register(
    "smart_rsi",
    [("rsi7", D), ("rsi14", D), ("rsi21", D), ("rsi_avg", D),
     ("rsi_state", S), ("rsi_divergence", S), ("rsi_signal", S),
     ("rsi_trend", S), ("rsi_strength", D), ("ob_threshold", D),
     ("os_threshold", D)],
    citation="batch/tv_rsi.py:14-174 (ATR-adaptive thresholds :20-25, "
    "EMA34 trend + 2-of-3 zone vote :56-99, pivot divergence :28-53)",
)
def i_smart_rsi(b: pd.DataFrame):
    """Full 智能RSI扫描器 semantics: multi-period RSI with volatility-
    adaptive overbought/oversold levels, EMA(34) trend gating, a 2-of-3
    zone vote for the position label, pivot divergence, and a divergence-
    boosted final signal."""
    _, h, l, c, _ = _ohlcv(b)
    r7a, r14a, r21a = (_rsi_arr(b, n) for n in (7, 14, 21))
    r7, r14, r21 = float(r7a[-1]), float(r14a[-1]), float(r21a[-1])
    # ATR-normalized adaptive thresholds (tv_rsi.py:20-25,126-136)
    atr = _atr(b, 14)
    amin = float(atr.min()) if len(atr) else NAN
    rng = (float(atr.max()) - amin) if len(atr) else NAN
    atr_norm = float((atr[-1] - amin) / (rng + 1e-10)) if len(atr) else 0.5
    if math.isnan(atr_norm):
        atr_norm = 0.5
    vol_factor = 1.0 + (atr_norm - 0.5) * 0.2
    overbought = min(80.0, 70.0 * vol_factor)
    oversold = max(20.0, 30.0 / vol_factor)

    vals = [v for v in (r7, r14, r21) if not math.isnan(v)]
    if not vals:
        return {"rsi7": float("nan"), "rsi14": float("nan"),
                "rsi21": float("nan"), "rsi_avg": float("nan"),
                "rsi_state": "neutral", "rsi_divergence": "none",
                "rsi_signal": "watch", "rsi_trend": "bearish",
                "rsi_strength": 0.0, "ob_threshold": overbought,
                "os_threshold": oversold}
    rsi_avg = float(np.mean(vals))
    # EMA(34) trend gate (tv_rsi.py:68-70)
    ema34 = float(ta_np.ewm_mean(c, span=34)[-1])
    trend = "bullish" if float(c[-1]) > ema34 else "bearish"
    n_os = sum(1 for v in vals if v < oversold)
    n_ob = sum(1 for v in vals if v > overbought)
    if trend == "bullish":
        if n_os >= 2:
            signal, state = "buy", "oversold"
        elif n_ob >= 2:
            signal, state = "watch", "overbought"
        else:
            signal, state = "watch", "neutral"
    else:
        if n_ob >= 2:
            signal, state = "sell", "overbought"
        elif n_os >= 2:
            signal, state = "watch", "oversold"
        else:
            signal, state = "watch", "neutral"
    if signal == "buy":
        strength = (oversold - rsi_avg) / oversold * 100
    elif signal == "sell":
        strength = (rsi_avg - overbought) / (100 - overbought) * 100
    else:
        strength = abs(50 - rsi_avg) / 50 * 100
    strength = max(0.0, min(100.0, abs(strength)))
    # divergence boost (tv_rsi.py:146-157)
    div, div_strength = _rsi_divergence_np(h, l, r14a, 50)
    if div == "bullish_div" and trend == "bullish" and n_os >= 2:
        signal = "buy"
        strength = min(100.0, strength + div_strength * 0.5)
    elif div == "bearish_div" and trend == "bearish" and n_ob >= 2:
        signal = "sell"
        strength = min(100.0, strength + div_strength * 0.5)
    return {"rsi7": r7, "rsi14": r14, "rsi21": r21,
            "rsi_avg": rsi_avg, "rsi_state": state, "rsi_divergence": div,
            "rsi_signal": signal, "rsi_trend": trend,
            "rsi_strength": strength, "ob_threshold": overbought,
            "os_threshold": oversold}


@register(
    "macd",
    [("macd_line", D), ("macd_signal", D), ("macd_hist", D), ("macd_cross", S)],
    citation="incremental/macd.py:6-50",
)
def i_macd(b: pd.DataFrame):
    _, _, _, c, _ = _ohlcv(b)
    line = ta_np.ewm_mean(c, span=12) - ta_np.ewm_mean(c, span=26)
    sig = ta_np.ewm_mean(line, span=9)
    cross = "none"
    if len(line) >= 2:
        p, cu = line[-2] - sig[-2], line[-1] - sig[-1]
        cross = "golden" if p <= 0 < cu else ("death" if p >= 0 > cu else "none")
    return {"macd_line": float(line[-1]), "macd_signal": float(sig[-1]),
            "macd_hist": float(line[-1] - sig[-1]), "macd_cross": cross}


@register(
    "kdj",
    [("kdj_k", D), ("kdj_d", D), ("kdj_j", D), ("kdj_state", S),
     ("kdj_signal", S)],
    citation="incremental/kdj.py:6-50 (信号概述 labels: cross/extreme/"
    "continue — rules/momentum/kdj.py conditions fire on transitions)",
)
def i_kdj(b: pd.DataFrame):
    _, h, l, c, _ = _ohlcv(b)
    lo = ta_np.roll_min(l, 9)
    hi = ta_np.roll_max(h, 9)
    with np.errstate(invalid="ignore"):
        rsv = (c - lo) / _repl0(hi - lo) * 100
    rsv = np.where(np.isnan(rsv), 50.0, rsv)
    k = ta_np.ewm_mean(rsv, alpha=1.0 / 3)
    d = ta_np.ewm_mean(k, alpha=1.0 / 3)
    kv = float(k[-1])
    dv = float(d[-1])
    jv = float(3 * k[-1] - 2 * d[-1])
    state = "overbought" if kv >= 80 else ("oversold" if kv <= 20 else "neutral")
    # 信号概述: J extremes take precedence, then fresh K/D crosses,
    # else "continue" — the label vocabulary the rule pack transitions on
    signal = "continue"
    if jv < 0:
        signal = "j_oversold"
    elif jv > 100:
        signal = "j_overbought"
    elif len(k) >= 2:
        pk, pd_ = float(k[-2]), float(d[-2])
        if pk <= pd_ and kv > dv:
            signal = "golden_cross"
        elif pk >= pd_ and kv < dv:
            signal = "death_cross"
    return {"kdj_k": kv, "kdj_d": dv, "kdj_j": jv,
            "kdj_state": state, "kdj_signal": signal}


@register(
    "harmonic", [("harmonic_score", D)],
    citation="batch/harmonic.py (mean of RSI(2..33))",
)
def i_harmonic(b: pd.DataFrame):
    vals = ta.rsi_last_multi(b.close, list(range(2, 34)))
    vals = vals[~np.isnan(vals)]
    return {"harmonic_score": float(np.mean(vals)) if len(vals) else float("nan")}


@register(
    "scalping", [("scalp_fast", D), ("scalp_slow", D), ("scalp_signal", S)],
    citation="batch/scalping.py", min_data=20,
)
def i_scalping(b: pd.DataFrame):
    _, _, _, c, _ = _ohlcv(b)
    fast = float(ta_np.ewm_mean(c, span=5)[-1])
    slow = float(ta_np.ewm_mean(c, span=13)[-1])
    sig = "long" if fast > slow else "short"
    return {"scalp_fast": fast, "scalp_slow": slow, "scalp_signal": sig}


# ---------------------------------------------------------------------------
# volatility / bands family
# ---------------------------------------------------------------------------
@register(
    "bollinger",
    [("bb_mid", D), ("bb_upper", D), ("bb_lower", D), ("bb_width", D), ("bb_pct", D)],
    citation="batch/bollinger.py:10-47",
)
def i_bollinger(b: pd.DataFrame):
    _, _, _, c, _ = _ohlcv(b)
    mid = float(ta_np.roll_mean(c, 20)[-1])
    sd = float(ta_np.roll_std(c, 20)[-1])
    upper, lower = mid + 2 * sd, mid - 2 * sd
    spread = upper - lower
    width = spread / (mid if mid != 0 else NAN)
    pct = (float(c[-1]) - lower) / (spread if spread != 0 else NAN)
    return {"bb_mid": mid, "bb_upper": upper, "bb_lower": lower,
            "bb_width": width, "bb_pct": pct}


@register(
    "atr_scan",
    [("atr14", D), ("atr_pct", D), ("atr_upper", D), ("atr_lower", D),
     ("atr_state", S), ("vol_class", S)],
    citation="incremental/atr.py:7-49 (波动分类 4-level regime labels "
    "consumed by rules/volatility/__init__.py:83-114)",
)
def i_atr_scan(b: pd.DataFrame):
    _, _, _, cl, _ = _ohlcv(b)
    a = _atr(b, 14)
    av = float(a[-1])
    c = float(cl[-1])
    med = float(ta_np.roll_median(a, 30)[-1])
    state = "heating" if av > med else "cooling"
    pct = av / c * 100 if c else float("nan")
    if math.isnan(pct):
        vol_class = "low"
    elif pct < 1.0:
        vol_class = "low"
    elif pct < 2.5:
        vol_class = "mid"
    elif pct < 5.0:
        vol_class = "high"
    else:
        vol_class = "extreme"
    return {"atr14": av, "atr_pct": pct,
            "atr_upper": c + 2 * av, "atr_lower": c - 2 * av,
            "atr_state": state, "vol_class": vol_class}


# ---------------------------------------------------------------------------
# volume / flow family
# ---------------------------------------------------------------------------
@register("obv", [("obv", D), ("obv_chg30", D)], citation="incremental/obv.py")
def i_obv(b: pd.DataFrame):
    _, _, _, c, v = _ohlcv(b)
    sign = np.sign(np.diff(c, prepend=c[:1]))
    obv = np.cumsum(sign * v)
    n = len(obv)
    chg = float(obv[-1] - obv[-31]) if n > 30 else NAN
    return {"obv": float(obv[-1]), "obv_chg30": chg}


@register("cvd", [("cvd", D), ("cvd_chg", D)], citation="incremental/cvd.py")
def i_cvd(b: pd.DataFrame):
    o, _, _, c, v = _ohlcv(b)
    delta = np.where(c >= o, v, -v)
    cvd = np.cumsum(delta)
    n = len(cvd)
    k = min(360, max(n - 1, 1))
    chg = float(cvd[-1] - cvd[-1 - k]) if n > k else NAN
    return {"cvd": float(cvd[-1]), "cvd_chg": chg}


@register(
    "volume_ratio", [("vol_ratio", D), ("vol_state", S)],
    citation="batch/volume_ratio.py:7-37",
)
def i_volume_ratio(b: pd.DataFrame):
    v = _ohlcv(b)[4]
    m = float(ta_np.roll_mean(v, 20)[-1])
    r = float(v[-1]) / (m if m != 0 else NAN)
    state = "surge" if r >= 2 else ("elevated" if r >= 1.2 else ("shrink" if r <= 0.6 else "normal"))
    return {"vol_ratio": r, "vol_state": state}


@register(
    "vwap_bands",
    [("vwap", D), ("vwap_upper", D), ("vwap_lower", D), ("vwap_dev_pct", D)],
    citation="batch/vwap.py:9-53 (300-bar VWAP ± 1σ)",
)
def i_vwap(b: pd.DataFrame):
    _, _, _, c, v = _ohlcv(b)
    tc, tv = c[-300:], v[-300:]
    den = float(tv.sum())
    vwap = float((tc * tv).sum() / den) if den else float("nan")
    sd = ta_np.nanstd(tc) if len(tc) > 1 else 0.0
    cv = float(c[-1])
    return {"vwap": vwap, "vwap_upper": vwap + sd, "vwap_lower": vwap - sd,
            "vwap_dev_pct": (cv - vwap) / vwap * 100 if vwap else float("nan")}


@register(
    "vpvr", [("poc", D), ("va_low", D), ("va_high", D), ("price_pos", S)],
    citation="batch/vpvr.py:46-119 (48 buckets, 70% value area)",
)
def i_vpvr(b: pd.DataFrame):
    poc, lo, hi = ta.volume_profile(b.close, b.volume, 48)
    c = float(_ohlcv(b)[3][-1])
    pos = "above_va" if c > hi else ("below_va" if c < lo else "in_va")
    return {"poc": poc, "va_low": lo, "va_high": hi, "price_pos": pos}


# ---------------------------------------------------------------------------
# EMA regime / composite family
# ---------------------------------------------------------------------------
@register(
    "ema_gc",
    [("ema7", D), ("ema25", D), ("ema99", D), ("regime", S), ("bw_score", D)],
    citation="incremental/ema_gc.py:9-59",
)
def i_ema_gc(b: pd.DataFrame):
    c = _ohlcv(b)[3]
    a, m, s = (float(ta_np.ewm_mean(c, span=n)[-1]) for n in (7, 25, 99))
    if a > m > s:
        regime = "bull_stack"  # 多头排列
    elif a < m < s:
        regime = "bear_stack"  # 空头排列
    else:
        regime = "tangled"
    bw = abs(a - s) / s if s else 0.0
    return {"ema7": a, "ema25": m, "ema99": s, "regime": regime,
            "bw_score": 100 * (1 - math.exp(-bw / 0.05))}


@register(
    "long_short", [("ha_open", D), ("ha_close", D), ("ls_signal", S)],
    citation="batch/tv_long_short.py (smoothed Heikin-Ashi 10/10)",
)
def i_long_short(b: pd.DataFrame):
    o, h, l, c, _ = _ohlcv(b)
    o2, h2, l2, c2 = (ta_np.ewm_mean(s, span=10) for s in (o, h, l, c))
    ha_c = (o2 + h2 + l2 + c2) / 4
    cc = ha_c.tolist()
    o2l, c2l = o2.tolist(), c2.tolist()
    oc = [0.0] * len(cc)
    if cc:
        oc[0] = (o2l[0] + c2l[0]) / 2
        for i in range(1, len(oc)):
            oc[i] = (oc[i - 1] + cc[i - 1]) / 2
    ho = float(ta_np.ewm_mean(np.asarray(oc), span=10)[-1]) if cc else NAN
    hc = float(ta_np.ewm_mean(ha_c, span=10)[-1]) if cc else NAN
    return {"ha_open": ho, "ha_close": hc,
            "ls_signal": "long" if hc >= ho else "short"}


# ---------------------------------------------------------------------------
# microstructure / stats family
# ---------------------------------------------------------------------------
@register(
    "liquidity",
    [("amihud_z", D), ("kyle_lambda", D), ("volatility", D),
     ("liq_score", D), ("liq_level", S)],
    citation="batch/liquidity.py:12-154 (流动性等级 labels consumed by "
    "rules/misc/__init__.py:7-34)",
)
def i_liquidity(b: pd.DataFrame):
    _, _, _, c, v = _ohlcv(b)
    pch = np.full(len(c), np.nan)
    if len(c) > 1:
        pch[1:] = c[1:] / c[:-1] - 1
    ret = np.abs(pch)
    dollar = _repl0(c * v)
    amihud = (ret / dollar) * 1e6
    mu, sd = ta_np.nanmean(amihud), ta_np.nanstd(amihud)
    z = (amihud[-1] - mu) / sd if sd and not math.isnan(sd) else 0.0
    lam = ta.linreg_slope(c) / (ta_np.nanmean(dollar) or np.nan)
    vol = ta_np.nanstd(pch)
    score = float(1 / (1 + math.exp(-(0.5 * (0 if math.isnan(z) else -z) + (0 if vol is None or math.isnan(vol) else -vol))))) * 100
    if score >= 75:
        level = "excellent"
    elif score >= 50:
        level = "good"
    elif score >= 25:
        level = "fair"
    else:
        level = "poor"
    return {"amihud_z": float(0 if math.isnan(z) else z),
            "kyle_lambda": float(lam) if not math.isnan(lam) else 0.0,
            "volatility": float(vol) if not math.isnan(vol) else 0.0,
            "liq_score": score, "liq_level": level}


@register(
    "support_resistance",
    [("support", D), ("resistance", D), ("sup_dist_pct", D),
     ("res_dist_pct", D)],
    citation="batch/support_resistance.py (距支撑/阻力百分比 consumed by "
    "rules/core/__init__.py:473-524)", min_data=12,
)
def i_support_resistance(b: pd.DataFrame):
    _, h, l, cl, _ = _ohlcv(b)
    ph, pl = _pivots2(b)
    c = float(cl[-1])
    res = ph[ph >= c]
    sup = pl[pl <= c]
    k = min(20, len(h))
    support = float(sup[-1]) if len(sup) else float(l[-k:].min())
    resistance = float(res[-1]) if len(res) else float(h[-k:].max())
    return {
        "support": support,
        "resistance": resistance,
        "sup_dist_pct": (c - support) / c * 100 if c else float("nan"),
        "res_dist_pct": (resistance - c) / c * 100 if c else float("nan"),
    }


@register(
    "smc",
    [("bos", S), ("order_block", D), ("struct_event", S), ("smc_bias", S),
     ("smc_score", D)],
    citation="batch/tv_big_money.py (SMC structure break + order block, "
    "pivot 5; 结构事件/偏向/评分 consumed by rules/core/__init__.py:304-386)",
    min_data=12,
)
def i_smc(b: pd.DataFrame):
    _, _, _, cl, _ = _ohlcv(b)
    ph, pl = _pivots2(b)
    last_ph = float(ph[-1]) if len(ph) else float("inf")
    last_pl = float(pl[-1]) if len(pl) else float("-inf")
    cv = float(cl[-1])
    bos = "bullish" if cv > last_ph else ("bearish" if cv < last_pl else "none")
    ob = last_pl if bos == "bullish" else (last_ph if bos == "bearish" else float("nan"))
    # structure-event string: a break against the prevailing swing trend
    # is a change-of-character (CHoCH), with it a break-of-structure (BOS)
    prior_trend = "up" if len(ph) >= 2 and last_ph >= float(ph[-2]) else "down"
    if bos == "bullish":
        event = "BOS_up" if prior_trend == "up" else "CHoCH_up"
        bias = "bullish"
    elif bos == "bearish":
        event = "BOS_down" if prior_trend == "down" else "CHoCH_down"
        bias = "bearish"
    else:
        event, bias = "none", "neutral"
    # score: break distance as a share of the swing range, 0-100
    rng = last_ph - last_pl
    if bos != "none" and math.isfinite(rng) and rng > 0:
        dist = cv - last_ph if bos == "bullish" else last_pl - cv
        score = float(min(100.0, 50.0 + dist / rng * 100.0))
    else:
        score = 0.0
    return {"bos": bos,
            "order_block": ob if not math.isinf(ob) else float("nan"),
            "struct_event": event, "smc_bias": bias, "smc_score": score}


@register(
    "stats_agg",
    [("slope_pct", D), ("zscore", D), ("pctl_rank", D), ("up_run", D)],
    citation="batch/futures_aggregate.py:18-81,84-259",
)
def i_stats_agg(b: pd.DataFrame):
    c = _ohlcv(b)[3]
    slope = ta.linreg_slope(c[-48:])
    mu, sd = c.mean(), c.std()
    z = (c[-1] - mu) / sd if sd else 0.0
    pctl = float((c <= c[-1]).mean())
    runs = ta.run_length(np.diff(c) > 0)
    base = c[-48] if len(c) >= 48 and c[-48] else (c[0] or 1.0)
    return {"slope_pct": slope / base * 100, "zscore": float(z),
            "pctl_rank": pctl, "up_run": float(runs)}


@register(
    "data_monitor", [("bar_count", D), ("completeness", D)],
    citation="batch/data_monitor.py", min_data=1,
)
def i_data_monitor(b: pd.DataFrame):
    return {"bar_count": float(len(b)), "completeness": float(min(len(b) / 500.0, 1.0))}


@register(
    "base_data",
    [("last_open", D), ("last_high", D), ("last_low", D), ("last_close", D),
     ("last_volume", D), ("amplitude", D), ("amplitude_pct", D),
     ("change_pct", D), ("turnover", D), ("money_flow", D)],
    citation="incremental/base_data.py (成交额/资金流向/振幅 consumed by "
    "rules/core + rules/misc; 主动买卖比 lives on buy_sell_ratio's "
    "taker_ratio column in the wide surface)", min_data=2,
)
def i_base_data(b: pd.DataFrame):
    o, h, l, cl, v = _ohlcv(b)
    c = float(cl[-1])
    pc = float(cl[-2]) if len(cl) >= 2 else float("nan")
    amp = (float(h[-1]) - float(l[-1])) / c if c else float("nan")
    turnover = c * float(v[-1])
    # signed turnover as the money-flow proxy (up bar = inflow)
    money_flow = turnover if c >= float(o[-1]) else -turnover
    return {
        "last_open": float(o[-1]), "last_high": float(h[-1]),
        "last_low": float(l[-1]), "last_close": c,
        "last_volume": float(v[-1]),
        "amplitude": amp,
        "amplitude_pct": amp * 100 if not math.isnan(amp) else float("nan"),
        "change_pct": (c - pc) / pc * 100 if pc else float("nan"),
        "turnover": turnover,
        "money_flow": money_flow,
    }


@register(
    "buy_sell_ratio", [("taker_ratio", D), ("taker_share", D)],
    citation="incremental/buy_sell_ratio.py (proxy: up-bar volume over "
    "the last 20 bars; 主动买卖比 is the buy/sell RATIO — 1.5 means "
    "buyers 1.5× sellers — matching rules/volume/__init__.py:162-191)",
    min_data=2,
)
def i_buy_sell_ratio(b: pd.DataFrame):
    o, _, _, c, v = _ohlcv(b)
    to, tc, tv = o[-20:], c[-20:], v[-20:]
    buy = float(np.where(tc >= to, tv, 0.0).sum())
    tot = float(tv.sum())
    sell = tot - buy
    return {"taker_ratio": float(buy / sell) if sell else float("nan"),
            "taker_share": float(buy / tot) if tot else float("nan")}


@register(
    "mfi", [("mfi14", D), ("mfi_state", S)],
    citation="batch/mfi.py:8-26", min_data=15,
)
def i_mfi(b: pd.DataFrame):
    _, h, l, c, v = _ohlcv(b)
    tp = (h + l + c) / 3
    mf = tp * v
    up_mask = np.concatenate(([False], tp[1:] > tp[:-1]))
    dn_mask = np.concatenate(([False], tp[1:] < tp[:-1]))
    up = np.where(up_mask, mf, 0.0)
    dn = np.where(dn_mask, mf, 0.0)
    dn_sum = float(ta_np.roll_sum(dn, 14)[-1])
    ratio = float(ta_np.roll_sum(up, 14)[-1]) / (dn_sum if dn_sum != 0 else NAN)
    m = float(100 - 100 / (1 + ratio))
    state = "overbought" if m >= 80 else ("oversold" if m <= 20 else "neutral")
    return {"mfi14": m, "mfi_state": state}


def _chart_pattern(b: pd.DataFrame):
    """Price-structure patterns over the tail — the full label family
    the reference's detector stack emits (batch/k_pattern.py:89-190:
    tradingpatterns detect_head_shoulder/double_top_bottom/triangle/
    wedge/channel + patternpy + the trendln channel classifier):
    head-and-shoulders top/bottom, double top/bottom, ascending/
    descending/symmetrical triangle, rising/falling wedge, rising/
    falling/horizontal channel. Pivot radius 3 bars; directions follow
    the reference's score signs (symmetrical triangle and horizontal
    channel carry small positive scores there → bull).

    Wedge vs channel disambiguation for co-directional trendlines: a
    narrowing pivot envelope (< 90% of the prior width) is a wedge,
    otherwise a channel — the converging-trendline rule both libraries
    apply."""
    _, h, l, c_arr, _ = _ohlcv(b)  # noqa: E741

    def _pivots(a: np.ndarray, is_high: bool) -> np.ndarray:
        # strict 3-radius local extremum; edges (first/last 3 bars)
        # excluded, matching the shift()-NaN-excludes behavior
        n = len(a)
        if n < 7:
            return a[:0]
        ctr = a[3 : n - 3]
        m = np.ones(n - 6, dtype=bool)
        for k in (1, 2, 3):
            if is_high:
                m &= (a[3 - k : n - 3 - k] < ctr) & (a[3 + k : n - 3 + k] < ctr)
            else:
                m &= (a[3 - k : n - 3 - k] > ctr) & (a[3 + k : n - 3 + k] > ctr)
        return ctr[m]

    ph, pl = _pivots(h, True), _pivots(l, False)
    c = float(c_arr[-1])
    out = []
    if len(ph) >= 3:
        a, m, z = float(ph[-3]), float(ph[-2]), float(ph[-1])
        if m > a and m > z and abs(a - z) / m < 0.02:
            out.append(("head_shoulders_top", "bear"))
    if len(pl) >= 3:
        a, m, z = float(pl[-3]), float(pl[-2]), float(pl[-1])
        if m < a and m < z and abs(a - z) / (m or 1) < 0.02:
            out.append(("head_shoulders_bottom", "bull"))
    if not out and len(ph) >= 2:
        a, z = float(ph[-2]), float(ph[-1])
        # neckline = the reaction low between the tops; the pattern only
        # completes on a break below it (keeps flat-top consolidations
        # classifiable as triangles/channels instead)
        neck = float(pl[-1]) if len(pl) else min(a, z)
        if abs(a - z) / max(a, z) < 0.015 and c < min(a, z) and c < neck:
            out.append(("double_top", "bear"))
    if not out and len(pl) >= 2:
        a, z = float(pl[-2]), float(pl[-1])
        neck = float(ph[-1]) if len(ph) else max(a, z)
        if (abs(a - z) / max(a, z, 1e-12) < 0.015 and c > max(a, z)
                and c > neck):
            out.append(("double_bottom", "bull"))
    if not out and len(ph) >= 2 and len(pl) >= 2:
        a_h, z_h = float(ph[-2]), float(ph[-1])
        a_l, z_l = float(pl[-2]), float(pl[-1])
        flat = 0.015
        hi_flat = abs(a_h - z_h) / max(a_h, z_h, 1e-12) < flat
        lo_flat = abs(a_l - z_l) / max(a_l, z_l, 1e-12) < flat
        hi_rising = not hi_flat and z_h > a_h
        hi_falling = not hi_flat and z_h < a_h
        lo_rising = not lo_flat and z_l > a_l
        lo_falling = not lo_flat and z_l < a_l
        narrowing = (z_h - z_l) < 0.9 * (a_h - a_l)
        if hi_flat and lo_rising:
            out.append(("ascending_triangle", "bull"))
        elif hi_falling and lo_flat:
            out.append(("descending_triangle", "bear"))
        elif hi_falling and lo_rising:
            out.append(("symmetrical_triangle", "bull"))
        elif hi_rising and lo_rising:
            out.append(
                ("rising_wedge", "bear") if narrowing
                else ("rising_channel", "bull")
            )
        elif hi_falling and lo_falling:
            out.append(
                ("falling_wedge", "bull") if narrowing
                else ("falling_channel", "bear")
            )
        elif hi_flat and lo_flat:
            out.append(("horizontal_channel", "bull"))
    return out


@register(
    "k_pattern",
    [("pattern", S), ("pattern_dir", S), ("n_patterns_20", "long")],
    citation="batch/k_pattern.py:9-241 (CDL set :9-48 — full 61-pattern "
    "TA-Lib parity, re-derived in indicators/candles.py; chart patterns "
    ":35-52,89-190)",
    min_data=5,
)
def i_k_pattern(b: pd.DataFrame):
    """Candlestick + chart patterns on the tail. ``pattern`` is a
    comma-joined label list (chart pattern first, then every CDL
    pattern firing on the latest bar), matching the reference's 形态类型
    multi-pattern string that the CONTAINS rules substring-match
    against. The full 61-name TA-Lib CDL set is evaluated (multi-bar
    reversals listed before single-bar shapes); ``pattern_dir`` is the
    first non-neutral direction in that precedence order."""
    from tradecat_spark.indicators.candles import Candles

    o, h, l, c, _ = _ohlcv(b)
    i = len(c) - 1
    cd = Candles(o, h, l, c)
    candles = cd.detect(i)
    charts = _chart_pattern(b) if len(b) >= 20 else []
    labels = [n for n, _ in charts] + [n for n, _ in candles]
    direction = next(
        (d for _, d in (*charts, *candles) if d != "neutral"), "neutral"
    )
    # pattern count over the last 20 bars (candle classifications only)
    n = 0
    for j in range(max(1, len(c) - 20), len(c)):
        if cd.detect(j):
            n += 1
    return {"pattern": ",".join(labels) if labels else "none",
            "pattern_dir": direction, "n_patterns_20": n}


@register(
    "gap_monitor", [("n_gaps", "long"), ("max_gap_bars", "long")],
    citation="batch/futures_gap_monitor.py (adjacent-bucket gap scan)",
    min_data=3,
)
def i_gap_monitor(b: pd.DataFrame):
    """Bar-index gaps in the tail window: the per-group form of the
    LEAD-based gap detector (S6), fed by bucket spacing."""
    if "bucket_ts" in b.columns:
        ts = pd.to_datetime(b["bucket_ts"])
        steps = ts.diff().dropna().dt.total_seconds()
        if len(steps) == 0:
            return {"n_gaps": 0, "max_gap_bars": 0}
        unit = steps.mode().iloc[0] or 1.0
        ratio = (steps / unit).round().astype(int)
        gaps = ratio[ratio > 1] - 1
        return {"n_gaps": int(len(gaps)), "max_gap_bars": int(gaps.max()) if len(gaps) else 0}
    return {"n_gaps": 0, "max_gap_bars": 0}


@register(
    "futures_sentiment",
    [("oi_last", D), ("oi_chg_pct", D), ("ls_ratio", D),
     ("taker_ls_ratio", D), ("risk_score", D), ("oi_streak", D),
     ("oi_zscore", D), ("sent_diff", D), ("flip_signal", S)],
    citation="incremental/futures_sentiment.py:1-104 (大户多空比/主动成交"
    "多空比/风险分/OI连续根数/持仓Z分数/情绪差值/情绪翻转信号 — the full "
    "期货情绪聚合表 field surface the futures rule pack reads; volume "
    "proxies for OI, same data limitation as round 1)",
    min_data=2,
)
def i_futures_sentiment(b: pd.DataFrame):
    """Latest-snapshot metrics proxy over the bar tail: last volume as
    OI stand-in, 30-bar change, up/down-volume ratio as L/S ratio, plus
    the derived sentiment fields the rule pack transitions on."""
    o, _, _, c, v = _ohlcv(b)
    n = len(v)
    oi = float(v[-1])
    base = float(v[-31]) if n >= 31 else float(v[0])
    upv = np.where(c >= o, v, 0.0)
    dnv = np.where(c < o, v, 0.0)
    up = float(upv[-30:].sum())
    dn = float(dnv[-30:].sum())
    ls = float(up / dn) if dn else float("nan")
    # taker L/S over a faster window (主动成交多空比)
    up10 = float(upv[-10:].sum())
    dn10 = float(dnv[-10:].sum())
    taker_ls = float(up10 / dn10) if dn10 else float("nan")
    # signed consecutive OI-delta streak (OI连续根数)
    d = np.diff(v)
    streak = 0
    for x in reversed(d.tolist()):
        s = 1 if x > 0 else (-1 if x < 0 else 0)
        if streak == 0:
            streak = s
        elif s == (1 if streak > 0 else -1):
            streak += s
        else:
            break
    # OI z-score over the 30-bar tail (持仓Z分数)
    t30 = v[-30:]
    sd = ta_np.nanstd(t30)
    z = float((oi - ta_np.nanmean(t30)) / sd) if sd and not math.isnan(sd) else 0.0
    # sentiment diff (情绪差值): log of L/S imbalance
    sent = float(math.log(ls)) if ls and ls > 0 and not math.isnan(ls) else 0.0
    # risk score (风险分): extremity of L/S + OI z + streak length
    imb = abs(sent)
    risk = float(min(100.0, imb * 40 + abs(z) * 20 + abs(streak) * 4))
    # flip signal (情绪翻转信号): sentiment sign change vs 10 bars ago
    start = max(0, n - 40)
    up_prev = float(upv[start : start + 30].sum())
    dn_prev = float(dnv[start : start + 30].sum())
    ls_prev = float(up_prev / dn_prev) if dn_prev else float("nan")
    if not math.isnan(ls_prev) and not math.isnan(ls):
        if ls_prev <= 1.0 < ls:
            flip = "bull_flip"
        elif ls_prev >= 1.0 > ls:
            flip = "bear_flip"
        else:
            flip = "none"
    else:
        flip = "none"
    return {
        "oi_last": oi,
        "oi_chg_pct": (oi - base) / base * 100 if base else float("nan"),
        "ls_ratio": ls,
        "taker_ls_ratio": taker_ls,
        "risk_score": risk,
        "oi_streak": float(streak),
        "oi_zscore": z,
        "sent_diff": sent,
        "flip_signal": flip,
    }


@register(
    "precision_trend",
    [("pt_line", D), ("pt_state", S), ("pt_flips_50", "long"),
     ("pt_strength", D)],
    citation="batch/super_trend.py:17-107 (ZLEMA70 band state machine, "
    "path-dependent flip tracking; 趋势强度 consumed by "
    "rules/trend/__init__.py:63-75)", min_data=80,
)
def i_precision_trend(b: pd.DataFrame):
    """The stateful variant of zero_lag_trend: tracks band-flip history
    (state machine over the whole tail), not just the latest side."""
    _, _, _, c, _ = _ohlcv(b)
    z, band = _zl_band(b)
    upper = (z + band).tolist()
    lower = (z - band).tolist()
    cv = c.tolist()
    state = 0  # -1 bear, 0 range, +1 bull
    flips = 0
    start = max(0, len(cv) - 50)
    for j in range(len(cv)):
        new = 1 if cv[j] > upper[j] else (-1 if cv[j] < lower[j] else state)
        if j >= start and new != state:
            flips += 1
        state = new
    label = {1: "bull", 0: "range", -1: "bear"}[state]
    # trend strength 0-100: distance of close from the ZLEMA line as a
    # share of the band width (100 = a full band beyond the line)
    bw = float(band[-1]) if len(band) else float("nan")
    strength = (
        min(100.0, abs(cv[-1] - float(z[-1])) / bw * 100.0)
        if bw and not math.isnan(bw)
        else 0.0
    )
    return {"pt_line": float(z[-1]) if len(z) else NAN, "pt_state": label,
            "pt_flips_50": flips, "pt_strength": float(strength)}
