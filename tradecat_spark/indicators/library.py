"""The registered indicator surface — pandas re-derivations of the
reference's 38 indicator classes (SURVEY.md §2.9).

Each ``@register`` mirrors one reference class (citation in the meta);
the math lives in :mod:`tradecat_spark.functions.ta`. All compute
functions return the latest-bar snapshot, matching the reference's
1-row-per-(symbol, interval) output contract (indicators/base.py:64-75).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tradecat_spark.functions import ta
from tradecat_spark.indicators.base import register

D = "double"
S = "string"


def _last(s: pd.Series) -> float:
    v = s.iloc[-1]
    return float(v) if pd.notna(v) else float("nan")


# ---------------------------------------------------------------------------
# trend / channel family
# ---------------------------------------------------------------------------
@register(
    "supertrend", [("st_line", D), ("st_dir", D), ("st_state", S)],
    citation="batch/lean_indicators.py:29-84 (方向 label consumed by "
    "rules/trend/__init__.py:7-34)",
)
def i_supertrend(b: pd.DataFrame):
    line, direction = ta.supertrend(b.high, b.low, b.close, 10, 3.0)
    d = _last(direction)
    return {"st_line": _last(line), "st_dir": d,
            "st_state": "up" if d > 0 else "down"}


@register(
    "adx", [("adx", D), ("plus_di", D), ("minus_di", D)],
    citation="batch/lean_indicators.py:88-130",
)
def i_adx(b: pd.DataFrame):
    a, p, m = ta.adx(b.high, b.low, b.close, 14)
    return {"adx": _last(a), "plus_di": _last(p), "minus_di": _last(m)}


@register("cci", [("cci", D)], citation="batch/lean_indicators.py:134-159")
def i_cci(b: pd.DataFrame):
    return {"cci": _last(ta.cci(b.high, b.low, b.close, 20))}


@register("williams_r", [("wr", D)], citation="batch/lean_indicators.py:163-184")
def i_wr(b: pd.DataFrame):
    return {"wr": _last(ta.williams_r(b.high, b.low, b.close, 14))}


@register(
    "donchian", [("don_high", D), ("don_mid", D), ("don_low", D)],
    citation="batch/lean_indicators.py:188-204",
)
def i_donchian(b: pd.DataFrame):
    hi = b.high.rolling(20, min_periods=1).max()
    lo = b.low.rolling(20, min_periods=1).min()
    return {
        "don_high": _last(hi),
        "don_low": _last(lo),
        "don_mid": _last((hi + lo) / 2),
    }


@register(
    "keltner", [("kc_mid", D), ("kc_upper", D), ("kc_lower", D)],
    citation="batch/lean_indicators.py:208-233",
)
def i_keltner(b: pd.DataFrame):
    mid = ta.ema(b.close, 20)
    band = 2 * ta.atr(b.high, b.low, b.close, 10)
    return {
        "kc_mid": _last(mid),
        "kc_upper": _last(mid + band),
        "kc_lower": _last(mid - band),
    }


@register(
    "ichimoku",
    [("tenkan", D), ("kijun", D), ("span_a", D), ("span_b", D),
     ("cloud_signal", S), ("ichi_signal", S)],
    citation="batch/lean_indicators.py:237-281",
)
def i_ichimoku(b: pd.DataFrame):
    def mid(n):
        return (b.high.rolling(n, min_periods=1).max()
                + b.low.rolling(n, min_periods=1).min()) / 2
    tenkan, kijun = mid(9), mid(26)
    span_a = (tenkan + kijun) / 2
    span_b = mid(52)
    c = _last(b.close)
    hi, lo = max(_last(span_a), _last(span_b)), min(_last(span_a), _last(span_b))
    signal = "above_cloud" if c > hi else ("below_cloud" if c < lo else "in_cloud")
    # 信号 buy/sell/neutral: cloud side + tenkan/kijun agreement (the
    # composite label rules/trend/__init__.py:78-105 transitions on)
    if c > hi and _last(tenkan) > _last(kijun):
        ichi = "buy"
    elif c < lo and _last(tenkan) < _last(kijun):
        ichi = "sell"
    else:
        ichi = "neutral"
    return {
        "tenkan": _last(tenkan), "kijun": _last(kijun),
        "span_a": _last(span_a), "span_b": _last(span_b),
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
    highs = b.high.to_numpy(dtype=float)
    lows = b.low.to_numpy(dtype=float)
    closes = b.close.to_numpy(dtype=float)
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
    z = ta.zlema(b.close, 70)
    band = ta.atr(b.high, b.low, b.close, 70).rolling(210, min_periods=1).max() * 1.2
    upper, lower = z + band, z - band
    c = _last(b.close)
    state = "bull" if c > _last(upper) else ("bear" if c < _last(lower) else "range")
    return {
        "zlema": _last(z), "zl_upper": _last(upper),
        "zl_lower": _last(lower), "zl_state": state,
    }


@register(
    "trend_cloud", [("smma200", D), ("cloud_side", S)],
    citation="batch/tv_trend_cloud.py", min_data=50,
)
def i_trend_cloud(b: pd.DataFrame):
    s = ta.rma(b.close, 200)
    return {
        "smma200": _last(s),
        "cloud_side": "above" if _last(b.close) >= _last(s) else "below",
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
    x = b.close.to_numpy(dtype=np.float64)
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
    base = ta.vwma(b.close, b.volume, 200)
    dev = (b.close - base).rolling(200, min_periods=1).std() * 3.0
    pos = (b.close - base) / dev.replace(0, np.nan)
    p = _last(pos)
    return {"vwma200": _last(base), "fib_pos": p,
            "fib_state": "up" if p >= 0 else "down"}


# ---------------------------------------------------------------------------
# oscillator / momentum family
# ---------------------------------------------------------------------------
def _rsi_divergence(b: pd.DataFrame, rsi: pd.Series, lookback: int = 50):
    """Pivot-based divergence scan (batch/tv_rsi.py:28-53): ±5-bar price
    pivots over the last `lookback` bars; bearish = higher price high on
    a lower RSI high, bullish = lower price low on a higher RSI low.
    Returns (label, strength%)."""
    if len(b) < lookback or rsi.isna().sum() > len(rsi) * 0.1:
        return "none", 0.0
    # vectorized centered ±5-bar pivot scan: a bar is a pivot when it
    # equals its 11-bar window extreme (same tie behavior as the
    # per-index scan it replaces; ~10× faster, the batch's hot spot)
    hi = b["high"].tail(lookback).to_numpy(dtype=float)
    lo = b["low"].tail(lookback).to_numpy(dtype=float)
    rr = rsi.tail(lookback).to_numpy(dtype=float)
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
    r7, r14, r21 = (ta.rsi(b.close, n) for n in (7, 14, 21))
    # ATR-normalized adaptive thresholds (tv_rsi.py:20-25,126-136)
    atr = ta.atr(b.high, b.low, b.close, 14)
    rng = atr.max() - atr.min()
    atr_norm = float((atr.iloc[-1] - atr.min()) / (rng + 1e-10)) if len(atr) else 0.5
    if math.isnan(atr_norm):
        atr_norm = 0.5
    vol_factor = 1.0 + (atr_norm - 0.5) * 0.2
    overbought = min(80.0, 70.0 * vol_factor)
    oversold = max(20.0, 30.0 / vol_factor)

    vals = [v for v in (_last(r7), _last(r14), _last(r21)) if not math.isnan(v)]
    if not vals:
        return {"rsi7": float("nan"), "rsi14": float("nan"),
                "rsi21": float("nan"), "rsi_avg": float("nan"),
                "rsi_state": "neutral", "rsi_divergence": "none",
                "rsi_signal": "watch", "rsi_trend": "bearish",
                "rsi_strength": 0.0, "ob_threshold": overbought,
                "os_threshold": oversold}
    rsi_avg = float(np.mean(vals))
    # EMA(34) trend gate (tv_rsi.py:68-70)
    ema34 = b.close.ewm(span=34, adjust=False).mean()
    trend = "bullish" if _last(b.close) > _last(ema34) else "bearish"
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
    div, div_strength = _rsi_divergence(b, r14, 50)
    if div == "bullish_div" and trend == "bullish" and n_os >= 2:
        signal = "buy"
        strength = min(100.0, strength + div_strength * 0.5)
    elif div == "bearish_div" and trend == "bearish" and n_ob >= 2:
        signal = "sell"
        strength = min(100.0, strength + div_strength * 0.5)
    return {"rsi7": _last(r7), "rsi14": _last(r14), "rsi21": _last(r21),
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
    line, sig, hist = ta.macd(b.close)
    cross = "none"
    if len(line) >= 2:
        p, c = line.iloc[-2] - sig.iloc[-2], line.iloc[-1] - sig.iloc[-1]
        cross = "golden" if p <= 0 < c else ("death" if p >= 0 > c else "none")
    return {"macd_line": _last(line), "macd_signal": _last(sig),
            "macd_hist": _last(hist), "macd_cross": cross}


@register(
    "kdj",
    [("kdj_k", D), ("kdj_d", D), ("kdj_j", D), ("kdj_state", S),
     ("kdj_signal", S)],
    citation="incremental/kdj.py:6-50 (信号概述 labels: cross/extreme/"
    "continue — rules/momentum/kdj.py conditions fire on transitions)",
)
def i_kdj(b: pd.DataFrame):
    k, d, j = ta.kdj(b.high, b.low, b.close)
    kv, jv = _last(k), _last(j)
    state = "overbought" if kv >= 80 else ("oversold" if kv <= 20 else "neutral")
    # 信号概述: J extremes take precedence, then fresh K/D crosses,
    # else "continue" — the label vocabulary the rule pack transitions on
    signal = "continue"
    if jv < 0:
        signal = "j_oversold"
    elif jv > 100:
        signal = "j_overbought"
    elif len(k) >= 2:
        pk, pd_ = float(k.iloc[-2]), float(d.iloc[-2])
        if pk <= pd_ and kv > _last(d):
            signal = "golden_cross"
        elif pk >= pd_ and kv < _last(d):
            signal = "death_cross"
    return {"kdj_k": kv, "kdj_d": _last(d), "kdj_j": jv,
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
    fast, slow = ta.ema(b.close, 5), ta.ema(b.close, 13)
    sig = "long" if _last(fast) > _last(slow) else "short"
    return {"scalp_fast": _last(fast), "scalp_slow": _last(slow), "scalp_signal": sig}


# ---------------------------------------------------------------------------
# volatility / bands family
# ---------------------------------------------------------------------------
@register(
    "bollinger",
    [("bb_mid", D), ("bb_upper", D), ("bb_lower", D), ("bb_width", D), ("bb_pct", D)],
    citation="batch/bollinger.py:10-47",
)
def i_bollinger(b: pd.DataFrame):
    mid = b.close.rolling(20, min_periods=1).mean()
    sd = b.close.rolling(20, min_periods=1).std()
    upper, lower = mid + 2 * sd, mid - 2 * sd
    width = (upper - lower) / mid.replace(0, np.nan)
    pct = (b.close - lower) / (upper - lower).replace(0, np.nan)
    return {"bb_mid": _last(mid), "bb_upper": _last(upper), "bb_lower": _last(lower),
            "bb_width": _last(width), "bb_pct": _last(pct)}


@register(
    "atr_scan",
    [("atr14", D), ("atr_pct", D), ("atr_upper", D), ("atr_lower", D),
     ("atr_state", S), ("vol_class", S)],
    citation="incremental/atr.py:7-49 (波动分类 4-level regime labels "
    "consumed by rules/volatility/__init__.py:83-114)",
)
def i_atr_scan(b: pd.DataFrame):
    a = ta.atr(b.high, b.low, b.close, 14)
    c = _last(b.close)
    med = a.rolling(30, min_periods=1).median()
    state = "heating" if _last(a) > _last(med) else "cooling"
    pct = _last(a) / c * 100 if c else float("nan")
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
    return {"atr14": _last(a), "atr_pct": pct,
            "atr_upper": c + 2 * _last(a), "atr_lower": c - 2 * _last(a),
            "atr_state": state, "vol_class": vol_class}


# ---------------------------------------------------------------------------
# volume / flow family
# ---------------------------------------------------------------------------
@register("obv", [("obv", D), ("obv_chg30", D)], citation="incremental/obv.py")
def i_obv(b: pd.DataFrame):
    sign = np.sign(b.close.diff().fillna(0))
    obv = (sign * b.volume).cumsum()
    chg = obv.diff(30)
    return {"obv": _last(obv), "obv_chg30": _last(chg)}


@register("cvd", [("cvd", D), ("cvd_chg", D)], citation="incremental/cvd.py")
def i_cvd(b: pd.DataFrame):
    delta = b.volume.where(b.close >= b.open, -b.volume)
    cvd = delta.cumsum()
    return {"cvd": _last(cvd), "cvd_chg": _last(cvd.diff(min(360, max(len(b) - 1, 1))))}


@register(
    "volume_ratio", [("vol_ratio", D), ("vol_state", S)],
    citation="batch/volume_ratio.py:7-37",
)
def i_volume_ratio(b: pd.DataFrame):
    ratio = b.volume / b.volume.rolling(20, min_periods=1).mean().replace(0, np.nan)
    r = _last(ratio)
    state = "surge" if r >= 2 else ("elevated" if r >= 1.2 else ("shrink" if r <= 0.6 else "normal"))
    return {"vol_ratio": r, "vol_state": state}


@register(
    "vwap_bands",
    [("vwap", D), ("vwap_upper", D), ("vwap_lower", D), ("vwap_dev_pct", D)],
    citation="batch/vwap.py:9-53 (300-bar VWAP ± 1σ)",
)
def i_vwap(b: pd.DataFrame):
    t = b.tail(300)
    den = t.volume.sum()
    vwap = float((t.close * t.volume).sum() / den) if den else float("nan")
    sd = float(t.close.std()) if len(t) > 1 else 0.0
    c = _last(b.close)
    return {"vwap": vwap, "vwap_upper": vwap + sd, "vwap_lower": vwap - sd,
            "vwap_dev_pct": (c - vwap) / vwap * 100 if vwap else float("nan")}


@register(
    "vpvr", [("poc", D), ("va_low", D), ("va_high", D), ("price_pos", S)],
    citation="batch/vpvr.py:46-119 (48 buckets, 70% value area)",
)
def i_vpvr(b: pd.DataFrame):
    poc, lo, hi = ta.volume_profile(b.close, b.volume, 48)
    c = _last(b.close)
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
    e7, e25, e99 = (ta.ema(b.close, n) for n in (7, 25, 99))
    a, m, s = _last(e7), _last(e25), _last(e99)
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
    ho, hc = ta.heikin_ashi(b.open, b.high, b.low, b.close, 10, 10)
    return {"ha_open": _last(ho), "ha_close": _last(hc),
            "ls_signal": "long" if _last(hc) >= _last(ho) else "short"}


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
    ret = b.close.pct_change().abs()
    dollar = (b.close * b.volume).replace(0, np.nan)
    amihud = (ret / dollar) * 1e6
    mu, sd = amihud.mean(), amihud.std()
    z = (amihud.iloc[-1] - mu) / sd if sd and not math.isnan(sd) else 0.0
    signed_flow = np.sign(b.close.diff().fillna(0)) * dollar
    lam = ta.linreg_slope(b.close.to_numpy()) / (dollar.mean() or np.nan)
    vol = b.close.pct_change().std()
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
    h, l = b.high, b.low
    ph = h[(h.shift(2) < h) & (h.shift(1) < h) & (h.shift(-1) < h) & (h.shift(-2) < h)]
    pl = l[(l.shift(2) > l) & (l.shift(1) > l) & (l.shift(-1) > l) & (l.shift(-2) > l)]
    c = _last(b.close)
    res = ph[ph >= c]
    sup = pl[pl <= c]
    support = float(sup.iloc[-1]) if len(sup) else _last(l.rolling(20, min_periods=1).min())
    resistance = float(res.iloc[-1]) if len(res) else _last(h.rolling(20, min_periods=1).max())
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
    h, l, c = b.high, b.low, b.close
    ph = h[(h.shift(2) < h) & (h.shift(1) < h) & (h.shift(-1) < h) & (h.shift(-2) < h)]
    pl = l[(l.shift(2) > l) & (l.shift(1) > l) & (l.shift(-1) > l) & (l.shift(-2) > l)]
    last_ph = float(ph.iloc[-1]) if len(ph) else float("inf")
    last_pl = float(pl.iloc[-1]) if len(pl) else float("-inf")
    cv = _last(c)
    bos = "bullish" if cv > last_ph else ("bearish" if cv < last_pl else "none")
    ob = last_pl if bos == "bullish" else (last_ph if bos == "bearish" else float("nan"))
    # structure-event string: a break against the prevailing swing trend
    # is a change-of-character (CHoCH), with it a break-of-structure (BOS)
    prior_trend = "up" if len(ph) >= 2 and last_ph >= float(ph.iloc[-2]) else "down"
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
    c = b.close.to_numpy()
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
    c, pc = _last(b.close), float(b.close.iloc[-2]) if len(b) >= 2 else float("nan")
    amp = (_last(b.high) - _last(b.low)) / c if c else float("nan")
    turnover = c * _last(b.volume)
    # signed turnover as the money-flow proxy (up bar = inflow)
    money_flow = turnover if c >= _last(b.open) else -turnover
    return {
        "last_open": _last(b.open), "last_high": _last(b.high),
        "last_low": _last(b.low), "last_close": c,
        "last_volume": _last(b.volume),
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
    t = b.tail(20)
    buy = t.volume.where(t.close >= t.open, 0.0).sum()
    tot = t.volume.sum()
    sell = tot - buy
    return {"taker_ratio": float(buy / sell) if sell else float("nan"),
            "taker_share": float(buy / tot) if tot else float("nan")}


@register(
    "mfi", [("mfi14", D), ("mfi_state", S)],
    citation="batch/mfi.py:8-26", min_data=15,
)
def i_mfi(b: pd.DataFrame):
    m = _last(ta.mfi(b.high, b.low, b.close, b.volume, 14))
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
    h, l = b.high.to_numpy(), b.low.to_numpy()  # noqa: E741

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

    ph, pl = pd.Series(_pivots(h, True)), pd.Series(_pivots(l, False))
    c = float(b.close.iloc[-1])
    out = []
    if len(ph) >= 3:
        a, m, z = float(ph.iloc[-3]), float(ph.iloc[-2]), float(ph.iloc[-1])
        if m > a and m > z and abs(a - z) / m < 0.02:
            out.append(("head_shoulders_top", "bear"))
    if len(pl) >= 3:
        a, m, z = float(pl.iloc[-3]), float(pl.iloc[-2]), float(pl.iloc[-1])
        if m < a and m < z and abs(a - z) / (m or 1) < 0.02:
            out.append(("head_shoulders_bottom", "bull"))
    if not out and len(ph) >= 2:
        a, z = float(ph.iloc[-2]), float(ph.iloc[-1])
        # neckline = the reaction low between the tops; the pattern only
        # completes on a break below it (keeps flat-top consolidations
        # classifiable as triangles/channels instead)
        neck = float(pl.iloc[-1]) if len(pl) else min(a, z)
        if abs(a - z) / max(a, z) < 0.015 and c < min(a, z) and c < neck:
            out.append(("double_top", "bear"))
    if not out and len(pl) >= 2:
        a, z = float(pl.iloc[-2]), float(pl.iloc[-1])
        neck = float(ph.iloc[-1]) if len(ph) else max(a, z)
        if (abs(a - z) / max(a, z, 1e-12) < 0.015 and c > max(a, z)
                and c > neck):
            out.append(("double_bottom", "bull"))
    if not out and len(ph) >= 2 and len(pl) >= 2:
        a_h, z_h = float(ph.iloc[-2]), float(ph.iloc[-1])
        a_l, z_l = float(pl.iloc[-2]), float(pl.iloc[-1])
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

    o, h, l, c = (x.to_numpy() for x in (b.open, b.high, b.low, b.close))
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
    v = b.volume
    oi = _last(v)
    base = float(v.iloc[-31]) if len(v) >= 31 else float(v.iloc[0])
    up = v.where(b.close >= b.open, 0.0).tail(30).sum()
    dn = v.where(b.close < b.open, 0.0).tail(30).sum()
    ls = float(up / dn) if dn else float("nan")
    # taker L/S over a faster window (主动成交多空比)
    up10 = v.where(b.close >= b.open, 0.0).tail(10).sum()
    dn10 = v.where(b.close < b.open, 0.0).tail(10).sum()
    taker_ls = float(up10 / dn10) if dn10 else float("nan")
    # signed consecutive OI-delta streak (OI连续根数)
    d = v.diff().dropna()
    streak = 0
    for x in reversed(d.to_numpy()):
        s = 1 if x > 0 else (-1 if x < 0 else 0)
        if streak == 0:
            streak = s
        elif s == (1 if streak > 0 else -1):
            streak += s
        else:
            break
    # OI z-score over the 30-bar tail (持仓Z分数)
    t30 = v.tail(30)
    sd = t30.std()
    z = float((oi - t30.mean()) / sd) if sd and not math.isnan(sd) else 0.0
    # sentiment diff (情绪差值): log of L/S imbalance
    sent = float(math.log(ls)) if ls and ls > 0 and not math.isnan(ls) else 0.0
    # risk score (风险分): extremity of L/S + OI z + streak length
    imb = abs(sent)
    risk = float(min(100.0, imb * 40 + abs(z) * 20 + abs(streak) * 4))
    # flip signal (情绪翻转信号): sentiment sign change vs 10 bars ago
    up_prev = v.where(b.close >= b.open, 0.0).tail(40).head(30).sum()
    dn_prev = v.where(b.close < b.open, 0.0).tail(40).head(30).sum()
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
    z = ta.zlema(b.close, 70)
    band = ta.atr(b.high, b.low, b.close, 70).rolling(210, min_periods=1).max() * 1.2
    upper, lower = (z + band).to_numpy(), (z - band).to_numpy()
    cv = b.close.to_numpy()
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
    bw = float(band.iloc[-1]) if len(band) else float("nan")
    strength = (
        min(100.0, abs(cv[-1] - float(z.iloc[-1])) / bw * 100.0)
        if bw and not math.isnan(bw)
        else 0.0
    )
    return {"pt_line": _last(pd.Series(z)), "pt_state": label,
            "pt_flips_50": flips, "pt_strength": float(strength)}
