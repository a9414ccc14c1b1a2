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
    "supertrend", [("st_line", D), ("st_dir", D)],
    citation="batch/lean_indicators.py:29-84",
)
def i_supertrend(b: pd.DataFrame):
    line, direction = ta.supertrend(b.high, b.low, b.close, 10, 3.0)
    return {"st_line": _last(line), "st_dir": _last(direction)}


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
    [("tenkan", D), ("kijun", D), ("span_a", D), ("span_b", D), ("cloud_signal", S)],
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
    return {
        "tenkan": _last(tenkan), "kijun": _last(kijun),
        "span_a": _last(span_a), "span_b": _last(span_b),
        "cloud_signal": signal,
    }


@register(
    "trend_line", [("piv_high", D), ("piv_low", D), ("trend_slope", D)],
    citation="batch/trend_line.py:5-175",
    min_data=12,
)
def i_trend_line(b: pd.DataFrame):
    """Pivot highs/lows + OLS slope over the tail — the line-fit core of
    the reference's Pine 'Trend Lines v2' port."""
    h, l = b.high, b.low
    ph = h[(h.shift(2) < h) & (h.shift(1) < h) & (h.shift(-1) < h) & (h.shift(-2) < h)]
    pl = l[(l.shift(2) > l) & (l.shift(1) > l) & (l.shift(-1) > l) & (l.shift(-2) > l)]
    return {
        "piv_high": float(ph.iloc[-1]) if len(ph) else float("nan"),
        "piv_low": float(pl.iloc[-1]) if len(pl) else float("nan"),
        "trend_slope": ta.linreg_slope(b.close.tail(50).to_numpy()),
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


@register(
    "ma_ribbon", [("ribbon_rising", D), ("ribbon_state", S)],
    citation="batch/tv_volume_signal.py (Madrid ribbon, 18 EMAs 5..100)",
)
def i_ribbon(b: pd.DataFrame):
    spans = range(5, 105, 5)  # 20 EMAs — the reference uses 18 of this ladder
    rising = sum(
        1 for n in spans
        if len(b) >= 2 and ta.ema(b.close, n).diff().iloc[-1] > 0
    )
    total = len(list(spans))
    state = "bull" if rising > total * 0.7 else ("bear" if rising < total * 0.3 else "mixed")
    return {"ribbon_rising": float(rising), "ribbon_state": state}


@register(
    "fib_sniper", [("vwma200", D), ("fib_pos", D)],
    citation="batch/tv_fib_sniper.py (VWMA(200) Fibonacci bands ×3.0)",
    min_data=50,
)
def i_fib_sniper(b: pd.DataFrame):
    base = ta.vwma(b.close, b.volume, 200)
    dev = (b.close - base).rolling(200, min_periods=1).std() * 3.0
    pos = (b.close - base) / dev.replace(0, np.nan)
    return {"vwma200": _last(base), "fib_pos": _last(pos)}


# ---------------------------------------------------------------------------
# oscillator / momentum family
# ---------------------------------------------------------------------------
@register(
    "smart_rsi",
    [("rsi7", D), ("rsi14", D), ("rsi21", D), ("rsi_state", S)],
    citation="batch/tv_rsi.py:14-174",
)
def i_smart_rsi(b: pd.DataFrame):
    r7, r14, r21 = (ta.rsi(b.close, n) for n in (7, 14, 21))
    v = _last(r14)
    state = "overbought" if v >= 70 else ("oversold" if v <= 30 else "neutral")
    return {"rsi7": _last(r7), "rsi14": _last(r14), "rsi21": _last(r21),
            "rsi_state": state}


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
    "kdj", [("kdj_k", D), ("kdj_d", D), ("kdj_j", D), ("kdj_state", S)],
    citation="incremental/kdj.py:6-50",
)
def i_kdj(b: pd.DataFrame):
    k, d, j = ta.kdj(b.high, b.low, b.close)
    kv = _last(k)
    state = "overbought" if kv >= 80 else ("oversold" if kv <= 20 else "neutral")
    return {"kdj_k": kv, "kdj_d": _last(d), "kdj_j": _last(j), "kdj_state": state}


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
    [("atr14", D), ("atr_pct", D), ("atr_upper", D), ("atr_lower", D), ("atr_state", S)],
    citation="incremental/atr.py:7-49",
)
def i_atr_scan(b: pd.DataFrame):
    a = ta.atr(b.high, b.low, b.close, 14)
    c = _last(b.close)
    med = a.rolling(30, min_periods=1).median()
    state = "heating" if _last(a) > _last(med) else "cooling"
    return {"atr14": _last(a), "atr_pct": _last(a) / c * 100 if c else float("nan"),
            "atr_upper": c + 2 * _last(a), "atr_lower": c - 2 * _last(a),
            "atr_state": state}


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
    [("amihud_z", D), ("kyle_lambda", D), ("volatility", D), ("liq_score", D)],
    citation="batch/liquidity.py:12-154",
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
    return {"amihud_z": float(0 if math.isnan(z) else z),
            "kyle_lambda": float(lam) if not math.isnan(lam) else 0.0,
            "volatility": float(vol) if not math.isnan(vol) else 0.0,
            "liq_score": score}


@register(
    "support_resistance", [("support", D), ("resistance", D)],
    citation="batch/support_resistance.py", min_data=12,
)
def i_support_resistance(b: pd.DataFrame):
    h, l = b.high, b.low
    ph = h[(h.shift(2) < h) & (h.shift(1) < h) & (h.shift(-1) < h) & (h.shift(-2) < h)]
    pl = l[(l.shift(2) > l) & (l.shift(1) > l) & (l.shift(-1) > l) & (l.shift(-2) > l)]
    c = _last(b.close)
    res = ph[ph >= c]
    sup = pl[pl <= c]
    return {
        "support": float(sup.iloc[-1]) if len(sup) else _last(l.rolling(20, min_periods=1).min()),
        "resistance": float(res.iloc[-1]) if len(res) else _last(h.rolling(20, min_periods=1).max()),
    }


@register(
    "smc", [("bos", S), ("order_block", D)],
    citation="batch/tv_big_money.py (SMC structure break + order block, pivot 5)",
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
    return {"bos": bos, "order_block": ob if not math.isinf(ob) else float("nan")}


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
     ("last_volume", D), ("amplitude", D), ("change_pct", D)],
    citation="incremental/base_data.py", min_data=2,
)
def i_base_data(b: pd.DataFrame):
    c, pc = _last(b.close), float(b.close.iloc[-2]) if len(b) >= 2 else float("nan")
    return {
        "last_open": _last(b.open), "last_high": _last(b.high),
        "last_low": _last(b.low), "last_close": c,
        "last_volume": _last(b.volume),
        "amplitude": (_last(b.high) - _last(b.low)) / c if c else float("nan"),
        "change_pct": (c - pc) / pc * 100 if pc else float("nan"),
    }


@register(
    "buy_sell_ratio", [("taker_ratio", D)],
    citation="incremental/buy_sell_ratio.py (proxy: up-bar volume share of last 20 bars)",
    min_data=2,
)
def i_buy_sell_ratio(b: pd.DataFrame):
    t = b.tail(20)
    buy = t.volume.where(t.close >= t.open, 0.0).sum()
    tot = t.volume.sum()
    return {"taker_ratio": float(buy / tot) if tot else float("nan")}


@register(
    "mfi", [("mfi14", D), ("mfi_state", S)],
    citation="batch/mfi.py:8-26", min_data=15,
)
def i_mfi(b: pd.DataFrame):
    m = _last(ta.mfi(b.high, b.low, b.close, b.volume, 14))
    state = "overbought" if m >= 80 else ("oversold" if m <= 20 else "neutral")
    return {"mfi14": m, "mfi_state": state}


@register(
    "k_pattern",
    [("pattern", S), ("pattern_dir", S), ("n_patterns_20", "long")],
    citation="batch/k_pattern.py:52-241 (TA-Lib CDL set; pure-python "
    "fallback mirrors k_pattern.py:52-67 try/except path)",
    min_data=5,
)
def i_k_pattern(b: pd.DataFrame):
    """Classic candlestick patterns on the latest bar, pure numpy —
    the reference's TA-Lib-unavailable fallback path. Covers the
    high-signal subset: doji, hammer, shooting star, bullish/bearish
    engulfing, harami, three white soldiers / black crows."""
    o, h, l, c = (x.to_numpy() for x in (b.open, b.high, b.low, b.close))
    body = np.abs(c - o)
    rng = np.maximum(h - l, 1e-12)
    upper = h - np.maximum(o, c)
    lower = np.minimum(o, c) - l
    i = len(c) - 1

    def bull(j): return c[j] > o[j]
    def bear(j): return c[j] < o[j]

    name, direction = "none", "neutral"
    if body[i] <= 0.1 * rng[i]:
        name, direction = "doji", "neutral"
    elif lower[i] >= 2 * body[i] and upper[i] <= 0.3 * body[i] + 1e-12:
        name, direction = "hammer", "bull"
    elif upper[i] >= 2 * body[i] and lower[i] <= 0.3 * body[i] + 1e-12:
        name, direction = "shooting_star", "bear"
    elif i >= 1 and bear(i - 1) and bull(i) and o[i] <= c[i - 1] and c[i] >= o[i - 1]:
        name, direction = "bullish_engulfing", "bull"
    elif i >= 1 and bull(i - 1) and bear(i) and o[i] >= c[i - 1] and c[i] <= o[i - 1]:
        name, direction = "bearish_engulfing", "bear"
    elif i >= 1 and body[i] < body[i - 1] and max(o[i], c[i]) <= max(o[i - 1], c[i - 1]) and min(o[i], c[i]) >= min(o[i - 1], c[i - 1]):
        name, direction = "harami", "neutral"
    elif i >= 2 and all(bull(j) for j in (i - 2, i - 1, i)) and c[i] > c[i - 1] > c[i - 2]:
        name, direction = "three_white_soldiers", "bull"
    elif i >= 2 and all(bear(j) for j in (i - 2, i - 1, i)) and c[i] < c[i - 1] < c[i - 2]:
        name, direction = "three_black_crows", "bear"

    # count doji-or-engulfing occurrences over the last 20 bars
    n = 0
    for j in range(max(1, len(c) - 20), len(c)):
        if body[j] <= 0.1 * rng[j]:
            n += 1
        elif bear(j - 1) and bull(j) and o[j] <= c[j - 1] and c[j] >= o[j - 1]:
            n += 1
        elif bull(j - 1) and bear(j) and o[j] >= c[j - 1] and c[j] <= o[j - 1]:
            n += 1
    return {"pattern": name, "pattern_dir": direction, "n_patterns_20": n}


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
    [("oi_last", D), ("oi_chg_pct", D), ("ls_ratio", D)],
    citation="incremental/futures_sentiment.py:1-104 (latest metrics snapshot)",
    min_data=2,
)
def i_futures_sentiment(b: pd.DataFrame):
    """Latest-snapshot metrics proxy over the bar tail: last volume as
    OI stand-in, 30-bar change, up/down-volume ratio as L/S ratio."""
    v = b.volume
    oi = _last(v)
    base = float(v.iloc[-31]) if len(v) >= 31 else float(v.iloc[0])
    up = v.where(b.close >= b.open, 0.0).tail(30).sum()
    dn = v.where(b.close < b.open, 0.0).tail(30).sum()
    return {
        "oi_last": oi,
        "oi_chg_pct": (oi - base) / base * 100 if base else float("nan"),
        "ls_ratio": float(up / dn) if dn else float("nan"),
    }


@register(
    "precision_trend",
    [("pt_line", D), ("pt_state", S), ("pt_flips_50", "long")],
    citation="batch/super_trend.py:17-107 (ZLEMA70 band state machine, "
    "path-dependent flip tracking)", min_data=80,
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
    return {"pt_line": _last(pd.Series(z)), "pt_state": label, "pt_flips_50": flips}
